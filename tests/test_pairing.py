"""Pairing bilinearity + non-degeneracy (host engine)."""

import pytest

from cocircom_tpu.fields.ec_host import ec_mul
from cocircom_tpu.fields.params import BN254, BLS12_381
from cocircom_tpu.pairing.pairing import engine
from cocircom_tpu.pairing.tower import Tower, generic_pow


def gens(curve):
    t = Tower(curve)
    g1 = (t.fp(curve.g1_gen[0]), t.fp(curve.g1_gen[1]))
    (x0, x1), (y0, y1) = curve.g2_gen
    g2 = (t.fp2(x0, x1), t.fp2(y0, y1))
    return g1, g2


def as_ints_g1(P):
    return (P[0].v, P[1].v)


def as_ints_g2(P):
    return ((P[0].c0.v, P[0].c1.v), (P[1].c0.v, P[1].c1.v))


@pytest.mark.parametrize("curve", [BN254, BLS12_381], ids=lambda c: c.name)
def test_bilinearity(curve):
    e = engine(curve)
    g1, g2 = gens(curve)
    a, b = 7, 13
    lhs = e.pairing(as_ints_g1(ec_mul(g1, a)), as_ints_g2(ec_mul(g2, b)))
    base = e.pairing(as_ints_g1(g1), as_ints_g2(g2))
    rhs = generic_pow(base, a * b)
    assert lhs == rhs
    # non-degeneracy
    assert not (base == e.t.fp12_one())
    # r-torsion: e(G1, G2)^r == 1
    assert generic_pow(base, curve.fr.p) == e.t.fp12_one()


def test_pairing_check_inverse():
    curve = BN254
    e = engine(curve)
    g1, g2 = gens(curve)
    neg_g1 = (g1[0], -g1[1])
    assert e.pairing_check(
        [(as_ints_g1(g1), as_ints_g2(g2)), (as_ints_g1(neg_g1), as_ints_g2(g2))]
    )
