"""NTT vs naive host DFT + roundtrip + coset shift."""

import random

import pytest

from cocircom_tpu.fields.params import BN254, BLS12_381
from cocircom_tpu.ops.field import get_field
from cocircom_tpu.ops.ntt import ntt_engine

CURVES = [BN254, BLS12_381]


def eng(curve):
    return ntt_engine(get_field(curve.fr.p, curve.name + ".fr"), curve.fr)


@pytest.mark.parametrize("curve", CURVES, ids=lambda c: c.name)
def test_ntt_matches_naive_dft(curve):
    e = eng(curve)
    rng = random.Random(21)
    n = 8
    coeffs = [rng.randrange(curve.fr.p) for _ in range(n)]
    w = curve.fr.root_of_unity(3)
    want = [
        sum(c * pow(w, i * k, curve.fr.p) for i, c in enumerate(coeffs)) % curve.fr.p
        for k in range(n)
    ]
    a = e.f.encode(coeffs)
    got = list(e.f.decode(e.ntt(a)))
    assert got == want


@pytest.mark.parametrize("curve", CURVES[:1], ids=lambda c: c.name)
def test_ntt_roundtrip(curve):
    e = eng(curve)
    rng = random.Random(22)
    n = 256
    coeffs = [rng.randrange(curve.fr.p) for _ in range(n)]
    a = e.f.encode(coeffs)
    back = list(e.f.decode(e.intt(e.ntt(a))))
    assert back == coeffs


@pytest.mark.parametrize("curve", CURVES[:1], ids=lambda c: c.name)
def test_coset_shift(curve):
    e = eng(curve)
    rng = random.Random(23)
    n = 16
    coeffs = [rng.randrange(curve.fr.p) for _ in range(n)]
    g = curve.fr.groth16_coset_root(4)
    a = e.f.encode(coeffs)
    got = list(e.f.decode(e.coset_shift(a)))
    want = [c * pow(g, i, curve.fr.p) % curve.fr.p for i, c in enumerate(coeffs)]
    assert got == want


def test_snarkjs_root_convention():
    # the 2^28 two-adicity tower of bn254 Fr, reversed-squaring structure
    fr = BN254.fr
    assert fr.two_adicity == 28
    _, roots = fr.snarkjs_roots
    assert roots[0] == 1
    for k in range(1, 5):
        r = roots[k]
        assert pow(r, 1 << k, fr.p) == 1
        assert pow(r, 1 << (k - 1), fr.p) != 1
    assert BLS12_381.fr.two_adicity == 32
