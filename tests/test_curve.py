"""JAX complete-formula curve ops vs host affine ground truth."""

import random

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cocircom_tpu.fields.ec_host import ec_add, ec_mul, ec_neg, ec_on_curve
from cocircom_tpu.fields.params import BN254, BLS12_381
from cocircom_tpu.ops.curve import g1_ops, g2_ops
from cocircom_tpu.pairing.tower import Tower

CURVES = [BN254, BLS12_381]


def host_g1_gen(curve):
    t = Tower(curve)
    return (t.fp(curve.g1_gen[0]), t.fp(curve.g1_gen[1]))


def host_g2_gen(curve):
    t = Tower(curve)
    (x0, x1), (y0, y1) = curve.g2_gen
    return (t.fp2(x0, x1), t.fp2(y0, y1))


def host_pts_g1(curve, ks):
    g = host_g1_gen(curve)
    return [ec_mul(g, k) for k in ks]


def to_ints_g1(P):
    return None if P is None else (P[0].v, P[1].v)


def to_ints_g2(P):
    if P is None:
        return None
    return ((P[0].c0.v, P[0].c1.v), (P[1].c0.v, P[1].c1.v))


@pytest.mark.parametrize("curve", CURVES, ids=lambda c: c.name)
def test_generators_on_curve(curve):
    t = Tower(curve)
    assert ec_on_curve(host_g1_gen(curve), t.fp(curve.b))
    assert ec_on_curve(host_g2_gen(curve), t.fp2(*curve.b2))


@pytest.mark.parametrize("curve", CURVES, ids=lambda c: c.name)
def test_g1_add_double_vs_host(curve):
    rng = random.Random(11)
    ks = [1, 2, 3, 7, rng.randrange(curve.fr.p), rng.randrange(curve.fr.p), 0]
    hostP = host_pts_g1(curve, ks)
    hostQ = list(reversed(hostP))
    ops = g1_ops(curve)
    P = ops.encode_points([to_ints_g1(p) for p in hostP])
    Q = ops.encode_points([to_ints_g1(p) for p in hostQ])
    got = ops.decode_points(ops.add(P, Q))
    want = [to_ints_g1(ec_add(a, b)) for a, b in zip(hostP, hostQ)]
    assert got == want
    # doubling through the same complete formula
    got2 = ops.decode_points(ops.double(P))
    want2 = [to_ints_g1(ec_add(a, a)) for a in hostP]
    assert got2 == want2
    # identity + negation
    gotn = ops.decode_points(ops.add(P, ops.neg(P)))
    assert gotn == [None] * len(hostP)


@pytest.mark.parametrize("curve", CURVES, ids=lambda c: c.name)
def test_g2_add_vs_host(curve):
    g = host_g2_gen(curve)
    hostP = [ec_mul(g, k) for k in [1, 5, 0, 123456789]]
    hostQ = [ec_mul(g, k) for k in [9, 5, 7, 1]]
    ops = g2_ops(curve)
    P = ops.encode_points([to_ints_g2(p) for p in hostP])
    Q = ops.encode_points([to_ints_g2(p) for p in hostQ])
    got = ops.decode_points(ops.add(P, Q))
    want = [to_ints_g2(ec_add(a, b)) for a, b in zip(hostP, hostQ)]
    assert got == want


@pytest.mark.parametrize("curve", CURVES[:1], ids=lambda c: c.name)
def test_g1_scalar_mul(curve):
    rng = random.Random(12)
    fr = curve.fr
    from cocircom_tpu.ops.field import get_field

    frf = get_field(fr.p)
    ks = [0, 1, 2, rng.randrange(fr.p), rng.randrange(fr.p)]
    g = host_g1_gen(curve)
    ops = g1_ops(curve)
    P = ops.encode_points([to_ints_g1(g)] * len(ks))
    scal = jnp.asarray(frf.to_limbs(ks))
    got = ops.decode_points(ops.scalar_mul(P, scal))
    want = [to_ints_g1(ec_mul(g, k)) for k in ks]
    assert got == want


@pytest.mark.parametrize("curve", CURVES[:1], ids=lambda c: c.name)
def test_g1_sum_and_msm_naive(curve):
    rng = random.Random(13)
    from cocircom_tpu.ops.field import get_field

    frf = get_field(curve.fr.p)
    ks = [rng.randrange(curve.fr.p) for _ in range(5)]
    ss = [rng.randrange(curve.fr.p) for _ in range(5)]
    g = host_g1_gen(curve)
    hostP = [ec_mul(g, k) for k in ks]
    ops = g1_ops(curve)
    P = ops.encode_points([to_ints_g1(p) for p in hostP])
    # sum
    want_sum = None
    for p in hostP:
        want_sum = ec_add(want_sum, p)
    got_sum = ops.decode_points(
        jax.tree.map(lambda a: a[..., None] if False else a[:, None] if False else jnp.expand_dims(a, 1), ops.sum(P, axis=1))
    )[0]
    assert got_sum == to_ints_g1(want_sum)
    # naive msm
    want = None
    for s, p in zip(ss, hostP):
        want = ec_add(want, ec_mul(p, s))
    scal = jnp.asarray(frf.to_limbs(ss))
    msm = ops.msm_naive(P, scal)
    got = ops.decode_points(jax.tree.map(lambda a: jnp.expand_dims(a, 1), msm))[0]
    assert got == to_ints_g1(want)
