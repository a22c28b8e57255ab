"""Fused Pallas EC-add kernel vs the generic CurveOps composition.

Run in interpret mode on the CPU backend (tests/conftest.py pins
JAX_PLATFORMS=cpu); the TPU path compiles the same kernel natively."""

import jax.numpy as jnp
import numpy as np
import pytest

from cocircom_tpu.fields.params import BN254, BLS12_381
from cocircom_tpu.ops.curve import ProjPoint, g1_ops
from cocircom_tpu.ops.pallas_curve import ec_add_pallas, ec_wave_add_pallas


def _random_points(ops, n, seed):
    """n points: generator multiples incl. the identity and repeats."""
    curve = ops.curve if hasattr(ops, "curve") else None
    rng = np.random.default_rng(seed)
    gen = ops.encode_points([None] + [  # identity in slot 0
        pt for pt in [BN254.g1_gen] * 0
    ]) if False else None
    scalars = rng.integers(0, 1 << 14, size=n).astype(np.uint32)
    scalars[0] = 0  # identity
    if n > 3:
        scalars[3] = scalars[2]  # equal points -> doubling case in adds
    base = ops.encode_points([_gen_for(ops)])
    baseb = ProjPoint(*(
        jnp.broadcast_to(c[..., 0:1], (c.shape[0], n)) for c in base))
    return ops.scalar_mul(baseb, jnp.asarray(scalars)[None, :], nbits=14)


def _gen_for(ops):
    return BN254.g1_gen if ops.lane.f.p == BN254.fq.p else BLS12_381.g1_gen


@pytest.mark.parametrize("curve", [BN254, BLS12_381])
def test_ec_add_pallas_matches_generic(curve):
    ops = g1_ops(curve)
    p = _random_points(ops, 16, seed=1)
    q = _random_points(ops, 16, seed=2)
    # include p + (-p) (identity result) and p + p (doubling path)
    q = ops.select(jnp.arange(16) == 5, ops.neg(p), q)
    q = ops.select(jnp.arange(16) == 6, p, q)
    ref = ops.add(p, q)
    got = ec_add_pallas(ops, p, q, interpret=True)
    for r, g in zip(ref, got):
        assert bool(jnp.all(r == g))


def test_ec_add_pallas_broadcast_single():
    ops = g1_ops(BN254)
    p = _random_points(ops, 8, seed=3)
    q1 = ProjPoint(*(c[..., 2:3] for c in _random_points(ops, 4, seed=4)))
    ref = ops.add(p, q1)
    got = ec_add_pallas(ops, p, q1, interpret=True)
    for r, g in zip(ref, got):
        assert bool(jnp.all(r == g))


def test_ec_wave_add_pallas_masks():
    ops = g1_ops(BN254)
    acc = _random_points(ops, 16, seed=5)
    pt = _random_points(ops, 16, seed=6)
    rng = np.random.default_rng(9)
    neg = jnp.asarray(rng.integers(0, 2, 16).astype(bool))
    valid = jnp.asarray(rng.integers(0, 2, 16).astype(bool))
    ln = ops.lane
    ptsel = ProjPoint(pt.x, ln.select(neg, ln.neg(pt.y), pt.y), pt.z)
    ref = ops.select(valid, ops.add(acc, ptsel), acc)
    got = ec_wave_add_pallas(ops, acc, pt, neg, valid, interpret=True)
    for r, g in zip(ref, got):
        assert bool(jnp.all(r == g))


def test_ec_wave_add_pallas_multidim_batch():
    """Wave-shaped (nw, K+1, T) batches flatten/pad/reshape correctly."""
    ops = g1_ops(BN254)
    flat = _random_points(ops, 24, seed=7)
    acc = ProjPoint(*(c.reshape(c.shape[0], 2, 3, 4) for c in flat))
    flat2 = _random_points(ops, 24, seed=8)
    pt = ProjPoint(*(c.reshape(c.shape[0], 2, 3, 4) for c in flat2))
    rng = np.random.default_rng(10)
    neg = jnp.asarray(rng.integers(0, 2, (2, 3, 4)).astype(bool))
    valid = jnp.asarray(rng.integers(0, 2, (2, 3, 4)).astype(bool))
    ln = ops.lane
    ptsel = ProjPoint(pt.x, ln.select(neg, ln.neg(pt.y), pt.y), pt.z)
    ref = ops.select(valid, ops.add(acc, ptsel), acc)
    got = ec_wave_add_pallas(ops, acc, pt, neg, valid, interpret=True)
    for r, g in zip(ref, got):
        assert bool(jnp.all(r == g))
        assert r.shape == g.shape
