"""Pippenger MSM vs naive batched double-and-add."""

import random

import jax.numpy as jnp
import pytest

from cocircom_tpu.fields.ec_host import ec_add, ec_mul
from cocircom_tpu.fields.params import BN254
from cocircom_tpu.ops.curve import g1_ops, g2_ops
from cocircom_tpu.ops.field import get_field
from cocircom_tpu.ops.msm import msm_engine
from cocircom_tpu.pairing.tower import Tower


def host_points_g1(curve, n, rng):
    t = Tower(curve)
    g = (t.fp(curve.g1_gen[0]), t.fp(curve.g1_gen[1]))
    return [ec_mul(g, rng.randrange(1, curve.fr.p)) for _ in range(n)]


@pytest.mark.parametrize("n", [1, 7, 65])
def test_msm_g1_matches_host(n):
    curve = BN254
    rng = random.Random(100 + n)
    hostP = host_points_g1(curve, n, rng)
    scalars = [rng.randrange(curve.fr.p) for _ in range(n)]
    if n > 2:
        scalars[1] = 0  # zero scalar
        hostP[2] = hostP[0]  # duplicate point
    want = None
    for s, p in zip(scalars, hostP):
        want = ec_add(want, ec_mul(p, s))
    ops = g1_ops(curve)
    P = ops.encode_points([(p[0].v, p[1].v) for p in hostP])
    frf = get_field(curve.fr.p)
    eng = msm_engine(ops)
    res = eng.msm(P, jnp.asarray(frf.to_limbs(scalars)))
    got = ops.decode_points(_exp(res))[0]
    want_ints = None if want is None else (want[0].v, want[1].v)
    assert got == want_ints


def _exp(pt):
    import jax

    return jax.tree.map(lambda a: jnp.expand_dims(a, 1), pt)


def test_msm_g2_small():
    curve = BN254
    rng = random.Random(7)
    t = Tower(curve)
    (x0, x1), (y0, y1) = curve.g2_gen
    g2 = (t.fp2(x0, x1), t.fp2(y0, y1))
    hostP = [ec_mul(g2, k) for k in (3, 99, 12345)]
    scalars = [rng.randrange(curve.fr.p) for _ in range(3)]
    want = None
    for s, p in zip(scalars, hostP):
        want = ec_add(want, ec_mul(p, s))
    ops = g2_ops(curve)

    def as_ints(P):
        return ((P[0].c0.v, P[0].c1.v), (P[1].c0.v, P[1].c1.v))

    P = ops.encode_points([as_ints(p) for p in hostP])
    frf = get_field(curve.fr.p)
    eng = msm_engine(ops)
    res = eng.msm(P, jnp.asarray(frf.to_limbs(scalars)))
    got = ops.decode_points(_exp(res))[0]
    assert got == as_ints(want)


def test_msm_chunked_matches_unchunked(monkeypatch):
    """Host-level chunking (n > CHUNK) must give the same point."""
    import random

    from cocircom_tpu.fields.params import BN254
    from cocircom_tpu.ops.curve import g1_ops
    from cocircom_tpu.ops.field import get_field
    from cocircom_tpu.ops.msm import MSM, msm_engine

    curve = BN254
    ops = g1_ops(curve)
    fr = get_field(curve.fr.p)
    rng = random.Random(3)
    n = 24
    import jax.numpy as jnp

    from cocircom_tpu.fields.ec_host import ec_add, ec_mul
    from cocircom_tpu.pairing.tower import Tower

    t = Tower(curve)
    g = (t.fp(curve.g1_gen[0]), t.fp(curve.g1_gen[1]))
    hostP = [ec_mul(g, rng.randrange(1, curve.fr.p)) for _ in range(n)]
    scalars = [rng.randrange(curve.fr.p) for _ in range(n)]
    want = None
    for s, p in zip(scalars, hostP):
        want = ec_add(want, ec_mul(p, s))

    P = ops.encode_points([(p[0].v, p[1].v) for p in hostP])
    sl = jnp.asarray(fr.to_limbs(scalars))
    eng = msm_engine(ops, 4)
    monkeypatch.setattr(MSM, "CHUNK_LOG", 3)  # force 3 chunks
    res = eng.msm(P, sl)
    x, y = ops.decode_points(
        jax.tree.map(lambda c: c[..., None], res))[0]
    assert (x, y) == (want[0].v, want[1].v)


import jax  # noqa: E402  (used by the chunk test)

@pytest.mark.parametrize("pack", [True, False])
@pytest.mark.parametrize("mxu", [True, False])
@pytest.mark.parametrize("n", [7, 65])
def test_msm_madd_path_matches_host(n, mxu, pack, monkeypatch):
    """The TPU mixed-add wave path (Jacobian += affine with D bucket init
    + E*D correction) in Pallas interpret mode vs the host reference,
    incl. identity points and zero scalars — across the packed-gather and
    MXU-REDC kernel variants."""
    from cocircom_tpu.ops import pallas_field
    from cocircom_tpu.ops.msm import MSM

    monkeypatch.setenv("COCIRCOM_FORCE_MADD", "interpret")
    monkeypatch.setattr(MSM, "PACK", pack)
    monkeypatch.setattr(pallas_field, "USE_MXU", mxu)
    curve = BN254
    rng = random.Random(500 + n)
    hostP = host_points_g1(curve, n, rng)
    scalars = [rng.randrange(curve.fr.p) for _ in range(n)]
    enc = [(p[0].v, p[1].v) for p in hostP]
    if n > 2:
        scalars[1] = 0
        enc[3] = None  # identity point in the bases
        hostP[3] = None
    want = None
    for s, p in zip(scalars, hostP):
        if p is None:
            continue
        want = ec_add(want, ec_mul(p, s))
    ops = g1_ops(curve)
    P = ops.encode_points(enc)
    frf = get_field(curve.fr.p)
    eng = msm_engine(ops, 6)
    res = eng.msm(P, jnp.asarray(frf.to_limbs(scalars)))
    got = ops.decode_points(_exp(res))[0]
    assert got == (want[0].v, want[1].v)
