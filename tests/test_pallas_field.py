"""Pallas mont_mul kernel conformance (interpreter mode on CPU).

The TPU backend routes Field.mont_mul through ops/pallas_field.py; these
tests pin the kernel's math against the pure-XLA path (itself pinned against
the host bigint model in test_field.py)."""

import jax.numpy as jnp
import numpy as np
import pytest

from cocircom_tpu.fields.params import BLS12_381, BN254
from cocircom_tpu.ops.field import get_field
from cocircom_tpu.ops.pallas_field import mont_mul_pallas


@pytest.mark.parametrize(
    "p,name",
    [
        (BN254.fr.p, "bn254.fr"),
        (BN254.fq.p, "bn254.fq"),
        (BLS12_381.fq.p, "bls12_381.fq"),
    ],
)
def test_pallas_mont_mul_matches_xla(p, name):
    f = get_field(p, name)
    rng = np.random.default_rng(42)
    vals_a = [int.from_bytes(rng.bytes(48), "little") % p for _ in range(333)]
    vals_b = [int.from_bytes(rng.bytes(48), "little") % p for _ in range(333)]
    a = jnp.asarray(f.to_limbs(vals_a))
    b = jnp.asarray(f.to_limbs(vals_b))
    ref = f.mont_mul(a, b)
    got = mont_mul_pallas(f, a, b, interpret=True)
    assert bool(jnp.all(ref == got))


def test_pallas_mont_mul_edge_and_broadcast():
    f = get_field(BN254.fr.p, "bn254.fr")
    e = jnp.asarray(f.to_limbs([f.p - 1, 0, 1, 2, f.p - 2, f.p - 1] * 3))
    assert bool(jnp.all(f.mont_mul(e, e) == mont_mul_pallas(f, e, e, interpret=True)))
    a3 = jnp.asarray(f.to_limbs(list(range(1, 61)))).reshape(f.L, 3, 20)
    b1 = a3[:, :1, :1]
    assert bool(
        jnp.all(f.mont_mul(a3, b1) == mont_mul_pallas(f, a3, b1, interpret=True))
    )


def test_pallas_butterfly_matches_xla():
    """Fused NTT butterfly (even +/- odd*w) vs the separate XLA ops."""
    from cocircom_tpu.ops.pallas_field import butterfly_pallas

    f = get_field(BN254.fr.p, "bn254.fr")
    rng = np.random.default_rng(7)
    n = 300
    ev = [int.from_bytes(rng.bytes(40), "little") % f.p for _ in range(n)]
    od = [int.from_bytes(rng.bytes(40), "little") % f.p for _ in range(n)]
    tw = [int.from_bytes(rng.bytes(40), "little") % f.p for _ in range(n)]
    # edge values: identity twiddle, zero operands, p-1 everywhere
    ev[:4] = [0, f.p - 1, 1, f.p - 1]
    od[:4] = [f.p - 1, 0, f.p - 1, f.p - 1]
    tw[:4] = [1, 1, 0, f.p - 1]
    e = jnp.asarray(f.to_limbs(ev))
    o = jnp.asarray(f.to_limbs(od))
    w = jnp.asarray(f.to_limbs(tw))
    t = f.mont_mul(o, w)
    ref_e, ref_o = f.add(e, t), f.sub(e, t)
    got_e, got_o = butterfly_pallas(f, e, o, w, interpret=True)
    assert bool(jnp.all(ref_e == got_e))
    assert bool(jnp.all(ref_o == got_o))


def test_pallas_kogge_stone_carry_mode():
    """KS parallel-carry kernels match the serial-chain kernels, including
    full-ripple carry patterns (operands driving limbs to 0xFFFF)."""
    from cocircom_tpu.ops import pallas_field

    f = get_field(BN254.fr.p, "bn254.fr")
    rng = np.random.default_rng(3)
    vals = [int.from_bytes(rng.bytes(40), "little") % f.p for _ in range(300)]
    # ripple-prone values: R-1 mod p, p-1, 2^k-1 ladders
    vals[:6] = [f.p - 1, (1 << 255) % f.p, (1 << 256) % f.p - 1 % f.p,
                (f.R - 1) % f.p, 1, (1 << 128) - 1]
    a = jnp.asarray(f.to_limbs(vals))
    b = jnp.asarray(f.to_limbs(vals[::-1]))
    ref = f.mont_mul(a, b)
    old = pallas_field.USE_KS
    try:
        pallas_field.USE_KS = True
        got = pallas_field.mont_mul_pallas(f, a, b, interpret=True)
        t = f.mont_mul(b, a)
        ref_e, ref_o = f.add(a, t), f.sub(a, t)
        got_e, got_o = pallas_field.butterfly_pallas(f, a, b, a, interpret=True)
    finally:
        pallas_field.USE_KS = old
    assert bool(jnp.all(ref == got))
    assert bool(jnp.all(ref_e == got_e))
    assert bool(jnp.all(ref_o == got_o))
