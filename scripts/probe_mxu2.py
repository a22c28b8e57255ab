"""Decompose the mont_mul kernel cost on the live TPU.

Times stripped-down Pallas kernels to locate the bottleneck:
  wide     : schoolbook a*b accumulation only (pad-add formulation)
  wide_tree: a*b via shift-add tree (log2(L) levels, ~3.5x fewer add rows)
  carry    : serial 2L-row carry chain only
  carry_ks : Kogge-Stone carry only
  redc_vpu : q + q*p (constant-operand _mul_cols) only
  redc_mxu : q + q*p as MXU matmuls only
  full_vpu / full_mxu / full_vpu_ks: complete mont cores

Usage: timeout 3000 python scripts/probe_mxu2.py [logn]
"""

import functools
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

CACHE_DIR = "/root/.cache/cocircom_tpu/xla-" + jax.default_backend()
os.makedirs(CACHE_DIR, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", CACHE_DIR)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from cocircom_tpu.fields.params import BN254
from cocircom_tpu.ops import pallas_field as pf
from cocircom_tpu.ops.field import get_field

MASK = np.uint32(0xFFFF)


def fetch(x):
    leaf = jax.tree.leaves(x)[0]
    return np.asarray(jax.device_get(leaf.reshape(-1)[:1]))


def timed(fn, iters=4):
    fetch(fn())
    t0 = time.time()
    out = None
    for _ in range(iters):
        out = fn()
    fetch(out)
    return (time.time() - t0) / iters


def _mul_cols_tree(a, b, L, ncols):
    """Wide product via shift-add tree: build per-i partial rows (L+1 cols
    after lo/hi fold), then combine in log2(L) levels of shifted adds."""
    # partial i: p_i = a[i] * b -> (L, T) lo plus (L, T) hi shifted by 1:
    # fold into (L+1, T) block immediately.
    zrow = jnp.zeros_like(a[0:1])
    blocks = []  # (width, T) blocks with implicit shift = i
    for i in range(L):
        prod = a[i : i + 1] * b  # (L, T)
        lo = prod & MASK
        hi = prod >> 16
        blk = jnp.concatenate([lo, zrow], 0) + jnp.concatenate([zrow, hi], 0)
        blocks.append(blk)  # shift i, width L+1
    shift = 1
    while len(blocks) > 1:
        nxt = []
        for j in range(0, len(blocks) - 1, 2):
            x, y = blocks[j], blocks[j + 1]
            # y is `shift` columns above x
            w = max(x.shape[0], y.shape[0] + shift)

            def zpad(arr, lo, hi):
                parts = []
                if lo:
                    parts.append(jnp.zeros((lo,) + arr.shape[1:], arr.dtype))
                parts.append(arr)
                if hi:
                    parts.append(jnp.zeros((hi,) + arr.shape[1:], arr.dtype))
                return jnp.concatenate(parts, 0) if len(parts) > 1 else arr

            xz = zpad(x, 0, w - x.shape[0])
            yz = zpad(y, shift, w - shift - y.shape[0])
            nxt.append(xz + yz)
        if len(blocks) % 2:
            nxt.append(blocks[-1])
        blocks = nxt
        shift *= 2
    out = blocks[0]
    if out.shape[0] < ncols:
        out = jnp.concatenate(
            [out, jnp.zeros((ncols - out.shape[0],) + out.shape[1:], out.dtype)], 0
        )
    return out[:ncols]


def make_kernels(fld):
    L = fld.L
    p_limbs = [int(v) for v in fld.p_limbs]
    np_limbs = [int(v) for v in fld.nprime_limbs]
    nmat, pmat = pf._byte_mats(fld.p_limbs, fld.nprime_limbs, L)
    nmat = jnp.asarray(nmat)
    pmat = jnp.asarray(pmat)

    def wide_k(a_ref, b_ref, o_ref):
        w = pf._mul_cols(a_ref[:], b_ref[:], L, 2 * L)
        o_ref[:] = w[:L] + w[L:]

    def wide_tree_k(a_ref, b_ref, o_ref):
        w = _mul_cols_tree(a_ref[:], b_ref[:], L, 2 * L)
        o_ref[:] = w[:L] + w[L:]

    def carry_k(a_ref, b_ref, o_ref):
        cols = jnp.concatenate([a_ref[:], b_ref[:]], 0)
        s = pf._carry(cols, 2 * L)
        o_ref[:] = s[:L] ^ s[L:]

    def carry_ks_k(a_ref, b_ref, o_ref):
        cols = jnp.concatenate([a_ref[:], b_ref[:]], 0)
        s, _ = pf._carry_ks_out(cols, 2 * L)
        o_ref[:] = s[:L] ^ s[L:]

    def redc_vpu_k(a_ref, b_ref, o_ref):
        tlo = a_ref[:]
        q = pf._carry(pf._mul_cols(tlo, np_limbs, L, L), L)
        qp = pf._mul_cols(q, p_limbs, L, 2 * L)
        o_ref[:] = qp[:L] + qp[L:] + b_ref[:]

    def make_redc_mxu_k():
        def k(a_ref, b_ref, n_ref, p_ref, o_ref):
            f32 = jnp.float32
            tlo = a_ref[:]

            def to_bf16(x):
                return x.astype(jnp.int32).astype(f32).astype(jnp.bfloat16)

            def to_u32(x):
                return x.astype(jnp.int32).astype(jnp.uint32)

            tlo8 = to_bf16(pf._to_bytes_rows(tlo, L))
            qcols = to_u32(jax.lax.dot_general(
                n_ref[:], tlo8, (((1,), (0,)), ((), ())),
                preferred_element_type=f32))
            q8 = to_bf16(pf._redistribute(qcols, 3))
            qpcols = to_u32(jax.lax.dot_general(
                p_ref[:], q8, (((1,), (0,)), ((), ())),
                preferred_element_type=f32))
            g = qpcols.reshape(2 * L, 2, *qpcols.shape[1:])
            qp16 = g[:, 0] + (g[:, 1] << 8)
            o_ref[:] = qp16[:L] + qp16[L:] + b_ref[:]

        return k

    return {
        "wide": (wide_k, 2),
        "wide_tree": (wide_tree_k, 2),
        "carry": (carry_k, 2),
        "carry_ks": (carry_ks_k, 2),
        "redc_vpu": (redc_vpu_k, 2),
        "redc_mxu": (make_redc_mxu_k(), 4),
    }, (nmat, pmat)


def main():
    logn = int(sys.argv[1]) if len(sys.argv) > 1 else 22
    n = 1 << logn
    fld = get_field(BN254.fr.p, "bn254.fr")
    L = fld.L
    tile = pf.MAX_TILE

    @jax.jit
    def gen(key):
        raw = jax.random.bits(key, (L, n), jnp.uint32) & 0xFFFF
        return fld._cond_sub_p(raw.at[L - 1].set(raw[L - 1] & 0x3FFF))

    k1, k2 = jax.random.split(jax.random.key(3))
    a = gen(k1)
    b = gen(k2)
    fetch(a)

    kernels, (nmat, pmat) = make_kernels(fld)
    spec = pl.BlockSpec((L, tile), lambda i: (0, i), memory_space=pltpu.VMEM)
    nspec = pl.BlockSpec((2 * L, 2 * L), lambda i: (0, 0),
                         memory_space=pltpu.VMEM)
    pspec = pl.BlockSpec((4 * L, 2 * L), lambda i: (0, 0),
                         memory_space=pltpu.VMEM)

    for name, (kern, nargs) in kernels.items():
        specs = [spec, spec] if nargs == 2 else [spec, spec, nspec, pspec]
        call = pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((L, n), jnp.uint32),
            grid=(n // tile,),
            in_specs=specs,
            out_specs=spec,
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",)),
        )
        args = (a, b) if nargs == 2 else (a, b, nmat, pmat)
        t = timed(lambda call=call, args=args: call(*args))
        print(f"{name:10s}: {t*1e3:8.2f} ms  {n/t/1e6:7.1f} M/s", flush=True)

    # full cores for reference
    for name, fn in [
        ("full_vpu", pf._mont_mul_call(fld, n, tile, False, False)),
        ("full_vpu_ks", pf._mont_mul_call(fld, n, tile, False, True)),
        ("full_mxu", pf._mont_mul_call_mxu(fld, n, tile, False, False)),
        ("full_mxu_ks", pf._mont_mul_call_mxu(fld, n, tile, False, True)),
    ]:
        t = timed(lambda fn=fn: fn(a, b))
        print(f"{name:10s}: {t*1e3:8.2f} ms  {n/t/1e6:7.1f} M/s", flush=True)


if __name__ == "__main__":
    main()
