"""Pallas TPU kernel: batched Montgomery multiplication, VMEM-resident.

Round-1 profiling (docs/TPU_NOTES.md) showed the XLA lowering of the wide
pad-row formulation spills the (2L, N) deferred-carry accumulator to HBM
between fusion passes, capping mont_mul at ~25 M muls/s while the VPU has
order-of-magnitude headroom. This kernel keeps the entire schoolbook
product + full-width REDC + conditional subtraction inside one Pallas
program: operands are (L, T) u32 tiles in VMEM, every intermediate lives in
vector registers / VMEM scratch, and one tile of results is written back per
grid step. The limb layout matches cocircom_tpu.ops.field.Field exactly
(L x 16-bit limbs, limb-axis first), so this is a drop-in replacement for
Field.mont_mul on the TPU backend.

Algorithm (identical math to Field._mont_reduce, reference parity with
arkworks MontBackend used by /root/reference/mpc-core — SURVEY.md L0):
    T  = a * b                      (2L deferred-carry columns, values < 2^21)
    q  = (T mod R) * (-p^-1) mod R  (low-half product)
    S  = (T + q*p) / R              (exact division: low L limbs cancel)
    out = S - p if S >= p else S
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

W = 16
MASK = np.uint32(0xFFFF)


def _carry(cols, n):
    """Propagate 16-bit carries through the first n deferred columns.

    cols: (C, T) u32 with column values < 2^32 - 2^16 (safe margin).
    Returns (n, T) canonical limbs. Serial over rows (n <= 2L = tiny), each
    step a (1, T) vector op.
    """
    c = jnp.zeros_like(cols[0:1])
    outs = []
    for i in range(n):
        t = cols[i : i + 1] + c
        outs.append(t & MASK)
        c = t >> W
    return jnp.concatenate(outs, 0)


# parallel-carry toggle (A/B probe: scripts/probe_mont_mul.py). The serial
# chain is 3 dependent vector ops per limb row; Kogge-Stone replaces it
# with ~2 folds + log2(n) prefix levels of independent full-height ops.
USE_KS = bool(int(os.environ.get("COCIRCOM_PALLAS_KS", "0")))


def _carry_ks_out(cols, n):
    """Parallel carry propagation (exact): cols (C, T) u32 with values
    < 2^22 -> (n canonical limbs, carry out of column n-1)."""
    v = cols[:n]
    drop = jnp.zeros_like(v[0:1])
    # two folds: hi bits hop one column; bounds 2^22 -> 2^16+2^6 -> 2^16
    for _ in range(2):
        lo = v & MASK
        hi = v >> W
        drop = drop + hi[n - 1 : n]
        v = lo + jnp.concatenate([jnp.zeros_like(hi[:1]), hi[:-1]], 0)
    # v <= 2^16: single-bit generate/propagate prefix scan
    g = v >> W  # {0, 1}
    r = v & MASK
    pr = (r == MASK).astype(jnp.uint32)
    d = 1
    while d < n:
        gs = jnp.concatenate([jnp.zeros_like(g[:d]), g[:-d]], 0)
        ps = jnp.concatenate([jnp.zeros_like(pr[:d]), pr[:-d]], 0)
        g = g | (pr & gs)
        pr = pr & ps
        d <<= 1
    cin = jnp.concatenate([jnp.zeros_like(g[:1]), g[:-1]], 0)
    return (r + cin) & MASK, drop + g[n - 1 : n]


def _carry_n(cols, n, ks=None):
    if USE_KS if ks is None else ks:
        return _carry_ks_out(cols, n)[0]
    return _carry(cols, n)


def _mul_cols(a, b_rows, L, ncols):
    """Schoolbook product into `ncols` deferred-carry columns.

    a: (L, T) u32 canonical limbs. b_rows: either a (L, T) array, or a list
    of L python ints (constant operand -> scalar-literal multiplies of the
    whole (L, T) array, keeping full sublane utilization and creating no
    captured array constants, which Pallas forbids). Column values stay
    < 2L * 2^16 < 2^21, so carries are deferred to one _carry pass.
    """
    zpad = [(0, 0)] * (a.ndim - 1)
    acc = jnp.zeros((ncols,) + a.shape[1:], jnp.uint32)
    if isinstance(b_rows, (list, tuple)):
        # iterate over the CONSTANT's limbs: prod_j = b[j] * a is one
        # scalar-by-(L,T) multiply per nonzero constant limb
        for j in range(L):
            bj = int(b_rows[j])
            if bj == 0:
                continue
            prod = a * jnp.uint32(bj)
            lo = prod & MASK
            hi = prod >> W
            wlo = min(L, ncols - j)
            whi = min(L, ncols - j - 1)
            if wlo > 0:
                acc = acc + jnp.pad(lo[:wlo], [(j, ncols - j - wlo)] + zpad)
            if whi > 0:
                acc = acc + jnp.pad(hi[:whi], [(j + 1, ncols - j - 1 - whi)] + zpad)
        return acc
    for i in range(L):
        prod = a[i : i + 1] * b_rows  # (L, T)
        lo = prod & MASK
        hi = prod >> W
        wlo = min(L, ncols - i)
        whi = min(L, ncols - i - 1)
        if wlo > 0:
            acc = acc + jnp.pad(lo[:wlo], [(i, ncols - i - wlo)] + zpad)
        if whi > 0:
            acc = acc + jnp.pad(hi[:whi], [(i + 1, ncols - i - 1 - whi)] + zpad)
    return acc


def _cond_sub_p(x, p_limbs, L):
    """x (L, T) canonical, value < 2p -> x mod p (branchless)."""
    big = jnp.uint32(1 << W)
    borrow = jnp.zeros_like(x[0:1])
    outs = []
    for i in range(L):
        t = x[i : i + 1] + big - borrow - jnp.uint32(p_limbs[i])
        outs.append(t & MASK)
        borrow = jnp.uint32(1) - (t >> W)
    d = jnp.concatenate(outs, 0)
    return jnp.where(borrow.astype(bool), x, d)


def _carry_out(cols, n):
    """Like _carry but also returns the carry out of column n-1."""
    c = jnp.zeros_like(cols[0:1])
    outs = []
    for i in range(n):
        t = cols[i : i + 1] + c
        outs.append(t & MASK)
        c = t >> W
    return jnp.concatenate(outs, 0), c


def _mont_core(a, b, L, p_limbs, nprime_limbs, ks=False):
    """(a * b * R^-1) mod p on (L, T) canonical limbs, result < p.

    The serial carry chains dominate kernel latency (each step depends on
    the previous row), so the first propagation only canonicalizes the low
    L columns (all REDC needs for q); the high half stays in deferred-carry
    form and rides the one full-width chain over s = T + q*p.
    """
    wide = _mul_cols(a, b, L, 2 * L)
    if ks:
        tlo, c_mid = _carry_ks_out(wide[:L], L)
    else:
        tlo, c_mid = _carry_out(wide[:L], L)
    q = _carry_n(_mul_cols(tlo, nprime_limbs, L, L), L, ks)
    qp = _mul_cols(q, p_limbs, L, 2 * L)
    s_lo = tlo + qp[:L]  # <= (2^16-1) + 2^21: deferred-safe
    s_hi = wide[L:] + qp[L:]  # <= 2^21 + 2^21
    s_hi = jnp.concatenate([s_hi[0:1] + c_mid, s_hi[1:]], 0)
    sc = _carry_n(jnp.concatenate([s_lo, s_hi], 0), 2 * L, ks)
    return _cond_sub_p(sc[L:], p_limbs, L)


def _make_kernel(L, p_limbs, nprime_limbs, ks):
    p_limbs = [int(v) for v in p_limbs]
    nprime_limbs = [int(v) for v in nprime_limbs]

    def kernel(a_ref, b_ref, o_ref):
        o_ref[:] = _mont_core(a_ref[:], b_ref[:], L, p_limbs, nprime_limbs, ks)

    return kernel


# ---------------------------------------------------------------- MXU REDC
# The two REDC products have one CONSTANT operand (q = T_lo * N' mod R and
# q * p), i.e. they are multiplications by fixed banded Toeplitz matrices
# over the limb vector — exactly an MXU shape. With 8-bit digits every
# partial product is < 2^16 and a column accumulates <= 2L of them, so the
# whole matmul stays < 2^22: EXACT in f32 accumulation, and every digit
# (<= 256 after redistribution) is exact in bf16. This moves ~3/4 of the
# kernel's multiply work from the VPU to the MXU (docs/TPU_NOTES.md
# "Speed-of-light notes").


def _byte_mats(p_limbs, nprime_limbs, L):
    """Constant banded byte matrices for the MXU REDC path.

    nmat: (2L, 2L) with nmat[k, i] = byte_{k-i}(N')  (product mod R)
    pmat: (4L, 2L) with pmat[k, i] = byte_{k-i}(p)   (full product)
    """
    B = 2 * L

    def to_bytes(limbs):
        out = []
        for v in limbs:
            out.append(int(v) & 0xFF)
            out.append((int(v) >> 8) & 0xFF)
        return out

    nb = to_bytes(nprime_limbs)
    pb = to_bytes(p_limbs)
    nmat = np.zeros((B, B), np.float32)
    pmat = np.zeros((2 * B, B), np.float32)
    for k in range(B):
        for i in range(B):
            if 0 <= k - i < B:
                nmat[k, i] = nb[k - i]
    for k in range(2 * B):
        for i in range(B):
            if 0 <= k - i < B:
                pmat[k, i] = pb[k - i]
    return nmat.astype(jnp.bfloat16), pmat.astype(jnp.bfloat16)


def _to_bytes_rows(x, L):
    """(L, T) 16-bit limbs -> (2L, T) 8-bit digits (little-endian)."""
    lo = x & jnp.uint32(0xFF)
    hi = x >> 8
    return jnp.stack([lo, hi], axis=1).reshape(2 * L, *x.shape[1:])


def _redistribute(v, rounds):
    """Deferred byte columns -> digits <= 256 (exact in bf16), mod 2^(8B).

    v (B, T) u32 with values < 2^22; each round splits every column into
    its 3 bytes and shifts them into place. Bounds: 2^22 -> 541 -> 257 ->
    256 (see the MXU REDC comment), all full-height parallel VPU ops."""
    z1 = None
    for _ in range(rounds):
        b0 = v & jnp.uint32(0xFF)
        b1 = (v >> 8) & jnp.uint32(0xFF)
        b2 = v >> 16
        if z1 is None:
            z1 = jnp.zeros_like(b1[:1])
        v = b0 + jnp.concatenate([z1, b1[:-1]], 0)
        v = v + jnp.concatenate([z1, z1, b2[:-2]], 0)
    return v


def _mont_core_mxu(a, b, L, p_limbs, nmat, pmat, ks):
    """(a * b * R^-1) mod p with the REDC products on the MXU.

    Exactness argument: digits <= 256 are exact bf16; banded-matmul columns
    accumulate <= 2L products of 8-bit digits (< 2^22) — exact f32. q built
    this way may exceed R by < R/256, which keeps S < 2p (p/R <= 0.25 for
    the supported fields), so the single conditional subtraction stands."""
    f32 = jnp.float32

    def to_bf16(x):  # Mosaic has no u32->bf16 cast; hop via i32/f32
        return x.astype(jnp.int32).astype(f32).astype(jnp.bfloat16)

    def to_u32(x):  # ... and no f32->u32; values are small positive ints
        return x.astype(jnp.int32).astype(jnp.uint32)

    wide = _mul_cols(a, b, L, 2 * L)
    if ks:
        tlo, c_mid = _carry_ks_out(wide[:L], L)
    else:
        tlo, c_mid = _carry_out(wide[:L], L)
    # q = (T_lo * N') mod R on the MXU. Matmuls run on a 2-D flattened
    # view (the NTT kernels pass (L, M, T) operands).
    batch = tlo.shape[1:]

    def flat2(x):
        return x.reshape(x.shape[0], -1)

    tlo8 = to_bf16(flat2(_to_bytes_rows(tlo, L)))
    qcols = to_u32(jax.lax.dot_general(
        nmat, tlo8, (((1,), (0,)), ((), ())), preferred_element_type=f32
    ))
    q8 = to_bf16(_redistribute(qcols, 3))
    # q * p on the MXU (full 2R-width product)
    qpcols = to_u32(jax.lax.dot_general(
        pmat, q8, (((1,), (0,)), ((), ())), preferred_element_type=f32
    )).reshape((4 * L,) + batch)
    g = qpcols.reshape(2 * L, 2, *qpcols.shape[1:])
    qp16 = g[:, 0] + (g[:, 1] << 8)  # (2L, T) 16-bit columns, < 2^31
    s_lo = tlo + qp16[:L]
    s_hi = wide[L:] + qp16[L:]
    s_hi = jnp.concatenate([s_hi[0:1] + c_mid, s_hi[1:]], 0)
    sc = _carry(jnp.concatenate([s_lo, s_hi], 0), 2 * L)
    return _cond_sub_p(sc[L:], p_limbs, L)


def _make_kernel_mxu(L, p_limbs, ks):
    p_limbs = [int(v) for v in p_limbs]

    def kernel(a_ref, b_ref, n_ref, p_ref, o_ref):
        o_ref[:] = _mont_core_mxu(
            a_ref[:], b_ref[:], L, p_limbs, n_ref[:], p_ref[:], ks
        )

    return kernel


@functools.lru_cache(maxsize=None)
def _mont_mul_call_mxu(field, n, tile, interpret, ks=False):
    L = field.L
    kernel = _make_kernel_mxu(L, field.p_limbs, ks)
    grid = n // tile
    spec = pl.BlockSpec((L, tile), lambda i: (0, i), memory_space=pltpu.VMEM)
    nspec = pl.BlockSpec(
        (2 * L, 2 * L), lambda i: (0, 0), memory_space=pltpu.VMEM
    )
    pspec = pl.BlockSpec(
        (4 * L, 2 * L), lambda i: (0, 0), memory_space=pltpu.VMEM
    )
    call = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((L, n), jnp.uint32),
        grid=(grid,),
        in_specs=[spec, spec, nspec, pspec],
        out_specs=spec,
        interpret=bool(interpret),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        )
        if not interpret
        else None,
    )
    nmat, pmat = _byte_mats(field.p_limbs, field.nprime_limbs, L)
    return lambda a, b: call(a, b, nmat, pmat)


@functools.lru_cache(maxsize=None)
def _mont_mul_call(field, n, tile, interpret, ks=False):
    """Compiled pallas_call for (L, n) operands, grid over n//tile tiles."""
    L = field.L
    kernel = _make_kernel(L, field.p_limbs, field.nprime_limbs, ks)
    grid = n // tile
    spec = pl.BlockSpec((L, tile), lambda i: (0, i), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((L, n), jnp.uint32),
        grid=(grid,),
        in_specs=[spec, spec],
        out_specs=spec,
        interpret=bool(interpret),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        )
        if not interpret
        else None,
    )


def _add_mod(x, y, p_limbs, L):
    """x, y (L, T) canonical < p -> (x + y) mod p. 2p < R so the final
    carry is always zero (asserted at Field construction)."""
    c = jnp.zeros_like(x[0:1])
    outs = []
    for i in range(L):
        t = x[i : i + 1] + y[i : i + 1] + c
        outs.append(t & MASK)
        c = t >> W
    return _cond_sub_p(jnp.concatenate(outs, 0), p_limbs, L)


def _sub_mod(x, y, p_limbs, L):
    """x, y (L, T) canonical < p -> (x - y) mod p."""
    big = jnp.uint32(1 << W)
    borrow = jnp.zeros_like(x[0:1])
    outs = []
    for i in range(L):
        t = x[i : i + 1] + big - borrow - y[i : i + 1]
        outs.append(t & MASK)
        borrow = jnp.uint32(1) - (t >> W)
    d = jnp.concatenate(outs, 0)
    c = jnp.zeros_like(x[0:1])
    outs2 = []
    for i in range(L):
        t = d[i : i + 1] + jnp.uint32(int(p_limbs[i])) + c
        outs2.append(t & MASK)
        c = t >> W
    dp = jnp.concatenate(outs2, 0)
    return jnp.where(borrow.astype(bool), dp, d)


def _make_butterfly_kernel(L, p_limbs, nprime_limbs, ks):
    """even, odd, w -> (even + odd*w, even - odd*w): one NTT butterfly
    stage entirely in VMEM. Fusing the two modular add/sub passes into the
    Montgomery multiply saves two kernel launches and four HBM round trips
    of the stage arrays per NTT stage (the add/sub carry chains cost ~40%
    of a stage on the XLA path, docs/TPU_NOTES.md)."""
    p_limbs = [int(v) for v in p_limbs]
    nprime_limbs = [int(v) for v in nprime_limbs]

    def kernel(e_ref, o_ref, w_ref, oe_ref, oo_ref):
        e = e_ref[:]
        t = _mont_core(o_ref[:], w_ref[:], L, p_limbs, nprime_limbs, ks)
        oe_ref[:] = _add_mod(e, t, p_limbs, L)
        oo_ref[:] = _sub_mod(e, t, p_limbs, L)

    return kernel


def _make_butterfly_kernel_mxu(L, p_limbs, ks):
    p_limbs = [int(v) for v in p_limbs]

    def kernel(e_ref, o_ref, w_ref, n_ref, p_ref, oe_ref, oo_ref):
        e = e_ref[:]
        t = _mont_core_mxu(o_ref[:], w_ref[:], L, p_limbs, n_ref[:], p_ref[:], ks)
        oe_ref[:] = _add_mod(e, t, p_limbs, L)
        oo_ref[:] = _sub_mod(e, t, p_limbs, L)

    return kernel


@functools.lru_cache(maxsize=None)
def _butterfly_call(field, n, tile, interpret, ks=False, mxu=False):
    L = field.L
    grid = n // tile
    spec = pl.BlockSpec((L, tile), lambda i: (0, i), memory_space=pltpu.VMEM)
    shape = jax.ShapeDtypeStruct((L, n), jnp.uint32)
    params = (
        pltpu.CompilerParams(dimension_semantics=("arbitrary",))
        if not interpret
        else None
    )
    if mxu:
        kernel = _make_butterfly_kernel_mxu(L, field.p_limbs, ks)
        nspec = pl.BlockSpec(
            (2 * L, 2 * L), lambda i: (0, 0), memory_space=pltpu.VMEM
        )
        pspec = pl.BlockSpec(
            (4 * L, 2 * L), lambda i: (0, 0), memory_space=pltpu.VMEM
        )
        call = pl.pallas_call(
            kernel,
            out_shape=(shape, shape),
            grid=(grid,),
            in_specs=[spec, spec, spec, nspec, pspec],
            out_specs=(spec, spec),
            interpret=bool(interpret),
            compiler_params=params,
        )
        nmat, pmat = _byte_mats(field.p_limbs, field.nprime_limbs, L)
        return lambda e, o, w: call(e, o, w, nmat, pmat)
    kernel = _make_butterfly_kernel(L, field.p_limbs, field.nprime_limbs, ks)
    return pl.pallas_call(
        kernel,
        out_shape=(shape, shape),
        grid=(grid,),
        in_specs=[spec, spec, spec],
        out_specs=(spec, spec),
        interpret=bool(interpret),
        compiler_params=params,
    )


@functools.lru_cache(maxsize=None)
def _butterfly_call3(field, nblk, interpret, ks=False, mxu=False):
    L = field.L
    grid = nblk // SUBL
    spec = pl.BlockSpec(
        (L, SUBL, LANES), lambda i: (0, i, 0), memory_space=pltpu.VMEM
    )
    params = (
        pltpu.CompilerParams(dimension_semantics=("arbitrary",))
        if not interpret
        else None
    )
    shape = jax.ShapeDtypeStruct((L, nblk, LANES), jnp.uint32)
    if mxu:
        kernel = _make_butterfly_kernel_mxu(L, field.p_limbs, ks)
        nspec = pl.BlockSpec(
            (2 * L, 2 * L), lambda i: (0, 0), memory_space=pltpu.VMEM
        )
        pspec = pl.BlockSpec(
            (4 * L, 2 * L), lambda i: (0, 0), memory_space=pltpu.VMEM
        )
        call = pl.pallas_call(
            kernel, out_shape=(shape, shape), grid=(grid,),
            in_specs=[spec, spec, spec, nspec, pspec],
            out_specs=(spec, spec),
            interpret=bool(interpret), compiler_params=params,
        )
        nmat, pmat = _byte_mats(field.p_limbs, field.nprime_limbs, L)
        return lambda e, o, w: call(e, o, w, nmat, pmat)
    kernel = _make_butterfly_kernel(L, field.p_limbs, field.nprime_limbs, ks)
    return pl.pallas_call(
        kernel, out_shape=(shape, shape), grid=(grid,),
        in_specs=[spec, spec, spec], out_specs=(spec, spec),
        interpret=bool(interpret), compiler_params=params,
    )


def butterfly_pallas(field, even, odd, w, interpret: bool = False):
    """(L, N) canonical Montgomery triples -> (even + odd*w, even - odd*w)."""
    L = field.L
    n = even.shape[1]
    if USE_3D:
        e3, o3, w3 = (_to3d(x, L, n) for x in (even, odd, w))
        oe, oo = _butterfly_call3(
            field, e3.shape[1], interpret, USE_KS, USE_MXU
        )(e3, o3, w3)
        return (oe.reshape(L, -1)[:, :n], oo.reshape(L, -1)[:, :n])
    if n >= MAX_TILE:
        tile = MAX_TILE
    else:
        tile = max(128, -(-n // 128) * 128)
    pad = (-n) % tile
    if pad:
        even = jnp.pad(even, ((0, 0), (0, pad)))
        odd = jnp.pad(odd, ((0, 0), (0, pad)))
        w = jnp.pad(w, ((0, 0), (0, pad)))
    oe, oo = _butterfly_call(field, n + pad, tile, interpret, USE_KS, USE_MXU)(
        even, odd, w
    )
    if pad:
        oe, oo = oe[:, :n], oo[:, :n]
    return oe, oo


# tile width (lanes per grid step): 2048 measured best on v5e among
# {1024, 2048, 8192} (scripts/probe_mont_mul.py); env knob for re-probing
MAX_TILE = int(os.environ.get("COCIRCOM_PALLAS_TILE", "2048"))

# MXU REDC path (q = T_lo*N' and q*p as bf16 banded matmuls): A/B probe
# scripts/probe_mxu.py
USE_MXU = bool(int(os.environ.get("COCIRCOM_PALLAS_MXU", "0")))

# 3-D tile layout (L, SUBL, LANES): the serial carry/borrow chains run one
# (1, ...) row op per limb, and with flat (L, T) tiles a row is 1 sublane x
# T lanes = 1/8 VPU utilization. Folding the batch into (SUBL, LANES)
# blocks makes every chain step a full-width op: measured 606 vs 338 M
# muls/s at 2^22 (scripts/probe_3d.py), bit-exact.
SUBL = int(os.environ.get("COCIRCOM_PALLAS_SUBL", "8"))
LANES = int(os.environ.get("COCIRCOM_PALLAS_LANES", "256"))
USE_3D = bool(int(os.environ.get("COCIRCOM_PALLAS_3D", "1")))


@functools.lru_cache(maxsize=None)
def _mont_mul_call3(field, nblk, interpret, ks=False, mxu=False):
    """Compiled pallas_call on (L, nblk, LANES) operands (3-D tiles)."""
    L = field.L
    grid = nblk // SUBL
    spec = pl.BlockSpec(
        (L, SUBL, LANES), lambda i: (0, i, 0), memory_space=pltpu.VMEM
    )
    params = (
        pltpu.CompilerParams(dimension_semantics=("arbitrary",))
        if not interpret
        else None
    )
    shape = jax.ShapeDtypeStruct((L, nblk, LANES), jnp.uint32)
    if mxu:
        kernel = _make_kernel_mxu(L, field.p_limbs, ks)
        nspec = pl.BlockSpec(
            (2 * L, 2 * L), lambda i: (0, 0), memory_space=pltpu.VMEM
        )
        pspec = pl.BlockSpec(
            (4 * L, 2 * L), lambda i: (0, 0), memory_space=pltpu.VMEM
        )
        call = pl.pallas_call(
            kernel, out_shape=shape, grid=(grid,),
            in_specs=[spec, spec, nspec, pspec], out_specs=spec,
            interpret=bool(interpret), compiler_params=params,
        )
        nmat, pmat = _byte_mats(field.p_limbs, field.nprime_limbs, L)
        return lambda a, b: call(a, b, nmat, pmat)
    kernel = _make_kernel(L, field.p_limbs, field.nprime_limbs, ks)
    return pl.pallas_call(
        kernel, out_shape=shape, grid=(grid,),
        in_specs=[spec, spec], out_specs=spec,
        interpret=bool(interpret), compiler_params=params,
    )


def _to3d(x, L, n):
    """(L, n) -> padded (L, nblk, LANES); returns (arr3, nblk, orig n)."""
    blk = SUBL * LANES
    pad = (-n) % blk
    if pad:
        x = jnp.pad(x, ((0, 0), (0, pad)))
    return x.reshape(L, (n + pad) // LANES, LANES)


def mont_mul_pallas(field, a, b, interpret: bool = False):
    """Drop-in Montgomery multiply: (L, *batch) x (L, *batch) -> (L, *batch)."""
    a, b = jnp.broadcast_arrays(a, b)
    L = field.L
    batch = a.shape[1:]
    n = 1
    for d in batch:
        n *= d
    a2 = a.reshape(L, n)
    b2 = b.reshape(L, n)
    if USE_3D:
        a3 = _to3d(a2, L, n)
        b3 = _to3d(b2, L, n)
        out = _mont_mul_call3(
            field, a3.shape[1], interpret, USE_KS, USE_MXU
        )(a3, b3)
        return out.reshape(L, -1)[:, :n].reshape((L,) + batch)
    if n >= MAX_TILE:
        tile = MAX_TILE
    else:
        tile = max(128, -(-n // 128) * 128)
    pad = (-n) % tile
    if pad:
        a2 = jnp.pad(a2, ((0, 0), (0, pad)))
        b2 = jnp.pad(b2, ((0, 0), (0, pad)))
    if USE_MXU:
        out = _mont_mul_call_mxu(field, n + pad, tile, interpret, USE_KS)(a2, b2)
    else:
        out = _mont_mul_call(field, n + pad, tile, interpret, USE_KS)(a2, b2)
    if pad:
        out = out[:, :n]
    return out.reshape((L,) + batch)
