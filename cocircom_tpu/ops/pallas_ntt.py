"""Pallas TPU kernels: four-step VMEM-resident NTT.

The round-2 NTT ran one fused butterfly kernel per stage but paid XLA
reshape/slice/concat copies of the whole (L, n) array between stages:
22 stages x ~25 ms at 2^22 (docs/TPU_NOTES.md). This module restructures
the transform as a recursive four-step decomposition (Bailey; the same
math as the distributed NTT in parallel/sharded.py, which puts the
transpose on ICI instead of in VMEM):

    NTT_M = reorder . (NTT_V rows) . transpose . twiddle . (NTT_U cols)

with U <= 2^KMAX so an entire U-point transform runs inside ONE Pallas
program: the tile is (L, U, TILE) with the transform on the SUBLANE axis
— every butterfly stage slices contiguous sublanes (no lane shuffles) and
the data makes exactly one HBM round trip per recursion level instead of
one per stage. The four-step twiddle (omega_M^{k1*v}) and, for inverse
transforms, the 1/n scale are folded into the column kernel as one extra
Montgomery multiply.

Root convention and stage structure are IDENTICAL to ops/ntt.py (snarkjs
root tower, radix-2 DIT over bit-reversed input), so results are
bit-exact vs the per-stage engine — asserted in tests/test_pallas_ntt.py
via interpret mode on CPU.

Parity: FFTProvider (/root/reference/mpc-core/src/traits.rs:535-559);
share-local, so Plain/REP3/Shamir all route through the same kernels.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_field import _add_mod, _mont_core, _sub_mod

import os

# largest in-kernel transform: 2^KMAX points on the sublane axis. With the
# constant-geometry stage loop (below) kernel compile time is O(1) in KMAX,
# so KMAX is bounded only by VMEM: the (L, M, TILE) carry + out block +
# twiddle stack peak ~35 MB at KMAX=11 (v5e has 128 MB). KMAX=11 runs 2^22
# as exactly TWO recursion levels (11+11): two HBM round trips total.
KMAX = int(os.environ.get("COCIRCOM_NTT_KMAX", "11"))
TILE = 128  # lanes per grid step


def _tile_of(M: int) -> int:
    """Lanes per grid step: halved for big in-kernel transforms so the
    double-buffered in/out/post windows + ping-pong scratch fit VMEM
    (at logm=11, L=16: TILE=128 needs ~140 MB; TILE=64 ~76 MB)."""
    return TILE if M <= 1024 else TILE // 2


def _bitrev_np(logn: int) -> np.ndarray:
    n = 1 << logn
    idx = np.arange(n, dtype=np.uint32)
    rev = np.zeros(n, dtype=np.uint32)
    for b in range(logn):
        rev |= ((idx >> b) & 1) << (logn - 1 - b)
    return rev.astype(np.int32)


# sublane pairs processed per inner-loop step. Mosaic compile time scales
# with the vreg volume of each MATERIALIZED op (an op on (L, M/2, 128) u32
# is M/2 vregs of IR; the mont core is ~300 ops), so the kernel below keeps
# every materialized op at CHUNK sublanes and loops -- compile time is O(1)
# in logm instead of O(M).
CHUNK = int(os.environ.get("COCIRCOM_NTT_CHUNK", "32"))


def _chunk_of(H: int) -> int:
    return max(1, min(CHUNK, H))


def _make_ntt_kernel(L, p_limbs, np_limbs, logm: int, ks):
    """Constant-geometry (Pease) radix-2 DIF: EVERY stage reads the two
    contiguous halves (j, j+M/2), computes a = e + o, b = (e - o) * w, and
    writes the pair interleaved to (2j, 2j+1) — register interleave on the
    STORE side, which Mosaic lowers ~12x faster than a stride-2 sublane
    extract on the load side (53 vs 658 M mont/s measured on v5e).
    Input is NATURAL order; output is BIT-REVERSED (the caller unpermutes).
    Stage-s twiddle for pair j is omega_M^{(j >> (s-1)) << (s-1)}
    (verified vs the textbook DFT; bit-exactness vs ops/ntt.py's per-stage
    engine is asserted in tests/test_pallas_ntt.py).

    Mosaic compile time scales with materialized IR, so the stage sequence
    runs as a fori_loop over stage PAIRS ping-ponging between the scratch
    ref and the output window (refs can't be picked by a traced parity):
    at most 3 peeled stage bodies + 2 in-loop bodies are materialized,
    O(1) in logm.  The previous fully-unrolled form took 89 s to compile
    at logm=6 and >9 min at logm=11 on v5e; this form ~17 s flat."""
    p_limbs = [int(v) for v in p_limbs]
    np_limbs = [int(v) for v in np_limbs]
    M = 1 << logm
    H = M // 2

    def kernel_small(x_ref, twstk_ref, o_ref, s_ref):
        # Unrolled value path for tiny kernels (M <= 64 = at most 8 vregs
        # per op): IR is small anyway.
        cur = x_ref[:]
        for s in range(logm):
            e = cur[:, :H, :]
            o = cur[:, H:, :]
            d = _sub_mod(e, o, p_limbs, L)
            b = _mont_core(
                d, twstk_ref[s, 0][:, :, None], L, p_limbs, np_limbs, ks)
            a = _add_mod(e, o, p_limbs, L)
            cur = jnp.stack([a, b], axis=2).reshape(L, M, -1)
        o_ref[:] = cur

    CH = _chunk_of(H)
    nch = H // CH

    def _stage(s, src_ref, dst_ref, twstk_ref, T):
        """One constant-geometry stage src->dst, chunked over sublanes.
        Materializes ONE CHUNK-wide body (the chunk loop is scf.For)."""

        def chunk(c, _):
            e = src_ref[:, pl.ds(c * CH, CH), :]
            o = src_ref[:, pl.ds(H + c * CH, CH), :]
            w = twstk_ref[s, c]  # (L, CH); dynamic lane offsets are
            # illegal in Mosaic, so the chunk axis is a leading dim
            d = _sub_mod(e, o, p_limbs, L)
            b = _mont_core(d, w[:, :, None], L, p_limbs, np_limbs, ks)
            a = _add_mod(e, o, p_limbs, L)
            dst_ref[:, pl.ds(c * 2 * CH, 2 * CH), :] = jnp.stack(
                [a, b], axis=2).reshape(L, 2 * CH, T)
            return 0

        jax.lax.fori_loop(0, nch, chunk, 0)

    def kernel(x_ref, twstk_ref, o_ref, s_ref):
        T = x_ref.shape[2]
        # Peel stages so the remaining count is even and data sits in
        # o_ref at loop entry; each loop iteration does o->s then s->o,
        # so the transform finishes in o_ref.
        if logm % 2 == 1:
            _stage(0, x_ref, o_ref, twstk_ref, T)
            done = 1
        else:
            _stage(0, x_ref, s_ref, twstk_ref, T)
            if logm >= 2:
                _stage(1, s_ref, o_ref, twstk_ref, T)
            done = 2

        if logm > done:

            def pair(k, _):
                s = done + 2 * k
                _stage(s, o_ref, s_ref, twstk_ref, T)
                _stage(s + 1, s_ref, o_ref, twstk_ref, T)
                return 0

            jax.lax.fori_loop(0, (logm - done) // 2, pair, 0)

    return kernel_small if M <= 64 else kernel


@functools.lru_cache(maxsize=None)
def _ntt_call(field, logm: int, lanes: int, interpret, ks):
    L = field.L
    M = 1 << logm
    kernel = _make_ntt_kernel(
        L, field.p_limbs, field.nprime_limbs, logm, ks)
    blk = pl.BlockSpec((L, M, TILE), lambda j: (0, 0, j), memory_space=pltpu.VMEM)
    CH = _chunk_of(M // 2)
    tw = pl.BlockSpec(
        (logm, (M // 2) // CH, L, CH),
        lambda j: (0, 0, 0, 0),
        memory_space=pltpu.VMEM,
    )
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((L, M, lanes), jnp.uint32),
        grid=(lanes // TILE,),
        in_specs=[blk, tw],
        out_specs=blk,
        scratch_shapes=[pltpu.VMEM((L, M, TILE), jnp.uint32)],
        interpret=bool(interpret),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            # scratch 16M + double-buffered in/out windows 2x32M = ~80 MB
            # at logm=11, L=16; v5e has 128 MB VMEM -- raise the 16 MB cap
            vmem_limit_bytes=112 * 1024 * 1024,
        )
        if not interpret
        else None,
    )


def _col_ntt(f, x, logm: int, twstk, post, interpret, ks):
    """NTT along axis 1 of (L, M, B) with M = 2^logm <= 2^KMAX; natural
    order in AND out (the kernel emits bit-reversed order; the unpermute
    is one XLA gather out here).  post: optional (L, M, B) Montgomery
    factor applied after the transform (outside the kernel: a third VMEM
    window would overflow v5e VMEM at logm=11, and the mul work is
    identical either way).  twstk: (logm, L, M/2) per-stage
    constant-geometry twiddle stack from build_aux."""
    L, M, B = x.shape
    CH = _chunk_of(M // 2)
    twstk = jnp.transpose(
        twstk.reshape(logm, L, (M // 2) // CH, CH), (0, 2, 1, 3)
    )
    pad = (-B) % TILE
    if pad:
        x = jnp.pad(x, ((0, 0), (0, 0), (0, pad)))
    out = _ntt_call(f, logm, B + pad, interpret, ks)(x, twstk)
    if pad:
        out = out[:, :, :B]
    out = jnp.take(out, jnp.asarray(_bitrev_np(logm)), axis=1)
    if post is not None:
        out = f.mont_mul(
            out.reshape(L, M * B), post.reshape(L, M * B)
        ).reshape(L, M, B)
    return out


def fourstep_ntt(f, x, logm: int, aux: dict, interpret=False, ks=False,
                 top=True, kmax=KMAX):
    """NTT along axis 1 of x (L, M, B), M = 2^logm, natural order in and
    out. aux: device-array pytree from build_aux (twiddle programs +
    four-step tables), passed as jit arguments so nothing bakes into the
    compiled program as a constant."""
    L, M, B = x.shape
    if logm <= kmax:
        post = None
        if top and f"scale_{logm}" in aux:
            post = jnp.broadcast_to(
                aux[f"scale_{logm}"][:, :, None], (L, M, B)
            )
        return _col_ntt(f, x, logm, aux[f"twstk_{logm}"], post, interpret, ks)
    logu = min(kmax, logm - 1)
    logv = logm - logu
    U, V = 1 << logu, 1 << logv
    x4 = x.reshape(L, U, V * B)
    tbl = aux[f"tbl_{logm}"]  # (L, U, V): omega_M^{k1*v} (incl. 1/n at top)
    post = jnp.broadcast_to(tbl[:, :, :, None], (L, U, V, B)).reshape(L, U, V * B)
    y = _col_ntt(f, x4, logu, aux[f"twstk_{logu}"], post, interpret, ks)
    y = y.reshape(L, U, V, B).transpose(0, 2, 1, 3).reshape(L, V, U * B)
    z = fourstep_ntt(f, y, logv, aux, interpret, ks, top=False, kmax=kmax)
    # (L, V, U*B): index along the new axis-1/2 pair is k2*U + k1 = natural
    return z.reshape(L, V * U, B)


def build_aux(f, host, logn: int, inverse: bool, kmax=KMAX) -> dict:
    """Device twiddle material for fourstep_ntt at size 2^logn.

    twstk_m: (m, L, 2^(m-1)) constant-geometry twiddle stack — row s-1
    holds the stage-s twiddles omega_{2^s}^{j >> (m-s)} (each power
    repeated 2^(m-s) times along j); tbl_m: (L, U, V) four-step factors
    for each recursion level; scale_m / folded 1/n for inverse."""
    aux: dict = {}
    p = host.p

    def root(logm: int) -> int:
        w = host.root_of_unity(logm)
        return host.inv(w) if inverse else w

    def twstk(logm: int):
        # DIF constant-geometry schedule: stage s, pair j gets
        # omega_{2^logm}^{(j >> (s-1)) << (s-1)} = root(logm-s+1)^{j >> (s-1)}
        half = 1 << (logm - 1)
        rows = []
        for s in range(1, logm + 1):
            ws = root(logm - s + 1)
            pw, cur = [], 1
            for _ in range(1 << (logm - s)):
                pw.append(cur)
                cur = cur * ws % p
            rep = 1 << (s - 1)
            rows.extend(v for v in pw for _ in range(rep))
        enc = f.encode(rows)  # (L, logm * half)
        return jnp.transpose(enc.reshape(f.L, logm, half), (1, 0, 2))

    levels = []
    lm = logn
    while lm > kmax:
        lu = min(kmax, lm - 1)
        levels.append((lm, lu, lm - lu))
        lm = lm - lu
    kernel_sizes = {lu for _, lu, _ in levels} | {lm}
    for k in kernel_sizes:
        aux[f"twstk_{k}"] = twstk(k)
    if not levels and inverse:
        aux[f"scale_{logn}"] = f.encode([host.inv(1 << logn)])  # (L, 1)
    from .ntt import power_table

    for i, (lmm, lu, lv) in enumerate(levels):
        U, V = 1 << lu, 1 << lv
        # omega_M^{k1*v} from a device-built length-M power table + gather
        pt = power_table(f, root(lmm), 1 << lmm)
        if i == 0 and inverse:
            pt = f.mont_mul(pt, f.encode([host.inv(1 << logn)]))
        k1 = np.arange(U, dtype=np.int64)[:, None]
        v = np.arange(V, dtype=np.int64)[None, :]
        idx = jnp.asarray(((k1 * v) % (1 << lmm)).reshape(-1).astype(np.int32))
        aux[f"tbl_{lmm}"] = jnp.take(pt, idx, axis=1).reshape(f.L, U, V)
    return aux
