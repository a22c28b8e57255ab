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

# largest in-kernel transform: 2^KMAX points on the sublane axis. KMAX=8
# cuts 2^22 from 4 recursion levels (7+7+7+1) to 3 (8+7+7): one fewer HBM
# round trip + inter-level transpose + twiddle post-multiply. Kernel VMEM
# doubles (~60 MB peak at logm=8, under the 100 MB cap below).
KMAX = int(os.environ.get("COCIRCOM_NTT_KMAX", "8"))
TILE = 128  # lanes per grid step


def _bitrev_np(logn: int) -> np.ndarray:
    n = 1 << logn
    idx = np.arange(n, dtype=np.uint32)
    rev = np.zeros(n, dtype=np.uint32)
    for b in range(logn):
        rev |= ((idx >> b) & 1) << (logn - 1 - b)
    return rev.astype(np.int32)


def _make_ntt_kernel(L, p_limbs, np_limbs, logm: int, with_post: bool, ks):
    p_limbs = [int(v) for v in p_limbs]
    np_limbs = [int(v) for v in np_limbs]
    M = 1 << logm

    def run(x_ref, twprog_ref, post_ref, o_ref, s_ref):
        """Stage stores go to a ping-pong ref and the Montgomery core runs
        at a CONSTANT flat (L, M/2, T) shape every stage: Mosaic allocates
        kernel temporaries statically per distinct shape, and the naive
        per-stage 4-D mont shapes kept 8 stages' buffers alive at once
        (observed 193 MB scoped vmem at logm=8). Only the cheap even/odd
        extract and interleave touch transient 4-D views."""
        n_writes = logm + (1 if with_post else 0)

        def target(k):  # k-th write (1-based); the LAST lands in o_ref
            return o_ref if (n_writes - k) % 2 == 0 else s_ref

        cur = x_ref
        for s in range(1, logm + 1):
            m = 1 << s
            half = m // 2
            x = cur[:]
            T = x.shape[2]
            v = x.reshape(L, M // m, m, T)
            e = v[:, :, :half, :].reshape(L, M // 2, T)
            o = v[:, :, half:, :].reshape(L, M // 2, T)
            # omega_{2^s}^j tiled over groups: (L, half) -> (L, M/2)
            w = jnp.broadcast_to(
                twprog_ref[:, half:m][:, None, :, None],
                (L, M // m, half, 1),
            ).reshape(L, M // 2, 1)
            t = _mont_core(o, w, L, p_limbs, np_limbs, ks)
            add = _add_mod(e, t, p_limbs, L).reshape(L, M // m, half, T)
            sub = _sub_mod(e, t, p_limbs, L).reshape(L, M // m, half, T)
            dst = target(s)
            dst[:] = jnp.concatenate([add, sub], axis=2).reshape(L, M, T)
            cur = dst
        if with_post:
            o_ref[:] = _mont_core(
                cur[:], post_ref[:], L, p_limbs, np_limbs, ks
            )

    if with_post:

        def kernel(x_ref, twprog_ref, post_ref, o_ref, s_ref):
            run(x_ref, twprog_ref, post_ref, o_ref, s_ref)

    else:

        def kernel(x_ref, twprog_ref, o_ref, s_ref):
            run(x_ref, twprog_ref, None, o_ref, s_ref)

    return kernel


@functools.lru_cache(maxsize=None)
def _ntt_call(field, logm: int, lanes: int, with_post: bool, interpret, ks):
    L = field.L
    M = 1 << logm
    kernel = _make_ntt_kernel(
        L, field.p_limbs, field.nprime_limbs, logm, with_post, ks
    )
    blk = pl.BlockSpec((L, M, TILE), lambda j: (0, 0, j), memory_space=pltpu.VMEM)
    tw = pl.BlockSpec((L, M), lambda j: (0, 0), memory_space=pltpu.VMEM)
    specs = [blk, tw] + ([blk] if with_post else [])
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((L, M, lanes), jnp.uint32),
        grid=(lanes // TILE,),
        in_specs=specs,
        out_specs=blk,
        scratch_shapes=[pltpu.VMEM((L, M, TILE), jnp.uint32)],
        interpret=bool(interpret),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            # the stage pipeline peaks ~30 MB of kernel stack at logm=7;
            # v5e has 128 MB VMEM — raise the default 16 MB scoped cap
            vmem_limit_bytes=100 * 1024 * 1024,
        )
        if not interpret
        else None,
    )


def _col_ntt(f, x, logm: int, twprog, post, interpret, ks):
    """NTT along axis 1 of (L, M, B) with M = 2^logm <= 2^KMAX; input in
    natural order (bit-reversal applied here); post: optional (L, M, B)
    Montgomery factor applied after the transform."""
    L, M, B = x.shape
    x = jnp.take(x, jnp.asarray(_bitrev_np(logm)), axis=1)
    pad = (-B) % TILE
    if pad:
        x = jnp.pad(x, ((0, 0), (0, 0), (0, pad)))
        if post is not None:
            post = jnp.pad(post, ((0, 0), (0, 0), (0, pad)))
    args = (x, twprog) + ((post,) if post is not None else ())
    out = _ntt_call(f, logm, B + pad, post is not None, interpret, ks)(*args)
    if pad:
        out = out[:, :, :B]
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
        return _col_ntt(f, x, logm, aux[f"twprog_{logm}"], post, interpret, ks)
    logu = min(kmax, logm - 1)
    logv = logm - logu
    U, V = 1 << logu, 1 << logv
    x4 = x.reshape(L, U, V * B)
    tbl = aux[f"tbl_{logm}"]  # (L, U, V): omega_M^{k1*v} (incl. 1/n at top)
    post = jnp.broadcast_to(tbl[:, :, :, None], (L, U, V, B)).reshape(L, U, V * B)
    y = _col_ntt(f, x4, logu, aux[f"twprog_{logu}"], post, interpret, ks)
    y = y.reshape(L, U, V, B).transpose(0, 2, 1, 3).reshape(L, V, U * B)
    z = fourstep_ntt(f, y, logv, aux, interpret, ks, top=False, kmax=kmax)
    # (L, V, U*B): index along the new axis-1/2 pair is k2*U + k1 = natural
    return z.reshape(L, V * U, B)


def build_aux(f, host, logn: int, inverse: bool, kmax=KMAX) -> dict:
    """Device twiddle material for fourstep_ntt at size 2^logn.

    twprog_m: (L, 2^m) packed per-stage kernel twiddles (stage s at
    [2^(s-1), 2^s)); tbl_m: (L, U, V) four-step factors for each recursion
    level; scale_m / folded 1/n for inverse transforms."""
    aux: dict = {}
    p = host.p

    def root(logm: int) -> int:
        w = host.root_of_unity(logm)
        return host.inv(w) if inverse else w

    def twprog(logm: int):
        M = 1 << logm
        vals = [1] * M
        for s in range(1, logm + 1):
            half = 1 << (s - 1)
            ws = root(s)
            cur = 1
            for j in range(half):
                vals[half + j] = cur
                cur = cur * ws % p
        return f.encode(vals)

    levels = []
    lm = logn
    while lm > kmax:
        lu = min(kmax, lm - 1)
        levels.append((lm, lu, lm - lu))
        lm = lm - lu
    kernel_sizes = {lu for _, lu, _ in levels} | {lm}
    for k in kernel_sizes:
        aux[f"twprog_{k}"] = twprog(k)
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
