"""Pippenger multi-scalar multiplication, TPU-first.

Algorithm (per c-bit signed window):
  1. signed digit recoding (buckets halved: |digit| <= 2^(c-1))
  2. sort point indices by bucket (XLA sort — lane friendly)
  3. conflict-free *wave* accumulation: wave w adds, for every bucket in
     parallel, the rank-w point of that bucket's run into a (K+1)-wide
     accumulator — a batched complete EC add per wave, NO scatter with EC
     semantics anywhere. Work = sum over waves of K adds ~= N adds/window.
  4. bucket reduction sum_j j*B_j via a reversed associative scan (suffix
     sums) + tree sum — log K levels of batched adds.
  5. Horner across windows: c doublings + 1 add per window.

This mirrors the role of MSMProvider (/root/reference/mpc-core/src/traits.rs:561)
— share-local over public points, so the same kernel serves Plain/REP3/Shamir
(REP3 runs it per additive component, rep3.rs:934-947).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .curve import CurveOps, ProjPoint


def _signed_digits(scalar_limbs, nbits: int, c: int):
    """(Ls, N) 16-bit limbs -> list of nw (N,) int32 signed digits."""
    Ls, = scalar_limbs.shape[:1]
    pad = jnp.concatenate(
        [scalar_limbs, jnp.zeros((1,) + scalar_limbs.shape[1:], scalar_limbs.dtype)], 0
    )
    nw = -(-(nbits + 1) // c)
    digits = []
    carry = jnp.zeros(scalar_limbs.shape[1:], jnp.uint32)
    half = 1 << (c - 1)
    full = 1 << c
    for t in range(nw):
        lo = t * c
        i, s = lo // 16, lo % 16
        raw = pad[i] >> s
        if s + c > 16:
            raw = raw | (pad[i + 1] << (16 - s))
        raw = raw & (full - 1)
        val = raw + carry
        is_neg = val > half
        carry = jnp.where(is_neg | (val == full), jnp.uint32(1), jnp.uint32(0))
        # val == full only when raw == full-1 and carry: digit 0, carry 1
        digit = jnp.where(is_neg, val.astype(jnp.int32) - full, val.astype(jnp.int32))
        digits.append(digit)
    return digits


class MSM:
    def __init__(self, ops: CurveOps, c: int | None = None):
        self.ops = ops
        self.c = c
        self._msm_jit = jax.jit(self._msm, static_argnums=(2, 3))

    def _window_c(self, n: int) -> int:
        if self.c:
            return self.c
        # balance N adds vs K*logK scan work per window
        return max(2, min(16, (max(n, 2).bit_length() + 1) // 2 + 2))

    def _msm(self, points: ProjPoint, scalar_limbs, nbits: int, c: int):
        """ALL windows processed simultaneously: the wave loop batches
        (nw, K+1) bucket accumulators into every curve add — the difference
        between latency-bound 1K-lane adds and full VPU occupancy."""
        ops = self.ops
        K = 1 << (c - 1)
        digits = jnp.stack(_signed_digits(scalar_limbs, nbits, c))  # (nw, N)
        nw, n = digits.shape
        neg_points = ops.neg(points)

        bucket = jnp.abs(digits)  # (nw, N)
        order = jnp.argsort(bucket, axis=1, stable=True)
        sortedb = jnp.take_along_axis(bucket, order, axis=1)
        prev = jnp.concatenate(
            [jnp.full((nw, 1), -1, sortedb.dtype), sortedb[:, :-1]], axis=1
        )
        starts = sortedb != prev
        arangeN = jnp.broadcast_to(jnp.arange(n, dtype=jnp.int32), (nw, n))
        # per-window bucket start positions (dump slot K+1 for non-starts)
        woff = jnp.arange(nw, dtype=jnp.int32)[:, None] * (K + 2)
        flat_idx = (jnp.where(starts, sortedb, K + 1) + woff).reshape(-1)
        bucket_start = jnp.full((nw * (K + 2),), n, jnp.int32)
        bucket_start = bucket_start.at[flat_idx].min(
            jnp.where(starts, arangeN, n).reshape(-1), mode="drop"
        )
        bucket_start = bucket_start.reshape(nw, K + 2)[:, : K + 1]
        # exact wave count: longest run among buckets > 0 across all windows
        run_start = jax.lax.associative_scan(
            jnp.maximum, jnp.where(starts, arangeN, -1), axis=1
        )
        rank = arangeN - run_start
        n_waves = jnp.max(jnp.where(sortedb > 0, rank, -1)) + 1

        acc = ops.identity((nw, K + 1))
        bidx = jnp.broadcast_to(jnp.arange(K + 1, dtype=jnp.int32), (nw, K + 1))

        def gather_pts(pts, src):
            return jax.tree.map(
                lambda a: jnp.take(a, src.reshape(-1), axis=1).reshape(
                    a.shape[:1] + src.shape
                ),
                pts,
            )

        def wave(state):
            w, acc = state
            pos = bucket_start + w  # (nw, K+1)
            safe = jnp.clip(pos, 0, n - 1)
            sb = jnp.take_along_axis(sortedb, safe, axis=1)
            valid = (pos < n) & (sb == bidx) & (bidx > 0)
            src = jnp.take_along_axis(order, safe, axis=1)  # original indices
            dsel = jnp.take_along_axis(digits, src, axis=1) < 0
            pt = gather_pts(points, src)
            ptn = gather_pts(neg_points, src)
            ptsel = ops.select(dsel, ptn, pt)
            added = ops.add(acc, ptsel)
            return w + 1, ops.select(valid, added, acc)

        _, acc = jax.lax.while_loop(
            lambda st: st[0] < n_waves, wave, (jnp.int32(0), acc)
        )

        # bucket reduction, batched over windows: sum_j j*B_j per window
        # = sum_k S_k where S_k = sum_{j>=k} B_j  (two suffix-sum passes)
        tail = jax.tree.map(lambda a: a[:, :, 1:], acc)  # (L, nw, K)
        suffix = ops.suffix_sums(tail, axis=2)
        suffix2 = ops.suffix_sums(suffix, axis=2)
        wsums = jax.tree.map(lambda a: jnp.take(a, 0, axis=2), suffix2)  # (L, nw)

        # Horner across windows (MSB first): result = 2^c * result + W_t
        xs = jax.tree.map(lambda a: jnp.moveaxis(a, 1, 0)[::-1], wsums)

        def step(result, wt):
            result = jax.lax.fori_loop(0, c, lambda _, r: ops.double(r), result)
            return ops.add(result, wt), None

        result, _ = jax.lax.scan(step, ops.identity(()), xs)
        return result

    def msm(self, points: ProjPoint, scalar_limbs, nbits: int | None = None) -> ProjPoint:
        """points: batched ProjPoint (coords (L, N)); scalars (Ls, N) 16-bit
        standard-form limbs. Returns a single ProjPoint."""
        n = scalar_limbs.shape[1]
        if n == 0:
            return self.ops.identity(())
        nbits = nbits or 16 * scalar_limbs.shape[0]
        c = self._window_c(n)
        return self._msm_jit(points, scalar_limbs, nbits, c)


@functools.lru_cache(maxsize=None)
def msm_engine(ops: CurveOps, c: int | None = None) -> MSM:
    return MSM(ops, c)
