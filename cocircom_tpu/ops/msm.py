"""Pippenger multi-scalar multiplication, TPU-first.

Algorithm (per c-bit signed window):
  1. signed digit recoding (buckets halved: |digit| <= 2^(c-1))
  2. sort point indices by bucket (XLA sort — lane friendly)
  3. conflict-free *wave* accumulation: wave w adds, for every bucket in
     parallel, ranks [w*T, w*T+T) of that bucket's run into a (K+1, T)-wide
     accumulator — a batched complete EC add per wave, NO scatter with EC
     semantics anywhere. Work = sum over waves of K*T adds ~= N adds/window.
     The T-way rank split (default 8) keeps total adds constant while
     cutting the wave count T-fold: each device program is ~T x larger
     (better VPU occupancy for the Pallas mont_mul tiles) and the host
     issues T x fewer dispatches through the tunnel. The T partial
     accumulators fold with log2(T) batched adds before bucket reduction.
  4. bucket reduction sum_j j*B_j via a reversed associative scan (suffix
     sums) + tree sum — log K levels of batched adds.
  5. Horner across windows: c doublings + 1 add per window.

Execution structure (round-2 redesign): the MSM is a HOST-ORCHESTRATED
sequence of four small jitted programs — prepare / wave-step / bucket-reduce
/ Horner — with the wave loop driven from Python. One monolithic program
(round 1) hit multi-minute XLA compiles that crashed the remote TPU worker
at n >= 2^16; small programs compile in seconds, cache well across sizes
(the wave step is shape-stable in n), and dispatch latency hides behind the
TPU's async execution queue.

This mirrors the role of MSMProvider (/root/reference/mpc-core/src/traits.rs:561)
— share-local over public points, so the same kernel serves Plain/REP3/Shamir
(REP3 runs it per additive component, rep3.rs:934-947).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np

from .curve import CurveOps, ProjPoint


def _signed_digits(scalar_limbs, nbits: int, c: int):
    """(Ls, N) 16-bit limbs -> list of nw (N,) int32 signed digits."""
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
    def __init__(self, ops: CurveOps, c: int | None = None, t: int | None = None):
        self.ops = ops
        self.c = c
        # rank-split factor: ranks processed per bucket per wave
        self.T = t or int(os.environ.get("COCIRCOM_MSM_T", "8"))
        self._prepare_jit = jax.jit(self._prepare, static_argnums=(1, 2))
        self._wave_jit = jax.jit(self._wave_step)
        self._wave_chunk_jit = jax.jit(self._wave_chunk, static_argnums=7)
        self._reduce_jit = jax.jit(self._reduce)
        self._horner_jit = jax.jit(self._horner, static_argnums=1)

    # number of waves executed per device dispatch in the phased driver:
    # one dispatch through the axon tunnel costs ~70 ms of latency, so
    # running waves one-per-dispatch dominates the MSM wall time; a
    # fori_loop chunk keeps the program one-wave-sized for the compiler
    # while cutting dispatches WAVE_CHUNK-fold.
    WAVE_CHUNK = 16

    def _window_c(self, n: int) -> int:
        if self.c:
            return self.c
        # balance N adds vs K*logK scan work per window; capped at 8 — the
        # v5e probe (scripts/probe_msm.py) measured c=8 fastest by 4-10x
        # over both smaller and larger windows at 2^15..2^17 (43K/66K
        # points/s): (nw=32, K+1=129) saturates the VPU lanes while larger
        # windows blow past VMEM-friendly wave sizes
        return max(2, min(8, (max(n, 2).bit_length() + 1) // 2 + 2))

    # ------------------------------------------------ phase 1: digit/sort

    def _prepare(self, scalar_limbs, nbits: int, c: int):
        K = 1 << (c - 1)
        digits = jnp.stack(_signed_digits(scalar_limbs, nbits, c))  # (nw, N)
        nw, n = digits.shape
        bucket = jnp.abs(digits)
        order = jnp.argsort(bucket, axis=1, stable=True)
        sortedb = jnp.take_along_axis(bucket, order, axis=1)
        prev = jnp.concatenate(
            [jnp.full((nw, 1), -1, sortedb.dtype), sortedb[:, :-1]], axis=1
        )
        starts = sortedb != prev
        arangeN = jnp.broadcast_to(jnp.arange(n, dtype=jnp.int32), (nw, n))
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
        return digits, order, sortedb, bucket_start, n_waves

    # ------------------------------------------------ phase 2: one wave

    def _wave_step(self, points, digits, order, sortedb, bucket_start, w, acc):
        """Wave w: add ranks [w*T, w*T+T) of every bucket's run into the
        (nw, K+1, T) accumulator."""
        ops = self.ops
        T = self.T
        nw, Kp1 = bucket_start.shape
        n = sortedb.shape[1]
        bidx = jnp.arange(Kp1, dtype=jnp.int32)[None, :, None]  # (1, Kp1, 1)
        ranks = jnp.arange(T, dtype=jnp.int32)[None, None, :]  # (1, 1, T)
        pos = bucket_start[:, :, None] + (w * T + ranks)  # (nw, Kp1, T)
        flat = pos.reshape(nw, Kp1 * T)
        safe = jnp.clip(flat, 0, n - 1)
        sb = jnp.take_along_axis(sortedb, safe, axis=1).reshape(nw, Kp1, T)
        valid = (pos < n) & (sb == bidx) & (bidx > 0)
        src = jnp.take_along_axis(order, safe, axis=1)  # (nw, Kp1*T)

        # ONE gather of the point coordinates; negative digits flip y in
        # registers (half the HBM gather traffic of a points/neg_points
        # double gather, and no negated copy of the array materializes)
        g = jax.tree.map(
            lambda a: jnp.take(a, src.reshape(-1), axis=1).reshape(
                a.shape[:1] + (nw, Kp1, T)
            ),
            points,
        )
        dsel = jnp.take_along_axis(digits, src, axis=1).reshape(nw, Kp1, T) < 0
        ln = ops.lane
        from .curve import FqLane

        if isinstance(ln, FqLane) and ln.f._pallas_ok(acc.x, acc.x):
            # fused kernel: add + y-negation + validity select in one pass
            from .pallas_curve import ec_wave_add_pallas

            return ec_wave_add_pallas(ops, acc, g, dsel, valid)
        ptsel = ProjPoint(g.x, ln.select(dsel, ln.neg(g.y), g.y), g.z)
        added = ops.add(acc, ptsel)
        return ops.select(valid, added, acc)

    def _wave_chunk(self, points, digits, order, sortedb,
                    bucket_start, w0, acc, n_steps: int):
        """Run n_steps consecutive waves on-device (one dispatch)."""

        def body(i, a):
            return self._wave_step(
                points, digits, order, sortedb, bucket_start, w0 + i, a,
            )

        return jax.lax.fori_loop(0, n_steps, body, acc)

    # ------------------------------------------------ phase 3: reduction

    def _reduce(self, acc):
        """(nw, K+1, T) bucket accumulators -> per-window sums sum_j j*B_j."""
        ops = self.ops
        acc = ops.sum(acc, axis=3)  # fold the T rank-split partials
        tail = jax.tree.map(lambda a: a[:, :, 1:], acc)  # (L, nw, K)
        suffix = ops.suffix_sums(tail, axis=2)
        suffix2 = ops.suffix_sums(suffix, axis=2)
        return jax.tree.map(lambda a: jnp.take(a, 0, axis=2), suffix2)  # (L, nw)

    # ------------------------------------------------ phase 4: Horner

    def _horner(self, wsums, c: int):
        ops = self.ops
        xs = jax.tree.map(lambda a: jnp.moveaxis(a, 1, 0)[::-1], wsums)

        def step(result, wt):
            result = jax.lax.fori_loop(0, c, lambda _, r: ops.double(r), result)
            return ops.add(result, wt), None

        result, _ = jax.lax.scan(step, ops.identity(()), xs)
        return result

    # ------------------------------------------------ fused (traceable)

    def _msm_fused(self, points: ProjPoint, scalar_limbs, nbits: int, c: int) -> ProjPoint:
        """Single traced program (wave loop as lax.while_loop) — for use
        INSIDE jit/shard_map (parallel/sharded.py) and for small sizes.
        Large single-chip MSMs go through the phased msm() below instead."""
        K = 1 << (c - 1)
        digits, order, sortedb, bucket_start, n_waves = self._prepare(
            scalar_limbs, nbits, c
        )
        nw = digits.shape[0]
        acc0 = self.ops.identity((nw, K + 1, self.T))
        n_super = -(-n_waves // self.T)

        def body(state):
            w, acc = state
            acc = self._wave_step(
                points, digits, order, sortedb, bucket_start, w, acc
            )
            return w + 1, acc

        _, acc = jax.lax.while_loop(
            lambda st: st[0] < n_super, body, (jnp.int32(0), acc0)
        )
        return self._horner(self._reduce(acc), c)

    # ------------------------------------------------ driver

    # largest single-program point count: programs above this compile
    # multi-hour through the remote-compile tunnel, while MSM additivity
    # makes host-level chunking free (chunk results are single points)
    CHUNK_LOG = 17

    def msm(self, points: ProjPoint, scalar_limbs, nbits: int | None = None) -> ProjPoint:
        """points: batched ProjPoint (coords (L, N)); scalars (Ls, N) 16-bit
        standard-form limbs. Returns a single ProjPoint."""
        n = scalar_limbs.shape[1]
        if n == 0:
            return self.ops.identity(())
        nbits = nbits or 16 * scalar_limbs.shape[0]
        chunk = 1 << self.CHUNK_LOG
        if n > chunk:
            acc = None
            for lo in range(0, n, chunk):
                hi = min(lo + chunk, n)
                part = self.msm(
                    jax.tree.map(lambda c: c[..., lo:hi], points),
                    scalar_limbs[:, lo:hi], nbits)
                acc = part if acc is None else jax.jit(self.ops.add)(acc, part)
            return acc
        c = self._window_c(n)
        K = 1 << (c - 1)
        digits, order, sortedb, bucket_start, n_waves = self._prepare_jit(
            scalar_limbs, nbits, c
        )
        nw = digits.shape[0]
        n_waves = int(jax.device_get(n_waves))
        n_super = -(-n_waves // self.T)
        acc = self.ops.identity((nw, K + 1, self.T))
        # always dispatch full chunks (out-of-range waves are no-ops via the
        # validity mask) so exactly ONE chunk program is ever compiled
        for w in range(0, n_super, self.WAVE_CHUNK):
            acc = self._wave_chunk_jit(
                points, digits, order, sortedb, bucket_start,
                jnp.int32(w), acc, self.WAVE_CHUNK,
            )
        wsums = self._reduce_jit(acc)
        return self._horner_jit(wsums, c)


@functools.lru_cache(maxsize=None)
def msm_engine(ops: CurveOps, c: int | None = None, t: int | None = None) -> MSM:
    return MSM(ops, c, t)
