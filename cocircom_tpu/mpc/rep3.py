"""REP3: 3-party replicated secret sharing over JAX limb tensors.

Party i holds (a = x_i, b = x_{i-1}) of x = x0 + x1 + x2. Parity with
/root/reference/mpc-core/src/protocols/rep3.rs:
  * PRF setup: each party samples a seed, sends it to the next party
    (rep3.rs:343-382) -> correlated streams (self, prev) that always advance
    in lockstep (rngs.rs Rep3Rand::random_fes semantics).
  * mul = 3-term local cross product + zero-masked reshare (rep3.rs:503-511)
  * open = send b next / recv prev (rep3.rs:614-618)
  * MSM/FFT are share-local per component (rep3.rs:880-947)

All share payloads are Montgomery limb tensors (L, N); shares are pytrees so
every op is jit/vmap-friendly and batches whole vectors into ONE round
(the reference's round-discipline invariant, SURVEY.md section 2.6 #3).
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..fields.params import CurveParams
from ..ops.curve import CurveOps, ProjPoint
from ..ops.field import Field
from ..utils.chacha import ChaChaStream, fresh_seed
from .driver import Driver, segment_sum_mont
from .net import Network


class Rep3FieldShare(NamedTuple):
    a: Any  # (L, *batch)
    b: Any


class Rep3PointShare(NamedTuple):
    a: ProjPoint
    b: ProjPoint


class Rep3Rngs:
    """Correlated ChaCha12 streams keyed with the exchanged 256-bit seeds
    (rngs.rs:25-113 parity; full-entropy replacement for the round-1 32-bit
    jax.random keys).

    Domains (counter-mode nonce word) separate independent sub-streams of
    the same pairwise seed, which replaces the reference's extra bitcomp
    seed derivation with zero additional communication:
      0: main rand (masking / random shares)   — rngs.rs Rep3Rand
      1: bitcomp (b2a correlated field elems)  — rngs.rs Rep3RandBitComp
      2: binary masks (XOR zero-sharings)
    """

    def __init__(self, seed_self: bytes | int, seed_prev: bytes | int):
        self.rng1 = ChaChaStream(seed_self, domain=0)
        self.rng2 = ChaChaStream(seed_prev, domain=0)
        self.bit1 = ChaChaStream(seed_self, domain=1)
        self.bit2 = ChaChaStream(seed_prev, domain=1)
        self.bin1 = ChaChaStream(seed_self, domain=2)
        self.bin2 = ChaChaStream(seed_prev, domain=2)

    def random_fes(self, f: Field, shape=()):
        """(r_self, r_prev) — a valid random share pair."""
        return self.rng1.rand_mont(f, shape), self.rng2.rand_mont(f, shape)

    def masking_field(self, f: Field, shape=()):
        """r_self - r_prev: sums to zero over the 3 parties."""
        a, b = self.random_fes(f, shape)
        return f.sub(a, b)

    def binary_mask(self, f: Field, nbits: int, shape=()):
        """r_self ^ r_prev over nbits: XORs to zero over the 3 parties."""
        return self.binary_masks(f, nbits, shape, 1)[0]

    def binary_masks(self, f: Field, nbits: int, shape=(), n: int = 1):
        """n zero-XOR masks from ONE fused program (the eager per-draw
        pipeline was ~30 ms/mask on CPU — the whole cost of an AND round;
        a single jitted program per (shape, n) is ~1 ms)."""
        L = f.L
        top_bits = nbits - 16 * (L - 1)
        top = (1 << top_bits) - 1 if top_bits > 0 else 0
        call, nblk = _binary_masks_call(L, top, tuple(shape), n)
        out = call(
            self.bin1.key, jnp.uint32(self.bin1.ctr), self.bin1.domain,
            self.bin2.key, jnp.uint32(self.bin2.ctr), self.bin2.domain,
        )
        self.bin1.ctr += nblk
        self.bin2.ctr += nblk
        return [out[i] for i in range(n)]


import functools


@functools.lru_cache(maxsize=None)
def _binary_masks_call(L: int, top: int, shape: tuple, n: int):
    """One jitted program producing n zero-XOR masks of (L, *shape) from
    the two correlated streams. Returns (call, blocks_consumed_per_stream).

    Stream discipline: consumes exactly n sequential limbs16 draws' worth
    of blocks from each stream, in draw-major order — both ends of each
    correlated stream MUST make identical request sequences (rngs.rs
    Rep3Rand lockstep), which holds because every party runs this same
    code path."""
    from ..utils.chacha import chacha_blocks

    half = -(-L // 2)
    total = 1
    for s in shape:
        total *= s
    per = max(1, -(-(half * total) // 16))
    nblk = per * n

    def draw(key, ctr, domain):
        w = chacha_blocks(key, ctr, domain, nblk)  # (16, nblk)
        flat = w.T.reshape(n, per * 16)[:, : half * total]
        flat = flat.reshape((n, half) + shape)
        lo = flat & jnp.uint32(0xFFFF)
        hi = flat >> 16
        both = jnp.concatenate(
            [lo[:, :, None], hi[:, :, None]], axis=2
        ).reshape((n, 2 * half) + shape)[:, :L]
        return both.at[:, L - 1].set(both[:, L - 1] & jnp.uint32(top))

    @jax.jit
    def go(k1, c1, d1, k2, c2, d2):
        return draw(k1, c1, d1) ^ draw(k2, c2, d2)

    return go, nblk


def share_field_vec(f: Field, vec_mont, seed: bytes | int | None = None):
    """Dealer-side: split (L, N) Montgomery values into 3 REP3 shares.

    Mask entropy is a 256-bit ChaCha key (fresh OS entropy unless a test
    passes an explicit seed, which is SHA-256-expanded)."""
    stream = ChaChaStream(fresh_seed() if seed is None else seed, domain=0)
    batch = vec_mont.shape[1:]
    x0 = stream.rand_mont(f, batch)
    x1 = stream.rand_mont(f, batch)
    x2 = f.sub(f.sub(vec_mont, x0), x1)
    return [
        Rep3FieldShare(x0, x2),
        Rep3FieldShare(x1, x0),
        Rep3FieldShare(x2, x1),
    ]


def combine_field_shares(f: Field, shares: list[Rep3FieldShare]):
    return f.add(f.add(shares[0].a, shares[1].a), shares[2].a)


class Rep3Driver(Driver):
    protocol = "rep3"

    def __init__(self, curve: CurveParams, net: Network, mesh=None):
        super().__init__(curve, mesh=mesh)
        self.net = net
        self.id = net.id
        # PRF setup: exchange 256-bit seeds with the next party
        # (rep3.rs:343-351, SEED_SIZE = 32 bytes)
        seed_self = fresh_seed()
        net.send_next(seed_self)
        seed_prev = bytes(net.recv_prev())
        if len(seed_prev) != 32:
            raise ValueError("PRF setup: peer seed must be 32 bytes")
        self.rngs = Rep3Rngs(seed_self, seed_prev)

    @property
    def binary(self):
        """Binary-domain ops (a2b, comparisons, bit circuits)."""
        if not hasattr(self, "_binary"):
            from .rep3_binary import Rep3Binary

            self._binary = Rep3Binary(self)
        return self._binary

    # ------------------------------------------------------- share algebra

    def promote_public(self, vals_mont):
        z = jnp.zeros_like(vals_mont)
        if self.id == 0:
            return Rep3FieldShare(vals_mont, z)
        if self.id == 1:
            return Rep3FieldShare(z, vals_mont)
        return Rep3FieldShare(z, z)

    def add(self, x: Rep3FieldShare, y: Rep3FieldShare):
        return Rep3FieldShare(self.fr.add(x.a, y.a), self.fr.add(x.b, y.b))

    def sub(self, x, y):
        return Rep3FieldShare(self.fr.sub(x.a, y.a), self.fr.sub(x.b, y.b))

    def neg(self, x):
        return Rep3FieldShare(self.fr.neg(x.a), self.fr.neg(x.b))

    def add_public(self, x: Rep3FieldShare, p):
        if self.id == 0:
            return Rep3FieldShare(self.fr.add(x.a, p), x.b)
        if self.id == 1:
            return Rep3FieldShare(x.a, self.fr.add(x.b, p))
        return x

    def mul_public(self, x, p):
        return Rep3FieldShare(self.fr.mont_mul(x.a, p), self.fr.mont_mul(x.b, p))

    def mul_vec(self, x: Rep3FieldShare, y: Rep3FieldShare):
        """ONE communication round for the whole vector (rep3.rs:650)."""
        f = self.fr
        batch = jnp.broadcast_shapes(x.a.shape[1:], y.a.shape[1:])
        local = f.add(
            f.add(f.mont_mul(x.a, y.a), f.mont_mul(x.a, y.b)),
            f.mont_mul(x.b, y.a),
        )
        local = f.add(local, self.rngs.masking_field(f, batch))
        self.net.send_next(local)
        prev = jnp.asarray(self.net.recv_prev())
        return Rep3FieldShare(local, prev)

    mul = mul_vec

    def rand(self, shape=()):
        a, b = self.rngs.random_fes(self.fr, shape)
        return Rep3FieldShare(a, b)

    def open_many(self, x: Rep3FieldShare):
        self.net.send_next(x.b)
        c = jnp.asarray(self.net.recv_prev())
        return self.fr.add(self.fr.add(x.a, x.b), c)

    open = open_many

    def mul_open_many(self, x, y):
        """x*y opened to all parties: ONE round (rep3.rs:727)."""
        f = self.fr
        batch = jnp.broadcast_shapes(x.a.shape[1:], y.a.shape[1:])
        local = f.add(
            f.add(f.mont_mul(x.a, y.a), f.mont_mul(x.a, y.b)),
            f.mont_mul(x.b, y.a),
        )
        local = f.add(local, self.rngs.masking_field(f, batch))
        self.net.send_next(local)
        self.net.send_prev(local)
        t_prev = jnp.asarray(self.net.recv_prev())
        t_next = jnp.asarray(self.net.recv_next())
        return f.add(f.add(local, t_prev), t_next)

    def sqrt_many(self, x: Rep3FieldShare):
        """Masked-open square root (rep3.rs:400-447): open r^2*x and
        r_squ*r_inv in ONE round, take the public sqrt, unmask with
        r_inv * (r_squ*r_inv)^-1. Returns SOME root; sign correction is the
        caller's job (the opened values leak nothing: r^2*x is uniform over
        squares)."""
        from ..vm.mpc_vm import tonelli_shanks

        f = self.fr
        n = x.a.shape[1]
        r_squ = self.rand((n,))
        r_inv = self.rand((n,))
        rr = self.mul_vec(r_squ, r_squ)
        lhs = self.concat(rr, r_squ)
        rhs = self.concat(x, r_inv)
        opened = self.mul_open_many(lhs, rhs)
        y_sq_pub = f.from_limbs(f.from_mont(opened[:, :n]))
        roots = []
        for v in y_sq_pub:
            r = tonelli_shanks(int(v), f.p)
            if r is None:
                raise ValueError("MPC sqrt: value is a non-residue")
            roots.append(r)
        y_sq = f.encode(roots)
        y_inv = f.batch_inv(opened[:, n:])
        r_squ_inv = self.mul_public(r_inv, y_inv)
        return self.mul_public(r_squ_inv, y_sq)

    def inv_many(self, x: Rep3FieldShare):
        """Masked-open inversion (rep3.rs:530-542): 2 rounds.

        NOTE the inherent leak of this construction (shared by the
        reference): the opened r*x is 0 iff x is 0, so all parties learn
        whether the secret was zero. The reference ABORTS on a zero
        denominator (rep3.rs:536 inverse() error) — we match that instead
        of silently mapping 0 -> 0."""
        r = self.rand(x.a.shape[1:])
        ry = self.mul_open_many(r, x)
        if not bool(jnp.all(jnp.any(ry != 0, axis=0))):
            raise ZeroDivisionError(
                "MPC inversion of a zero share (leaks zero-ness by "
                "construction; reference rep3.rs:530-542 errors too)")
        ry_inv = self.fr.batch_inv(ry) if ry.ndim > 1 and ry.shape[1] > 1 else self.fr.inv(ry)
        return self.mul_public(r, ry_inv)

    def inv_many_guarded(self, x: Rep3FieldShare):
        """Like inv_many but maps 0 -> 0 instead of aborting — the VM's
        guarded-division semantics (x/0 -> 0 on lanes whose secret branch
        is untaken; circom-mpc-vm mpc_vm.rs:523-531 guards divisors the
        same way). Zero-ness of individual lanes is still revealed, which
        is inherent to the masked-open construction."""
        r = self.rand(x.a.shape[1:])
        ry = self.mul_open_many(r, x)
        ry_inv = self.fr.batch_inv(ry) if ry.ndim > 1 and ry.shape[1] > 1 else self.fr.inv(ry)
        return self.mul_public(r, ry_inv)

    def gather(self, x: Rep3FieldShare, idx):
        idx = jnp.asarray(idx)
        return Rep3FieldShare(
            jnp.take(x.a, idx, axis=1), jnp.take(x.b, idx, axis=1)
        )

    def concat(self, *vecs):
        return Rep3FieldShare(
            jnp.concatenate([v.a for v in vecs], axis=1),
            jnp.concatenate([v.b for v in vecs], axis=1),
        )

    def slice(self, x, lo, hi):
        return Rep3FieldShare(x.a[:, lo:hi], x.b[:, lo:hi])

    def set_slice(self, x, lo, values: Rep3FieldShare):
        n = values.a.shape[1]
        return Rep3FieldShare(
            x.a.at[:, lo : lo + n].set(values.a), x.b.at[:, lo : lo + n].set(values.b)
        )

    def segment_sum(self, values: Rep3FieldShare, seg_ids, num_segments):
        return Rep3FieldShare(
            segment_sum_mont(self.fr, values.a, seg_ids, num_segments),
            segment_sum_mont(self.fr, values.b, seg_ids, num_segments),
        )

    # ------------------------------------------------------------- FFT

    def fft(self, x: Rep3FieldShare):
        return Rep3FieldShare(self.ntt.ntt(x.a), self.ntt.ntt(x.b))

    def ifft(self, x):
        return Rep3FieldShare(self.ntt.intt(x.a), self.ntt.intt(x.b))

    def coset_shift(self, x, g=None):
        return Rep3FieldShare(
            self.ntt.coset_shift(x.a, g), self.ntt.coset_shift(x.b, g)
        )

    # ------------------------------------------------------------- EC

    def to_scalars(self, x: Rep3FieldShare):
        return Rep3FieldShare(self.fr.from_mont(x.a), self.fr.from_mont(x.b))

    def msm_g1(self, points: ProjPoint, share_vec: Rep3FieldShare):
        s = self.to_scalars(share_vec)
        return Rep3PointShare(
            self.msm_g1_engine.msm(points, s.a), self.msm_g1_engine.msm(points, s.b)
        )

    def msm_g2(self, points, share_vec):
        s = self.to_scalars(share_vec)
        return Rep3PointShare(
            self.msm_g2_engine.msm(points, s.a), self.msm_g2_engine.msm(points, s.b)
        )

    def _single_scalar_mul(self, ops: CurveOps, point: ProjPoint, limbs):
        if limbs.ndim == 1:
            limbs = limbs[:, None]
            point = jax.tree.map(lambda c: c[..., None] if c.ndim == 1 else c, point)
            res = ops.scalar_mul(point, limbs)
            return jax.tree.map(lambda c: jnp.squeeze(c, -1), res)
        return ops.scalar_mul(point, limbs)

    def scalar_mul_public_point(self, ops: CurveOps, point: ProjPoint, share):
        sa = self.fr.from_mont(share.a)
        sb = self.fr.from_mont(share.b)
        return Rep3PointShare(
            self._single_scalar_mul(ops, point, sa),
            self._single_scalar_mul(ops, point, sb),
        )

    def _masking_point(self, ops: CurveOps, batch=()):
        m = self.rngs.masking_field(self.fr, batch)
        gen = ops.encode_points(
            [self.curve.g1_gen if ops is self.g1 else self.curve.g2_gen]
        )
        # single generator point: drop the length-1 batch dim
        gen = jax.tree.map(lambda c: c[..., 0] if c.ndim > 1 else c, gen)
        return self._single_scalar_mul(ops, gen, self.fr.from_mont(m))

    def scalar_mul(self, ops: CurveOps, pt: Rep3PointShare, s: Rep3FieldShare):
        """Shared point x shared scalar: 1 round (rep3.rs:835-847)."""
        t1 = self._single_scalar_mul(ops, pt.a, self.fr.from_mont(s.a))
        t2 = self._single_scalar_mul(ops, pt.b, self.fr.from_mont(s.a))
        t3 = self._single_scalar_mul(ops, pt.a, self.fr.from_mont(s.b))
        local = ops.add(ops.add(t1, t2), ops.add(t3, self._masking_point(ops)))
        self.net.send_next(local)
        prev = jax.tree.map(jnp.asarray, self.net.recv_prev())
        return Rep3PointShare(local, ProjPoint(*prev))

    def point_add(self, ops: CurveOps, x: Rep3PointShare, y: Rep3PointShare):
        return Rep3PointShare(ops.add(x.a, y.a), ops.add(x.b, y.b))

    def point_sub(self, ops, x, y):
        return Rep3PointShare(
            ops.add(x.a, ops.neg(y.a)), ops.add(x.b, ops.neg(y.b))
        )

    def point_add_public(self, ops: CurveOps, x: Rep3PointShare, p: ProjPoint):
        if self.id == 0:
            return Rep3PointShare(ops.add(x.a, p), x.b)
        if self.id == 1:
            return Rep3PointShare(x.a, ops.add(x.b, p))
        return x

    def open_point(self, ops: CurveOps, x: Rep3PointShare):
        self.net.send_next(x.b)
        c = jax.tree.map(jnp.asarray, self.net.recv_prev())
        return ops.add(ops.add(x.a, x.b), ProjPoint(*c))

    def open_two_points(self, x: Rep3PointShare, y: Rep3PointShare):
        self.net.send_next((x.b, y.b))
        cx, cy = self.net.recv_prev()
        cx = ProjPoint(*jax.tree.map(jnp.asarray, cx))
        cy = ProjPoint(*jax.tree.map(jnp.asarray, cy))
        g1 = self.g1.add(self.g1.add(x.a, x.b), cx)
        g2 = self.g2.add(self.g2.add(y.a, y.b), cy)
        return g1, g2
