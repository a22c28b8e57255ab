"""Common MPC driver interface + the Plain (no-MPC) driver.

The prover/VM layer is written ONCE, generic over a driver — the central
architectural decision preserved from the reference (SURVEY.md section 1,
mpc-core/src/traits.rs). Communication-free methods are local; methods that
need a round take/return via the driver's network.

Share-vector representation per driver:
  Plain : raw (L, N) Montgomery limb arrays
  REP3  : Rep3FieldShare(a=(L,N), b=(L,N))
  Shamir: (L, N) (single component, degree-t polynomial share)

Scalars fed to curve ops are ALWAYS converted out of Montgomery form first
(standard-form limbs are what windowed scalar recoding expects).
"""

from __future__ import annotations

import functools
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from ..fields.params import CurveParams
from ..ops.curve import CurveOps, ProjPoint, g1_ops, g2_ops
from ..ops.field import Field, get_field
from ..ops.msm import msm_engine
from ..ops.ntt import ntt_engine


def segment_sum_mont(f: Field, values, seg_ids, num_segments: int):
    """Segment-sum of Montgomery elements (L, N) by (N,) int ids.

    Plain u32 limb segment-sum (rows bounded < 2^15 terms — checked by
    artifact loaders) followed by one wide Montgomery renormalization."""
    data = jnp.moveaxis(values, 0, -1)  # (N, L)
    sums = jax.ops.segment_sum(data, seg_ids, num_segments=num_segments)
    cols = jnp.moveaxis(sums, -1, 0)  # (L, num_segments), limbs < 2^31
    wide = jnp.concatenate([cols, jnp.zeros_like(cols)], axis=0)
    red = f.mont_reduce_wide(wide)  # = sum * R^{-1}
    return f.mont_mul(red, f._bcast_const(f.r2_np, red.shape[1:]))


class Driver:
    """Base: holds field/curve engines. Subclasses define share semantics.

    With `mesh` (a jax.sharding.Mesh of >1 device) the FFT/MSM engines are
    the SHARDED implementations (parallel/sharded.py): every prover MSM and
    (i)NTT data-partitions across the mesh and reduces over ICI collectives,
    bit-exact vs single-chip. This mirrors the reference where the FFT/MSM
    provider traits are the protocol-level compute interface
    (/root/reference/mpc-core/src/traits.rs:535-584)."""

    protocol = "abstract"

    def __init__(self, curve: CurveParams, mesh=None):
        self.curve = curve
        self.fr = get_field(curve.fr.p, curve.name + ".fr")
        self.fq = get_field(curve.fq.p, curve.name + ".fq")
        self.g1 = g1_ops(curve)
        self.g2 = g2_ops(curve)
        bits = curve.fr.p.bit_length()
        self.mesh = mesh if mesh is not None and mesh.devices.size > 1 else None
        if self.mesh is not None:
            from ..parallel.sharded import ShardedMSMEngine, ShardedNTTEngine

            self.ntt = ShardedNTTEngine(self.fr, curve.fr, self.mesh)
            self.msm_g1_engine = ShardedMSMEngine(
                self.g1, self.mesh, scalar_bits=bits)
            self.msm_g2_engine = ShardedMSMEngine(
                self.g2, self.mesh, scalar_bits=bits)
        else:
            self.ntt = ntt_engine(self.fr, curve.fr)
            self.msm_g1_engine = msm_engine(self.g1, scalar_bits=bits)
            self.msm_g2_engine = msm_engine(self.g2, scalar_bits=bits)

    # ---- helpers shared by drivers ----

    def encode_publics(self, vals) -> jnp.ndarray:
        return self.fr.encode([int(v) % self.fr.p for v in vals])

    def g1_proj(self, arr) -> ProjPoint:
        """io.zkey.G1Array -> ProjPoint with infinity handling ((0,0))."""
        x = jnp.asarray(arr.x)
        y = jnp.asarray(arr.y)
        inf = jnp.logical_and(jnp.all(x == 0, 0), jnp.all(y == 0, 0))
        one = self.fq.one_mont(x.shape[1:])
        z = self.fq.select(inf, self.fq.zeros(x.shape[1:]), one)
        y = self.fq.select(inf, one, y)
        return ProjPoint(x, y, z)

    def g2_proj(self, arr) -> ProjPoint:
        x = (jnp.asarray(arr.x0), jnp.asarray(arr.x1))
        y = (jnp.asarray(arr.y0), jnp.asarray(arr.y1))
        lane = self.g2.lane
        inf = jnp.logical_and(lane.is_zero(x), lane.is_zero(y))
        one = lane.one(arr.x0.shape[1:])
        z = lane.select(inf, lane.zeros(arr.x0.shape[1:]), one)
        y = lane.select(inf, one, y)
        return ProjPoint(x, y, z)

    def host_g1(self, pt) -> ProjPoint:
        """host affine int tuple (or None) -> single ProjPoint."""
        return self.g1.encode_points([pt])

    def host_g2(self, pt) -> ProjPoint:
        return self.g2.encode_points([pt])

    # ---- generic share-tree helpers (shares are pytrees of (L, n) limbs) ----

    def broadcast_share(self, x, n: int):
        """single share (batch () or (1,)) -> batch (n,)."""
        return jax.tree.map(
            lambda c: jnp.broadcast_to(
                c[:, None] if c.ndim == 1 else c[:, :1], (c.shape[0], n)
            ),
            x,
        )

    def sum_vec(self, x):
        """Reduce a share vector along its batch axis (local, linear)."""
        return jax.tree.map(lambda c: self.fr.sum(c), x)

    def index_share(self, x, i: int):
        return jax.tree.map(lambda c: c[:, i], x)

    def stack_shares(self, xs: list):
        return jax.tree.map(lambda *cs: jnp.stack(cs, axis=1), *xs)

    def evaluate_poly_public(self, coeffs_share, xi: int):
        """Evaluate a shared polynomial at a public point (local)."""
        from ..ops.ntt import power_table

        n = jax.tree.leaves(coeffs_share)[0].shape[1]
        pows = power_table(self.fr, xi, n)
        return self.sum_vec(self.mul_public(coeffs_share, pows))

    def prefix_mul(self, x):
        """Inclusive prefix products of a share vector in CONSTANT rounds
        (Ozdemir-Boneh masking; parity: co-plonk round2.rs array_prod_mul):
        blind with r_i, open r_i*x_i*r_{i+1}^-1, local public prefix scan,
        unblind with r_0^-1 * r_{i+1}."""
        n = jax.tree.leaves(x)[0].shape[1]
        r = self.rand((n + 1,))
        r_inv = self.inv_many(r)
        r_inv0 = self.broadcast_share(self.slice_share(r_inv, 0, 1), n)
        unblind = self.mul_vec(r_inv0, self.slice_share(r, 1, n + 1))
        blinded = self.mul_vec(self.slice_share(r, 0, n), x)
        opened = self.mul_open_many(blinded, self.slice_share(r_inv, 1, n + 1))
        cum = self.fr.cumprod(opened)
        return self.mul_public(unblind, cum)

    def slice_share(self, x, lo: int, hi: int):
        return jax.tree.map(lambda c: c[:, lo:hi], x)

    def concat_shares(self, *xs):
        return jax.tree.map(lambda *cs: jnp.concatenate(cs, axis=1), *xs)

    def stack_points(self, pts: list):
        """list of single point-shares -> batched point-share (batch k)."""
        return jax.tree.map(lambda *cs: jnp.stack(cs, axis=-1), *pts)


class PlainDriver(Driver):
    """Single-party ground-truth driver (reference plain.rs:63)."""

    protocol = "plain"

    def __init__(self, curve: CurveParams, seed: int = 0, mesh=None):
        super().__init__(curve, mesh=mesh)
        self._key = jax.random.key(seed ^ 0x9E3779B9)

    # ---- share algebra ----

    def promote_public(self, vals_mont):
        return vals_mont

    def add(self, a, b):
        return self.fr.add(a, b)

    def sub(self, a, b):
        return self.fr.sub(a, b)

    def neg(self, a):
        return self.fr.neg(a)

    def add_public(self, a, p):
        return self.fr.add(a, p)

    def mul_public(self, a, p):
        return self.fr.mont_mul(a, p)

    def mul_vec(self, a, b):
        return self.fr.mont_mul(a, b)

    def mul(self, a, b):
        return self.fr.mont_mul(a, b)

    def mul_open_many(self, a, b):
        return self.fr.mont_mul(a, b)

    def rand(self, shape=()):
        self._key, sub = jax.random.split(self._key)
        return self.fr.rand_mont(sub, shape)

    def open_many(self, a):
        return a

    def open(self, a):
        return a

    def inv_many(self, a):
        return self.fr.batch_inv(a) if a.ndim > 1 and a.shape[1] > 1 else self.fr.inv(a)

    def gather(self, vec, idx):
        return jnp.take(vec, jnp.asarray(idx), axis=1)

    def concat(self, *vecs):
        return jnp.concatenate(vecs, axis=1)

    def slice(self, vec, lo, hi):
        return vec[:, lo:hi]

    def set_slice(self, vec, lo, values):
        return vec.at[:, lo : lo + values.shape[1]].set(values)

    def segment_sum(self, values, seg_ids, num_segments):
        return segment_sum_mont(self.fr, values, seg_ids, num_segments)

    # ---- FFT ----

    def fft(self, a):
        return self.ntt.ntt(a)

    def ifft(self, a):
        return self.ntt.intt(a)

    def coset_shift(self, a, g=None):
        return self.ntt.coset_shift(a, g)

    # ---- EC ----

    def to_scalars(self, share_vec):
        """Montgomery share vec -> standard-form limbs for windowing."""
        return self.fr.from_mont(share_vec)

    def msm_g1(self, points: ProjPoint, share_vec):
        return self.msm_g1_engine.msm(points, self.to_scalars(share_vec))

    def msm_g2(self, points: ProjPoint, share_vec):
        return self.msm_g2_engine.msm(points, self.to_scalars(share_vec))

    def scalar_mul_public_point(self, ops: CurveOps, point: ProjPoint, share):
        s = self.to_scalars(share)
        if s.ndim == 1:
            s = s[:, None]
            point = jax.tree.map(lambda c: c[..., None] if c.ndim == 1 else c, point)
        res = ops.scalar_mul(point, s)
        return jax.tree.map(lambda c: jnp.squeeze(c, -1) if c.ndim > 1 else c, res)

    def scalar_mul(self, ops: CurveOps, point_share, scalar_share):
        return self.scalar_mul_public_point(ops, point_share, scalar_share)

    def point_add(self, ops: CurveOps, a, b):
        return ops.add(a, b)

    def point_add_public(self, ops: CurveOps, a, p):
        return ops.add(a, p)

    def point_sub(self, ops: CurveOps, a, b):
        return ops.add(a, ops.neg(b))

    def open_point(self, ops: CurveOps, a):
        return a

    def open_two_points(self, a, b):
        return a, b


@functools.lru_cache(maxsize=None)
def plain_driver(curve: CurveParams) -> PlainDriver:
    return PlainDriver(curve)
