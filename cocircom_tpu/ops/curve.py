"""TPU-native elliptic-curve ops: branchless complete projective formulas.

Points are pytrees ``ProjPoint(x, y, z)`` whose coordinates are Montgomery
limb arrays ``(L, *batch)`` (G1) or pairs of them (G2 over Fq2). Addition
uses the *complete* a=0 formulas (Renes–Costello–Batina 2016, Alg. 7):
one straight-line sequence of 12 field muls valid for ALL inputs (identity,
doubling, inverses) — no data-dependent branching, exactly what the TPU VPU
and XLA want. Identity is (0 : 1 : 0).

Reference parity: arkworks CurveGroup usage + MSM/ECC traits
(/root/reference/mpc-core/src/traits.rs:472-533, SURVEY.md L0).
"""

from __future__ import annotations

import functools
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..fields.params import CurveParams
from .field import Field, get_field


class ProjPoint(NamedTuple):
    x: Any
    y: Any
    z: Any


class FqLane:
    """Generic field-lane adapter over a base prime field (elements = arrays)."""

    def __init__(self, f: Field):
        self.f = f

    def add(self, a, b):
        return self.f.add(a, b)

    def sub(self, a, b):
        return self.f.sub(a, b)

    def mul(self, a, b):
        return self.f.mont_mul(a, b)

    def sqr(self, a):
        return self.f.mont_mul(a, a)

    def neg(self, a):
        return self.f.neg(a)

    def select(self, mask, a, b):
        return self.f.select(mask, a, b)

    def is_zero(self, a):
        return self.f.is_zero(a)

    def eq(self, a, b):
        return self.f.eq(a, b)

    def inv(self, a):
        return self.f.inv(a)

    def batch_inv(self, a, axis=1):
        return self.f.batch_inv(a, axis)

    def zeros(self, batch=()):
        return self.f.zeros(batch)

    def one(self, batch=()):
        return self.f.one_mont(batch)

    def const(self, v: int, batch=()):
        """host int -> broadcastable Montgomery constant."""
        enc = self.f._int_to_limbs_np((v * self.f.R) % self.f.p)
        return self.f._bcast_const(enc, batch)

    def encode(self, vals):
        return self.f.encode(vals)

    def decode(self, a):
        return self.f.decode(a)

    def broadcast_to(self, a, batch):
        return jnp.broadcast_to(a, (self.f.L,) + tuple(batch))

    def batch_shape(self, a):
        return a.shape[1:]

    def stack(self, elems, axis=1):
        return jnp.stack(elems, axis=axis)

    def index(self, a, idx, axis=1):
        return jnp.take(a, idx, axis=axis)


class Fq2Lane:
    """Quadratic extension lane: elements are (c0, c1) with u^2 = -1."""

    def __init__(self, f: Field):
        self.f = f

    def add(self, a, b):
        return (self.f.add(a[0], b[0]), self.f.add(a[1], b[1]))

    def sub(self, a, b):
        return (self.f.sub(a[0], b[0]), self.f.sub(a[1], b[1]))

    def mul(self, a, b):
        # Karatsuba with the 3 independent base products STACKED into one
        # mont_mul call (compile-size + lane-utilization win)
        f = self.f
        batch = jnp.broadcast_shapes(a[0].shape[1:], b[0].shape[1:])
        a = tuple(jnp.broadcast_to(c, (f.L,) + batch) for c in a)
        b = tuple(jnp.broadcast_to(c, (f.L,) + batch) for c in b)
        lhs = jnp.stack([a[0], a[1], f.add(a[0], a[1])], axis=1)
        rhs = jnp.stack([b[0], b[1], f.add(b[0], b[1])], axis=1)
        prod = f.mont_mul(lhs, rhs)
        v0, v1, t = prod[:, 0], prod[:, 1], prod[:, 2]
        return (f.sub(v0, v1), f.sub(f.sub(t, v0), v1))

    def sqr(self, a):
        return self.mul(a, a)

    def neg(self, a):
        return (self.f.neg(a[0]), self.f.neg(a[1]))

    def select(self, mask, a, b):
        return (self.f.select(mask, a[0], b[0]), self.f.select(mask, a[1], b[1]))

    def is_zero(self, a):
        return jnp.logical_and(self.f.is_zero(a[0]), self.f.is_zero(a[1]))

    def eq(self, a, b):
        return jnp.logical_and(self.f.eq(a[0], b[0]), self.f.eq(a[1], b[1]))

    def inv(self, a):
        norm = self.f.add(self.f.mont_mul(a[0], a[0]), self.f.mont_mul(a[1], a[1]))
        ninv = self.f.inv(norm)
        return (self.f.mont_mul(a[0], ninv), self.f.neg(self.f.mont_mul(a[1], ninv)))

    def batch_inv(self, a, axis=1):
        norm = self.f.add(self.f.mont_mul(a[0], a[0]), self.f.mont_mul(a[1], a[1]))
        ninv = self.f.batch_inv(norm, axis)
        return (self.f.mont_mul(a[0], ninv), self.f.neg(self.f.mont_mul(a[1], ninv)))

    def zeros(self, batch=()):
        return (self.f.zeros(batch), self.f.zeros(batch))

    def one(self, batch=()):
        return (self.f.one_mont(batch), self.f.zeros(batch))

    def const(self, v, batch=()):
        v0, v1 = v
        e0 = self.f._int_to_limbs_np((v0 * self.f.R) % self.f.p)
        e1 = self.f._int_to_limbs_np((v1 * self.f.R) % self.f.p)
        return (self.f._bcast_const(e0, batch), self.f._bcast_const(e1, batch))

    def encode(self, vals):
        """vals: sequence of (c0, c1) int pairs."""
        c0 = [v[0] for v in vals]
        c1 = [v[1] for v in vals]
        return (self.f.encode(c0), self.f.encode(c1))

    def decode(self, a):
        return (self.f.decode(a[0]), self.f.decode(a[1]))

    def broadcast_to(self, a, batch):
        shp = (self.f.L,) + tuple(batch)
        return (jnp.broadcast_to(a[0], shp), jnp.broadcast_to(a[1], shp))

    def batch_shape(self, a):
        return a[0].shape[1:]

    def stack(self, elems, axis=1):
        return (
            jnp.stack([e[0] for e in elems], axis=axis),
            jnp.stack([e[1] for e in elems], axis=axis),
        )

    def index(self, a, idx, axis=1):
        return (jnp.take(a[0], idx, axis=axis), jnp.take(a[1], idx, axis=axis))


class CurveOps:
    """Complete-formula point arithmetic over a field lane."""

    def __init__(self, lane, b_host, name: str = "G", gen_host=None):
        self.lane = lane
        self.name = name
        self.b_host = b_host
        self.gen_host = gen_host  # host affine generator (bucket-init base)
        if isinstance(b_host, tuple):
            self.b3_host = tuple((3 * c) % lane.f.p for c in b_host)
        else:
            self.b3_host = (3 * b_host) % lane.f.p
        # jit-cache hot entry points (instances cached via g1_ops/g2_ops)
        self.add = jax.jit(self.add)
        self.scalar_mul = jax.jit(self.scalar_mul, static_argnums=2)
        self.sum = jax.jit(self.sum, static_argnums=1)

    def b3(self, batch=()):
        return self.lane.const(self.b3_host, batch)

    def identity(self, batch=()) -> ProjPoint:
        ln = self.lane
        return ProjPoint(ln.zeros(batch), ln.one(batch), ln.zeros(batch))

    def is_identity(self, p: ProjPoint):
        return self.lane.is_zero(p.z)

    def neg(self, p: ProjPoint) -> ProjPoint:
        return ProjPoint(p.x, self.lane.neg(p.y), p.z)

    def select(self, mask, p: ProjPoint, q: ProjPoint) -> ProjPoint:
        ln = self.lane
        return ProjPoint(
            ln.select(mask, p.x, q.x), ln.select(mask, p.y, q.y), ln.select(mask, p.z, q.z)
        )

    def add(self, p: ProjPoint, q: ProjPoint) -> ProjPoint:
        """Renes–Costello–Batina 2016 Algorithm 7 (a=0), complete.

        The 12 field muls are regrouped into 3 *stacked* multiply waves
        (independent products batched along one axis into a single mont_mul)
        — minimal XLA graph, maximal lane occupancy. On the TPU backend the
        whole formula runs as ONE fused Pallas kernel instead
        (ops/pallas_curve.py): ~9 coord-sized HBM tensors per add vs ~85."""
        ln = self.lane
        if isinstance(ln, FqLane) and ln.f._pallas_ok(p.x, q.x):
            from .pallas_curve import ec_add_pallas

            return ec_add_pallas(self, p, q)
        batch = jnp.broadcast_shapes(ln.batch_shape(p.x), ln.batch_shape(q.x))
        X1, Y1, Z1 = (ln.broadcast_to(c, batch) for c in p)
        X2, Y2, Z2 = (ln.broadcast_to(c, batch) for c in q)
        # wave 1: all pairwise products of the input coordinates
        l1 = ln.stack([X1, Y1, Z1, ln.add(X1, Y1), ln.add(Y1, Z1), ln.add(X1, Z1)])
        r1 = ln.stack([X2, Y2, Z2, ln.add(X2, Y2), ln.add(Y2, Z2), ln.add(X2, Z2)])
        w1 = ln.mul(l1, r1)
        m0, m1, m2, m3, m4, m5 = (ln.index(w1, i) for i in range(6))
        t3 = ln.sub(ln.sub(m3, m0), m1)  # X1Y2 + X2Y1
        t4 = ln.sub(ln.sub(m4, m1), m2)  # Y1Z2 + Y2Z1
        y3p = ln.sub(ln.sub(m5, m0), m2)  # X1Z2 + X2Z1
        t0 = ln.add(ln.add(m0, m0), m0)  # 3 X1X2
        # wave 2: the two b3 scalings
        b3 = self.b3(ln.batch_shape(m2))
        w2 = ln.mul(ln.stack([m2, y3p]), ln.stack([b3, b3]))
        t2 = ln.index(w2, 0)  # b3 Z1Z2
        y3 = ln.index(w2, 1)  # b3 (X1Z2+X2Z1)
        z3p = ln.add(m1, t2)
        t1 = ln.sub(m1, t2)
        # wave 3: the six output products
        l3 = ln.stack([t4, t3, y3, t1, t0, z3p])
        r3 = ln.stack([y3, t1, t0, z3p, t3, t4])
        w3 = ln.mul(l3, r3)
        X3 = ln.sub(ln.index(w3, 1), ln.index(w3, 0))
        Y3 = ln.add(ln.index(w3, 3), ln.index(w3, 2))
        Z3 = ln.add(ln.index(w3, 5), ln.index(w3, 4))
        return ProjPoint(X3, Y3, Z3)

    def double(self, p: ProjPoint) -> ProjPoint:
        return self.add(p, p)

    def scalar_mul(self, p: ProjPoint, scalar_limbs, nbits: int | None = None) -> ProjPoint:
        """p * s with s given as (Ls, *batch) 16-bit standard-form limbs."""
        Ls = scalar_limbs.shape[0]
        nbits = nbits or 16 * Ls

        def body(i, acc):
            j = nbits - 1 - i
            limb = jnp.take(scalar_limbs, j >> 4, axis=0)
            bit = ((limb >> (j & 15)) & 1).astype(bool)
            acc = self.double(acc)
            return self.select(bit, self.add(acc, p), acc)

        batch = self.lane.batch_shape(p.x)
        sb = scalar_limbs.shape[1:]
        if len(sb) > len(batch):
            batch = sb
            p = ProjPoint(
                self.lane.broadcast_to(p.x, batch),
                self.lane.broadcast_to(p.y, batch),
                self.lane.broadcast_to(p.z, batch),
            )
        acc0 = self.identity(batch)
        return jax.lax.fori_loop(0, nbits, body, acc0)

    def suffix_sums(self, p: ProjPoint, axis: int = 1) -> ProjPoint:
        """out[i] = p[i] + p[i+1] + ... along one batch axis.

        Masked Hillis–Steele with a fori_loop: ONE curve add in the loop body
        regardless of length (compile-friendly), log2(n) iterations."""
        ln = self.lane
        batch = ln.batch_shape(p.x)
        n = batch[axis - 1]
        if n <= 1:
            return p
        steps = (n - 1).bit_length()
        pos_shape = tuple(d if i == axis - 1 else 1 for i, d in enumerate(batch))
        pos = jnp.arange(n, dtype=jnp.int32).reshape(pos_shape)
        pos = jnp.broadcast_to(pos, batch)

        def body(s, x):
            shift = jnp.left_shift(jnp.int32(1), s)
            rolled = jax.tree.map(lambda c: jnp.roll(c, -shift, axis=axis), x)
            valid = (pos + shift) < n
            added = self.add(x, rolled)
            return self.select(valid, added, x)

        return jax.lax.fori_loop(0, steps, body, p)

    def sum(self, p: ProjPoint, axis: int = 1) -> ProjPoint:
        """Reduce points along a batch axis (log2 adds via suffix_sums)."""
        s = self.suffix_sums(p, axis)
        return jax.tree.map(lambda a: jnp.take(a, 0, axis=axis), s)

    def msm_naive(self, points: ProjPoint, scalar_limbs) -> ProjPoint:
        """Reference MSM: per-point scalar_mul then tree sum (test-sized N)."""
        prods = self.scalar_mul(points, scalar_limbs)
        return self.sum(prods, axis=1)

    # ---------------- host conversions ----------------

    def encode_points(self, affine_list) -> ProjPoint:
        """list of host affine points (None = infinity) -> batched ProjPoint."""
        ln = self.lane
        xs, ys, zs = [], [], []
        if isinstance(self.b_host, tuple):
            zero_c, one_c = (0, 0), (1, 0)
        else:
            zero_c, one_c = 0, 1
        for pt in affine_list:
            if pt is None:
                xs.append(zero_c)
                ys.append(one_c)
                zs.append(zero_c)
            else:
                xs.append(pt[0])
                ys.append(pt[1])
                zs.append(one_c)
        if isinstance(self.b_host, tuple):
            enc = lambda vs: (  # noqa: E731
                ln.f.encode([v[0] for v in vs]),
                ln.f.encode([v[1] for v in vs]),
            )
        else:
            enc = ln.f.encode
        return ProjPoint(enc(xs), enc(ys), enc(zs))

    def decode_points(self, p: ProjPoint):
        """batched ProjPoint -> list of host affine points (None = infinity)."""
        ln = self.lane
        zinv = ln.batch_inv(p.z, axis=1)
        ax = ln.decode(ln.mul(p.x, zinv))
        ay = ln.decode(ln.mul(p.y, zinv))
        inf = np.asarray(jax.device_get(self.is_identity(p)))
        out = []
        for i in range(inf.shape[0]):
            if inf[i]:
                out.append(None)
            elif isinstance(self.b_host, tuple):
                out.append(((int(ax[0][i]), int(ax[1][i])), (int(ay[0][i]), int(ay[1][i]))))
            else:
                out.append((int(ax[i]), int(ay[i])))
        return out

    def to_affine_limbs(self, p: ProjPoint):
        """(x, y) affine Montgomery limbs; identity -> (0, 0)."""
        ln = self.lane
        batch = ln.batch_shape(p.x)
        if len(batch) == 0:
            zinv = ln.inv(p.z)
        else:
            zinv = ln.batch_inv(p.z, axis=1)
        inf = self.is_identity(p)
        ax = ln.mul(p.x, zinv)
        ay = ln.mul(p.y, zinv)
        zero = ln.zeros(batch)
        return (ln.select(inf, zero, ax), ln.select(inf, zero, ay))


@functools.lru_cache(maxsize=None)
def g1_ops(curve: CurveParams) -> CurveOps:
    f = get_field(curve.fq.p, curve.name + ".fq")
    return CurveOps(FqLane(f), curve.b, curve.name + ".G1", curve.g1_gen)


@functools.lru_cache(maxsize=None)
def g2_ops(curve: CurveParams) -> CurveOps:
    f = get_field(curve.fq.p, curve.name + ".fq")
    return CurveOps(Fq2Lane(f), curve.b2, curve.name + ".G2", curve.g2_gen)
