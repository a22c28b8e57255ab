"""Shamir secret sharing (n parties, threshold t) over JAX limb tensors.

Parity: /root/reference/mpc-core/src/protocols/shamir.rs —
  * share = f(id+1) for a degree-t polynomial with secret at f(0)
  * open  = broadcast_next(t+1) + Lagrange at 0 (shamir.rs:575-579)
  * mul   = local product (degree 2t) then KING-based degree reduction
    masked by a preprocessed double share (r_t, r_2t) (shamir.rs:252-301):
    parties open x+r at degree 2t to the king, the king reshares at degree
    t, parties subtract r_t.
  * preprocessing (shamir.rs:873-1010 ShamirRng): dealerless Vandermonde
    batch extraction (DN07) — every party deals one random double sharing
    per slot and the [i^k] Vandermonde rows squeeze t+1 independent pairs
    out of each slot, evaluated as batched device tensor ops.
  * MSM/FFT are share-local (linearity), single component.

Requires n >= 2t+1.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from ..fields.params import CurveParams
from ..ops.curve import CurveOps, ProjPoint
from ..ops.field import Field
from .driver import Driver, segment_sum_mont
from .net import Network


def _lagrange_at_zero(host, xs: list[int]) -> list[int]:
    """Lagrange coefficients for interpolating f(0) from points xs."""
    out = []
    for j, xj in enumerate(xs):
        num, den = 1, 1
        for m, xm in enumerate(xs):
            if m != j:
                num = num * xm % host.p
                den = den * (xm - xj) % host.p
        out.append(num * host.inv(den) % host.p)
    return out


def _eval_poly_shares(f: Field, secret_mont, coeffs, xs: list[int]):
    """shares_j = secret + sum_k coeffs[k] * x_j^(k+1) for each x in xs.

    secret (L, *batch); coeffs list of (L, *batch); returns list per x."""
    shares = []
    for x in xs:
        acc = secret_mont
        xp = 1
        for c in coeffs:
            xp = xp * x
            const = f._bcast_const(
                f._int_to_limbs_np((xp % f.p) * f.R % f.p), c.shape[1:]
            )
            acc = f.add(acc, f.mont_mul(c, const))
        shares.append(acc)
    return shares


def share_field_vec_shamir(
    f: Field, vec_mont, threshold: int, n_parties: int,
    seed: bytes | int | None = None
):
    """Dealer-side split: returns one (L, N) share array per party.
    Mask entropy: 256-bit ChaCha key (fresh OS entropy unless a test seed
    is passed, which is SHA-256 expanded)."""
    from ..utils.chacha import ChaChaStream, fresh_seed

    stream = ChaChaStream(fresh_seed() if seed is None else seed, domain=3)
    batch = vec_mont.shape[1:]
    coeffs = [stream.rand_mont(f, batch) for _ in range(threshold)]
    return _eval_poly_shares(f, vec_mont, coeffs, list(range(1, n_parties + 1)))


def combine_field_shares_shamir(f: Field, shares: list, threshold: int):
    host = __import__(
        "cocircom_tpu.fields.params", fromlist=["HostField"]
    ).HostField(f.p)
    xs = list(range(1, threshold + 2))
    lams = _lagrange_at_zero(host, xs)
    acc = None
    for lam, s in zip(lams, shares[: threshold + 1]):
        const = f._bcast_const(f._int_to_limbs_np(lam * f.R % f.p), s.shape[1:])
        term = f.mont_mul(s, const)
        acc = term if acc is None else f.add(acc, term)
    return acc


class ShamirDriver(Driver):
    protocol = "shamir"
    KING = 0

    def __init__(self, curve: CurveParams, net: Network, threshold: int = 1,
                 mesh=None):
        super().__init__(curve, mesh=mesh)
        assert net.n_parties >= 2 * threshold + 1, "need n >= 2t+1"
        self.net = net
        self.id = net.id
        self.t = threshold
        self.n = net.n_parties
        from ..utils.chacha import ChaChaStream, fresh_seed

        self._stream = ChaChaStream(fresh_seed(), domain=4)
        self._pair_buf: list = []  # list of (r_t, r_2t) (L,) columns
        host = curve.fr
        # lagrange for open (parties id, id-1, ..., id-t)
        own_xs = [((self.id - k) % self.n) + 1 for k in range(self.t + 1)]
        self._open_lams = [
            lam * self.fr.R % self.fr.p for lam in _lagrange_at_zero(host, own_xs)
        ]
        # lagrange for king reconstruction from all n parties at degree 2t
        all_xs = list(range(1, self.n + 1))
        self._king_lams = [
            lam * self.fr.R % self.fr.p
            for lam in _lagrange_at_zero(host, all_xs[: 2 * self.t + 1])
        ]

    # ------------------------------------------------------- rng helpers

    def _rand(self, shape=()):
        return self._stream.rand_mont(self.fr, shape)

    def _deal(self, secret_mont, degree: int):
        """Deal a degree-d sharing of secret to all parties; returns own
        share; sends others theirs (tagged implicitly by message order)."""
        batch = secret_mont.shape[1:]
        coeffs = [self._rand(batch) for _ in range(degree)]
        shares = _eval_poly_shares(
            self.fr, secret_mont, coeffs, list(range(1, self.n + 1))
        )
        for p in range(self.n):
            if p != self.id:
                self.net.send(p, shares[p])
        return shares[self.id]

    def preprocess(self, amount: int):
        """Batch-generate random double shares (r_t, r_2t) dealerlessly with
        Vandermonde extraction (shamir.rs:899-1010): every party deals ONE
        random double sharing per slot; applying the rows [i^k]_{k<=t} of
        the Vandermonde matrix over the n received share columns yields
        t+1 INDEPENDENT pairs per slot instead of just their sum -- the
        DN07 amortization. All rows are evaluated as batched device
        mont_mul/add over (L, n, amount) tensors."""
        slots = -(-amount // (self.t + 1))
        contrib = self._rand((slots,))
        own_t = self._deal(contrib, self.t)
        own_2t = self._deal(contrib, 2 * self.t)
        cols_t = [None] * self.n
        cols_2t = [None] * self.n
        cols_t[self.id] = own_t
        cols_2t[self.id] = own_2t
        for p in range(self.n):
            if p != self.id:
                cols_t[p] = jnp.asarray(self.net.recv(p))
                cols_2t[p] = jnp.asarray(self.net.recv(p))
        # (L, n, slots) stacks
        st = jnp.stack(cols_t, axis=1)
        s2t = jnp.stack(cols_2t, axis=1)
        fr = self.fr
        host = self.curve.fr
        # row k: coefficients (1^k, 2^k, ..., n^k) in Montgomery form
        row_pts = list(range(1, self.n + 1))
        for k in range(self.t + 1):
            coef = fr.encode([pow(x, k, host.p) for x in row_pts])  # (L, n)
            wt = fr.mont_mul(st, coef[:, :, None])
            w2t = fr.mont_mul(s2t, coef[:, :, None])
            rt = wt[:, 0]
            r2t = w2t[:, 0]
            for i in range(1, self.n):
                rt = fr.add(rt, wt[:, i])
                r2t = fr.add(r2t, w2t[:, i])
            self._pair_buf.append((rt, r2t))

    def _get_pairs(self, amount: int):
        have = sum(p[0].shape[1] for p in self._pair_buf)
        if have < amount:
            self.preprocess(amount - have)
        rt = jnp.concatenate([p[0] for p in self._pair_buf], axis=1)
        r2t = jnp.concatenate([p[1] for p in self._pair_buf], axis=1)
        take = (rt[:, :amount], r2t[:, :amount])
        rest = (rt[:, amount:], r2t[:, amount:])
        self._pair_buf = [rest] if rest[0].shape[1] else []
        return take

    # ------------------------------------------------------- share algebra

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

    def _lincomb(self, shares, lams):
        acc = None
        for lam, s in zip(lams, shares):
            const = self.fr._bcast_const(self.fr._int_to_limbs_np(lam), s.shape[1:])
            term = self.fr.mont_mul(s, const)
            acc = term if acc is None else self.fr.add(acc, term)
        return acc

    def degree_reduce(self, x2t):
        """Masked king-based reduction, batched: 2 rounds (shamir.rs:252)."""
        flat = x2t.reshape(self.fr.L, -1)
        amount = flat.shape[1]
        rt, r2t = self._get_pairs(amount)
        y = self.fr.add(flat, r2t)
        if self.id == self.KING:
            shares = [y]
            for p in range(1, self.n):
                shares.append(jnp.asarray(self.net.recv(p)))
            # king shares are ordered by party id; x-points 1..n
            val = self._lincomb(shares[: 2 * self.t + 1], self._king_lams)
            own = self._deal(val, self.t)
        else:
            self.net.send(self.KING, y)
            own = jnp.asarray(self.net.recv(self.KING))
        red = self.fr.sub(own, rt)
        return red.reshape(x2t.shape)

    def mul_vec(self, a, b):
        return self.degree_reduce(self.fr.mont_mul(a, b))

    mul = mul_vec

    def rand(self, shape=()):
        n = int(np.prod(shape)) if shape else 1
        rt, _ = self._get_pairs(n)
        return rt.reshape((self.fr.L,) + tuple(shape))

    def open_many(self, x):
        got = self.net.broadcast_next(x, self.t + 1)
        return self._lincomb([jnp.asarray(g) for g in got], self._open_lams)

    open = open_many

    def mul_open_many(self, a, b):
        return self.open_many(self.mul_vec(a, b))

    def inv_many(self, x):
        """Masked-open inversion; aborts on zero denominators (the opened
        r*x reveals zero-ness by construction — reference errors too)."""
        r = self.rand(x.shape[1:])
        rx = self.mul_vec(r, x)
        opened = self.open_many(rx)
        if not bool(jnp.all(jnp.any(opened != 0, axis=0))):
            raise ZeroDivisionError("MPC inversion of a zero share")
        inv = (
            self.fr.batch_inv(opened)
            if opened.ndim > 1 and opened.shape[1] > 1
            else self.fr.inv(opened)
        )
        return self.mul_public(r, inv)

    def inv_many_guarded(self, x):
        """0 -> 0 variant for the VM's guarded division (see rep3.py)."""
        r = self.rand(x.shape[1:])
        rx = self.mul_vec(r, x)
        opened = self.open_many(rx)
        inv = (
            self.fr.batch_inv(opened)
            if opened.ndim > 1 and opened.shape[1] > 1
            else self.fr.inv(opened)
        )
        return self.mul_public(r, inv)

    def gather(self, x, idx):
        return jnp.take(x, jnp.asarray(idx), axis=1)

    def concat(self, *vecs):
        return jnp.concatenate(vecs, axis=1)

    def slice(self, x, lo, hi):
        return x[:, lo:hi]

    def set_slice(self, x, lo, values):
        return x.at[:, lo : lo + values.shape[1]].set(values)

    def segment_sum(self, values, seg_ids, num_segments):
        return segment_sum_mont(self.fr, values, seg_ids, num_segments)

    # ------------------------------------------------------------- FFT

    def fft(self, a):
        return self.ntt.ntt(a)

    def ifft(self, a):
        return self.ntt.intt(a)

    def coset_shift(self, a, g=None):
        return self.ntt.coset_shift(a, g)

    # ------------------------------------------------------------- EC

    def to_scalars(self, x):
        return self.fr.from_mont(x)

    def msm_g1(self, points: ProjPoint, share_vec):
        return self.msm_g1_engine.msm(points, self.to_scalars(share_vec))

    def msm_g2(self, points, share_vec):
        return self.msm_g2_engine.msm(points, self.to_scalars(share_vec))

    def _single_scalar_mul(self, ops: CurveOps, point: ProjPoint, limbs):
        if limbs.ndim == 1:
            batch = jax.tree.leaves(point)[0].shape[1:]
            if batch:
                # one scalar against a batched point: broadcast the scalar
                lb = jnp.broadcast_to(limbs[:, None], limbs.shape[:1] + batch)
                return ops.scalar_mul(point, lb)
            limbs = limbs[:, None]
            point = jax.tree.map(lambda c: c[..., None], point)
            res = ops.scalar_mul(point, limbs)
            return jax.tree.map(lambda c: jnp.squeeze(c, -1), res)
        return ops.scalar_mul(point, limbs)

    def scalar_mul_public_point(self, ops: CurveOps, point: ProjPoint, share):
        return self._single_scalar_mul(ops, point, self.fr.from_mont(share))

    def _point_lincomb(self, ops: CurveOps, points: list[ProjPoint], lams):
        """sum lam_j * P_j with host-int lams (lams given in v*R form)."""
        acc = None
        for lam, pt in zip(lams, points):
            lam_std = lam * pow(self.fr.R, -1, self.fr.p) % self.fr.p
            limbs = jnp.asarray(self.fr.to_limbs([lam_std]))[:, 0]
            term = self._single_scalar_mul(ops, pt, limbs)
            acc = term if acc is None else ops.add(acc, term)
        return acc

    def degree_reduce_point(self, ops: CurveOps, x2t: ProjPoint):
        rt, _r2t = self._get_pairs(1)
        rt = rt[:, 0]
        # mask: r_2t as point — derive from SAME pair: use r*G at both degrees
        gen = ops.encode_points(
            [self.curve.g1_gen if ops is self.g1 else self.curve.g2_gen]
        )
        gen = jax.tree.map(lambda c: c[..., 0], gen)
        r2t_pt = self._single_scalar_mul(ops, gen, self.fr.from_mont(_r2t[:, 0]))
        rt_pt = self._single_scalar_mul(ops, gen, self.fr.from_mont(rt))
        y = ops.add(x2t, r2t_pt)
        if self.id == self.KING:
            pts = [y]
            for p in range(1, self.n):
                got = self.net.recv(p)
                pts.append(ProjPoint(*jax.tree.map(jnp.asarray, got)))
            val = self._point_lincomb(
                ops, pts[: 2 * self.t + 1], self._king_lams
            )
            # king deals a degree-t sharing of the point: P + sum c_k x^k G
            coeffs = [self._rand(()) for _ in range(self.t)]
            my_share = None
            for pid in range(self.n):
                xj = pid + 1
                acc = val
                xp = 1
                for c in coeffs:
                    xp = xp * xj
                    cc = self.fr.mont_mul(
                        c,
                        self.fr._bcast_const(
                            self.fr._int_to_limbs_np(xp % self.fr.p * self.fr.R % self.fr.p), ()
                        ),
                    )
                    cpt = self._single_scalar_mul(ops, gen, self.fr.from_mont(cc))
                    acc = ops.add(acc, cpt)
                if pid == self.id:
                    my_share = acc
                else:
                    self.net.send(pid, acc)
            own = my_share
        else:
            self.net.send(self.KING, y)
            own = ProjPoint(*jax.tree.map(jnp.asarray, self.net.recv(self.KING)))
        return ops.add(own, ops.neg(rt_pt))

    def scalar_mul(self, ops: CurveOps, pt: ProjPoint, s):
        """Shared point x shared scalar -> degree-2t point, then reduce."""
        prod = self._single_scalar_mul(ops, pt, self.fr.from_mont(s))
        return self.degree_reduce_point(ops, prod)

    def point_add(self, ops: CurveOps, a, b):
        return ops.add(a, b)

    def point_add_public(self, ops: CurveOps, a, p):
        return ops.add(a, p)

    def point_sub(self, ops, a, b):
        return ops.add(a, ops.neg(b))

    def open_point(self, ops: CurveOps, x: ProjPoint):
        got = self.net.broadcast_next(x, self.t + 1)
        pts = [ProjPoint(*jax.tree.map(jnp.asarray, g)) for g in got]
        return self._point_lincomb(ops, pts, self._open_lams)

    def open_two_points(self, x: ProjPoint, y: ProjPoint):
        got = self.net.broadcast_next((x, y), self.t + 1)
        xs = [ProjPoint(*jax.tree.map(jnp.asarray, g[0])) for g in got]
        ys = [ProjPoint(*jax.tree.map(jnp.asarray, g[1])) for g in got]
        return (
            self._point_lincomb(self.g1, xs, self._open_lams),
            self._point_lincomb(self.g2, ys, self._open_lams),
        )
