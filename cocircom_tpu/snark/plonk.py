"""Collaborative PLONK prover (snarkjs-compatible), generic over MPC driver.

Parity: /root/reference/co-circom/co-plonk/src/{round1..round5}.rs —
the 5-round state machine with the explicit round-count discipline:
  round1: wire polys + blinding, 3 commitments              (1 open round)
  round2: permutation poly z via constant-round prefix products
          (Ozdemir-Boneh masking), 1 commitment             (~6 rounds)
  round3: quotient t on the 4n coset — every product batched into wide
          single-round mul_vec calls; Z_H division local    (2 mul rounds)
  round4: 4 shared evaluations opened in one round
  round5: linearization r, W_xi, W_xiw — local; 2 commitments opened
All Fiat-Shamir challenges ride the byte-exact Keccak256 transcript
(ops/keccak.py). Public math stays on-device as public limb vectors.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np

from ..io.plonk_zkey import PlonkZKey
from ..ops.keccak import Keccak256Transcript
from ..ops.ntt import power_table
from .groth16 import SharedWitness, _expand


class CoPlonk:
    def __init__(self, driver, deterministic_blinding: bool = False,
                 tracer=None):
        from ..utils.trace import tracer_or_null

        if deterministic_blinding and not os.environ.get(
                "COCIRCOM_INSECURE_DETERMINISTIC"):
            raise PermissionError(
                "deterministic_blinding replaces the 11 PLONK blinding "
                "scalars with public constants and destroys zero-knowledge; "
                "it exists only for round-KAT tests. Set "
                "COCIRCOM_INSECURE_DETERMINISTIC=1 to acknowledge.")
        self.d = driver
        self.deterministic = deterministic_blinding
        self.tracer = tracer_or_null(tracer)

    # ------------------------------------------------------------- helpers

    def _pub_vec(self, vals_mont_np):
        return jnp.asarray(vals_mont_np)

    def _commit(self, zk: PlonkZKey, poly_share):
        n = jax.tree.leaves(poly_share)[0].shape[1]
        pts = self.d.g1_proj(zk.p_tau)
        pts = jax.tree.map(lambda c: c[..., :n], pts)
        return self.d.msm_g1(pts, poly_share)

    def _blind(self, poly_share, bs: list):
        """poly - sum_k rev(bs)[k] X^k + X^n * (rev(bs) poly); parity:
        plonk_utils::blind_coefficients (lib.rs:140-158)."""
        d = self.d
        rev = list(reversed(bs))
        n = jax.tree.leaves(poly_share)[0].shape[1]
        head = d.sub(d.slice_share(poly_share, 0, len(rev)), d.stack_shares(rev))
        mid = d.slice_share(poly_share, len(rev), n)
        tail = d.stack_shares(rev)
        return d.concat_shares(head, mid, tail)

    def _fft4(self, zk, poly_share):
        """evaluate (unblinded) coeffs on the 4n extended domain."""
        d = self.d
        n4 = 4 * zk.domain_size
        cur = jax.tree.leaves(poly_share)[0].shape[1]
        padded = jax.tree.map(
            lambda c: jnp.pad(c, [(0, 0), (0, n4 - cur)]), poly_share
        )
        return d.fft(padded)

    def _decode_point(self, pt):
        return self.d.g1.decode_points(_expand(pt))[0]

    # ------------------------------------------------------------- witness

    def _build_witness(self, zk: PlonkZKey, shared: SharedWitness):
        """Returns (publics ints with [0]=0, full get_witness gather source).

        Layout of the gather source W (share vec, length n_vars):
          [0..n_public]                     promoted publics (index 0 -> 0)
          (n_public..n_vars-n_additions)    the shared witness
          [n_vars-n_additions..n_vars)      addition results (computed here)
        Parity: round1.rs calculate_additions + lib.rs get_witness.
        """
        d = self.d
        # wire 0 is promoted as ZERO (snarkjs mirror, types.rs:104-110);
        # the returned publics list is the bare nPublic values — exactly what
        # the snarkjs transcript and PI computations consume (validated
        # against the committed snarkjs proof's challenge schedule).
        publics = [int(x) for x in shared.public_inputs[1:]]
        pub_mont = d.encode_publics([0] + publics)
        base = d.concat(d.promote_public(pub_mont), shared.witness)
        n_base = zk.n_vars - zk.n_additions
        if zk.n_additions == 0:
            return publics, base
        refs_additions = bool(
            np.any(zk.add_id1 >= n_base) or np.any(zk.add_id2 >= n_base)
        )
        f1 = jnp.asarray(zk.add_f1)
        f2 = jnp.asarray(zk.add_f2)
        if not refs_additions:
            w1 = d.gather(base, zk.add_id1)
            w2 = d.gather(base, zk.add_id2)
            adds = d.add(d.mul_public(w1, f1), d.mul_public(w2, f2))
            return publics, d.concat(base, adds)
        # sequential fallback: additions may reference earlier additions
        W = base
        for i in range(zk.n_additions):
            w1 = d.gather(W, np.array([zk.add_id1[i]]))
            w2 = d.gather(W, np.array([zk.add_id2[i]]))
            res = d.add(
                d.mul_public(w1, f1[:, i : i + 1]), d.mul_public(w2, f2[:, i : i + 1])
            )
            W = d.concat(W, res)
        return publics, W

    # ------------------------------------------------------------- rounds

    def prove(self, zk: PlonkZKey, shared: SharedWitness) -> dict:
        d = self.d
        fr = d.fr
        host = d.curve.fr
        n = zk.domain_size
        n4 = 4 * n
        root = host.root_of_unity(zk.power)
        root4 = host.root_of_unity(zk.power + 2)
        root2 = host.root_of_unity(2)

        _tr = self.tracer
        publics, W = self._build_witness(zk, shared)

        # blinding scalars b[0..10]
        if self.deterministic:
            bs = [
                d.promote_public(fr.encode([i]))
                for i in range(11)
            ]
            bs = [d.index_share(b, 0) for b in bs]
        else:
            bs = [d.rand(()) for _ in range(11)]

        _sp = _tr.span("round 1")
        _sp.__enter__()
        # ---------------- round 1 ----------------
        def wire_buffer(mapping):
            idx = np.zeros(n, np.int64)
            idx[: zk.n_constraints] = mapping
            buf = d.gather(W, idx)
            if zk.n_constraints < n:  # zero out the padding lanes
                mask = np.zeros((1, n), np.uint32)
                mask[0, : zk.n_constraints] = 1
                buf = jax.tree.map(lambda c: c * jnp.asarray(mask), buf)
            return buf

        buf_a = wire_buffer(zk.map_a)
        buf_b = wire_buffer(zk.map_b)
        buf_c = wire_buffer(zk.map_c)

        poly_a = d.ifft(buf_a)
        poly_b = d.ifft(buf_b)
        poly_c = d.ifft(buf_c)
        ev_a = self._fft4(zk, poly_a)
        ev_b = self._fft4(zk, poly_b)
        ev_c = self._fft4(zk, poly_c)
        poly_a = self._blind(poly_a, bs[0:2])
        poly_b = self._blind(poly_b, bs[2:4])
        poly_c = self._blind(poly_c, bs[4:6])

        commits = d.stack_points(
            [self._commit(zk, poly_a), self._commit(zk, poly_b), self._commit(zk, poly_c)]
        )
        opened = d.open_point(d.g1, commits)
        commit_a, commit_b, commit_c = (
            self._decode_point(jax.tree.map(lambda c: c[..., i], opened))
            for i in range(3)
        )

        _sp.__exit__(None, None, None)
        _sp = _tr.span("round 2")
        _sp.__enter__()
        # ---------------- round 2 ----------------
        ts = Keccak256Transcript(d.curve)
        for pt in (zk.qm_c, zk.ql_c, zk.qr_c, zk.qo_c, zk.qc_c, zk.s1_c, zk.s2_c, zk.s3_c):
            ts.add_point(pt)
        for v in publics:
            ts.add_scalar(v)
        ts.add_point(commit_a)
        ts.add_point(commit_b)
        ts.add_point(commit_c)
        beta = ts.get_challenge()
        ts2 = Keccak256Transcript(d.curve)
        ts2.add_scalar(beta)
        gamma = ts2.get_challenge()

        w_pows = power_table(fr, root, n)
        gamma_c = fr._bcast_const(fr._int_to_limbs_np(gamma * fr.R % fr.p), (n,))

        def lin(buf, mult: int, sigma_evals=None):
            """buf + beta*mult*w^i + gamma  (or beta*sigma_i + gamma)."""
            if sigma_evals is None:
                pub = fr.mont_mul(
                    w_pows,
                    fr._bcast_const(
                        fr._int_to_limbs_np(beta * mult % fr.p * fr.R % fr.p), (n,)
                    ),
                )
            else:
                pub = fr.mont_mul(
                    jnp.asarray(sigma_evals),
                    fr._bcast_const(fr._int_to_limbs_np(beta * fr.R % fr.p), (n,)),
                )
            return d.add_public(buf, fr.add(pub, gamma_c))

        n1 = lin(buf_a, 1)
        n2 = lin(buf_b, zk.k1)
        n3 = lin(buf_c, zk.k2)
        dd1 = lin(buf_a, 0, zk.s1.evals[:, ::4])
        dd2 = lin(buf_b, 0, zk.s2.evals[:, ::4])
        dd3 = lin(buf_c, 0, zk.s3.evals[:, ::4])

        # batch the two pair-products into one round, then the two triples
        p12 = d.mul_vec(d.concat_shares(n1, dd1), d.concat_shares(n2, dd2))
        p123 = d.mul_vec(p12, d.concat_shares(n3, dd3))
        num = d.slice_share(p123, 0, n)
        den = d.slice_share(p123, n, 2 * n)

        num_pref = d.prefix_mul(num)
        den_pref = d.prefix_mul(den)
        den_inv = d.inv_many(den_pref)
        z_buf = d.mul_vec(num_pref, den_inv)
        z_buf = jax.tree.map(lambda c: jnp.roll(c, 1, axis=1), z_buf)

        poly_z = d.ifft(z_buf)
        ev_z = self._fft4(zk, poly_z)
        poly_z = self._blind(poly_z, bs[6:9])
        commit_z_pt = d.open_point(d.g1, self._commit(zk, poly_z))
        commit_z = self._decode_point(commit_z_pt)

        _sp.__exit__(None, None, None)
        _sp = _tr.span("round 3")
        _sp.__enter__()
        # ---------------- round 3 ----------------
        ts = Keccak256Transcript(d.curve)
        ts.add_scalar(beta)
        ts.add_scalar(gamma)
        ts.add_point(commit_z)
        alpha = ts.get_challenge()
        alpha2 = alpha * alpha % fr.p

        w4_pows = power_table(fr, root4, n4)

        def mulp_int(vec_pub, k: int):
            return fr.mont_mul(
                vec_pub, fr._bcast_const(fr._int_to_limbs_np(k % fr.p * fr.R % fr.p), (n4,))
            )

        def addp_int(vec_pub, k: int):
            return fr.add(
                vec_pub, fr._bcast_const(fr._int_to_limbs_np(k % fr.p * fr.R % fr.p), (n4,))
            )

        bc = lambda s: d.broadcast_share(s, n4)  # noqa: E731
        ap = d.add(d.mul_public(bc(bs[0]), w4_pows), bc(bs[1]))
        bp = d.add(d.mul_public(bc(bs[2]), w4_pows), bc(bs[3]))
        cp = d.add(d.mul_public(bc(bs[4]), w4_pows), bc(bs[5]))
        w4_sq = fr.mont_mul(w4_pows, w4_pows)
        zp = d.add(
            d.add(d.mul_public(bc(bs[6]), w4_sq), d.mul_public(bc(bs[7]), w4_pows)),
            bc(bs[8]),
        )
        ww = mulp_int(w4_pows, root)
        ww_sq = fr.mont_mul(ww, ww)
        zwp = d.add(
            d.add(d.mul_public(bc(bs[6]), ww_sq), d.mul_public(bc(bs[7]), ww)),
            bc(bs[8]),
        )

        # z1/z2/z3 degree-correction patterns (period 4)
        z1 = [0, (-1 + root2) % fr.p, fr.p - 2, (-1 - root2) % fr.p]
        z2 = [0, (-2 * root2) % fr.p, 4, (2 * root2) % fr.p]
        z3 = [0, (2 + 2 * root2) % fr.p, (-8) % fr.p, (2 - 2 * root2) % fr.p]

        def pattern(vals):
            reps = np.tile(np.array([int(v) % fr.p for v in vals], dtype=object), n)
            return jnp.asarray(fr.to_limbs([int(v) * fr.R % fr.p for v in reps]))

        z1p, z2p, z3p = pattern(z1), pattern(z2), pattern(z3)

        zw_ev = jax.tree.map(lambda c: jnp.roll(c, -4, axis=1), ev_z)

        # wave A: the 4 e1/e1z products in ONE round
        lhsA = d.concat_shares(ev_a, ev_a, ap, ap)
        rhsA = d.concat_shares(ev_b, bp, ev_b, bp)
        wA = d.mul_vec(lhsA, rhsA)
        sl = lambda k: d.slice_share(wA, k * n4, (k + 1) * n4)  # noqa: E731
        a_b, a_bp, ap_b, ap_bp = sl(0), sl(1), sl(2), sl(3)

        qm4, ql4, qr4 = jnp.asarray(zk.qm.evals), jnp.asarray(zk.ql.evals), jnp.asarray(zk.qr.evals)
        qo4, qc4 = jnp.asarray(zk.qo.evals), jnp.asarray(zk.qc.evals)
        s14, s24, s34 = jnp.asarray(zk.s1.evals), jnp.asarray(zk.s2.evals), jnp.asarray(zk.s3.evals)
        l1_4 = jnp.asarray(zk.lagrange[0].evals)

        e1 = d.mul_public(a_b, qm4)
        e1 = d.add(e1, d.mul_public(ev_a, ql4))
        e1 = d.add(e1, d.mul_public(ev_b, qr4))
        e1 = d.add(e1, d.mul_public(ev_c, qo4))
        e1 = d.add_public(e1, qc4)
        for j in range(zk.n_public):
            lj = jnp.asarray(zk.lagrange[j].evals)
            contrib = d.mul_public(bc(d.index_share(buf_a, j)), lj)
            e1 = d.sub(e1, contrib)

        e1z = d.add(d.add(a_bp, ap_b), d.mul_public(ap_bp, z1p))
        e1z = d.mul_public(e1z, qm4)
        e1z = d.add(e1z, d.mul_public(ap, ql4))
        e1z = d.add(e1z, d.mul_public(bp, qr4))
        e1z = d.add(e1z, d.mul_public(cp, qo4))

        beta_g = lambda mult: addp_int(mulp_int(w4_pows, beta * mult), gamma)  # noqa: E731
        e2a = d.add_public(ev_a, beta_g(1))
        e2b = d.add_public(ev_b, beta_g(zk.k1))
        e2c = d.add_public(ev_c, beta_g(zk.k2))
        e3a = d.add_public(ev_a, addp_int(mulp_int(s14, beta), gamma))
        e3b = d.add_public(ev_b, addp_int(mulp_int(s24, beta), gamma))
        e3c = d.add_public(ev_c, addp_int(mulp_int(s34, beta), gamma))

        # mul4vec for e2 = e2a*e2b*e2c*z and e3 = e3a*e3b*e3c*zw, with ALL
        # blinding cross terms (round3.rs mul4vec/mul4vec_post). Stage 1:
        # the 16 pair products (a-side x4, c-side x4, both branches), ONE round.
        lhsB = d.concat_shares(
            e2a, e2a, ap, ap, e2c, e2c, cp, cp,
            e3a, e3a, ap, ap, e3c, e3c, cp, cp,
        )
        rhsB = d.concat_shares(
            e2b, bp, e2b, bp, ev_z, zp, ev_z, zp,
            e3b, bp, e3b, bp, zw_ev, zwp, zw_ev, zwp,
        )
        wB = d.mul_vec(lhsB, rhsB)
        slB = lambda k: d.slice_share(wB, k * n4, (k + 1) * n4)  # noqa: E731
        # per branch: P=a*b, R=a*bp, Q=ap*b, S=ap*bp ; U=c*d, W=c*dp, V=cp*d, X=cp*dp
        P2, R2, Q2, S2, U2, W2, V2, X2 = (slB(k) for k in range(8))
        P3, R3, Q3, S3, U3, W3, V3, X3 = (slB(k) for k in range(8, 16))

        # Stage 2: full 16-combo outer products per branch, ONE round.
        def outer(Pp, Qq, Rr, Ss, Uu, Vv, Ww, Xx):
            lhs, rhs = [], []
            for pterm in (Pp, Qq, Rr, Ss):
                for uterm in (Uu, Vv, Ww, Xx):
                    lhs.append(pterm)
                    rhs.append(uterm)
            return lhs, rhs

        l2, r2 = outer(P2, Q2, R2, S2, U2, V2, W2, X2)
        l3, r3 = outer(P3, Q3, R3, S3, U3, V3, W3, X3)
        wD = d.mul_vec(d.concat_shares(*(l2 + l3)), d.concat_shares(*(r2 + r3)))

        def combine(base_k):
            g = lambda p, u: d.slice_share(  # noqa: E731
                wD, (base_k + 4 * p + u) * n4, (base_k + 4 * p + u + 1) * n4
            )
            # indices: p,u in 0..3 over (P,Q,R,S) x (U,V,W,X)
            e_full = g(0, 0)  # P*U
            a0 = d.add(d.add(g(1, 0), g(2, 0)), d.add(g(0, 1), g(0, 2)))
            a1 = d.add(
                d.add(d.add(g(3, 0), g(1, 1)), d.add(g(1, 2), g(2, 1))),
                d.add(g(2, 2), g(0, 3)),
            )
            a2 = d.add(d.add(g(2, 3), g(1, 3)), d.add(g(3, 2), g(3, 1)))
            a3 = g(3, 3)
            ez = d.add(
                d.add(a0, d.mul_public(a1, z1p)),
                d.add(d.mul_public(a2, z2p), d.mul_public(a3, z3p)),
            )
            return e_full, ez

        e2, e2z = combine(0)
        e3, e3z = combine(16)

        # t = e1 + alpha(e2 - e3) + alpha^2 * L1*(z-1)
        one_c = fr._bcast_const(fr.one_mont_np, (n4,))
        e4 = d.add_public(ev_z, fr.neg(one_c))
        e4 = d.mul_public(e4, l1_4)
        t_ev = d.add(e1, d.mul_public(d.sub(e2, e3), mulp_int(fr.one_mont((n4,)), alpha)))
        t_ev = d.add(t_ev, d.mul_public(e4, mulp_int(fr.one_mont((n4,)), alpha2)))
        e4z = d.mul_public(zp, l1_4)
        tz_ev = d.add(e1z, d.mul_public(d.sub(e2z, e3z), mulp_int(fr.one_mont((n4,)), alpha)))
        tz_ev = d.add(tz_ev, d.mul_public(e4z, mulp_int(fr.one_mont((n4,)), alpha2)))

        coeff_t = d.ifft(t_ev)
        # divide by Z_H = X^n - 1 (sequential over the 4 chunks, local)
        chunk0 = d.neg(d.slice_share(coeff_t, 0, n))
        chunks = [chunk0]
        for k in range(1, 4):
            ck = d.sub(chunks[k - 1], d.slice_share(coeff_t, k * n, (k + 1) * n))
            chunks.append(ck)
        coeff_t = d.concat_shares(*chunks)
        coeff_tz = d.ifft(tz_ev)
        t_final = d.add(coeff_t, coeff_tz)

        t1 = d.concat_shares(
            d.slice_share(t_final, 0, n), d.stack_shares([bs[9]])
        )
        t2_head = d.sub(
            d.slice_share(t_final, n, n + 1), d.stack_shares([bs[9]])
        )
        t2 = d.concat_shares(
            t2_head, d.slice_share(t_final, n + 1, 2 * n), d.stack_shares([bs[10]])
        )
        t3_head = d.sub(
            d.slice_share(t_final, 2 * n, 2 * n + 1), d.stack_shares([bs[10]])
        )
        t3 = d.concat_shares(t3_head, d.slice_share(t_final, 2 * n + 1, 3 * n + 6))

        tcommits = d.stack_points(
            [self._commit(zk, t1), self._commit(zk, t2), self._commit(zk, t3)]
        )
        opened_t = d.open_point(d.g1, tcommits)
        commit_t1, commit_t2, commit_t3 = (
            self._decode_point(jax.tree.map(lambda c: c[..., i], opened_t))
            for i in range(3)
        )

        _sp.__exit__(None, None, None)
        _sp = _tr.span("round 4")
        _sp.__enter__()
        # ---------------- round 4 ----------------
        ts = Keccak256Transcript(d.curve)
        ts.add_scalar(alpha)
        ts.add_point(commit_t1)
        ts.add_point(commit_t2)
        ts.add_point(commit_t3)
        xi = ts.get_challenge()
        xiw = xi * root % fr.p

        evs = [
            self.d.evaluate_poly_public(poly_a, xi),
            self.d.evaluate_poly_public(poly_b, xi),
            self.d.evaluate_poly_public(poly_c, xi),
            self.d.evaluate_poly_public(poly_z, xiw),
        ]
        opened_evs = d.open_many(d.stack_shares(evs))
        vals = fr.from_limbs(fr.from_mont(opened_evs))
        eval_a, eval_b, eval_c, eval_zw = (int(v) for v in vals)
        s1_coef = jnp.asarray(zk.s1.coeffs)
        s2_coef = jnp.asarray(zk.s2.coeffs)
        xi_pows_n = power_table(fr, xi, n)
        eval_s1 = int(fr.from_limbs(fr.from_mont(fr.sum(fr.mont_mul(s1_coef, xi_pows_n)))))
        eval_s2 = int(fr.from_limbs(fr.from_mont(fr.sum(fr.mont_mul(s2_coef, xi_pows_n)))))

        _sp.__exit__(None, None, None)
        _sp = _tr.span("round 5")
        _sp.__enter__()
        # ---------------- round 5 ----------------
        ts = Keccak256Transcript(d.curve)
        ts.add_scalar(xi)
        for v in (eval_a, eval_b, eval_c, eval_s1, eval_s2, eval_zw):
            ts.add_scalar(v)
        v0 = ts.get_challenge()
        vv = [v0]
        for _ in range(4):
            vv.append(vv[-1] * v0 % fr.p)

        # public lagrange evaluations at xi
        xin = pow(xi, n, fr.p)
        zh = (xin - 1) % fr.p
        l_len = max(1, zk.n_public)
        l_evals = []
        w = 1
        for _ in range(l_len):
            l_evals.append(
                w * zh % fr.p * pow(n * (xi - w) % fr.p, -1, fr.p) % fr.p
            )
            w = w * root % fr.p
        eval_pi = (-sum(l * v for l, v in zip(l_evals, publics))) % fr.p

        coef_ab = eval_a * eval_b % fr.p
        betaxi = beta * xi % fr.p
        e2a_s = (eval_a + betaxi + gamma) % fr.p
        e2b_s = (eval_b + betaxi * zk.k1 + gamma) % fr.p
        e2c_s = (eval_c + betaxi * zk.k2 + gamma) % fr.p
        e2_s = e2a_s * e2b_s % fr.p * e2c_s % fr.p * alpha % fr.p
        e3a_s = (eval_a + beta * eval_s1 + gamma) % fr.p
        e3b_s = (eval_b + beta * eval_s2 + gamma) % fr.p
        e3_s = e3a_s * e3b_s % fr.p * eval_zw % fr.p * alpha % fr.p
        e4_s = alpha2 * l_evals[0] % fr.p
        e24 = (e2_s + e4_s) % fr.p

        len5 = n + 6

        def fit(pub_arr, length):
            cur = pub_arr.shape[1]
            if cur >= length:
                return pub_arr[:, :length]
            return jnp.pad(pub_arr, [(0, 0), (0, length - cur)])

        def mulc(pub_arr, k):
            return fr.mont_mul(
                pub_arr,
                fr._bcast_const(fr._int_to_limbs_np(k % fr.p * fr.R % fr.p), pub_arr.shape[1:]),
            )

        r_pub = mulc(fit(jnp.asarray(zk.qm.coeffs), len5), coef_ab)
        r_pub = fr.add(r_pub, mulc(fit(jnp.asarray(zk.ql.coeffs), len5), eval_a))
        r_pub = fr.add(r_pub, mulc(fit(jnp.asarray(zk.qr.coeffs), len5), eval_b))
        r_pub = fr.add(r_pub, mulc(fit(jnp.asarray(zk.qo.coeffs), len5), eval_c))
        r_pub = fr.add(r_pub, fit(jnp.asarray(zk.qc.coeffs), len5))
        r_pub = fr.add(
            r_pub, mulc(fit(jnp.asarray(zk.s3.coeffs), len5), (-(e3_s * beta)) % fr.p)
        )

        def fit_share(sh, length):
            cur = jax.tree.leaves(sh)[0].shape[1]
            if cur >= length:
                return d.slice_share(sh, 0, length)
            return jax.tree.map(lambda c: jnp.pad(c, [(0, 0), (0, length - cur)]), sh)

        poly_r = d.mul_public(
            fit_share(poly_z, len5), mulc(fr.one_mont((len5,)), e24)
        )
        poly_r = d.add_public(poly_r, r_pub)
        tmp = d.mul_public(fit_share(t3, len5), mulc(fr.one_mont((len5,)), xin * xin % fr.p))
        tmp = d.add(tmp, d.mul_public(fit_share(t2, len5), mulc(fr.one_mont((len5,)), xin)))
        tmp = d.add(tmp, fit_share(t1, len5))
        tmp = d.mul_public(tmp, mulc(fr.one_mont((len5,)), zh))
        poly_r = d.sub(poly_r, tmp)
        r0 = (eval_pi - e3_s * ((eval_c + gamma) % fr.p) - e4_s) % fr.p
        r0_vec = np.zeros(len5, dtype=object)
        r0_vec[0] = r0
        poly_r = d.add_public(
            poly_r, jnp.asarray(fr.to_limbs([int(x) * fr.R % fr.p for x in r0_vec]))
        )

        # W_xi
        wxi = poly_r
        wxi = d.add(wxi, d.mul_public(fit_share(poly_a, len5), mulc(fr.one_mont((len5,)), vv[0])))
        wxi = d.add(wxi, d.mul_public(fit_share(poly_b, len5), mulc(fr.one_mont((len5,)), vv[1])))
        wxi = d.add(wxi, d.mul_public(fit_share(poly_c, len5), mulc(fr.one_mont((len5,)), vv[2])))
        wxi = d.add_public(wxi, mulc(fit(s1_coef, len5), vv[3]))
        wxi = d.add_public(wxi, mulc(fit(s2_coef, len5), vv[4]))
        const0 = (
            vv[0] * eval_a + vv[1] * eval_b + vv[2] * eval_c
            + vv[3] * eval_s1 + vv[4] * eval_s2
        ) % fr.p
        c0_vec = np.zeros(len5, dtype=object)
        c0_vec[0] = (-const0) % fr.p
        wxi = d.add_public(wxi, jnp.asarray(fr.to_limbs([int(x) * fr.R % fr.p for x in c0_vec])))
        wxi = self._div_by_x_minus(wxi, xi)

        # W_xiw
        wxiw = poly_z
        zw_c = np.zeros(jax.tree.leaves(poly_z)[0].shape[1], dtype=object)
        zw_c[0] = (-eval_zw) % fr.p
        wxiw = d.add_public(wxiw, jnp.asarray(fr.to_limbs([int(x) * fr.R % fr.p for x in zw_c])))
        wxiw = self._div_by_x_minus(wxiw, xiw)

        wcommits = d.stack_points([self._commit(zk, wxi), self._commit(zk, wxiw)])
        opened_w = d.open_point(d.g1, wcommits)
        commit_wxi, commit_wxiw = (
            self._decode_point(jax.tree.map(lambda c: c[..., i], opened_w))
            for i in range(2)
        )

        _sp.__exit__(None, None, None)
        return {
            "curve": d.curve,
            "A": commit_a,
            "B": commit_b,
            "C": commit_c,
            "Z": commit_z,
            "T1": commit_t1,
            "T2": commit_t2,
            "T3": commit_t3,
            "Wxi": commit_wxi,
            "Wxiw": commit_wxiw,
            "eval_a": eval_a,
            "eval_b": eval_b,
            "eval_c": eval_c,
            "eval_s1": eval_s1,
            "eval_s2": eval_s2,
            "eval_zw": eval_zw,
        }

    def _div_by_x_minus(self, poly_share, beta: int):
        """Synthetic division by (X - beta): q_i = -(sum_{j<=i} c_j b^j) / b^{i+1}.
        Local (prefix sums per share component). Parity: round5.rs
        div_by_zerofier with n=1."""
        d = self.d
        fr = d.fr
        m = jax.tree.leaves(poly_share)[0].shape[1]
        pows = power_table(fr, beta, m)
        binv = pow(beta, -1, fr.p)
        inv_pows = power_table(fr, binv, m)
        neg_binv_c = fr._bcast_const(
            fr._int_to_limbs_np((fr.p - binv) * fr.R % fr.p), (m,)
        )
        scaled = d.mul_public(poly_share, pows)
        pref = jax.tree.map(lambda c: fr.prefix_sums(c), scaled)
        q = d.mul_public(pref, fr.mont_mul(inv_pows, neg_binv_c))
        return d.slice_share(q, 0, m - 1)
