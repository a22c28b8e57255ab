"""co-UltraHonk: the MPC twin of the plain UltraHonk prover, generic over
an MPC driver.

Parity: /root/reference/co-noir/co-ultrahonk/src/ — prover.rs :47-60,
co_oink/prover.rs (shared w4 :54, logderiv inverses :185, grand product
via the constant-round prefix trick :303-329), co_decider/co_sumcheck
(prover.rs :25-55, round.rs), co_decider/co_zeromorph/prover.rs,
parse/builder_variable.rs (public/shared circuit values).

TPU-first redesigns vs the reference:
  * relation accumulation runs the SAME formulas as the plain prover
    (relations.py) through the Pub/Sh wrapper algebra (co_alg.py) over
    whole (L, 8, E) edge tensors — every share product is ONE batched
    communication round; the reference's co relations call mul_many per
    edge (O(circuit) rounds per sumcheck round);
  * z_perm uses the Ozdemir-Boneh constant-round prefix product
    (driver.prefix_mul) instead of a sequential scan;
  * known-tau CRS commits are local evaluations at tau + one
    public-point scalar mul, opened in batches; the final KZG quotient
    commitment is q(tau)*G = pi(tau)/(tau-x)*G — no coefficient-wise
    long division on shares.

The proof bytes equal the plain prover's for the same witness and CRS
(asserted in tests): the MPC changes only WHO computes, not what.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .builder import NUM_WIRES, P, UltraCircuitBuilder
from .co_alg import CoAlg, Pub, Sh
from .proving_key import Q_LOOKUP, create_proving_key
from .relations import (
    ALL_ENTITY_NAMES,
    NUM_ALPHAS,
    PRECOMPUTED_NAMES,
    SUBRELATION_IS_LINEARLY_INDEPENDENT,
    SUBRELATION_LENGTHS,
    evaluate_relations,
)
from .sumcheck import (
    BATCHED_LENGTH,
    CONST_PROOF_SIZE_LOG_N,
    GateSeparator,
)
from .transcript import Transcript
from .zeromorph import F_NAMES, G_NAMES, G_SHIFT_NAMES

SHARED_ENTITIES = ("w_l", "w_r", "w_o", "w_4", "z_perm", "lookup_inverses")
SHARED_SHIFTS = ("w_l_shift", "w_r_shift", "w_o_shift", "w_4_shift",
                 "z_perm_shift")


def wire_index_maps(builder: UltraCircuitBuilder, n: int):
    """Trace-order variable indices per wire column — the gather the plain
    proving key performs on VALUES, kept as indices so the shared prover
    gathers share handles instead (builder gate layout is
    witness-independent for the supported circuits)."""
    from .builder import BLOCK_ORDER

    # default: the ZERO sentinel slot (appended after all real variables)
    # — the zero row and dyadic padding rows must gather value 0, not
    # variable 0
    zero_slot = len(builder.variables)
    idx = [np.full(n, zero_slot, np.int64) for _ in range(NUM_WIRES)]
    offset = 1
    for name in BLOCK_ORDER:
        blk = builder.blocks[name]
        for row in range(len(blk)):
            for w in range(NUM_WIRES):
                idx[w][row + offset] = builder.real_variable_index[
                    blk.wires[w][row]]
        offset += len(blk)
    return idx


class CoUltraHonk:
    def __init__(self, driver, crs):
        self.d = driver
        self.f = driver.fr
        self.crs = crs
        self.alg = CoAlg(driver)

    # ------------------------------------------------------------ helpers

    def _enc(self, ints) -> jnp.ndarray:
        return self.f.to_mont(jnp.asarray(self.f.to_limbs(list(ints))))

    def _commit_share(self, poly_share):
        """share of commit(poly) = poly(tau) * G (known-tau CRS)."""
        d = self.d
        s = d.evaluate_poly_public(poly_share, self.crs.tau)
        gen = d.g1.encode_points([(self.crs.g1[0].v, self.crs.g1[1].v)])
        gen = jax.tree.map(lambda c: c[..., 0], gen)
        return d.scalar_mul_public_point(d.g1, gen, s)

    def _open_points(self, point_shares: list):
        d = self.d
        stacked = d.stack_points(point_shares)
        opened = d.open_point(d.g1, stacked)
        return [
            d.g1.decode_points(
                jax.tree.map(lambda c: c[..., i : i + 1], opened))[0]
            for i in range(len(point_shares))
        ]

    def _open_frs(self, share) -> list[int]:
        vals = self.f.from_limbs(self.f.from_mont(self.d.open_many(share)))
        return [int(v) % P for v in np.atleast_1d(vals)]

    @staticmethod
    def _shift_sh(x):
        zero = jax.tree.map(
            lambda c: jnp.zeros(c.shape[:-1] + (1,), c.dtype), x)
        shifted = jax.tree.map(lambda c: c[..., 1:], x)
        return jax.tree.map(
            lambda a, b: jnp.concatenate([a, b], axis=-1), shifted, zero)

    # -------------------------------------------------------------- prove

    def prove(self, builder: UltraCircuitBuilder, witness_share) -> list[int]:
        d = self.d
        f = self.f
        alg = self.alg
        pk = create_proving_key(builder, self.crs)
        n = pk.circuit_size
        varnum = jax.tree.leaves(witness_share)[0].shape[-1]

        # shared variables vector: witness shares ++ builder extras. Extras
        # are public constants unless the builder ran in provider mode
        # (co_builder.MpcBuilderValues — e.g. shared ROM records), in which
        # case the registered share handles overwrite their slots. The
        # trailing slot is the ZERO sentinel the padding rows gather.
        extra_vals = [builder.variables[i]
                      for i in range(varnum, len(builder.variables))] + [0]
        extra = d.promote_public(self._enc(extra_vals))
        m = getattr(builder, "mpc", None)
        if m is not None and m.extra:
            order = sorted(m.extra)
            cols = d.concat_shares(*(m.extra[i] for i in order))
            slots = jnp.asarray(np.asarray(order, np.int64) - varnum)
            extra = jax.tree.map(
                lambda base, v: base.at[:, slots].set(v), extra, cols)
        vars_vec = d.concat(witness_share, extra)

        idx = wire_index_maps(builder, n)
        wires_sh = [d.gather(vars_vec, i) for i in idx]

        pub_idx = np.asarray(
            [pk.pub_inputs_offset + i for i in range(pk.num_public_inputs)],
            np.int64)
        public_inputs = self._open_frs(d.gather(wires_sh[1], pub_idx)) \
            if pk.num_public_inputs else []

        t = Transcript()
        t.send_u64("circuit_size", n)
        t.send_u64("public_input_size", pk.num_public_inputs)
        t.send_u64("pub_inputs_offset", pk.pub_inputs_offset)
        for i, x in enumerate(public_inputs):
            t.send_fr("public_input_%d" % i, x)

        for label, pt in zip(
            ("W_L", "W_R", "W_O"),
            self._open_points([self._commit_share(wires_sh[k])
                               for k in range(3)]),
        ):
            t.send_point(label, pt)

        # ---------------- eta round: w4 (+ memory records) ----------------
        eta_1, eta_2, eta_3 = t.get_challenges(["eta", "eta_two", "eta_three"])
        w_4 = wires_sh[3]
        def _pc(v, n):
            return f._bcast_const(
                f._int_to_limbs_np(v % f.p * f.R % f.p), (n,))

        if pk.memory_read_records or pk.memory_write_records:
            # shared twin of the plain oink fill (prover.py:92-97): at
            # memory rows w_4 += w_l*eta + w_r*eta_2 + w_o*eta_3 (+1 for
            # writes); etas are public, so this is LOCAL on shares
            def _mfill(w4v, rows, add_one):
                if not rows:
                    return w4v
                r = np.asarray(rows, np.int64)
                combo = d.add(
                    d.gather(w4v, r),
                    d.add(
                        d.mul_public(d.gather(wires_sh[0], r),
                                     _pc(eta_1, len(rows))),
                        d.add(
                            d.mul_public(d.gather(wires_sh[1], r),
                                         _pc(eta_2, len(rows))),
                            d.mul_public(d.gather(wires_sh[2], r),
                                         _pc(eta_3, len(rows))),
                        ),
                    ),
                )
                if add_one:
                    combo = d.add_public(combo, _pc(1, len(rows)))
                return jax.tree.map(
                    lambda base, v: base.at[:, jnp.asarray(r)].set(v),
                    w4v, combo)

            w_4 = _mfill(w_4, pk.memory_read_records, 0)
            w_4 = _mfill(w_4, pk.memory_write_records, 1)
        mixed = getattr(pk, "memory_mixed_records", None)
        if mixed:
            # oblivious-sorted RAM rows: w_4 += eta-combo + [access] where
            # the access type is a SHARE (secret sort permutation)
            r = np.asarray(mixed, np.int64)
            acc_vec = d.concat_shares(*m.mixed_access)
            combo = d.add(
                d.gather(w_4, r),
                d.add(
                    acc_vec,
                    d.add(
                        d.mul_public(d.gather(wires_sh[0], r),
                                     _pc(eta_1, len(mixed))),
                        d.add(
                            d.mul_public(d.gather(wires_sh[1], r),
                                         _pc(eta_2, len(mixed))),
                            d.mul_public(d.gather(wires_sh[2], r),
                                         _pc(eta_3, len(mixed))),
                        ),
                    ),
                ),
            )
            w_4 = jax.tree.map(
                lambda base, v: base.at[:, jnp.asarray(r)].set(v),
                w_4, combo)
        read_counts, read_tags = pk.witness[4], pk.witness[5]
        rc_pub = self._enc(read_counts)
        rt_pub = self._enc(read_tags)
        for label, pt in zip(
            ("LOOKUP_READ_COUNTS", "LOOKUP_READ_TAGS", "W_4"),
            self._open_points([
                self._commit_share(d.promote_public(rc_pub)),
                self._commit_share(d.promote_public(rt_pub)),
                self._commit_share(w_4),
            ]),
        ):
            t.send_point(label, pt)

        # ---------------- beta/gamma: logderiv inverses ----------------
        beta, gamma = t.get_challenges(["beta", "gamma"])
        pre = pk.precomputed
        pre_pub = {name: self._enc(pre[i])
                   for i, name in enumerate(PRECOMPUTED_NAMES)}

        w = {k: Sh(alg, v) for k, v in zip(
            ("w_l", "w_r", "w_o", "w_4"), (*wires_sh[:3], w_4))}
        ws = {k + "_shift": Sh(alg, self._shift_sh(v.v)) for k, v in w.items()}
        q = {k: Pub(alg, v) for k, v in pre_pub.items()}
        g_c = alg.pub_of_int(gamma)
        e1c, e2c, e3c = (alg.pub_of_int(eta_1), alg.pub_of_int(eta_2),
                         alg.pub_of_int(eta_3))

        read_term = (
            (w["w_l"] + g_c + q["q_r"] * ws["w_l_shift"])
            + (w["w_r"] + q["q_m"] * ws["w_r_shift"]) * e1c
            + (w["w_o"] + q["q_c"] * ws["w_o_shift"]) * e2c
            + q["q_o"] * e3c
        )
        write_term = (q["table_1"] + g_c + q["table_2"] * e1c
                      + q["table_3"] * e2c + q["table_4"] * e3c)
        prod = read_term * write_term  # Sh x Pub: local

        active = np.asarray(
            [i for i in range(n)
             if pre[Q_LOOKUP][i] == 1 or read_tags[i] == 1], np.int64)
        inv_active = d.inv_many(d.gather(prod.v, active))
        zeros = jax.tree.map(lambda c: jnp.zeros_like(c), prod.v)
        lookup_inverses = jax.tree.map(
            lambda z, s: z.at[..., active].set(s), zeros, inv_active)
        t.send_point("LOOKUP_INVERSES",
                     self._open_points([self._commit_share(lookup_inverses)])[0])

        # ---------------- grand product ----------------
        from .prover import compute_public_input_delta

        public_input_delta = compute_public_input_delta(
            beta, gamma, public_inputs, n, pk.pub_inputs_offset)
        b_c = alg.pub_of_int(beta)
        num = None
        den = None
        for col, wn in enumerate(("w_l", "w_r", "w_o", "w_4")):
            fac_n = w[wn] + q[PRECOMPUTED_NAMES[17 + col]] * b_c + g_c
            fac_d = w[wn] + q[PRECOMPUTED_NAMES[13 + col]] * b_c + g_c
            num = fac_n if num is None else num * fac_n
            den = fac_d if den is None else den * fac_d
        pref_num = d.prefix_mul(num.v)
        pref_den = d.prefix_mul(den.v)
        inv_den = d.inv_many(jax.tree.map(lambda c: c[..., : n - 1], pref_den))
        z_tail = d.mul_vec(
            jax.tree.map(lambda c: c[..., : n - 1], pref_num), inv_den)
        z_zero = jax.tree.map(
            lambda c: jnp.zeros(c.shape[:-1] + (1,), c.dtype), z_tail)
        z_perm = jax.tree.map(
            lambda a, b: jnp.concatenate([a, b], axis=-1), z_zero, z_tail)
        t.send_point("Z_PERM",
                     self._open_points([self._commit_share(z_perm)])[0])

        alphas = [t.get_challenge("alpha_%d" % i) for i in range(NUM_ALPHAS)]
        gate_challenges = [t.get_challenge("Sumcheck:gate_challenge_%d" % i)
                           for i in range(CONST_PROOF_SIZE_LOG_N)]

        rp = {"eta_1": eta_1, "eta_2": eta_2, "eta_3": eta_3, "beta": beta,
              "gamma": gamma, "public_input_delta": public_input_delta,
              "alphas": alphas, "gate_challenges": gate_challenges}

        # ---------------- entity polynomials ----------------
        pub_polys = dict(pre_pub)
        pub_polys["lookup_read_counts"] = rc_pub
        pub_polys["lookup_read_tags"] = rt_pub
        for k in ("table_1", "table_2", "table_3", "table_4"):
            pub_polys[k + "_shift"] = jnp.concatenate(
                [pub_polys[k][..., 1:],
                 jnp.zeros(pub_polys[k].shape[:-1] + (1,),
                           pub_polys[k].dtype)], axis=-1)
        sh_polys = {"w_l": wires_sh[0], "w_r": wires_sh[1],
                    "w_o": wires_sh[2], "w_4": w_4, "z_perm": z_perm,
                    "lookup_inverses": lookup_inverses}
        for k in SHARED_ENTITIES[:5]:
            sh_polys[k + "_shift"] = self._shift_sh(sh_polys[k])

        claimed, challenges = self._co_sumcheck(pub_polys, sh_polys, rp, n, t)
        self._co_zeromorph(pub_polys, sh_polys, claimed, challenges, n, t)
        return t.proof_data

    # --------------------------------------------------------- co-sumcheck

    def _extend_pub(self, tensor, round_size):
        f = self.f
        a = tensor[..., 0:round_size:2]
        b = tensor[..., 1:round_size:2]
        dd = f.sub(b, a)
        rows = [a]
        cur = a
        for _ in range(1, BATCHED_LENGTH):
            cur = f.add(cur, dd)
            rows.append(cur)
        return jnp.stack(rows, axis=1)  # (L, 8, E)

    def _extend_sh(self, share, round_size):
        return jax.tree.map(lambda c: self._extend_pub(c, round_size), share)

    def _co_sumcheck(self, pub_polys, sh_polys, rp, n, t: Transcript):
        """Shape-stable rounds: after round 0 every tensor keeps the fixed
        padded length n/2 (zeros beyond the live window), so the whole
        sumcheck compiles exactly TWO shape sets regardless of log n —
        fewer XLA programs (the CPU backend's concurrent-compile hazard)
        and fewer, larger device dispatches on the TPU. Padded lanes hold
        zero shares; the per-edge beta-product scaling vector is zero
        there, and the one unscaled (linearly dependent) subrelation
        evaluates to zero on all-zero entities."""
        d = self.d
        f = self.f
        alg = self.alg
        log_n = n.bit_length() - 1
        gs = GateSeparator(rp["gate_challenges"], log_n)
        rp_w = {k: alg.pub_of_int(rp[k]) for k in
                ("eta_1", "eta_2", "eta_3", "beta", "gamma",
                 "public_input_delta")}
        alphas_full = [1] + list(rp["alphas"])

        challenges = []
        live = n          # live window inside the (fixed-size) arrays
        cur_pub = dict(pub_polys)
        cur_sh = dict(sh_polys)
        for round_idx in range(log_n):
            E_live = live // 2
            E = jax.tree.leaves(next(iter(cur_sh.values())))[0].shape[-1] // 2
            ents = {}
            for k, v in cur_pub.items():
                ents[k] = Pub(alg, self._extend_pub(v, 2 * E))
            for k, v in cur_sh.items():
                ents[k] = Sh(alg, self._extend_sh(v, 2 * E))
            subvals = evaluate_relations(ents, rp_w)

            scal_ints = [gs.beta_products[e * gs.periodicity]
                         if e < E_live else 0 for e in range(E)]
            scal = self._enc(scal_ints)[:, None, :]  # (L, 1, E)
            pow_cur = gs.current()
            ext_rand = [(1 + k * (pow_cur - 1)) % P
                        for k in range(BATCHED_LENGTH)]

            uni_share = None
            uni_pub = None
            for si, v in enumerate(subvals):
                indep = SUBRELATION_IS_LINEARLY_INDEPENDENT[si]
                if isinstance(v, Sh):
                    x = d.mul_public(v.v, scal) if indep else v.v
                    summed = jax.tree.map(lambda c: f.sum(c, axis=2), x)
                else:
                    x = f.mont_mul(v.v, scal) if indep else v.v
                    summed = f.sum(x, axis=2)

                ln = SUBRELATION_LENGTHS[si]
                # public linear map: truncate to ln evals, barycentric
                # extend to 8, folded with alpha/pow factors
                from .sumcheck import _EXT_CACHE, _extension_matrix

                key = (ln, BATCHED_LENGTH)
                if key not in _EXT_CACHE:
                    _EXT_CACHE[key] = _extension_matrix(ln, BATCHED_LENGTH)
                coefs = [[0] * ln for _ in range(BATCHED_LENGTH)]
                for k in range(ln):
                    coefs[k][k] = 1
                for k, row in enumerate(_EXT_CACHE[key]):
                    coefs[ln + k] = list(row)
                for k in range(BATCHED_LENGTH):
                    s = alphas_full[si]
                    if indep:
                        s = s * ext_rand[k] % P \
                            * gs.partial_evaluation_result % P
                    coefs[k] = [c * s % P for c in coefs[k]]
                cmat = self._enc(
                    [c for row in coefs for c in row]).reshape(
                        f.L, BATCHED_LENGTH, ln)
                if isinstance(v, Sh):
                    contrib = jax.tree.map(
                        lambda c: f.sum(
                            f.mont_mul(cmat, c[:, None, :ln]), axis=2),
                        summed)
                    uni_share = contrib if uni_share is None else d.add(
                        uni_share, contrib)
                else:
                    vals = f.sum(f.mont_mul(cmat, summed[:, None, :ln]),
                                 axis=2)
                    uni_pub = vals if uni_pub is None else f.add(
                        uni_pub, vals)

            if uni_pub is not None:
                uni_share = d.add_public(uni_share, uni_pub)
            univariate = self._open_frs(uni_share)
            t.send_fr_vec("Sumcheck:univariate_%d" % round_idx, univariate)
            u = t.get_challenge("Sumcheck:u_%d" % round_idx)
            challenges.append(u)

            # partial evaluation, padded back to the FIXED length n/2 so
            # rounds >= 1 share one compiled shape set
            uc = self._enc([u])  # (L, 1)
            fixed = n // 2

            def pe_pub(v):
                a = v[..., 0::2]
                b = v[..., 1::2]
                out = f.add(a, f.mont_mul(f.sub(b, a), uc))
                pad = fixed - out.shape[-1]
                if pad > 0:
                    out = jnp.pad(out, [(0, 0)] * (out.ndim - 1) + [(0, pad)])
                return out

            cur_pub = {k: pe_pub(v) for k, v in cur_pub.items()}
            cur_sh = {k: jax.tree.map(pe_pub, v) for k, v in cur_sh.items()}
            gs.partially_evaluate(u)
            live >>= 1

        zero_univariate = [0] * BATCHED_LENGTH
        for idxr in range(log_n, CONST_PROOF_SIZE_LOG_N):
            t.send_fr_vec("Sumcheck:univariate_%d" % idxr, zero_univariate)
            challenges.append(t.get_challenge("Sumcheck:u_%d" % idxr))

        sh_names = [nm for nm in ALL_ENTITY_NAMES if nm in cur_sh]
        stacked = d.stack_shares([
            jax.tree.map(lambda c: c[..., 0], cur_sh[nm]) for nm in sh_names])
        opened = self._open_frs(stacked)
        claimed = {}
        it = iter(opened)
        for nm in ALL_ENTITY_NAMES:
            if nm in cur_sh:
                claimed[nm] = next(it)
            else:
                claimed[nm] = int(np.atleast_1d(
                    f.from_limbs(f.from_mont(cur_pub[nm][..., 0])))[0]) % P
        t.send_fr_vec("Sumcheck:evaluations",
                      [claimed[nm] for nm in ALL_ENTITY_NAMES])
        return claimed, challenges

    # -------------------------------------------------------- co-zeromorph

    def _co_zeromorph(self, pub_polys, sh_polys, claimed, challenges, n,
                      t: Transcript):
        d = self.d
        f = self.f
        log_n = n.bit_length() - 1
        u = challenges

        rho = t.get_challenge("rho")
        batched_eval = 0
        scalar = 1
        pub_acc = jnp.zeros_like(pub_polys["q_m"])
        sh_acc = None
        for name in F_NAMES:
            sc = self._enc([scalar])
            if name in sh_polys:
                term = d.mul_public(sh_polys[name], sc)
                sh_acc = term if sh_acc is None else d.add(sh_acc, term)
            else:
                pub_acc = f.add(pub_acc, f.mont_mul(pub_polys[name], sc))
            batched_eval = (batched_eval + scalar * claimed[name]) % P
            scalar = scalar * rho % P
        f_batched = d.add_public(sh_acc, pub_acc)
        pub_acc = jnp.zeros_like(pub_polys["q_m"])
        sh_acc = None
        for name, shift_name in zip(G_NAMES, G_SHIFT_NAMES):
            sc = self._enc([scalar])
            if name in sh_polys:
                term = d.mul_public(sh_polys[name], sc)
                sh_acc = term if sh_acc is None else d.add(sh_acc, term)
            else:
                pub_acc = f.add(pub_acc, f.mont_mul(pub_polys[name], sc))
            batched_eval = (batched_eval + scalar * claimed[shift_name]) % P
            scalar = scalar * rho % P
        g_batched = d.add_public(sh_acc, pub_acc)

        # f = f_batched + shift(g_batched)
        g_shift = jax.tree.map(
            lambda c: jnp.concatenate(
                [c[..., 1:], jnp.zeros(c.shape[:-1] + (1,), c.dtype)],
                axis=-1), g_batched)
        f_poly = d.add(f_batched, g_shift)

        # multilinear quotients (local linear recursion on shares)
        quotients = []
        g_cur = f_poly
        size_q = 1 << (log_n - 1)
        half = lambda x, lo, hi: jax.tree.map(lambda c: c[..., lo:hi], x)
        qs = [None] * log_n
        qs[log_n - 1] = d.sub(half(g_cur, size_q, 2 * size_q),
                              half(g_cur, 0, size_q))
        g_cur = half(g_cur, 0, size_q)
        for k in range(1, log_n):
            index = log_n - k
            uc = self._enc([u[index]])
            f_k = d.add(g_cur, d.mul_public(qs[index], uc))
            size_q >>= 1
            qs[index - 1] = d.sub(half(f_k, size_q, 2 * size_q),
                                  half(f_k, 0, size_q))
            g_cur = half(f_k, 0, size_q)
        quotients = qs

        com_qk = self._open_points([self._commit_share(q) for q in quotients])
        for idx, pt in enumerate(com_qk):
            t.send_point("ZM:C_q_%d" % idx, pt)
        gen = (self.crs.g1[0].v, self.crs.g1[1].v)
        for idx in range(log_n, CONST_PROOF_SIZE_LOG_N):
            t.send_point("ZM:C_q_%d" % idx, gen)

        y = t.get_challenge("ZM:y")
        # batched lifted-degree quotient: sum_k y^k X^{n - d_k - 1} q_k —
        # known-tau commit only needs its evaluation at tau, but zeta_x
        # needs coefficients, so build it as padded share concat
        batched_q = None
        for k, qk in enumerate(quotients):
            deg_k = (1 << k) - 1
            offset = n - deg_k - 1
            yk = self._enc([pow(y, k, P)])
            term = d.mul_public(qk, yk)
            padded = jax.tree.map(
                lambda c: jnp.pad(c, [(0, 0)] * (c.ndim - 1)
                                  + [(offset, n - offset - (deg_k + 1))]),
                term)
            batched_q = padded if batched_q is None else d.add(
                batched_q, padded)
        t.send_point("ZM:C_q",
                     self._open_points([self._commit_share(batched_q)])[0])

        x, z = t.get_challenges(["ZM:x", "ZM:z"])

        # zeta_x = batched_q - sum_k y^k x^{n-d_k-1} q_k (padded low)
        zeta_x = batched_q
        for k, qk in enumerate(quotients):
            deg_k = (1 << k) - 1
            s = (-(pow(y, k, P) * pow(x, n - deg_k - 1, P))) % P
            sc = self._enc([s])
            term = d.mul_public(qk, sc)
            padded = jax.tree.map(
                lambda c: jnp.pad(c, [(0, 0)] * (c.ndim - 1)
                                  + [(0, n - (deg_k + 1))]), term)
            zeta_x = d.add(zeta_x, padded)

        # Z_x = g_batched + x f_batched - v x Phi_n(x) e_0
        #       - x sum_k (x^{2^k} Phi_{n-k-1} - u_k Phi_{n-k}) q_k
        phi_numerator = (pow(x, n, P) - 1) % P
        phi_n_x = phi_numerator * pow(x - 1, -1, P) % P
        xc = self._enc([x])
        z_x = d.add(g_batched, d.mul_public(f_batched, xc))
        v_shift = (-(batched_eval * x % P * phi_n_x)) % P
        e0 = np.zeros(n, dtype=object)
        e0[0] = v_shift
        z_x = d.add_public(z_x, self._enc(list(e0)))
        for k, qk in enumerate(quotients):
            x_power = pow(x, 1 << k, P)
            phi_1 = phi_numerator * pow(pow(x, 1 << (k + 1), P) - 1, -1, P) % P
            phi_2 = phi_numerator * pow(x_power - 1, -1, P) % P
            s = (-(((x_power * phi_1 - phi_2 * u[k]) % P) * x)) % P
            sc = self._enc([s])
            term = d.mul_public(qk, sc)
            padded = jax.tree.map(
                lambda c: jnp.pad(c, [(0, 0)] * (c.ndim - 1)
                                  + [(0, n - c.shape[-1])]), term)
            z_x = d.add(z_x, padded)

        zc = self._enc([z])
        pi = d.add(zeta_x, d.mul_public(z_x, zc))

        # KZG open: commit((pi - 0)/(X - x)) = pi(tau)/(tau - x) * G
        s_pi = d.evaluate_poly_public(pi, self.crs.tau)
        inv_txc = self._enc([pow((self.crs.tau - x) % P, -1, P)])[:, 0]
        s_q = d.mul_public(s_pi, inv_txc)
        gen_enc = d.g1.encode_points([gen])
        gen_enc = jax.tree.map(lambda c: c[..., 0], gen_enc)
        w_pt = d.scalar_mul_public_point(d.g1, gen_enc, s_q)
        t.send_point("KZG:W", self._open_points([w_pt])[0])
