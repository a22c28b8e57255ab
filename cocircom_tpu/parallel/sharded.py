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
