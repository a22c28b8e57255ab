"""Multi-chip sharding: MSM and NTT engines over a jax Mesh.

The scaling axes here play the role DP/TP play in an ML stack
(SURVEY.md section 2.6 #4): points/constraints are data-partitioned across
chips, bucket partials ride ICI via all_gather, and the elementwise field
ops shard trivially. Party parallelism stays at the process level (each MPC
party owns its own mesh); share components batch on a leading axis.

Product wiring (VERDICT r3 #2): `ShardedMSMEngine` / `ShardedNTTEngine`
expose the SAME `.msm(points, scalars)` / `.ntt/.intt/.coset_shift`
surface as the single-chip engines, and `mpc.driver.Driver` swaps them in
when constructed with a mesh of >1 device — so `Rep3Driver(curve, net,
mesh=...)` routes every prover MSM/FFT through the sharded path (the
reference's structural analogue: FFT/MSM providers ARE the protocol-level
compute interface, /root/reference/mpc-core/src/traits.rs:535-584).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..fields.params import CurveParams, HostField
from ..ops.curve import CurveOps, ProjPoint, g1_ops
from ..ops.field import Field, get_field
from ..ops.msm import MSM, msm_engine


def shard_points(mesh: Mesh, pts: ProjPoint, axis: str = "data") -> ProjPoint:
    sh = NamedSharding(mesh, P(None, axis))
    return jax.tree.map(lambda c: jax.device_put(c, sh), pts)


# --------------------------------------------------------------- MSM


class ShardedMSMEngine:
    """Drop-in for ops.msm.MSM when the driver holds a mesh: points and
    scalars are data-partitioned along `axis`, each device runs the fused
    Pippenger (`MSM._msm_fused`), the single-point partials all_gather over
    ICI and combine locally. Sizes below ~4 points/device fall back to the
    single-chip engine (sharding overhead dominates)."""

    def __init__(self, ops: CurveOps, mesh: Mesh, axis: str = "data",
                 scalar_bits: int | None = None):
        self.ops = ops
        self.mesh = mesh
        self.axis = axis
        self.scalar_bits = scalar_bits
        self.local = msm_engine(ops, scalar_bits=scalar_bits)
        self.n_dev = mesh.devices.size
        self._fns: dict = {}

    def _build(self, nbits: int, c: int, tdef):
        eng, ops, axis = self.local, self.ops, self.axis

        def local_fn(points, scalars):
            partial = eng._msm_fused(points, scalars, nbits, c)
            gathered = jax.tree.map(
                lambda cc: jax.lax.all_gather(cc, axis, axis=1, tiled=False),
                partial,
            )
            return ops.sum(gathered, axis=1)

        pts0 = jax.tree.unflatten(tdef, [0] * tdef.num_leaves)
        pspec = jax.tree.map(lambda _: P(None, axis), pts0)
        outspec = jax.tree.map(lambda _: P(), ProjPoint(0, 0, 0))
        return jax.jit(
            jax.shard_map(
                local_fn,
                mesh=self.mesh,
                in_specs=(pspec, P(None, axis)),
                out_specs=outspec,
                check_vma=False,
            )
        )

    def msm(self, points: ProjPoint, scalar_limbs, nbits: int | None = None) -> ProjPoint:
        n = scalar_limbs.shape[1]
        nbits = nbits or self.scalar_bits or 16 * scalar_limbs.shape[0]
        if n < 4 * self.n_dev:
            return self.local.msm(points, scalar_limbs, nbits)
        # pad to a device multiple: zero scalars recode to all-zero digits,
        # which never enter a bucket, so the padded lanes contribute nothing
        pad = (-n) % self.n_dev
        if pad:
            scalar_limbs = jnp.pad(scalar_limbs, ((0, 0), (0, pad)))
            points = jax.tree.map(
                lambda cc: jnp.pad(cc, ((0, 0), (0, pad))), points
            )
        c = self.local._window_c((n + pad) // self.n_dev)
        tdef = jax.tree.structure(points)
        key = (nbits, c, tdef)
        if key not in self._fns:
            self._fns[key] = self._build(nbits, c, tdef)
        return self._fns[key](points, scalar_limbs)


def sharded_msm(ops: CurveOps, mesh: Mesh, axis: str = "data",
                scalar_bits: int | None = None):
    """Legacy helper: a jitted sharded MSM fn(points, scalars) -> ProjPoint.
    Prefer ShardedMSMEngine (what the driver wires in)."""
    eng = ShardedMSMEngine(ops, mesh, axis, scalar_bits)

    def fn(points, scalars):
        return eng.msm(points, scalars)

    return fn


# --------------------------------------------------------------- NTT


def _ntt_last_axis(f: Field, eng, a, logn: int, inverse: bool):
    """Batched radix-2 NTT over the LAST axis of (L, B, n) (inputs in
    natural order; the bit-reversal permutation is applied here)."""
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


def _build_fourstep(f: Field, host: HostField, mesh: Mesh, axis: str,
                    logn: int, inverse: bool):
    """Distributed four-step (I)NTT program for one size.

    n = U*V is viewed as a (U, V) matrix: length-U column NTTs (V axis
    sharded -> fully local), an omega^{±v*k1} twiddle pass, length-V row
    NTTs (U axis sharded), and the output transpose. Shardings are declared
    with with_sharding_constraint and XLA GSPMD inserts the all_to_all
    transposes over ICI — the scaling-book recipe, not hand-written
    collectives. Bit-exact vs the single-device radix-2 engine (same
    snarkjs root tower; the inverse path scales by (1/U)(1/V) = 1/n via the
    two sub-NTTs' own n_inv factors)."""
    from ..ops.ntt import ntt_engine

    eng = ntt_engine(f, host)
    logu = logn // 2
    logv = logn - logu
    U, V = 1 << logu, 1 << logv
    # warm twiddle caches eagerly (lru caches must not build under trace)
    eng._warm(logu, inverse)
    eng._warm(logv, inverse)
    root = host.root_of_unity(logn)
    if inverse:
        root = host.inv(root)
    eng._power_table(root, 1 << logn)

    col = NamedSharding(mesh, P(None, None, axis))   # shard V
    row = NamedSharding(mesh, P(None, axis, None))   # shard U
    flat = NamedSharding(mesh, P(None, axis))

    import numpy as np

    k1 = np.arange(U, dtype=np.int64)[:, None]
    v = np.arange(V, dtype=np.int64)[None, :]
    tw_idx = jnp.asarray((k1 * v).reshape(-1).astype(np.int32))

    def fn(a):
        ptab = eng._power_table(root, 1 << logn)
        twiddle = jnp.take(ptab, tw_idx, axis=1).reshape(f.L, U, V)
        M = a.reshape(f.L, U, V)
        M = jax.lax.with_sharding_constraint(M, col)
        # step 1: column NTTs (length U) — transform axis 1
        B = _ntt_last_axis(f, eng, M.transpose(0, 2, 1), logu, inverse)
        B = B.transpose(0, 2, 1)  # (L, U, V), element [k1, v]
        # step 2: twiddle by omega^{±v*k1}
        B = f.mont_mul(B, twiddle)
        B = jax.lax.with_sharding_constraint(B, row)
        # step 3: row NTTs (length V)
        X = _ntt_last_axis(f, eng, B, logv, inverse)  # element [k1, k2]
        # step 4: output order y[k2*U + k1]
        y = X.transpose(0, 2, 1).reshape(f.L, 1 << logn)
        return jax.lax.with_sharding_constraint(y, flat)

    return jax.jit(fn)


class ShardedNTTEngine:
    """Drop-in for ops.ntt.NTTEngine when the driver holds a mesh: the
    four-step decomposition above for ntt/intt; coset_shift is elementwise
    (data-parallel under GSPMD) and delegates to the local engine. Sizes
    too small to cover the mesh (either sub-NTT axis < n_dev) fall back to
    the single-chip engine."""

    def __init__(self, f: Field, host: HostField, mesh: Mesh,
                 axis: str = "data"):
        from ..ops.ntt import ntt_engine

        self.f = f
        self.host = host
        self.mesh = mesh
        self.axis = axis
        self.local = ntt_engine(f, host)
        self.n_dev = mesh.devices.size
        # logn//2 >= log2(n_dev) so both the U and V axes cover the mesh
        self.min_log = 2 * max((self.n_dev - 1).bit_length(), 1)
        self._fns: dict = {}

    def _fn(self, logn: int, inverse: bool):
        key = (logn, inverse)
        if key not in self._fns:
            self._fns[key] = _build_fourstep(
                self.f, self.host, self.mesh, self.axis, logn, inverse
            )
        return self._fns[key]

    def _route(self, a, inverse: bool):
        n = a.shape[1]
        logn = n.bit_length() - 1
        assert 1 << logn == n, "size must be a power of two"
        if logn < self.min_log:
            return (self.local.intt if inverse else self.local.ntt)(a)
        return self._fn(logn, inverse)(a)

    def ntt(self, a):
        return self._route(a, False)

    def intt(self, a):
        return self._route(a, True)

    def coset_shift(self, a, g: int | None = None):
        return self.local.coset_shift(a, g)


def sharded_ntt(f: Field, host, mesh: Mesh, axis: str = "data"):
    """Legacy helper: forward-only distributed NTT fn. Prefer
    ShardedNTTEngine (what the driver wires in)."""
    eng = ShardedNTTEngine(f, host, mesh, axis)
    eng.min_log = 1  # the legacy helper always shards

    def ntt(a):
        return eng.ntt(a)

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
    nbits = curve.fr.p.bit_length()
    eng = msm_engine(ops, scalar_bits=nbits)

    def local(a_vec, b_vec, c_vec, px, py, pz):
        ab = f.mont_mul(a_vec, b_vec)
        h = f.sub(ab, c_vec)
        scal = f.from_mont(h)
        points = ProjPoint(px, py, pz)
        partial = eng._msm_fused(points, scal, nbits, eng._window_c(scal.shape[1]))
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
