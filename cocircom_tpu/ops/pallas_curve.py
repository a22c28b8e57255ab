"""Pallas TPU kernel: fused complete EC point addition (a=0 curves).

The MSM wave loop (ops/msm.py) and every point-reduction path issue EC adds
on wide batches. The generic CurveOps.add composes 3 stacked Pallas
mont_muls with ~30 XLA elementwise ops in between, so one batched add makes
~25 HBM round trips of coordinate-sized tensors. This kernel runs the WHOLE
Renes-Costello-Batina Algorithm 7 (complete, a=0; same formula as
CurveOps.add — eprint 2015/1060) inside one Pallas program: 14 Montgomery
multiplies + all modular add/sub chains on VMEM-resident (L, tile) blocks.
HBM traffic drops to reading 6 coords + writing 3 (~9 tensors vs ~85).

Two variants:
  * ec_add_pallas(ops, p, q)          — drop-in for CurveOps.add on (L, N)
  * ec_wave_add_pallas(ops, acc, pt, neg, valid)
        — the MSM wave update: q.y is negated where `neg`, and lanes where
          NOT `valid` pass `acc` through unchanged; folds the two selects
          of MSM._wave_step into the same kernel.

Share-local like everything in ops/ (MSMProvider parity:
/root/reference/mpc-core/src/traits.rs:561) — the same kernel serves
Plain/REP3/Shamir provers, which run it per share component.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .curve import ProjPoint
from .pallas_field import (
    MAX_TILE,
    _add_mod,
    _byte_mats,
    _mont_core,
    _mont_core_mxu,
    _sub_mod,
)


def _ec_add_core(P, Q, L, p_limbs, np_limbs, b3_limbs, ks):
    """RCB16 Algorithm 7 on (L, T) canonical Montgomery limb blocks."""

    def mul(a, b):
        return _mont_core(a, b, L, p_limbs, np_limbs, ks)

    def mul_b3(a):
        # constant operand -> scalar-literal multiplies (no captured arrays)
        return _mont_core(a, b3_limbs, L, p_limbs, np_limbs, ks)

    def add(x, y):
        return _add_mod(x, y, p_limbs, L)

    def sub(x, y):
        return _sub_mod(x, y, p_limbs, L)

    x1, y1, z1 = P
    x2, y2, z2 = Q
    m_xx = mul(x1, x2)
    m_yy = mul(y1, y2)
    m_zz = mul(z1, z2)
    t3 = sub(sub(mul(add(x1, y1), add(x2, y2)), m_xx), m_yy)  # X1Y2+X2Y1
    t4 = sub(sub(mul(add(y1, z1), add(y2, z2)), m_yy), m_zz)  # Y1Z2+Y2Z1
    xz = sub(sub(mul(add(x1, z1), add(x2, z2)), m_xx), m_zz)  # X1Z2+X2Z1
    t0 = add(add(m_xx, m_xx), m_xx)  # 3 X1X2
    t2 = mul_b3(m_zz)  # b3 Z1Z2
    z3p = add(m_yy, t2)
    t1 = sub(m_yy, t2)
    y3 = mul_b3(xz)  # b3 (X1Z2+X2Z1)
    X3 = sub(mul(t3, t1), mul(t4, y3))
    Y3 = add(mul(t1, z3p), mul(y3, t0))
    Z3 = add(mul(z3p, t4), mul(t0, t3))
    return X3, Y3, Z3


def _make_ec_add_kernel(L, p_limbs, np_limbs, b3_limbs, ks):
    p_limbs = [int(v) for v in p_limbs]
    np_limbs = [int(v) for v in np_limbs]
    b3_limbs = [int(v) for v in b3_limbs]

    def kernel(x1, y1, z1, x2, y2, z2, ox, oy, oz):
        X3, Y3, Z3 = _ec_add_core(
            (x1[:], y1[:], z1[:]), (x2[:], y2[:], z2[:]),
            L, p_limbs, np_limbs, b3_limbs, ks,
        )
        ox[:] = X3
        oy[:] = Y3
        oz[:] = Z3

    return kernel


def _make_ec_wave_kernel(L, p_limbs, np_limbs, b3_limbs, ks):
    p_limbs = [int(v) for v in p_limbs]
    np_limbs = [int(v) for v in np_limbs]
    b3_limbs = [int(v) for v in b3_limbs]

    def kernel(x1, y1, z1, x2, y2, z2, neg, valid, ox, oy, oz):
        a = (x1[:], y1[:], z1[:])
        zero = jnp.zeros_like(x2[:])
        y2n = jnp.where(
            neg[:] != 0, _sub_mod(zero, y2[:], p_limbs, L), y2[:]
        )
        X3, Y3, Z3 = _ec_add_core(
            a, (x2[:], y2n, z2[:]), L, p_limbs, np_limbs, b3_limbs, ks,
        )
        keep = valid[:] != 0
        ox[:] = jnp.where(keep, X3, a[0])
        oy[:] = jnp.where(keep, Y3, a[1])
        oz[:] = jnp.where(keep, Z3, a[2])

    return kernel


@functools.lru_cache(maxsize=None)
def _ec_add_call(field, b3_limbs, n, tile, interpret, ks):
    L = field.L
    kernel = _make_ec_add_kernel(L, field.p_limbs, field.nprime_limbs, b3_limbs, ks)
    spec = pl.BlockSpec((L, tile), lambda i: (0, i), memory_space=pltpu.VMEM)
    shape = jax.ShapeDtypeStruct((L, n), jnp.uint32)
    return pl.pallas_call(
        kernel,
        out_shape=(shape, shape, shape),
        grid=(n // tile,),
        in_specs=[spec] * 6,
        out_specs=(spec, spec, spec),
        interpret=bool(interpret),
        compiler_params=pltpu.CompilerParams(dimension_semantics=("arbitrary",))
        if not interpret
        else None,
    )


@functools.lru_cache(maxsize=None)
def _ec_add_call3(field, b3_limbs, nblk, interpret, ks):
    from .pallas_field import LANES, SUBL

    L = field.L
    kernel = _make_ec_add_kernel(
        L, field.p_limbs, field.nprime_limbs, b3_limbs, ks
    )
    spec = pl.BlockSpec(
        (L, SUBL, LANES), lambda i: (0, i, 0), memory_space=pltpu.VMEM
    )
    shape = jax.ShapeDtypeStruct((L, nblk, LANES), jnp.uint32)
    return pl.pallas_call(
        kernel,
        out_shape=(shape, shape, shape),
        grid=(nblk // SUBL,),
        in_specs=[spec] * 6,
        out_specs=(spec, spec, spec),
        interpret=bool(interpret),
        compiler_params=pltpu.CompilerParams(dimension_semantics=("arbitrary",))
        if not interpret
        else None,
    )


@functools.lru_cache(maxsize=None)
def _ec_wave_call3(field, b3_limbs, nblk, interpret, ks):
    from .pallas_field import LANES, SUBL

    L = field.L
    kernel = _make_ec_wave_kernel(
        L, field.p_limbs, field.nprime_limbs, b3_limbs, ks
    )
    spec = pl.BlockSpec(
        (L, SUBL, LANES), lambda i: (0, i, 0), memory_space=pltpu.VMEM
    )
    mspec = pl.BlockSpec(
        (SUBL, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    shape = jax.ShapeDtypeStruct((L, nblk, LANES), jnp.uint32)
    return pl.pallas_call(
        kernel,
        out_shape=(shape, shape, shape),
        grid=(nblk // SUBL,),
        in_specs=[spec] * 6 + [mspec, mspec],
        out_specs=(spec, spec, spec),
        interpret=bool(interpret),
        compiler_params=pltpu.CompilerParams(dimension_semantics=("arbitrary",))
        if not interpret
        else None,
    )


@functools.lru_cache(maxsize=None)
def _ec_wave_call(field, b3_limbs, n, tile, interpret, ks):
    L = field.L
    kernel = _make_ec_wave_kernel(L, field.p_limbs, field.nprime_limbs, b3_limbs, ks)
    spec = pl.BlockSpec((L, tile), lambda i: (0, i), memory_space=pltpu.VMEM)
    mspec = pl.BlockSpec((1, tile), lambda i: (0, i), memory_space=pltpu.VMEM)
    shape = jax.ShapeDtypeStruct((L, n), jnp.uint32)
    return pl.pallas_call(
        kernel,
        out_shape=(shape, shape, shape),
        grid=(n // tile,),
        in_specs=[spec] * 6 + [mspec, mspec],
        out_specs=(spec, spec, spec),
        interpret=bool(interpret),
        compiler_params=pltpu.CompilerParams(dimension_semantics=("arbitrary",))
        if not interpret
        else None,
    )


def _tile_pad(n):
    if n >= MAX_TILE:
        return MAX_TILE, (-n) % MAX_TILE
    tile = max(128, -(-n // 128) * 128)
    return tile, (-n) % tile


def _flatten(coords, L):
    batch = coords[0].shape[1:]
    n = 1
    for d in batch:
        n *= d
    return [c.reshape(L, n) for c in coords], batch, n


def ec_add_pallas(ops, p: ProjPoint, q: ProjPoint, interpret: bool = False) -> ProjPoint:
    """Fused complete add on batched ProjPoints with (L, *batch) coords."""
    f = ops.lane.f
    L = f.L
    batch = jnp.broadcast_shapes(
        ops.lane.batch_shape(p.x), ops.lane.batch_shape(q.x)
    )
    coords = [jnp.broadcast_to(c, (L,) + batch) for c in (*p, *q)]
    flat, _, n = _flatten(coords, L)
    b3 = _b3_limbs(ops)
    from . import pallas_field

    if pallas_field.USE_3D:
        from .pallas_field import _to3d

        c3 = [_to3d(c, L, n) for c in flat]
        outs = _ec_add_call3(
            f, b3, c3[0].shape[1], interpret, pallas_field.USE_KS
        )(*c3)
        return ProjPoint(
            *(o.reshape(L, -1)[:, :n].reshape((L,) + batch) for o in outs)
        )
    tile, pad = _tile_pad(n)
    if pad:
        flat = [jnp.pad(c, ((0, 0), (0, pad))) for c in flat]
    outs = _ec_add_call(f, b3, n + pad, tile, interpret, pallas_field.USE_KS)(*flat)
    if pad:
        outs = [o[:, :n] for o in outs]
    return ProjPoint(*(o.reshape((L,) + batch) for o in outs))


def ec_wave_add_pallas(
    ops, acc: ProjPoint, pt: ProjPoint, neg, valid, interpret: bool = False
) -> ProjPoint:
    """MSM wave update: acc <- valid ? acc + (neg ? -pt : pt) : acc.

    neg/valid: bool arrays over the batch shape."""
    f = ops.lane.f
    L = f.L
    batch = ops.lane.batch_shape(acc.x)
    coords = [jnp.broadcast_to(c, (L,) + batch) for c in (*acc, *pt)]
    flat, _, n = _flatten(coords, L)
    b3 = _b3_limbs(ops)
    from . import pallas_field

    if pallas_field.USE_3D:
        from .pallas_field import LANES, SUBL, _to3d

        blk = SUBL * LANES
        pad = (-n) % blk
        c3 = [_to3d(c, L, n) for c in flat]
        m3 = []
        for m in (neg, valid):
            m2 = m.astype(jnp.uint32).reshape(n)
            if pad:
                m2 = jnp.pad(m2, (0, pad))
            m3.append(m2.reshape(-1, LANES))
        outs = _ec_wave_call3(
            f, b3, c3[0].shape[1], interpret, pallas_field.USE_KS
        )(*c3, *m3)
        return ProjPoint(
            *(o.reshape(L, -1)[:, :n].reshape((L,) + batch) for o in outs)
        )
    masks = [
        m.astype(jnp.uint32).reshape(1, n) for m in (neg, valid)
    ]
    tile, pad = _tile_pad(n)
    if pad:
        flat = [jnp.pad(c, ((0, 0), (0, pad))) for c in flat]
        masks = [jnp.pad(m, ((0, 0), (0, pad))) for m in masks]
    outs = _ec_wave_call(f, b3, n + pad, tile, interpret, pallas_field.USE_KS)(
        *flat, *masks
    )
    if pad:
        outs = [o[:, :n] for o in outs]
    return ProjPoint(*(o.reshape((L,) + batch) for o in outs))


def _b3_limbs(ops):
    """3*b as Montgomery limb ints (hashable tuple for the call cache)."""
    f = ops.lane.f
    enc = f._int_to_limbs_np((ops.b3_host * f.R) % f.p)
    return tuple(int(v) for v in enc.reshape(-1))


# ---------------------------------------------------------------- mixed add
# Jacobian += affine (madd-2007-bl, 11 Montgomery muls vs 14 for the
# complete RCB formula) for the MSM wave loop. Incomplete: the doubling
# case (acc's affine x equals the point) and acc-at-infinity are NOT
# handled — the MSM initializes every bucket lane with a fixed point D of
# unknown discrete log w.r.t. the inputs (ops/msm.py), so hitting either
# case implies solving a dlog relation. The gathered points arrive
# ELEMENT-MAJOR ((lanes, 2L) rows, straight from the embedding-style
# gather) and are transposed to limb-major inside the kernel, saving the
# XLA HBM transpose pass (~1/3 of the gather cost, scripts/probe_gather.py).


def _make_ec_madd_kernel(L, p_limbs, np_limbs, ks, packed=False, mxu=False,
                         d3=False, has_neg=True):
    p_limbs = [int(v) for v in p_limbs]
    np_limbs = [int(v) for v in np_limbs]

    def body(x1r, y1r, z1r, rows, neg, valid, ox, oy, oz, mats):
        X1, Y1, Z1 = x1r[:], y1r[:], z1r[:]

        if mxu:
            nmat, pmat = mats

            def mul(a, b):
                return _mont_core_mxu(a, b, L, p_limbs, nmat[:], pmat[:], ks)

        else:

            def mul(a, b):
                return _mont_core(a, b, L, p_limbs, np_limbs, ks)

        def add(x, y):
            return _add_mod(x, y, p_limbs, L)

        def sub(x, y):
            return _sub_mod(x, y, p_limbs, L)

        # in-VMEM transpose of the gathered rows (3-D tiles: the row
        # coordinate axis moves from lanes to the leading dim)
        t = rows[:].transpose(2, 0, 1) if d3 else rows[:].T
        if packed:
            # (L, T) u32 rows: each u32 packs limb pair (2k, 2k+1) —
            # HALF the gathered bytes of the 2L-wide u16-in-u32 layout
            h = L // 2

            def unpack(pk):
                # split-halves pack (msm.py _affine_em): lo = limbs [0, L/2),
                # hi = limbs [L/2, L) — plain concat, no sublane interleave
                lo = pk & jnp.uint32(0xFFFF)
                hi = pk >> 16
                return jnp.concatenate([lo, hi], axis=0)

            x2 = unpack(t[:h])
            y2 = unpack(t[h:])
        else:
            x2 = t[:L]
            y2 = t[L:]
        if has_neg:
            zero = jnp.zeros_like(x2)
            y2n = jnp.where(neg[:] != 0, _sub_mod(zero, y2, p_limbs, L), y2)
        else:
            # sign already applied in the gathered table (msm.py
            # _perm_signed_em)
            y2n = y2
        # affine identity is encoded (0, 0) by to_affine_limbs
        inf2 = jnp.all((x2 == 0) & (y2 == 0), axis=0, keepdims=True)
        keep = (valid[:] != 0) & ~inf2

        z1z1 = mul(Z1, Z1)
        u2 = mul(x2, z1z1)
        s2 = mul(y2n, mul(Z1, z1z1))
        h = sub(u2, X1)
        hh = mul(h, h)
        i4 = add(add(hh, hh), add(hh, hh))
        j = mul(h, i4)
        r2 = sub(s2, Y1)
        r2 = add(r2, r2)
        v = mul(X1, i4)
        x3 = sub(sub(mul(r2, r2), j), add(v, v))
        y1j = mul(Y1, j)
        y3 = sub(mul(r2, sub(v, x3)), add(y1j, y1j))
        zh = add(Z1, h)
        z3 = sub(sub(mul(zh, zh), z1z1), hh)
        ox[:] = jnp.where(keep, x3, X1)
        oy[:] = jnp.where(keep, y3, Y1)
        oz[:] = jnp.where(keep, z3, Z1)

    if mxu and has_neg:

        def kernel(x1r, y1r, z1r, rows, neg, valid, nm, pm, ox, oy, oz):
            body(x1r, y1r, z1r, rows, neg, valid, ox, oy, oz, (nm, pm))

    elif mxu:

        def kernel(x1r, y1r, z1r, rows, valid, nm, pm, ox, oy, oz):
            body(x1r, y1r, z1r, rows, None, valid, ox, oy, oz, (nm, pm))

    elif has_neg:

        def kernel(x1r, y1r, z1r, rows, neg, valid, ox, oy, oz):
            body(x1r, y1r, z1r, rows, neg, valid, ox, oy, oz, None)

    else:

        def kernel(x1r, y1r, z1r, rows, valid, ox, oy, oz):
            body(x1r, y1r, z1r, rows, None, valid, ox, oy, oz, None)

    return kernel


@functools.lru_cache(maxsize=None)
def _ec_madd_call3(field, nblk, interpret, ks, packed=False, mxu=False,
                   has_neg=True):
    """3-D tile variant: coords (L, nblk, LANES), rows (nblk, LANES, rw),
    masks (nblk, LANES); grid over nblk // SUBL."""
    from .pallas_field import LANES, SUBL

    L = field.L
    kernel = _make_ec_madd_kernel(
        L, field.p_limbs, field.nprime_limbs, ks, packed, mxu, d3=True,
        has_neg=has_neg,
    )
    rw = L if packed else 2 * L
    grid = nblk // SUBL
    spec = pl.BlockSpec(
        (L, SUBL, LANES), lambda i: (0, i, 0), memory_space=pltpu.VMEM
    )
    rspec = pl.BlockSpec(
        (SUBL, LANES, rw), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
    )
    mspec = pl.BlockSpec(
        (SUBL, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    shape = jax.ShapeDtypeStruct((L, nblk, LANES), jnp.uint32)
    in_specs = [spec, spec, spec, rspec] + [mspec] * (2 if has_neg else 1)
    if mxu:
        in_specs += [
            pl.BlockSpec((2 * L, 2 * L), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((4 * L, 2 * L), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ]
    call = pl.pallas_call(
        kernel,
        out_shape=(shape, shape, shape),
        grid=(grid,),
        in_specs=in_specs,
        out_specs=(spec, spec, spec),
        interpret=bool(interpret),
        compiler_params=pltpu.CompilerParams(dimension_semantics=("arbitrary",))
        if not interpret
        else None,
    )
    if mxu:
        nmat, pmat = _byte_mats(field.p_limbs, field.nprime_limbs, L)
        return lambda *args: call(*args, nmat, pmat)
    return call


@functools.lru_cache(maxsize=None)
def _ec_madd_call(field, n, tile, interpret, ks, packed=False, mxu=False,
                  has_neg=True):
    L = field.L
    kernel = _make_ec_madd_kernel(
        L, field.p_limbs, field.nprime_limbs, ks, packed, mxu,
        has_neg=has_neg,
    )
    rw = L if packed else 2 * L
    spec = pl.BlockSpec((L, tile), lambda i: (0, i), memory_space=pltpu.VMEM)
    rspec = pl.BlockSpec((tile, rw), lambda i: (i, 0), memory_space=pltpu.VMEM)
    mspec = pl.BlockSpec((1, tile), lambda i: (0, i), memory_space=pltpu.VMEM)
    shape = jax.ShapeDtypeStruct((L, n), jnp.uint32)
    in_specs = [spec, spec, spec, rspec] + [mspec] * (2 if has_neg else 1)
    if mxu:
        in_specs += [
            pl.BlockSpec((2 * L, 2 * L), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((4 * L, 2 * L), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ]
    call = pl.pallas_call(
        kernel,
        out_shape=(shape, shape, shape),
        grid=(n // tile,),
        in_specs=in_specs,
        out_specs=(spec, spec, spec),
        interpret=bool(interpret),
        compiler_params=pltpu.CompilerParams(dimension_semantics=("arbitrary",))
        if not interpret
        else None,
    )
    if mxu:
        nmat, pmat = _byte_mats(field.p_limbs, field.nprime_limbs, L)
        return lambda *args: call(*args, nmat, pmat)
    return call


def ec_madd_pallas(ops, acc: ProjPoint, rows, neg, valid,
                   interpret: bool = False, packed: bool = False) -> ProjPoint:
    """Jacobian acc += (affine rows element-major), masked.

    acc: JACOBIAN ProjPoint with (L, *batch) coords; rows: gathered affine
    points, row i = [x limbs | y limbs] ((n, 2L) u16-in-u32, or (n, L)
    PACKED pairs when `packed`); neg/valid: bool (*batch)."""
    from . import pallas_field

    f = ops.lane.f
    L = f.L
    rw = L if packed else 2 * L
    batch = ops.lane.batch_shape(acc.x)
    coords = [jnp.broadcast_to(c, (L,) + batch) for c in acc]
    flat, _, n = _flatten(coords, L)
    rows2 = rows.reshape(n, rw)
    if pallas_field.USE_3D:
        from .pallas_field import LANES, SUBL, _to3d

        blk = SUBL * LANES
        pad = (-n) % blk
        c3 = [_to3d(c, L, n) for c in flat]
        if pad:
            rows2 = jnp.pad(rows2, ((0, pad), (0, 0)))
        r3 = rows2.reshape(-1, LANES, rw)
        m3 = []
        for m in ((neg, valid) if neg is not None else (valid,)):
            m2 = m.astype(jnp.uint32).reshape(n)
            if pad:
                m2 = jnp.pad(m2, (0, pad))
            m3.append(m2.reshape(-1, LANES))
        outs = _ec_madd_call3(
            f, c3[0].shape[1], interpret, pallas_field.USE_KS, packed,
            pallas_field.USE_MXU, has_neg=neg is not None,
        )(*c3, r3, *m3)
        return ProjPoint(
            *(o.reshape(L, -1)[:, :n].reshape((L,) + batch) for o in outs)
        )
    masks = [m.astype(jnp.uint32).reshape(1, n)
             for m in ((neg, valid) if neg is not None else (valid,))]
    tile, pad = _tile_pad(n)
    if pad:
        flat = [jnp.pad(c, ((0, 0), (0, pad))) for c in flat]
        rows2 = jnp.pad(rows2, ((0, pad), (0, 0)))
        masks = [jnp.pad(m, ((0, 0), (0, pad))) for m in masks]
    outs = _ec_madd_call(
        f, n + pad, tile, interpret, pallas_field.USE_KS, packed,
        pallas_field.USE_MXU, has_neg=neg is not None,
    )(*flat, rows2, *masks)
    if pad:
        outs = [o[:, :n] for o in outs]
    return ProjPoint(*(o.reshape((L,) + batch) for o in outs))
