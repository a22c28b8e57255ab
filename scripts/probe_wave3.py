"""Decompose round-3 MSM wave cost at larger windows (c=12) on the TPU."""
import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

CACHE_DIR = "/root/.cache/cocircom_tpu/xla-" + jax.default_backend()
os.makedirs(CACHE_DIR, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", CACHE_DIR)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from cocircom_tpu.fields.params import BN254
from cocircom_tpu.ops.curve import g1_ops
from cocircom_tpu.ops.field import get_field
from cocircom_tpu.ops.msm import msm_engine


def fetch(x):
    leaf = jax.tree.leaves(x)[0]
    return np.asarray(jax.device_get(leaf.reshape(-1)[:1]))


def timed(fn, iters=2):
    fetch(fn())
    t0 = time.time()
    out = None
    for _ in range(iters):
        out = fn()
    fetch(out)
    return (time.time() - t0) / iters


def emit(**kw):
    print(json.dumps(kw), flush=True)


def main():
    curve = BN254
    fr = get_field(curve.fr.p, curve.name + ".fr")
    fq = get_field(curve.fq.p, curve.name + ".fq")
    ops = g1_ops(curve)
    log_n = int(os.environ.get("PROBE_LOG_N", "17"))
    c = int(os.environ.get("PROBE_C", "12"))
    n = 1 << log_n
    key = jax.random.key(7)
    k1, k2 = jax.random.split(key)

    @jax.jit
    def gen_points(key):
        gen = ops.encode_points([curve.g1_gen])
        genb = jax.tree.map(
            lambda c: jnp.broadcast_to(c[..., 0:1], (c.shape[0], n)), gen)
        small = jax.random.bits(key, (1, n), jnp.uint32) & 0x7FFF | 1
        return ops.scalar_mul(genb, small, nbits=16)

    @jax.jit
    def gen_scalars(key):
        s = jax.random.bits(key, (fr.L, n), jnp.uint32) & 0xFFFF
        return s.at[fr.L - 1].set(s[fr.L - 1] & 0x3FFF)

    pts = gen_points(k1)
    scalars = gen_scalars(k2)
    fetch(pts)

    eng = msm_engine(ops, c)
    K = 1 << (c - 1)
    T = eng.T
    nbits = 16 * fr.L
    tdef = jax.tree.structure(pts)

    t_prep = timed(lambda: eng._prepare_jit(scalars, nbits, c))
    digits, order, sortedb, bucket_start, n_waves = eng._prepare_jit(
        scalars, nbits, c)
    pts_em = eng._emajor_jit(pts)
    n_waves = int(jax.device_get(n_waves))
    n_super = -(-n_waves // T)
    nw = digits.shape[0]
    Kp1 = K + 1
    width = nw * Kp1 * T
    emit(probe="shape", c=c, n_super=n_super, nw=nw, K=K, T=T, width=width,
         prep_ms=round(t_prep*1e3, 1))

    acc0 = ops.identity((nw, Kp1, T))

    # full wave loop, one dispatch
    t_all = timed(lambda: eng._wave_chunk_jit(
        pts_em, digits, order, sortedb, bucket_start, jnp.int32(0), acc0,
        n_super, tdef), 1)
    emit(probe="wave_all", ms=round(t_all*1e3, 1),
         per_wave_ms=round(t_all*1e3/n_super, 2),
         adds_per_sec=round(width*n_super/t_all, 0))

    # gather-only (em rows), fori over n_super
    @jax.jit
    def gather_only(w0):
        def body(i, accx):
            w = w0 + i
            bidx = jnp.arange(Kp1, dtype=jnp.int32)[None, :, None]
            ranks = jnp.arange(T, dtype=jnp.int32)[None, None, :]
            pos = bucket_start[:, :, None] + (w * T + ranks)
            flat = pos.reshape(nw, Kp1 * T)
            safe = jnp.clip(flat, 0, n - 1)
            sb = jnp.take_along_axis(sortedb, safe, axis=1).reshape(nw, Kp1, T)
            valid = (pos < n) & (sb == bidx) & (bidx > 0)
            src = jnp.take_along_axis(order, safe, axis=1)
            rows = jnp.take(pts_em, src.reshape(-1), axis=0)
            coords = rows.T.reshape(3, fq.L, nw, Kp1, T)
            dsel = jnp.take_along_axis(digits, src, axis=1).reshape(nw, Kp1, T) < 0
            mix = coords[0,0] ^ coords[1,0] ^ coords[2,0] ^ dsel.astype(jnp.uint32) ^ valid.astype(jnp.uint32)
            return accx ^ mix
        z = jnp.zeros((nw, Kp1, T), jnp.uint32)
        return jax.lax.fori_loop(0, n_super, body, z)

    t_g = timed(lambda: gather_only(jnp.int32(0)), 1)
    emit(probe="gather_only", ms=round(t_g*1e3, 1),
         per_wave_ms=round(t_g*1e3/n_super, 2))

    # EC add only at this width (broadcast operands, no gather)
    from cocircom_tpu.ops.pallas_curve import ec_wave_add_pallas
    gp = jax.tree.map(
        lambda a: jnp.broadcast_to(
            a[:, :1, None, None], (fq.L, nw, Kp1, T)).copy(), pts)
    negm = jnp.zeros((nw, Kp1, T), bool)
    valm = jnp.ones((nw, Kp1, T), bool)

    @jax.jit
    def add_only(acc):
        def body(i, a):
            return ec_wave_add_pallas(ops, a, gp, negm, valm)
        return jax.lax.fori_loop(0, n_super, body, acc)

    t_a = timed(lambda: add_only(acc0), 1)
    emit(probe="add_only", ms=round(t_a*1e3, 1),
         per_wave_ms=round(t_a*1e3/n_super, 2),
         adds_per_sec=round(width*n_super/t_a, 0))

    accw = eng._wave_chunk_jit(pts_em, digits, order, sortedb, bucket_start,
                               jnp.int32(0), acc0, n_super, tdef)
    from cocircom_tpu.ops.msm import _top_window_packing
    _, nb, S = _top_window_packing(nbits, c)
    t_r = timed(lambda: eng._reduce_jit(accw, nb, S), 2)
    wsums = eng._reduce_jit(accw, nb, S)
    t_h = timed(lambda: eng._horner_jit(wsums, c), 2)
    emit(probe="reduce", ms=round(t_r*1e3, 1))
    emit(probe="horner", ms=round(t_h*1e3, 1))


if __name__ == "__main__":
    main()
