"""Decompose MSM wave-step time on the live TPU: gather vs EC add vs sort.

Prints one JSON line per measurement. Run on the axon TPU.
"""
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
from cocircom_tpu.ops.curve import g1_ops, ProjPoint
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


def emit(name, **kw):
    print(json.dumps({"probe": name, **kw}), flush=True)


def main():
    curve = BN254
    fr = get_field(curve.fr.p, curve.name + ".fr")
    fq = get_field(curve.fq.p, curve.name + ".fq")
    ops = g1_ops(curve)
    log_n = int(os.environ.get("PROBE_LOG_N", "17"))
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

    c = 8
    eng = msm_engine(ops, c)
    K = 1 << (c - 1)
    T = eng.T
    nbits = 16 * fr.L

    # --- prepare (digits + sort) ---
    t_prep = timed(lambda: eng._prepare_jit(scalars, nbits, c))
    emit("prepare", ms=round(t_prep * 1e3, 2), log_n=log_n)

    digits, order, sortedb, bucket_start, n_waves = eng._prepare_jit(
        scalars, nbits, c)
    n_waves = int(jax.device_get(n_waves))
    n_super = -(-n_waves // T)
    nw = digits.shape[0]
    acc0 = ops.identity((nw, K + 1, T))
    emit("shape", n_waves=n_waves, n_super=n_super, nw=nw, K=K, T=T)

    # --- full wave chunk (16 waves / dispatch), whole loop ---
    def whole_loop():
        acc = acc0
        for w in range(0, n_super, eng.WAVE_CHUNK):
            acc = eng._wave_chunk_jit(
                pts, digits, order, sortedb, bucket_start,
                jnp.int32(w), acc, eng.WAVE_CHUNK)
        return acc
    t_loop = timed(whole_loop, 1)
    emit("wave_loop_16", ms=round(t_loop * 1e3, 2),
         per_wave_ms=round(t_loop * 1e3 / n_super, 3))

    # --- one dispatch for ALL waves ---
    t_all = timed(lambda: eng._wave_chunk_jit(
        pts, digits, order, sortedb, bucket_start, jnp.int32(0), acc0,
        n_super), 1)
    emit("wave_loop_one_dispatch", ms=round(t_all * 1e3, 2),
         per_wave_ms=round(t_all * 1e3 / n_super, 3))

    # --- gather-only variant: same indices, XOR-reduce, no EC math ---
    Kp1 = K + 1

    @jax.jit
    def gather_only(w0):
        def body(i, acc):
            w = w0 + i
            bidx = jnp.arange(Kp1, dtype=jnp.int32)[None, :, None]
            ranks = jnp.arange(T, dtype=jnp.int32)[None, None, :]
            pos = bucket_start[:, :, None] + (w * T + ranks)
            flat = pos.reshape(nw, Kp1 * T)
            safe = jnp.clip(flat, 0, n - 1)
            sb = jnp.take_along_axis(sortedb, safe, axis=1).reshape(nw, Kp1, T)
            valid = (pos < n) & (sb == bidx) & (bidx > 0)
            src = jnp.take_along_axis(order, safe, axis=1)
            g = jax.tree.map(
                lambda a: jnp.take(a, src.reshape(-1), axis=1).reshape(
                    a.shape[:1] + (nw, Kp1, T)), pts)
            dsel = jnp.take_along_axis(digits, src, axis=1).reshape(nw, Kp1, T) < 0
            mix = g.x ^ g.y ^ g.z ^ dsel.astype(jnp.uint32) ^ valid.astype(jnp.uint32)
            return acc ^ mix
        z = jnp.zeros((fq.L, nw, Kp1, T), jnp.uint32)
        return jax.lax.fori_loop(0, n_super, body, z)

    t_gather = timed(lambda: gather_only(jnp.int32(0)), 1)
    emit("gather_only_all_waves", ms=round(t_gather * 1e3, 2),
         per_wave_ms=round(t_gather * 1e3 / n_super, 3))

    # --- EC wave add only (pre-gathered operands, fori over n_super) ---
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

    t_add = timed(lambda: add_only(acc0), 1)
    emit("ec_add_only_all_waves", ms=round(t_add * 1e3, 2),
         per_wave_ms=round(t_add * 1e3 / n_super, 3),
         adds_per_sec=round(n_super * nw * Kp1 * T / t_add, 0))

    # --- mont_mul throughput at wave element count ---
    m = nw * Kp1 * T
    a = jnp.broadcast_to(gp.x.reshape(fq.L, -1)[:, :m], (fq.L, m)).copy()
    t_mm = timed(lambda: fq.mont_mul(a, a), 4)
    emit("mont_mul_wave_sized", m=m, ms=round(t_mm * 1e3, 3),
         muls_per_sec=round(m / t_mm, 0))

    # --- reduce + horner ---
    accw = whole_loop()
    t_red = timed(lambda: eng._reduce_jit(accw), 2)
    wsums = eng._reduce_jit(accw)
    t_h = timed(lambda: eng._horner_jit(wsums, c), 2)
    emit("reduce", ms=round(t_red * 1e3, 2))
    emit("horner", ms=round(t_h * 1e3, 2))


if __name__ == "__main__":
    main()
