"""Warm + measure the BASELINE north-star shapes on the live TPU:
MSM 2^20 (c=8), NTT 2^22, prove-core 2^20. Compiles cache persistently;
subsequent bench.py runs hit the cache."""
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
from cocircom_tpu.mpc.driver import PlainDriver
from cocircom_tpu.ops.curve import g1_ops
from cocircom_tpu.ops.field import get_field
from cocircom_tpu.ops.msm import msm_engine
from cocircom_tpu.ops.ntt import ntt_engine


def fetch(x):
    leaf = jax.tree.leaves(x)[0]
    return np.asarray(jax.device_get(leaf.reshape(-1)[:1]))


def main():
    curve = BN254
    fr = get_field(curve.fr.p, curve.name + ".fr")
    ops = g1_ops(curve)
    eng = msm_engine(ops, 8)
    ntt = ntt_engine(fr, curve.fr)
    key = jax.random.key(7)
    k1, k2, k3 = jax.random.split(key, 3)

    # ---- NTT 2^22 first (single program, highest-value cache entry) ----
    m = 1 << 22

    @jax.jit
    def gen_coeffs(key):
        raw = jax.random.bits(key, (fr.L, m), jnp.uint32) & 0xFFFF
        return fr._cond_sub_p(raw.at[fr.L - 1].set(raw[fr.L - 1] & 0x3FFF))

    coeffs = gen_coeffs(k3)
    t0 = time.time()
    fetch(ntt.ntt(coeffs))
    print(json.dumps({"ntt22_warm_s": round(time.time() - t0, 1)}), flush=True)
    t0 = time.time()
    fetch(ntt.ntt(coeffs))
    print(json.dumps({"ntt22_hot_s": round(time.time() - t0, 3)}), flush=True)
    del coeffs

    # ---- MSM 2^20 ----
    n = 1 << 20

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
    print(json.dumps({"points_ready": True}), flush=True)
    t0 = time.time()
    fetch(eng.msm(pts, scalars, 16 * fr.L))
    print(json.dumps({"msm20_warm_s": round(time.time() - t0, 1)}), flush=True)
    t0 = time.time()
    fetch(eng.msm(pts, scalars, 16 * fr.L))
    hot = time.time() - t0
    print(json.dumps({"msm20_hot_s": round(hot, 2),
                      "pps": round(n / hot, 1)}), flush=True)

    # ---- prove-core 2^20 (reuses msm cache) ----
    d = PlainDriver(curve)
    av = fr.to_mont(gen_scalars(k1))
    bv = fr.to_mont(gen_scalars(k2))

    def prove_core():
        c1 = fr.mont_mul(av, bv)
        a2 = d.fft(d.coset_shift(d.ifft(av)))
        b2 = d.fft(d.coset_shift(d.ifft(bv)))
        ab = fr.mont_mul(a2, b2)
        c2 = d.fft(d.coset_shift(d.ifft(c1)))
        h = fr.sub(ab, c2)
        return eng.msm(pts, fr.from_mont(h), 16 * fr.L)

    t0 = time.time()
    fetch(prove_core())
    print(json.dumps({"prove20_warm_s": round(time.time() - t0, 1)}), flush=True)
    t0 = time.time()
    fetch(prove_core())
    print(json.dumps({"prove20_hot_s": round(time.time() - t0, 2)}), flush=True)


if __name__ == "__main__":
    main()
