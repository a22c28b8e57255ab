"""MSM perf probe on the live TPU: window size sweep + the 2^20 north-star."""
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


def main():
    curve = BN254
    fr = get_field(curve.fr.p, curve.name + ".fr")
    ops = g1_ops(curve)

    key = jax.random.key(7)
    k1, k2 = jax.random.split(key)

    for log_n, cs in [(20, (8,))]:
        n = 1 << log_n

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
        for c in cs:
            eng = msm_engine(ops, c)
            t0 = time.time()
            fetch(eng.msm(pts, scalars, 16 * fr.L))
            warm = time.time() - t0
            t0 = time.time()
            fetch(eng.msm(pts, scalars, 16 * fr.L))
            hot = time.time() - t0
            print(json.dumps({"log_n": log_n, "c": c,
                              "warm_s": round(warm, 2),
                              "hot_s": round(hot, 3),
                              "pps": round(n / hot, 1)}), flush=True)


if __name__ == "__main__":
    main()
