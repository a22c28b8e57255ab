"""Round-3 MSM probe: balanced top window + element-major gather + shared
accumulator chunking. Sweeps window size c at 2^17 and runs the 2^20
north-star shape; cross-checks results between window sizes."""
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


def emit(**kw):
    print(json.dumps(kw), flush=True)


def main():
    curve = BN254
    fr = get_field(curve.fr.p, curve.name + ".fr")
    ops = g1_ops(curve)
    key = jax.random.key(7)
    k1, k2 = jax.random.split(key)

    logs = [int(x) for x in os.environ.get("PROBE_LOGS", "17,20").split(",")]
    cs = [int(x) for x in os.environ.get("PROBE_CS", "12,10,8").split(",")]

    results = {}
    for log_n in logs:
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
            eng = msm_engine(ops, c, scalar_bits=curve.fr.p.bit_length())
            t0 = time.time()
            r = eng.msm(pts, scalars)
            # compare in AFFINE coords (projective reps differ across paths)
            v = ops.decode_points(jax.tree.map(lambda x: x[..., None], r))
            warm = time.time() - t0
            t0 = time.time()
            r = eng.msm(pts, scalars)
            fetch(r)
            hot = time.time() - t0
            emit(log_n=log_n, c=c, warm_s=round(warm, 2), hot_s=round(hot, 3),
                 pps=round(n / hot, 0))
            results.setdefault(log_n, {})[c] = v
        vals = list(results[log_n].values())
        emit(log_n=log_n, results_agree=all(v == vals[0] for v in vals))


if __name__ == "__main__":
    main()
