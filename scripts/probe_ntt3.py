"""Four-step Pallas NTT timing on the TPU (2^20 / 2^22, fwd + inv)."""
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
from cocircom_tpu.ops.field import get_field
from cocircom_tpu.ops.ntt import ntt_engine


def fetch(x):
    return np.asarray(jax.device_get(jax.tree.leaves(x)[0].reshape(-1)[:1]))


def timed(fn, iters=2):
    fetch(fn())
    t0 = time.time()
    out = None
    for _ in range(iters):
        out = fn()
    fetch(out)
    return (time.time() - t0) / iters


def main():
    fr = get_field(BN254.fr.p, BN254.name + ".fr")
    eng = ntt_engine(fr, BN254.fr)
    for logn in [int(x) for x in os.environ.get("PROBE_NTT_LOGS", "20,22").split(",")]:
        n = 1 << logn

        @jax.jit
        def gen(key):
            raw = jax.random.bits(key, (fr.L, n), jnp.uint32) & 0xFFFF
            return fr._cond_sub_p(raw.at[fr.L - 1].set(raw[fr.L - 1] & 0x3FFF))

        a = gen(jax.random.key(logn))
        fetch(a)
        t_f = timed(lambda: eng.ntt(a))
        t_i = timed(lambda: eng.intt(a))
        # roundtrip correctness on device
        back = eng.intt(eng.ntt(a))
        ok = bool(jax.device_get(jnp.array_equal(back, a)))
        print(json.dumps({"logn": logn, "ntt_ms": round(t_f * 1e3, 1),
                          "intt_ms": round(t_i * 1e3, 1), "roundtrip_ok": ok}),
              flush=True)


if __name__ == "__main__":
    main()
