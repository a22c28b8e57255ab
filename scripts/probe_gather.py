"""Micro-probe: row gather vs gather+transpose vs limb-major gather."""
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


def fetch(x):
    return np.asarray(jax.device_get(jax.tree.leaves(x)[0].reshape(-1)[:1]))


def timed(fn, iters=4):
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
    n = 1 << 17
    width = 360448  # ~c=12 wave width
    reps = 8  # waves per dispatch
    key = jax.random.key(0)
    k1, k2 = jax.random.split(key)
    em = jax.random.bits(k1, (n, 48), jnp.uint32)
    lm = jax.random.bits(k2, (48, n), jnp.uint32)
    idx = jax.random.randint(jax.random.key(3), (width,), 0, n, jnp.int32)

    @jax.jit
    def take_only(em, idx):
        def body(i, acc):
            r = jnp.take(em, idx + i, axis=0)  # (width, 48)
            return acc ^ r[:, 0]
        return jax.lax.fori_loop(0, reps, body, jnp.zeros((width,), jnp.uint32))

    @jax.jit
    def take_t(em, idx):
        def body(i, acc):
            r = jnp.take(em, idx + i, axis=0).T  # (48, width)
            return acc ^ r[0] ^ r[47]
        return jax.lax.fori_loop(0, reps, body, jnp.zeros((width,), jnp.uint32))

    @jax.jit
    def take_limb_major(lm, idx):
        def body(i, acc):
            r = jnp.take(lm, idx + i, axis=1)  # (48, width)
            return acc ^ r[0] ^ r[47]
        return jax.lax.fori_loop(0, reps, body, jnp.zeros((width,), jnp.uint32))

    for name, fn, a in [("take_row", take_only, em), ("take_row_T", take_t, em),
                        ("take_limb_major", take_limb_major, lm)]:
        t = timed(lambda fn=fn, a=a: fn(a, idx))
        emit(probe=name, per_wave_ms=round(t * 1e3 / reps, 2))


if __name__ == "__main__":
    main()
