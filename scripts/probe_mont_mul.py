"""mont_mul + NTT-butterfly kernel probe on the live TPU.

Sweeps the Pallas tile width for the mont_mul kernel, then times the fused
butterfly kernel and a full NTT at the north-star size. Run with a warm
persistent cache where possible; new tile widths are new programs (remote
compiles are slow — see docs/TPU_NOTES.md).

Usage:  timeout 5400 python scripts/probe_mont_mul.py [logn] [tile,tile,...]
"""
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
from cocircom_tpu.ops import pallas_field
from cocircom_tpu.ops.field import get_field
from cocircom_tpu.ops.ntt import ntt_engine


def fetch(x):
    leaf = jax.tree.leaves(x)[0]
    return np.asarray(jax.device_get(leaf.reshape(-1)[:1]))


def timed(fn, iters=4):
    fetch(fn())
    t0 = time.time()
    out = None
    for _ in range(iters):
        out = fn()
    fetch(out)
    return (time.time() - t0) / iters


def main():
    logn = int(sys.argv[1]) if len(sys.argv) > 1 else 22
    tiles = (
        [int(t) for t in sys.argv[2].split(",")]
        if len(sys.argv) > 2
        else [2048, 8192]
    )
    curve = BN254
    fr = get_field(curve.fr.p, curve.name + ".fr")
    n = 1 << logn

    @jax.jit
    def gen(key):
        raw = jax.random.bits(key, (fr.L, n), jnp.uint32) & 0xFFFF
        return fr._cond_sub_p(raw.at[fr.L - 1].set(raw[fr.L - 1] & 0x3FFF))

    a = gen(jax.random.key(1))
    b = gen(jax.random.key(2))
    fetch((a, b))

    for tile in tiles:
        pallas_field.MAX_TILE = tile
        t = timed(lambda: pallas_field.mont_mul_pallas(fr, a, b))
        print(f"mont_mul 2^{logn} tile={tile}: {t*1e3:.1f} ms "
              f"({n/t/1e6:.0f} M/s)", flush=True)

    pallas_field.MAX_TILE = tiles[0]
    half = n // 2
    e, o, w = a[:, :half], a[:, half:], b[:, :half]
    t = timed(lambda: pallas_field.butterfly_pallas(fr, e, o, w))
    print(f"butterfly 2^{logn-1} tile={tiles[0]}: {t*1e3:.1f} ms "
          f"({half/t/1e6:.0f} M butterflies/s)", flush=True)

    eng = ntt_engine(fr, curve.fr)
    t = timed(lambda: eng.ntt(a), 2)
    print(f"NTT 2^{logn} (fused butterfly): {t*1e3:.1f} ms", flush=True)


if __name__ == "__main__":
    main()
