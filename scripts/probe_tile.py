"""Tile-width sweep: find the per-grid-step overhead / bandwidth floor.

Times a trivial copy kernel, the carry-only kernel, and the full MXU mont
core across tile widths. 768 MB of traffic should take ~1 ms at v5e HBM
speed; the round-3 kernels sat at ~8 ms with tile=2048 (4 us/step).

Usage: timeout 3000 python scripts/probe_tile.py [logn] [tiles,...]
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

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from cocircom_tpu.fields.params import BN254
from cocircom_tpu.ops import pallas_field as pf
from cocircom_tpu.ops.field import get_field


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
        else [2048, 8192, 32768, 131072]
    )
    n = 1 << logn
    fld = get_field(BN254.fr.p, "bn254.fr")
    L = fld.L

    @jax.jit
    def gen(key):
        raw = jax.random.bits(key, (L, n), jnp.uint32) & 0xFFFF
        return fld._cond_sub_p(raw.at[L - 1].set(raw[L - 1] & 0x3FFF))

    k1, k2 = jax.random.split(jax.random.key(3))
    a = gen(k1)
    b = gen(k2)
    fetch(a)

    def copy_k(a_ref, b_ref, o_ref):
        o_ref[:] = a_ref[:] ^ b_ref[:]

    def carry_k(a_ref, b_ref, o_ref):
        cols = jnp.concatenate([a_ref[:], b_ref[:]], 0)
        s = pf._carry(cols, 2 * L)
        o_ref[:] = s[:L] ^ s[L:]

    for tile in tiles:
        spec = pl.BlockSpec(
            (L, tile), lambda i: (0, i), memory_space=pltpu.VMEM
        )
        for name, kern in [("copy", copy_k), ("carry", carry_k)]:
            call = pl.pallas_call(
                kern,
                out_shape=jax.ShapeDtypeStruct((L, n), jnp.uint32),
                grid=(n // tile,),
                in_specs=[spec, spec],
                out_specs=spec,
                compiler_params=pltpu.CompilerParams(
                    dimension_semantics=("arbitrary",),
                    vmem_limit_bytes=100 * 1024 * 1024,
                ),
            )
            t = timed(lambda call=call: call(a, b))
            gbs = 3 * n * L * 4 / t / 1e9
            print(
                f"tile {tile:6d} {name:5s}: {t*1e3:7.2f} ms "
                f"{n/t/1e6:7.1f} M/s  {gbs:6.1f} GB/s",
                flush=True,
            )
        try:
            full = pf._mont_mul_call_mxu(fld, n, tile, False, False)
            t = timed(lambda: full(a, b))
            print(
                f"tile {tile:6d} fmxu : {t*1e3:7.2f} ms {n/t/1e6:7.1f} M/s",
                flush=True,
            )
        except Exception as e:  # noqa: BLE001
            print(f"tile {tile:6d} fmxu : FAIL {type(e).__name__}", flush=True)
        try:
            fv = pf._mont_mul_call(fld, n, tile, False, False)
            t = timed(lambda: fv(a, b))
            print(
                f"tile {tile:6d} fvpu : {t*1e3:7.2f} ms {n/t/1e6:7.1f} M/s",
                flush=True,
            )
        except Exception as e:  # noqa: BLE001
            print(f"tile {tile:6d} fvpu : FAIL {type(e).__name__}", flush=True)


if __name__ == "__main__":
    main()
