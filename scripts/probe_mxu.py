"""A/B probe: MXU REDC mont core vs the VPU schoolbook core on the live TPU.

Times mont_mul and the fused NTT butterfly at the north-star batch size for
both paths, then cross-checks a sample of outputs on-device (XOR-reduce of
the two results must be zero).

Usage: timeout 3000 python scripts/probe_mxu.py [logn]
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
    n = 1 << logn
    fld = get_field(BN254.fr.p, "bn254.fr")
    tile = pf.MAX_TILE

    @jax.jit
    def gen(key):
        raw = jax.random.bits(key, (fld.L, n), jnp.uint32) & 0xFFFF
        return fld._cond_sub_p(raw.at[fld.L - 1].set(raw[fld.L - 1] & 0x3FFF))

    k1, k2, k3 = jax.random.split(jax.random.key(3), 3)
    a = gen(k1)
    b = gen(k2)
    w = gen(k3)
    fetch(a)

    vpu = pf._mont_mul_call(fld, n, tile, False, pf.USE_KS)
    mxu = pf._mont_mul_call_mxu(fld, n, tile, False, pf.USE_KS)

    t_v = timed(lambda: vpu(a, b))
    print(f"mont_mul VPU  {n}: {t_v*1e3:8.2f} ms  {n/t_v/1e6:7.1f} M/s",
          flush=True)
    t_m = timed(lambda: mxu(a, b))
    print(f"mont_mul MXU  {n}: {t_m*1e3:8.2f} ms  {n/t_m/1e6:7.1f} M/s "
          f" ({t_v/t_m:.2f}x)", flush=True)

    # exactness on-device (no host transfer of the arrays)
    @jax.jit
    def diff(a, b):
        return (vpu(a, b) ^ mxu(a, b)).sum()

    print("xor-diff:", int(fetch(diff(a, b))[0]), flush=True)

    bf_v = pf._butterfly_call(fld, n, tile, False, pf.USE_KS, False)
    bf_m = pf._butterfly_call(fld, n, tile, False, pf.USE_KS, True)
    t_bv = timed(lambda: bf_v(a, b, w))
    print(f"butterfly VPU {n}: {t_bv*1e3:8.2f} ms", flush=True)
    t_bm = timed(lambda: bf_m(a, b, w))
    print(f"butterfly MXU {n}: {t_bm*1e3:8.2f} ms ({t_bv/t_bm:.2f}x)",
          flush=True)

    @jax.jit
    def diffb(a, b, w):
        e1, o1 = bf_v(a, b, w)
        e2, o2 = bf_m(a, b, w)
        return ((e1 ^ e2) | (o1 ^ o2)).sum()

    print("butterfly xor-diff:", int(fetch(diffb(a, b, w))[0]), flush=True)


if __name__ == "__main__":
    main()
