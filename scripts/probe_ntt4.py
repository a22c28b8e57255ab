"""Per-pass cost split of the four-step NTT at 2^22 (VERDICT r4: <200 ms).

Times, on the real chip: the full fourstep, each level's Pallas kernel,
the bitrev takes, and the inter-level transposes — to decide whether the
next lever is fused transposed writes (BlockSpec index mapping) or faster
butterfly mont cores.
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
from cocircom_tpu.ops.field import get_field
from cocircom_tpu.ops import pallas_ntt as pn
from cocircom_tpu.ops.ntt import ntt_engine


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


def main():
    fr = get_field(BN254.fr.p, BN254.name + ".fr")
    eng = ntt_engine(fr, BN254.fr)
    logn = int(os.environ.get("PROBE_LOG", "22"))
    n = 1 << logn
    L = fr.L

    @jax.jit
    def gen(key):
        raw = jax.random.bits(key, (L, n), jnp.uint32) & 0xFFFF
        return fr._cond_sub_p(raw.at[L - 1].set(raw[L - 1] & 0x3FFF))

    a = gen(jax.random.key(logn))
    fetch(a)

    t_full = timed(lambda: eng.ntt(a))
    print(f"fourstep ntt 2^{logn}: {t_full*1e3:.1f} ms", flush=True)

    aux = eng._fourstep_aux(logn, False)
    kmax = pn.KMAX

    # level shapes
    shapes = []
    lm, B = logn, 1
    while lm > kmax:
        lu = min(kmax, lm - 1)
        shapes.append((lu, (1 << (lm - lu)) * B))
        B *= 1 << lu
        lm -= lu
    shapes.append((lm, B))
    print("levels:", shapes, flush=True)

    for lu, rest in shapes:
        U = 1 << lu
        Bv = n // U

        x = a.reshape(L, U, Bv)
        tw = aux[f"twprog_{lu}"]

        br = jnp.asarray(pn._bitrev_np(lu))
        take = jax.jit(lambda x, br: jnp.take(x, br, axis=1))
        t_take = timed(lambda: take(x, br))

        call = pn._ntt_call(fr, lu, Bv, False, False, False)
        t_kern = timed(lambda: call(x, tw))

        tr = jax.jit(
            lambda y: y.reshape(L, U, Bv // 128, 128)
            .transpose(0, 2, 1, 3)
            .reshape(L, Bv // 128, U * 128)
        )
        t_tr = timed(lambda: tr(x))
        print(
            f"  logu={lu} B={Bv}: take {t_take*1e3:.1f} ms, kernel "
            f"{t_kern*1e3:.1f} ms, transpose {t_tr*1e3:.1f} ms",
            flush=True,
        )


if __name__ == "__main__":
    main()
