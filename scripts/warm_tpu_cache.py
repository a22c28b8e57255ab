"""Pre-compile bench-critical shapes into the persistent XLA cache (TPU).

Remote compiles through the axon tunnel are ~100x slower than local, but
cache entries persist — warming once makes every later bench.py run fast.
Run under timeout in the background; safe to re-run (cache hits are free).
"""
import os, sys, time
import jax, jax.numpy as jnp, numpy as np

CACHE = "/root/.cache/cocircom_tpu/xla-" + jax.default_backend()
os.makedirs(CACHE, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", CACHE)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from cocircom_tpu.fields.params import BN254
from cocircom_tpu.ops.curve import g1_ops
from cocircom_tpu.ops.field import get_field
from cocircom_tpu.ops.msm import msm_engine
from cocircom_tpu.ops.ntt import ntt_engine

def fetch(x):
    return np.asarray(jax.device_get(jax.tree.leaves(x)[0].reshape(-1)[:1]))

fr = get_field(BN254.fr.p, "bn254.fr")
ops = g1_ops(BN254)
eng = msm_engine(ops)
ntt = ntt_engine(fr, BN254.fr)
key = jax.random.key(7)
k1, k2, k3 = jax.random.split(key, 3)

for logn in [int(x) for x in os.environ.get("WARM_MSM_LOGS", "17").split(",")]:
    n = 1 << logn
    t = time.time()
    @jax.jit
    def gen(n=n):
        g0 = ops.encode_points([BN254.g1_gen])
        gb = jax.tree.map(lambda c: jnp.broadcast_to(c[..., 0:1], (c.shape[0], n)), g0)
        small = jax.random.bits(k1, (1, n), jnp.uint32) & 0x7FFF | 1
        return ops.scalar_mul(gb, small, nbits=16)
    pts = gen(); fetch(pts)
    print(f"gen 2^{logn}: {time.time()-t:.0f}s", flush=True)
    sl = jax.random.bits(k2, (fr.L, n), jnp.uint32) & 0xFFFF
    sl = sl.at[fr.L - 1].set(sl[fr.L - 1] & 0x3FFF)
    c = eng._window_c(n)
    t = time.time()
    r = eng.msm(pts, sl, 256)
    fetch(r)
    print(f"msm 2^{logn} c={c}: {time.time()-t:.0f}s", flush=True)
    t = time.time()
    r = eng.msm(pts, sl, 256); fetch(r)
    print(f"msm 2^{logn} run: {time.time()-t:.1f}s -> {n/(time.time()-t):.0f} pts/s", flush=True)

for logm in [int(x) for x in os.environ.get("WARM_NTT_LOGS", "20,22").split(",")]:
    m = 1 << logm
    coeffs = jax.random.bits(k3, (fr.L, m), jnp.uint32) & 0xFFFF
    coeffs = fr._cond_sub_p(coeffs.at[fr.L - 1].set(coeffs[fr.L - 1] & 0x3FFF))
    t = time.time(); r = ntt.ntt(coeffs); fetch(r)
    print(f"ntt 2^{logm} compile+run: {time.time()-t:.0f}s", flush=True)
    t = time.time(); r = ntt.ntt(coeffs); fetch(r)
    print(f"ntt 2^{logm} run: {(time.time()-t)*1000:.0f}ms", flush=True)
    t = time.time(); r = fr.mont_mul(coeffs, coeffs); fetch(r)
    t = time.time(); r = fr.mont_mul(coeffs, coeffs); fetch(r)
    print(f"mont_mul 2^{logm}: {(time.time()-t)*1000:.1f}ms -> {m/(time.time()-t)/1e6:.1f} M/s", flush=True)
print("WARM DONE", flush=True)
