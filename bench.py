"""Benchmark harness: MSM / NTT / field-mul throughput on real hardware.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, ...extras}

Headline metric (BASELINE.json): G1 MSM points/s/chip on BN254.

Measurement notes for the axon-tunneled TPU:
  * host<->device bandwidth through the relay is tiny and execution is
    effectively lazy until a fetch — so ALL benchmark inputs are generated
    ON-DEVICE (jax.random / tiny constants) and timing is measured from
    dispatch to a 4-byte result fetch.

Env knobs: COCIRCOM_BENCH_MSM_LOG (default 17), COCIRCOM_BENCH_NTT_LOG
(default 22), COCIRCOM_BENCH_ITERS (default 2), COCIRCOM_BENCH_PROVE_LOG
(off by default; 20 = the BASELINE north-star prover-core shape).
Inputs above 2^17 route through the chunked MSM driver (cached
fixed-shape programs).
"""

from __future__ import annotations

import json
import os
import sys
import time

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

CACHE_DIR = "/root/.cache/cocircom_tpu/xla-" + jax.default_backend()
os.makedirs(CACHE_DIR, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", CACHE_DIR)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from cocircom_tpu.fields.params import BN254  # noqa: E402
from cocircom_tpu.ops.curve import g1_ops  # noqa: E402
from cocircom_tpu.ops.field import get_field  # noqa: E402
from cocircom_tpu.ops.msm import msm_engine  # noqa: E402
from cocircom_tpu.ops.ntt import ntt_engine  # noqa: E402


def fetch(x):
    """Force completion: pull 1 element of the first leaf to the host."""
    leaf = jax.tree.leaves(x)[0]
    flat = leaf.reshape(-1)[:1]
    return np.asarray(jax.device_get(flat))


def timed(fn, iters: int):
    fetch(fn())  # compile + flush the lazy queue
    t0 = time.time()
    out = None
    for _ in range(iters):
        out = fn()
    fetch(out)
    return (time.time() - t0) / iters


def main():
    msm_log = int(os.environ.get("COCIRCOM_BENCH_MSM_LOG", "17"))
    ntt_log = int(os.environ.get("COCIRCOM_BENCH_NTT_LOG", "22"))
    iters = int(os.environ.get("COCIRCOM_BENCH_ITERS", "2"))

    msm_c = int(os.environ.get("COCIRCOM_BENCH_MSM_C", "0")) or None

    curve = BN254
    fr = get_field(curve.fr.p, curve.name + ".fr")
    ops = g1_ops(curve)
    eng = msm_engine(ops, msm_c)
    ntt = ntt_engine(fr, curve.fr)
    platform = jax.devices()[0].platform
    dev = str(jax.devices()[0])

    n = 1 << msm_log

    # --- on-device input generation (tunnel-friendly) ---
    key = jax.random.key(7)
    k1, k2, k3 = jax.random.split(key, 3)

    @jax.jit
    def gen_points(key):
        gen = ops.encode_points([curve.g1_gen])
        genb = jax.tree.map(lambda c: jnp.broadcast_to(c[..., 0:1], (c.shape[0], n)), gen)
        small = jax.random.bits(key, (1, n), jnp.uint32) & 0x7FFF | 1
        return ops.scalar_mul(genb, small, nbits=16)

    @jax.jit
    def gen_scalars(key):
        s = jax.random.bits(key, (fr.L, n), jnp.uint32) & 0xFFFF
        return s.at[fr.L - 1].set(s[fr.L - 1] & 0x3FFF)

    pts = gen_points(k1)
    scalars = gen_scalars(k2)
    fetch(pts)

    msm_t = timed(lambda: eng.msm(pts, scalars, 16 * fr.L), iters)
    msm_pps = n / msm_t

    # --- NTT ---
    m = 1 << ntt_log

    @jax.jit
    def gen_coeffs(key):
        raw = jax.random.bits(key, (fr.L, m), jnp.uint32) & 0xFFFF
        return fr._cond_sub_p(raw.at[fr.L - 1].set(raw[fr.L - 1] & 0x3FFF))

    coeffs = gen_coeffs(k3)
    ntt_t = timed(lambda: ntt.ntt(coeffs), iters)

    # --- field mul throughput at NTT size ---
    mm_t = timed(lambda: fr.mont_mul(coeffs, coeffs), max(iters, 4))

    # --- co-Groth16 prover core at 2^prove_log constraints (optional) ---
    # witness_map slice (mul_vec + iFFT/coset/FFT x3 + mul + sub) followed
    # by the h_query MSM — the wall-time-dominant phases of a prove
    # (groth16.rs:141-266). Synthetic data, real kernel shapes.
    prove_log = int(os.environ.get("COCIRCOM_BENCH_PROVE_LOG", "0"))
    prove_s = None
    if prove_log:
        np_ = 1 << prove_log

        @jax.jit
        def gen_vec(key):
            raw = jax.random.bits(key, (fr.L, np_), jnp.uint32) & 0xFFFF
            return fr._cond_sub_p(raw.at[fr.L - 1].set(raw[fr.L - 1] & 0x3FFF))

        ka, kb, kc2, kp = jax.random.split(jax.random.key(11), 4)
        av = gen_vec(ka)
        bv = gen_vec(kb)
        cv = gen_vec(kc2)

        @jax.jit
        def gen_points2(key):
            gen = ops.encode_points([curve.g1_gen])
            genb = jax.tree.map(
                lambda c: jnp.broadcast_to(c[..., 0:1], (c.shape[0], np_)), gen)
            small = jax.random.bits(key, (1, np_), jnp.uint32) & 0x7FFF | 1
            return ops.scalar_mul(genb, small, nbits=16)

        hpts = gen_points2(kp)
        fetch(hpts)
        from cocircom_tpu.fields.params import curve_by_name
        from cocircom_tpu.mpc.driver import PlainDriver

        d = PlainDriver(curve)

        def prove_core():
            c1 = fr.mont_mul(av, bv)
            a2 = d.fft(d.coset_shift(d.ifft(av)))
            b2 = d.fft(d.coset_shift(d.ifft(bv)))
            ab = fr.mont_mul(a2, b2)
            c2 = d.fft(d.coset_shift(d.ifft(c1)))
            h = fr.sub(ab, c2)
            return eng.msm(hpts, fr.from_mont(h), 16 * fr.L)

        prove_s = timed(prove_core, 1)

    line = {
        "metric": "msm_g1_points_per_sec_per_chip",
        "value": round(msm_pps, 1),
        "unit": "points/s/chip",
        # ratio vs the round-1 headline (35,456 points/s at 2^15, v5e)
        "vs_baseline": round(msm_pps / 35456.0, 2),
        "platform": platform,
        "device": dev,
        "msm_n": n,
        "msm_ms": round(msm_t * 1e3, 2),
        "ntt_n": m,
        "ntt_ms": round(ntt_t * 1e3, 2),
        "mont_mul_per_sec": round(m / mm_t, 1),
    }
    if prove_s is not None:
        line["prove_core_n"] = 1 << prove_log
        line["prove_core_s"] = round(prove_s, 2)
    print(json.dumps(line))


if __name__ == "__main__":
    main()
