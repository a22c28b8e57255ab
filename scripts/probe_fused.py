"""Fused-EC-kernel probe on the live TPU: correctness first, then timings.

Stages (progress printed per stage so a tail of the log shows where a slow
remote compile is):
  A  backend init (retries while the axon worker recovers)
  B  mont_mul + butterfly correctness at 4096 lanes (new split-carry kernel)
  C  fused EC add + wave-add correctness vs HOST curve math (64 lanes)
  D  MSM correctness vs host Pippenger at n=256 (exercises the fused wave
     path end to end) and timings: mont_mul 2^20, MSM 2^15/2^17
  E  optional Kogge-Stone A/B of the field kernels (COCIRCOM_PROBE_KS=1)

Run:  timeout 7000 python scripts/probe_fused.py   (background; do NOT kill
mid-compile — a killed client leaves the remote worker busy for ~20 min,
docs/TPU_NOTES.md)."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


def main():
    import jax

    for attempt in range(40):
        try:
            backend = jax.default_backend()
            break
        except RuntimeError as e:
            log(f"A: backend init failed (attempt {attempt}): {e}")
            time.sleep(60)
            try:
                jax.clear_backends()
            except Exception:
                pass
    else:
        log("A: giving up on backend init")
        return 1
    jax.config.update(
        "jax_compilation_cache_dir", "/root/.cache/cocircom_tpu/xla-" + backend
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    log(f"A: backend = {backend}, device = {jax.devices()[0]}")

    import jax.numpy as jnp
    import numpy as np

    from cocircom_tpu.fields.ec_host import ec_add, ec_mul
    from cocircom_tpu.fields.params import BN254
    from cocircom_tpu.ops import pallas_field
    from cocircom_tpu.ops.curve import ProjPoint, g1_ops
    from cocircom_tpu.ops.field import get_field
    from cocircom_tpu.ops.msm import msm_engine

    f = get_field(BN254.fr.p, "bn254.fr")
    rng = np.random.default_rng(7)

    # ---- B: field kernels ----
    vals = [int.from_bytes(rng.bytes(40), "little") % f.p for _ in range(4096)]
    vals[:3] = [f.p - 1, 1, (f.R - 1) % f.p]
    a = jnp.asarray(f.to_limbs(vals))
    b = jnp.asarray(f.to_limbs(vals[::-1]))
    ref_host = [x * y % f.p * pow(f.R, -1, f.p) % f.p
                for x, y in zip(vals, vals[::-1])]
    t0 = time.time()
    got = np.asarray(pallas_field.mont_mul_pallas(f, a, b))
    log(f"B: mont_mul first call {time.time()-t0:.1f}s")
    got_ints = [int(v) for v in f.from_limbs(got)]
    assert got_ints == ref_host, "mont_mul MISMATCH vs host"
    log("B: mont_mul OK (4096 lanes vs host ints)")
    t = f.mont_mul(b, a)
    re_, ro_ = np.asarray(f.add(a, t)), np.asarray(f.sub(a, t))
    t0 = time.time()
    ge, go = pallas_field.butterfly_pallas(f, a, b, a)
    ok = bool((re_ == np.asarray(ge)).all() and (ro_ == np.asarray(go)).all())
    log(f"B: butterfly first call {time.time()-t0:.1f}s, match={ok}")
    assert ok

    # ---- C: fused EC add vs host ----
    from cocircom_tpu.pairing.tower import Fp

    ops = g1_ops(BN254)
    qmod = BN254.fq.p
    g1 = (Fp(BN254.g1_gen[0], qmod), Fp(BN254.g1_gen[1], qmod))

    def aff(pt):
        return None if pt is None else (pt[0].v, pt[1].v)

    n = 64
    ks = rng.integers(1, 1 << 14, n)
    ms = rng.integers(1, 1 << 14, n)
    host_p = [ec_mul(g1, int(k)) for k in ks]
    host_q = [ec_mul(g1, int(m)) for m in ms]
    host_q[5] = None  # identity lane
    host_sum = [ec_add(p, q) for p, q in zip(host_p, host_q)]
    P = ops.encode_points([aff(p) for p in host_p])
    Q = ops.encode_points([aff(p) for p in host_q])
    t0 = time.time()
    R = ops.add(P, Q)
    got_aff = ops.decode_points(R)
    log(f"C: fused ec add first call {time.time()-t0:.1f}s")
    assert got_aff == [aff(s) for s in host_sum], "EC add MISMATCH vs host"
    log("C: fused EC add OK (64 lanes vs host curve math)")

    # ---- D: MSM correctness (n=256) then timings ----
    eng = msm_engine(ops)
    n = 256
    sc = rng.integers(0, 1 << 16, n)
    pts_host = [ec_mul(g1, int(k)) for k in rng.integers(1, 1 << 14, n)]
    want = None
    for s, pt in zip(sc, pts_host):
        if int(s):
            term = ec_mul(pt, int(s))
            want = term if want is None else ec_add(want, term)
    pts = ops.encode_points([aff(p) for p in pts_host])
    limbs = np.zeros((f.L, n), np.uint32)
    limbs[0] = sc & 0xFFFF
    t0 = time.time()
    res = eng.msm(pts, jnp.asarray(limbs), 16)
    got1 = ops.decode_points(jax.tree.map(lambda c: c[..., None], res))[0]
    log(f"D: msm n=256 first call {time.time()-t0:.1f}s")
    assert got1 == aff(want), "MSM MISMATCH vs host"
    log("D: MSM OK (n=256 vs host Pippenger)")

    iters = int(os.environ.get("COCIRCOM_PROBE_ITERS", "3"))

    def fetch(x):
        leaf = jax.tree.leaves(x)[0]
        return np.asarray(jax.device_get(leaf.reshape(-1)[:1]))

    def timed(fn):
        fetch(fn())
        t0 = time.time()
        out = None
        for _ in range(iters):
            out = fn()
        fetch(out)
        return (time.time() - t0) / iters

    m = 1 << 20
    key = jax.random.key(3)

    @jax.jit
    def gen_vec(key):
        raw = jax.random.bits(key, (f.L, m), jnp.uint32) & 0xFFFF
        return f._cond_sub_p(raw.at[f.L - 1].set(raw[f.L - 1] & 0x3FFF))

    big = gen_vec(key)
    mm_t = timed(lambda: f.mont_mul(big, big))
    log(f"D: mont_mul 2^20: {mm_t*1e3:.1f} ms = {m/mm_t/1e6:.1f} M/s")

    for logn in (15, 17):
        nn = 1 << logn

        @jax.jit
        def gen_points(key, nn=nn):
            gen = ops.encode_points([BN254.g1_gen])
            genb = jax.tree.map(
                lambda c: jnp.broadcast_to(c[..., 0:1], (c.shape[0], nn)), gen
            )
            small = jax.random.bits(key, (1, nn), jnp.uint32) & 0x7FFF | 1
            return ops.scalar_mul(genb, small, nbits=16)

        @jax.jit
        def gen_scalars(key, nn=nn):
            s = jax.random.bits(key, (f.L, nn), jnp.uint32) & 0xFFFF
            return s.at[f.L - 1].set(s[f.L - 1] & 0x3FFF)

        k1, k2 = jax.random.split(jax.random.key(7))
        t0 = time.time()
        pts = gen_points(k1)
        fetch(pts)
        log(f"D: gen_points 2^{logn} {time.time()-t0:.1f}s")
        scs = gen_scalars(k2)
        msm_t = timed(lambda: eng.msm(pts, scs, 16 * f.L))
        log(f"D: MSM 2^{logn}: {msm_t*1e3:.0f} ms = {nn/msm_t/1e3:.1f} K pts/s")

    # ---- E: KS A/B on the field kernels ----
    if os.environ.get("COCIRCOM_PROBE_KS"):
        pallas_field.USE_KS = True
        got = np.asarray(pallas_field.mont_mul_pallas(f, a, b))
        assert [int(v) for v in f.from_limbs(got)] == ref_host, "KS MISMATCH"
        mm_ks = timed(lambda: pallas_field.mont_mul_pallas(f, big, big))
        log(f"E: mont_mul 2^20 KS: {mm_ks*1e3:.1f} ms = {m/mm_ks/1e6:.1f} M/s "
            f"(serial {mm_t*1e3:.1f} ms)")
        pallas_field.USE_KS = False
    log("probe complete")
    return 0


if __name__ == "__main__":
    sys.exit(main())
