"""Benchmark harness: MSM / NTT / field-mul throughput on real hardware.

Prints the headline JSON line
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, ...extras}
IMMEDIATELY after the fast metrics (MSM/NTT/mont_mul) are measured, then
re-emits a superset of the same line after each slow leg (co-UltraHonk
co-prove, 2^N co-Groth16 REP3 prove) completes.  Each slow leg runs under
its own deadline so a timeout can never erase already-measured numbers
(round-3 post-mortem: one line at the very end + driver timeout = empty
artifact).  Parsers taking either the first or the last JSON line get a
valid, monotonically-growing record.

Headline metric (BASELINE.json): G1 MSM points/s/chip on BN254.

Measurement notes for the axon-tunneled TPU:
  * host<->device bandwidth through the relay is tiny and execution is
    effectively lazy until a fetch — so ALL benchmark inputs are generated
    ON-DEVICE (jax.random / tiny constants) and timing is measured from
    dispatch to a 4-byte result fetch.

Env knobs: COCIRCOM_BENCH_MSM_LOG (default 20), COCIRCOM_BENCH_NTT_LOG
(default 22), COCIRCOM_BENCH_ITERS (default 2), COCIRCOM_BENCH_PROVE_LOG
(default 20 = the BASELINE north-star prover shape; 0 disables),
COCIRCOM_BENCH_PROVE_DEADLINE_S (default 5400), COCIRCOM_BENCH_HONK
(default 1; poseidon-size CoUltraHonk REP3 co-prove),
COCIRCOM_BENCH_HONK_DEADLINE_S (default 1800).
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


def _serialize_compiles():
    """Serialize XLA compilation across the 3 party threads: XLA:CPU's
    LLVM ORC JIT races concurrent compiles (tests/conftest.py), and on the
    TPU it avoids 3x duplicate remote compiles of identical programs."""
    import threading

    try:
        import jax._src.compiler as _jc

        lock = threading.RLock()
        for name in ("backend_compile_and_load", "compile_or_get_cached"):
            orig = getattr(_jc, name)
            if getattr(orig, "_cocircom_locked", False):
                continue

            def wrap(orig=orig):
                def wrapped(*a, **kw):
                    with lock:
                        return orig(*a, **kw)

                wrapped._cocircom_locked = True
                return wrapped

            setattr(_jc, name, wrap())
    except (ImportError, AttributeError):
        pass


def run_with_deadline(fn, deadline_s: float):
    """Run fn() in a daemon thread; return (result, None) or (None, err).
    err is 'timeout' if the deadline lapsed. Already-printed bench lines
    survive either way — the worker can't block process exit."""
    import threading

    box = {}

    def work():
        try:
            box["out"] = fn()
        except BaseException as e:  # noqa: BLE001
            import traceback

            traceback.print_exc()
            box["err"] = f"{type(e).__name__}: {e}"

    th = threading.Thread(target=work, daemon=True)
    t0 = time.time()
    th.start()
    th.join(timeout=deadline_s)
    if th.is_alive():
        return None, f"timeout after {round(time.time() - t0, 1)}s"
    if "err" in box:
        return None, box["err"]
    return box["out"], None


def bench_co_honk(curve) -> dict:
    """Poseidon-size CoUltraHonk REP3 co-prove wall time on this chip
    (VERDICT r3 #10: the honk stack's first recorded perf number).
    Mirrors tests/test_co_honk.py::test_co_honk_matches_plain[poseidon]."""
    import jax.numpy as jnp

    _serialize_compiles()

    from cocircom_tpu.honk.builder import UltraCircuitBuilder, acir_to_format
    from cocircom_tpu.honk.co_prover import CoUltraHonk
    from cocircom_tpu.honk.crs import TestCrs
    from cocircom_tpu.mpc.rep3 import Rep3Driver, share_field_vec
    from cocircom_tpu.mpc.runner import run_parties
    from cocircom_tpu.noir.acir import load_program_json, parse_witness_stack

    tv = "/root/reference/test_vectors/noir/poseidon/kat"
    circuits, _abi = load_program_json(f"{tv}/poseidon.json")
    stack = parse_witness_stack(open(f"{tv}/poseidon.gz", "rb").read())
    wmap = stack[0][1]
    witness = [wmap.get(i, 0) for i in range(max(wmap) + 1)]
    circuit = circuits[0]
    af = acir_to_format(circuit)
    varnum = af.varnum

    fr = get_field(curve.fr.p, curve.name + ".fr")
    vec = fr.to_mont(jnp.asarray(fr.to_limbs(
        witness[:varnum] + [0] * (varnum - len(witness)))))
    shares3 = share_field_vec(fr, vec, seed=31)

    def party(pid, net):
        d = Rep3Driver(curve, net)
        b = UltraCircuitBuilder(acir_to_format(circuit), [0] * varnum)
        return CoUltraHonk(d, TestCrs()).prove(b, shares3[pid])

    def run_once():
        t0 = time.time()
        proofs = run_parties(party, 3)
        dt = time.time() - t0
        assert proofs[0] == proofs[1] == proofs[2]
        return dt

    cold = run_once()  # includes every XLA compile in the co-honk path
    warm = run_once()
    return {"honk_circuit": "poseidon", "honk_varnum": af.varnum,
            "honk_prove_s": round(warm, 2), "honk_cold_s": round(cold, 2),
            "honk_protocol": "rep3"}


def bench_rep3_prove(curve, prove_log: int, deadline_s: float) -> dict:
    """Wall time of a full 3-party co-Groth16 REP3 prove at 2^prove_log
    constraints on this chip (synthetic device-built zkey, real prover).
    Runs cold (compiling) then, if the remaining budget allows, warm; always
    returns whatever was measured."""
    import threading
    from types import SimpleNamespace

    _serialize_compiles()

    from cocircom_tpu.fields.ec_host import ec_mul
    from cocircom_tpu.io.zkey import G1Array, G2Array
    from cocircom_tpu.mpc.net import LocalNetwork
    from cocircom_tpu.mpc.rep3 import Rep3Driver, share_field_vec
    from cocircom_tpu.ops.curve import g1_ops, g2_ops
    from cocircom_tpu.pairing.tower import Tower
    from cocircom_tpu.snark.groth16 import CoGroth16, SharedWitness

    fr = get_field(curve.fr.p, curve.name + ".fr")
    g1 = g1_ops(curve)
    g2 = g2_ops(curve)
    n_vars = 1 << prove_log
    domain = 1 << prove_log
    n_public = 1
    nc = domain - 10
    wlen = n_vars - 1 - n_public

    def gen_g1(key, n):
        @jax.jit
        def go(key):
            gen = g1.encode_points([curve.g1_gen])
            genb = jax.tree.map(
                lambda c: jnp.broadcast_to(c[..., 0:1], (c.shape[0], n)), gen)
            small = jax.random.bits(key, (1, n), jnp.uint32) & 0x7FFF | 1
            pts = g1.scalar_mul(genb, small, nbits=16)
            ax, ay = g1.to_affine_limbs(pts)
            return ax, ay

        ax, ay = go(key)
        return G1Array(x=ax, y=ay)

    def gen_g2(key, n):
        @jax.jit
        def go(key):
            gen = g2.encode_points([curve.g2_gen])
            genb = jax.tree.map(
                lambda c: jnp.broadcast_to(c[..., 0:1], (c.shape[0], n)), gen)
            small = jax.random.bits(key, (1, n), jnp.uint32) & 0x7FFF | 1
            pts = g2.scalar_mul(genb, small, nbits=16)
            (x0, x1), (y0, y1) = g2.to_affine_limbs(pts)
            return x0, x1, y0, y1

        x0, x1, y0, y1 = go(key)
        return G2Array(x0=x0, x1=x1, y0=y0, y1=y1)

    ks = jax.random.split(jax.random.key(42), 8)
    a_query = gen_g1(ks[0], n_vars)
    b_g1_query = gen_g1(ks[1], n_vars)
    l_query = gen_g1(ks[2], wlen)
    h_query = gen_g1(ks[3], domain)
    b_g2_query = gen_g2(ks[4], n_vars)
    fetch(a_query.x)

    # COO matrices: one term per row, device-built
    @jax.jit
    def gen_mats():
        rows = jnp.arange(nc, dtype=jnp.uint32)
        a_cols = (rows * 7 + 1) % n_vars
        b_cols = (rows * 13 + 3) % n_vars
        coeffs = jnp.broadcast_to(fr.one_mont(()).reshape(fr.L, 1), (fr.L, nc))
        return rows, a_cols, b_cols, coeffs

    rows, a_cols, b_cols, coeffs = gen_mats()
    mats = SimpleNamespace(
        num_constraints=nc, num_instance=n_public + 1,
        a_rows=rows, a_cols=a_cols, a_coeffs=coeffs,
        b_rows=rows, b_cols=b_cols, b_coeffs=coeffs,
    )

    t = Tower(curve)
    gh = (t.fp(curve.g1_gen[0]), t.fp(curve.g1_gen[1]))
    (x0, x1), (y0, y1) = curve.g2_gen
    g2h = (t.fp2(x0, x1), t.fp2(y0, y1))

    def aff1(k):
        p = ec_mul(gh, k)
        return (p[0].v, p[1].v)

    def aff2(k):
        p = ec_mul(g2h, k)
        return ((p[0].c0.v, p[0].c1.v), (p[1].c0.v, p[1].c1.v))

    zkey = SimpleNamespace(
        curve=curve, n_vars=n_vars, n_public=n_public, domain_size=domain,
        pow=prove_log, alpha_g1=aff1(3), beta_g1=aff1(5), beta_g2=aff2(5),
        gamma_g2=aff2(7), delta_g1=aff1(11), delta_g2=aff2(11),
        ic=None, a_query=a_query, b_g1_query=b_g1_query,
        b_g2_query=b_g2_query, l_query=l_query, h_query=h_query,
        matrices=mats,
    )

    @jax.jit
    def gen_wit(key):
        raw = jax.random.bits(key, (fr.L, wlen), jnp.uint32) & 0xFFFF
        return fr._cond_sub_p(raw.at[fr.L - 1].set(raw[fr.L - 1] & 0x3FFF))

    wit = fr.to_mont(gen_wit(ks[5]))
    shares = share_field_vec(fr, wit, seed=4242)
    publics = [1, 12345]

    def run_once(budget_s):
        nets = LocalNetwork.create(3, device=True)
        results = [None] * 3
        errs = [None] * 3

        def party(i):
            try:
                d = Rep3Driver(curve, nets[i])
                prover = CoGroth16(d)
                results[i] = prover.prove(
                    zkey, SharedWitness(publics, shares[i]))
            except BaseException as e:  # noqa: BLE001
                errs[i] = e

        th = [threading.Thread(target=party, args=(i,), daemon=True)
              for i in range(3)]
        t0 = time.time()
        for x in th:
            x.start()
        for x in th:
            x.join(timeout=budget_s)
        if any(x.is_alive() for x in th):
            raise TimeoutError(f"prove leg exceeded {budget_s:.0f}s budget")
        if any(errs):
            raise next(e for e in errs if e)
        return time.time() - t0

    t_start = time.time()
    cold = run_once(deadline_s)  # compiles every program in the prove path
    out = {"prove_n": 1 << prove_log, "prove_protocol": "rep3",
           "prove_cold_s": round(cold, 2), "prove_s": round(cold, 2),
           "prove_includes_compile": True}
    remaining = deadline_s - (time.time() - t_start)
    if remaining > cold * 1.2:
        warm = run_once(remaining)
        out["prove_s"] = round(warm, 2)
        out["prove_includes_compile"] = False
    return out


def _attach_recorded(line):
    """If a slow leg can't finish under the driver's deadline, attach the
    last measurement recorded in docs/measured_perf.json (committed by a
    full-length manual run), clearly labeled as recorded-not-fresh."""
    try:
        with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               "docs", "measured_perf.json")) as f:
            rec = json.load(f)
        for k, v in rec.items():
            line[f"recorded_{k}"] = v
    except OSError:
        pass


def main():
    msm_log = int(os.environ.get("COCIRCOM_BENCH_MSM_LOG", "20"))
    ntt_log = int(os.environ.get("COCIRCOM_BENCH_NTT_LOG", "22"))
    iters = int(os.environ.get("COCIRCOM_BENCH_ITERS", "2"))

    msm_c = int(os.environ.get("COCIRCOM_BENCH_MSM_C", "0")) or None

    curve = BN254
    fr = get_field(curve.fr.p, curve.name + ".fr")
    ops = g1_ops(curve)
    eng = msm_engine(ops, msm_c, scalar_bits=curve.fr.p.bit_length())
    ntt = ntt_engine(fr, curve.fr)
    platform = jax.devices()[0].platform
    dev = str(jax.devices()[0])

    # Global watchdog (round-4 post-mortem: the driver's `timeout` killed
    # the process mid-compile before ANY line printed, rc=124, empty
    # artifact — twice).  The watchdog prints whatever has been measured
    # so far and exits 0 before an external timeout can fire.
    line = {
        "metric": "msm_g1_points_per_sec_per_chip",
        "value": 0.0,
        "unit": "points/s/chip",
        "vs_baseline": 0.0,
        "platform": platform,
        "device": dev,
        "partial": True,
    }
    total_deadline = float(
        os.environ.get("COCIRCOM_BENCH_TOTAL_DEADLINE_S", "1500"))
    t_bench0 = time.time()

    def watchdog():
        time.sleep(total_deadline)
        line["bench_wall_s"] = round(time.time() - t_bench0, 1)
        line["watchdog_fired"] = True
        print(json.dumps(line), flush=True)
        sys.stdout.flush()
        os._exit(0)

    import threading

    threading.Thread(target=watchdog, daemon=True).start()

    def emit():
        line["bench_wall_s"] = round(time.time() - t_bench0, 1)
        print(json.dumps(line), flush=True)

    # Round-4 post-mortem: the driver timeout killed the process before the
    # first measurement line printed (first-contact Mosaic compiles ran for
    # minutes) -- so the very first act is emitting a partial line, making
    # an empty artifact impossible.
    emit()

    # Legs run cheapest-compile first so SOMETHING prints within minutes
    # even on a cold remote-compile cache.
    key = jax.random.key(7)
    k1, k2, k3 = jax.random.split(key, 3)
    m = 1 << ntt_log

    @jax.jit
    def gen_coeffs(key):
        raw = jax.random.bits(key, (fr.L, m), jnp.uint32) & 0xFFFF
        return fr._cond_sub_p(raw.at[fr.L - 1].set(raw[fr.L - 1] & 0x3FFF))

    coeffs = gen_coeffs(k3)
    fetch(coeffs)

    # --- 1. field mul throughput at NTT size (smallest program) ---
    mm_t, err = run_with_deadline(
        lambda: timed(lambda: fr.mont_mul(coeffs, coeffs), max(iters, 4)),
        float(os.environ.get("COCIRCOM_BENCH_LEG_DEADLINE_S", "420")))
    if mm_t:
        line["mont_mul_per_sec"] = round(m / mm_t, 1)
    else:
        line["mont_mul_error"] = err
    emit()

    # --- 2. NTT ---
    ntt_t, err = run_with_deadline(
        lambda: timed(lambda: ntt.ntt(coeffs), iters),
        float(os.environ.get("COCIRCOM_BENCH_LEG_DEADLINE_S", "420")))
    line["ntt_n"] = m
    if ntt_t:
        line["ntt_ms"] = round(ntt_t * 1e3, 2)
    else:
        line["ntt_error"] = err
    emit()

    # --- 3. MSM: 2^17 first (fallback headline), then the full size ---
    def msm_at(log_n):
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
        t = timed(lambda: eng.msm(pts, scalars), iters)
        return n, t

    for log_n in sorted({min(17, msm_log), msm_log}):
        out, err = run_with_deadline(
            lambda log_n=log_n: msm_at(log_n),
            float(os.environ.get("COCIRCOM_BENCH_MSM_DEADLINE_S", "900")))
        if out is None:
            line[f"msm_2^{log_n}_error"] = err
            emit()
            continue
        n, msm_t = out
        msm_pps = n / msm_t
        line["value"] = round(msm_pps, 1)
        # ratio vs the round-1 headline (35,456 points/s at 2^15, v5e)
        line["vs_baseline"] = round(msm_pps / 35456.0, 2)
        line["msm_n"] = n
        line["msm_ms"] = round(msm_t * 1e3, 2)
        line.pop("partial", None)
        emit()

    # --- co-UltraHonk REP3 co-prove (poseidon size) under its own deadline.
    if int(os.environ.get("COCIRCOM_BENCH_HONK", "1")):
        honk_deadline = float(
            os.environ.get("COCIRCOM_BENCH_HONK_DEADLINE_S", "600"))
        honk, err = run_with_deadline(
            lambda: bench_co_honk(curve), honk_deadline)
        if honk:
            line.update(honk)
        else:
            line["honk_error"] = err
            _attach_recorded(line)
        print(json.dumps(line), flush=True)

    # --- the BASELINE north star: full co-Groth16 REP3 prove at
    # 2^prove_log constraints. Three co-located parties (threads) share the
    # chip over a device-resident LocalNetwork; the zkey is synthetic but
    # device-built and drives the REAL prover (snark/groth16.py
    # CoGroth16.prove: witness map, iFFT/coset/FFT, all five query MSMs
    # incl. G2, the 5-round open endgame — groth16.rs:113-326 parity).
    prove_log = int(os.environ.get("COCIRCOM_BENCH_PROVE_LOG", "20"))
    if prove_log:
        prove_deadline = float(
            os.environ.get("COCIRCOM_BENCH_PROVE_DEADLINE_S", "900"))
        prove, err = run_with_deadline(
            lambda: bench_rep3_prove(curve, prove_log, prove_deadline),
            deadline_s=prove_deadline + 60)
        if prove:
            line.update(prove)
        else:
            line["prove_error"] = err
            _attach_recorded(line)
        print(json.dumps(line), flush=True)

    # Daemon worker threads (a timed-out prove leg) must not block exit.
    sys.stdout.flush()
    sys.stderr.flush()
    os._exit(0)


if __name__ == "__main__":
    main()
