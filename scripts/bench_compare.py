#!/usr/bin/env python
"""co-circom vs snarkjs comparison bench.

Parity: /root/reference/co-circom/co-circom/src/bin/bench-co-circom.rs
(:33-180) — runs the full pipeline (witness extension, proof, verify) with
per-phase wall times, and, when a `snarkjs` binary is available, the same
circuit through snarkjs for a side-by-side table. Offline images without
snarkjs (like this one) still get the co-circom column.

Usage:
  python scripts/bench_compare.py [--circuit NAME] [--runs N]
with NAME one of the committed Groth16 vector circuits (default poseidon).
"""

import argparse
import json
import os
import shutil
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# device selection must happen before jax import: default to local CPU (the
# snarkjs comparison is a host-vs-host shootout); pass --device tpu to route
# through the accelerator (uses the persistent compile cache, see
# docs/TPU_NOTES.md for first-compile wall times)
_dev = "cpu"
if "--device" in sys.argv:
    _dev = sys.argv[sys.argv.index("--device") + 1]
import jax  # noqa: E402  (sitecustomize may have imported it at boot)

if _dev == "cpu":
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ.pop("PALLAS_AXON_POOL_IPS", None)
    jax.config.update("jax_platforms", "cpu")
else:
    jax.config.update("jax_compilation_cache_dir",
                      "/root/.cache/cocircom_tpu/xla-tpu")

TV = "/root/reference/test_vectors/Groth16/bn254"


def timed(fn, *a, **k):
    t0 = time.perf_counter()
    out = fn(*a, **k)
    return out, time.perf_counter() - t0


def bench_ours(circuit: str, runs: int):
    from cocircom_tpu.fields.params import BN254
    from cocircom_tpu.io.witness import read_wtns
    from cocircom_tpu.io.zkey import read_groth16_zkey
    from cocircom_tpu.io.jsonio import parse_groth16_vk
    from cocircom_tpu.mpc.driver import plain_driver
    from cocircom_tpu.snark.groth16 import CoGroth16, SharedWitness
    from cocircom_tpu.snark.groth16_verify import verify_groth16

    base = f"{TV}/{circuit}"
    zkey, t_zkey = timed(
        lambda: read_groth16_zkey(open(f"{base}/circuit.zkey", "rb").read()))
    wtns = read_wtns(open(f"{base}/witness.wtns", "rb").read())
    vk = parse_groth16_vk(open(f"{base}/verification_key.json").read())
    d = plain_driver(BN254)
    vals = wtns.values_ints()
    n_pub = zkey.n_public + 1
    shared = SharedWitness(
        [int(v) for v in vals[:n_pub]],
        d.promote_public(d.fr.encode([int(v) for v in vals[n_pub:]])),
    )
    prover = CoGroth16(d)
    best_prove = None
    proof = None
    for _ in range(max(1, runs)):
        proof, t = timed(prover.prove, zkey, shared)
        best_prove = t if best_prove is None else min(best_prove, t)
    publics = [int(v) for v in vals[1:n_pub]]
    ok, t_verify = timed(verify_groth16, vk, proof, publics)
    assert ok, "proof did not verify"
    return {"zkey_load_s": round(t_zkey, 4),
            "prove_s": round(best_prove, 4),
            "verify_s": round(t_verify, 4)}


def bench_snarkjs(circuit: str, runs: int):
    snarkjs = shutil.which("snarkjs")
    if snarkjs is None:
        return None
    base = f"{TV}/{circuit}"
    import tempfile

    with tempfile.TemporaryDirectory() as tmp:
        proof_f = os.path.join(tmp, "proof.json")
        pub_f = os.path.join(tmp, "public.json")
        best = None
        for _ in range(max(1, runs)):
            t0 = time.perf_counter()
            subprocess.run(
                [snarkjs, "groth16", "prove", f"{base}/circuit.zkey",
                 f"{base}/witness.wtns", proof_f, pub_f],
                check=True, capture_output=True)
            t = time.perf_counter() - t0
            best = t if best is None else min(best, t)
        t0 = time.perf_counter()
        subprocess.run(
            [snarkjs, "groth16", "verify",
             f"{base}/verification_key.json", pub_f, proof_f],
            check=True, capture_output=True)
        t_verify = time.perf_counter() - t0
    return {"prove_s": round(best, 4), "verify_s": round(t_verify, 4)}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--circuit", default="poseidon")
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--device", default="cpu", choices=["cpu", "tpu"])
    args = ap.parse_args()

    ours = bench_ours(args.circuit, args.runs)
    theirs = bench_snarkjs(args.circuit, args.runs)
    result = {"circuit": args.circuit, "cocircom_tpu": ours,
              "snarkjs": theirs if theirs else "not installed"}
    print(json.dumps(result))
    if theirs:
        print(f"speedup prove: {theirs['prove_s'] / ours['prove_s']:.2f}x",
              file=sys.stderr)


if __name__ == "__main__":
    main()
