"""Profile ONE 3-party REP3 witness-extension corpus circuit.

Splits wall time into XLA-compile vs everything else, counts distinct
compiled programs, and reports per-phase timings — the data VERDICT r3 #7a
asks for before attacking the ~21 min/circuit cost.

Usage: python scripts/profile_corpus.py [circuit ...]   (default: pointbits_loopback)
"""
import json
import os
import sys
import threading
import time

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.pop("PALLAS_AXON_POOL_IPS", None)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# --- instrument XLA compiles (count + wall, thread-aggregated) ----------
_stats = {"n": 0, "s": 0.0}
_lock = threading.RLock()

import jax._src.compiler as _jc  # noqa: E402

_orig = _jc.backend_compile_and_load


def _wrapped(*a, **kw):
    t0 = time.time()
    with _lock:  # also serializes (tests/conftest.py LLVM race)
        out = _orig(*a, **kw)
    dt = time.time() - t0
    _stats["n"] += 1
    _stats["s"] += dt
    return out


_jc.backend_compile_and_load = _wrapped

from cocircom_tpu.fields.params import BN254  # noqa: E402
from cocircom_tpu.mpc.driver import plain_driver  # noqa: E402
from cocircom_tpu.mpc.rep3 import Rep3Driver, share_field_vec  # noqa: E402
from cocircom_tpu.mpc.runner import run_parties  # noqa: E402
from cocircom_tpu.ops.field import get_field  # noqa: E402
from cocircom_tpu.vm.compiler import compile_circom  # noqa: E402
from cocircom_tpu.vm.mpc_vm import WitnessExtension, flatten_inputs  # noqa: E402

TV = "/root/reference/test_vectors/WitnessExtension"
FR = get_field(BN254.fr.p, "bn254.fr")


def run_one(name):
    src = open(os.path.join(TV, "tests", f"{name}.circom")).read()
    t0 = time.time()
    circuit = compile_circom(
        src, BN254,
        link=[os.path.join(TV, "tests"), os.path.join(TV, "tests", "libs")],
    )
    t_cc = time.time() - t0
    inputs = json.load(open(os.path.join(TV, "kats", name, "input0.json")))
    t0 = time.time()
    want = WitnessExtension(plain_driver(BN254), circuit).run_host(inputs)
    t_host = time.time() - t0

    flat = []
    slots = []
    if all(nm in inputs for nm in circuit.input_slots):
        for nm, sl in circuit.input_slots.items():
            flat.extend(flatten_inputs(inputs[nm]))
            slots.extend(sl)
    else:
        flat = flatten_inputs(inputs["in"])
        slots = [s for sl in circuit.input_slots.values() for s in sl]
    shares = share_field_vec(FR, FR.encode(flat), seed=31337)

    lvl_hist: dict = {}
    widths: dict = {}
    for level in circuit.levels:
        per: dict = {}
        for op, _, _ in level:
            lvl_hist[op] = lvl_hist.get(op, 0) + 1
            per[op] = per.get(op, 0) + 1
        for op, n in per.items():
            w = max(1, 1 << (n - 1).bit_length())
            widths.setdefault(op, set()).add(w)

    c0 = _stats["n"]
    s0 = _stats["s"]
    t0 = time.time()

    def party(i, net):
        d = Rep3Driver(BN254, net)
        vm = WitnessExtension(d, circuit)
        wshare = vm.run_shared(shares[i], slots)
        opened = d.open_many(wshare)
        return [int(v) for v in FR.from_limbs(FR.from_mont(opened))]

    results = run_parties(party)
    t_run = time.time() - t0
    ok = results[0] == results[1] == results[2] == want
    print(json.dumps({
        "circuit": name,
        "ok": ok,
        "n_levels": len(circuit.levels),
        "n_ops": sum(lvl_hist.values()),
        "op_hist": dict(sorted(lvl_hist.items(), key=lambda kv: -kv[1])),
        "pow2_widths_per_op": {k: sorted(v) for k, v in widths.items()},
        "circuit_compile_s": round(t_cc, 1),
        "host_run_s": round(t_host, 1),
        "mpc_run_s": round(t_run, 1),
        "xla_compiles": _stats["n"] - c0,
        "xla_compile_s": round(_stats["s"] - s0, 1),
        "exec_s": round(t_run - (_stats["s"] - s0), 1),
    }), flush=True)


if __name__ == "__main__":
    names = sys.argv[1:] or ["pointbits_loopback"]
    for n in names:
        run_one(n)
