"""REP3 witness extension over bit-heavy KAT circuits.

Exercises the full shared op surface added in round 2 — comparisons, shifts,
bitwise ops (a2b/b2a), pow, and the sqrt accelerator — by running real KAT
circuits 3-party and comparing the opened witness against the host path.
Parity: tests/tests/circom/witness_extension_tests/rep3.rs.
"""

import json
import os

import pytest

from cocircom_tpu.fields.params import BN254
from cocircom_tpu.io.witness import read_wtns
from cocircom_tpu.mpc.driver import plain_driver
from cocircom_tpu.mpc.rep3 import Rep3Driver, share_field_vec
from cocircom_tpu.mpc.runner import run_parties
from cocircom_tpu.ops.field import get_field
from cocircom_tpu.vm.compiler import compile_circom
from cocircom_tpu.vm.mpc_vm import WitnessExtension, flatten_inputs

TV = "/root/reference/test_vectors/WitnessExtension"
pytestmark = pytest.mark.skipif(not os.path.isdir(TV), reason="no reference vectors")

FR = get_field(BN254.fr.p, "bn254.fr")


def _run_rep3(name):
    src = open(os.path.join(TV, "tests", f"{name}.circom")).read()
    circuit = compile_circom(
        src, BN254, link=[os.path.join(TV, "tests"), os.path.join(TV, "tests", "libs")]
    )
    inputs = json.load(open(os.path.join(TV, "kats", name, "input0.json")))
    vm_host = WitnessExtension(plain_driver(BN254), circuit)
    want = vm_host.run_host(inputs)

    flat = []
    slots = []
    for nm, sl in circuit.input_slots.items():
        flat.extend(flatten_inputs(inputs[nm]) if nm in inputs else flatten_inputs(inputs["in"]))
        slots.extend(sl)
    shares = share_field_vec(FR, FR.encode(flat), seed=31337)

    def party(i, net):
        d = Rep3Driver(BN254, net)
        vm = WitnessExtension(d, circuit)
        wshare = vm.run_shared(shares[i], slots)
        opened = d.open_many(wshare)
        return [int(v) for v in FR.from_limbs(FR.from_mont(opened))]

    results = run_parties(party)
    assert results[0] == results[1] == results[2]
    assert results[0] == want, "REP3 witness != host witness"


# lessthan: signed comparisons (a2b Kogge-Stone); binsum: shr/band bit
# decomposition; sqrt_test: masked-open sqrt + sign correction
@pytest.mark.parametrize("name", ["lessthan", "binsum_test", "sqrt_test"])
def test_rep3_bit_heavy_kats(name):
    _run_rep3(name)
