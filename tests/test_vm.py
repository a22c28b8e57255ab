"""Witness extension: compiler + VM vs committed circom KAT witnesses."""

import json
import os

import jax.numpy as jnp
import numpy as np
import pytest

from cocircom_tpu.fields.params import BN254
from cocircom_tpu.io.witness import read_wtns
from cocircom_tpu.mpc.driver import PlainDriver
from cocircom_tpu.mpc.rep3 import Rep3Driver, combine_field_shares, share_field_vec
from cocircom_tpu.mpc.runner import run_parties
from cocircom_tpu.ops.field import get_field
from cocircom_tpu.vm.compiler import compile_circom
from cocircom_tpu.vm.mpc_vm import WitnessExtension, flatten_inputs

TV = "/root/reference/test_vectors/WitnessExtension"
pytestmark = pytest.mark.skipif(not os.path.isdir(TV), reason="no reference vectors")

FR = get_field(BN254.fr.p, "bn254.fr")


def load_kat(name, idx=0):
    src = open(os.path.join(TV, "tests", f"{name}.circom")).read()
    base = os.path.join(TV, "kats", name)
    inputs = json.load(open(os.path.join(base, f"input{idx}.json")))
    w = read_wtns(open(os.path.join(base, f"witness{idx}.wtns"), "rb").read())
    return src, inputs, w.values_ints()


@pytest.mark.parametrize("name", ["multiplier16"])
def test_host_witness_matches_kat(name):
    src, inputs, want = load_kat(name)
    circuit = compile_circom(src, BN254)
    d = PlainDriver(BN254)
    vm = WitnessExtension(d, circuit)
    got = vm.run_host(inputs)
    assert got == want, f"n={len(got)} vs {len(want)}"


def test_rep3_witness_extension_multiplier16():
    src, inputs, want = load_kat("multiplier16")
    circuit = compile_circom(src, BN254)
    # dealer: share the flat input vector
    flat = flatten_inputs(inputs["in"])
    slots = circuit.input_slots["in"]
    shares = share_field_vec(FR, FR.encode(flat), seed=77)

    def party(i, net):
        d = Rep3Driver(BN254, net)
        vm = WitnessExtension(d, circuit)
        wshare = vm.run_shared(shares[i], slots)
        opened = d.open_many(wshare)
        return [int(v) for v in FR.from_limbs(FR.from_mont(opened))]

    results = run_parties(party)
    assert results[0] == want
    assert results[1] == want


def test_compile_control_flow_loops():
    src = """
    pragma circom 2.0.0;
    template Acc(N) {
        signal input in[N];
        signal output out;
        var acc = 0;
        for (var i = 0; i < N; i++) {
            if (i % 2 == 0) { acc += in[i] * in[i]; } else { acc += 2 * in[i]; }
        }
        out <== acc;
    }
    component main = Acc(5);
    """
    circuit = compile_circom(src, BN254)
    vm = WitnessExtension(PlainDriver(BN254), circuit)
    vals = vm.run_host({"in": [1, 2, 3, 4, 5]})
    want = (1 * 1 + 2 * 2 + 3 * 3 + 2 * 4 + 5 * 5) % BN254.fr.p
    assert vals[circuit.output_slots["out"][0]] == want


def test_compile_functions_and_comparisons():
    src = """
    pragma circom 2.0.0;
    function fib(n) {
        var a = 0; var b = 1;
        for (var i = 0; i < n; i++) { var t = a + b; a = b; b = t; }
        return a;
    }
    template T() {
        signal input x;
        signal output out;
        signal output cmp;
        out <== x * fib(10);
        cmp <-- x > 5 ? 1 : 0;
    }
    component main = T();
    """
    circuit = compile_circom(src, BN254)
    vm = WitnessExtension(PlainDriver(BN254), circuit)
    vals = vm.run_host({"x": 7})
    assert vals[circuit.output_slots["out"][0]] == 7 * 55
    assert vals[circuit.output_slots["cmp"][0]] == 1
