"""r1cs wire2label-pinned witness layout (VERDICT r3 #5).

When an r1cs is available (the zkey-interop case: snarkjs always ships
circuit.r1cs next to circuit.zkey), the compiler constrains the O2
simplifier's pivot choice to keep EXACTLY the label set circom kept
(`compile_circom(keep_labels=..., n_labels=...)`), reproducing circom's
witness layout regardless of its internal pivot heuristic.

Reference: wire2label map format /root/reference/co-circom/circom-types/
src/r1cs.rs:75-104; the reference consumes the map for witness checks.
"""

import os

import pytest

from cocircom_tpu.fields.params import BN254, curve_by_name
from cocircom_tpu.io.r1cs import read_r1cs
from cocircom_tpu.io.witness import read_wtns
from cocircom_tpu.mpc.driver import plain_driver
from cocircom_tpu.vm.compiler import compile_circom
from cocircom_tpu.vm.mpc_vm import WitnessExtension

TV = "/root/reference/test_vectors"
LIBS = [f"{TV}/WitnessExtension/tests", f"{TV}/WitnessExtension/tests/libs"]
pytestmark = pytest.mark.skipif(
    not os.path.isdir(TV), reason="no reference vectors"
)


def _poseidon_src(n):
    return (
        'pragma circom 2.0.0;\ninclude "poseidon.circom";\n'
        f"component main = Poseidon({n});\n"
    )


def _run_case(base, n_inputs):
    r1 = read_r1cs(open(f"{base}/circuit.r1cs", "rb").read())
    w = read_wtns(open(f"{base}/witness.wtns", "rb").read()).values_ints()
    curve = r1.curve
    c = compile_circom(
        _poseidon_src(n_inputs), curve, link=LIBS,
        keep_labels=r1.wire_mapping[1:], n_labels=r1.n_labels,
    )
    inputs = {"inputs": [str(w[2 + i]) for i in range(n_inputs)]}
    got = WitnessExtension(plain_driver(curve), c).run_host(inputs)
    assert got == w  # byte-exact layout pinned by the r1cs


def test_poseidon1_bn254_with_label_gap():
    """Poseidon(1)'s label space has a 2-label gap (n_labels = 583 vs 580
    declared signals) — exercises the gap-position search."""
    _run_case(f"{TV}/Groth16/bn254/poseidon", 1)


def test_poseidon2_bn254_zero_gap():
    _run_case(f"{TV}/Plonk/bn254/poseidon", 2)


def test_poseidon1_bls12_381():
    _run_case(f"{TV}/Groth16/bls12_381/poseidon", 1)


def test_wrong_r1cs_rejected():
    """An r1cs from a different circuit must raise, not silently produce a
    wrong layout."""
    r1 = read_r1cs(
        open(f"{TV}/Groth16/bn254/multiplier2/circuit.r1cs", "rb").read()
    )
    with pytest.raises(ValueError):
        compile_circom(
            _poseidon_src(1), BN254, link=LIBS,
            keep_labels=r1.wire_mapping[1:], n_labels=r1.n_labels,
        )


def test_multiplier2_keep_labels():
    base = f"{TV}/Groth16/bn254/multiplier2"
    r1 = read_r1cs(open(f"{base}/circuit.r1cs", "rb").read())
    w = read_wtns(open(f"{base}/witness.wtns", "rb").read()).values_ints()
    src = (
        "pragma circom 2.0.0;\ntemplate Multiplier2() {\n"
        "signal input a;\nsignal input b;\nsignal output c;\n"
        "c <== a*b;\n}\ncomponent main = Multiplier2();\n"
    )
    c = compile_circom(
        src, curve_by_name("bn254"),
        keep_labels=r1.wire_mapping[1:], n_labels=r1.n_labels,
    )
    got = WitnessExtension(plain_driver(BN254), c).run_host(
        {"a": str(w[2]), "b": str(w[3])}
    )
    assert got == w
