"""Noir/ACVM conformance: parse every committed ACIR KAT, solve the
witness with the plain driver, and byte-compare against the committed
Barretenberg witness stacks.

Parity: /root/reference/tests/tests/noir (plain-solver tests) over
/root/reference/test_vectors/noir/*/kat/.
"""

import glob
import os

import pytest

from cocircom_tpu.fields.params import BN254
from cocircom_tpu.noir.acir import (
    load_program_json,
    parse_witness_stack,
    write_witness_stack,
)
from cocircom_tpu.noir.solver import AcvmSolver, PlainNoirDriver, bind_toml_inputs

TV = "/root/reference/test_vectors/noir"
pytestmark = pytest.mark.skipif(not os.path.isdir(TV), reason="no reference vectors")

P = BN254.fr.p


def kat_names():
    if not os.path.isdir(TV):
        return []
    out = []
    for d in sorted(os.listdir(TV)):
        js = glob.glob(os.path.join(TV, d, "kat", "*.json"))
        gz = glob.glob(os.path.join(TV, d, "kat", "*.gz"))
        if js and gz:
            out.append(d)
    return out


@pytest.mark.parametrize("name", kat_names())
def test_acvm_solve_matches_kat(name):
    js = glob.glob(os.path.join(TV, name, "kat", "*.json"))[0]
    gz = glob.glob(os.path.join(TV, name, "kat", "*.gz"))[0]
    circuits, _abi = load_program_json(js)
    assert len(circuits) == 1
    c = circuits[0]
    stack = parse_witness_stack(open(gz, "rb").read())
    assert len(stack) == 1
    want = stack[0][1]

    # bind the circuit parameters from the committed witness, then re-solve
    params = sorted(set(c.private_parameters) | set(c.public_parameters))
    solver = AcvmSolver(PlainNoirDriver(P), c)
    for w in params:
        solver.witness[w] = want[w]
    got = solver.solve()
    assert got == want, (
        f"{name}: witness mismatch "
        f"({len(got)} vs {len(want)} entries)"
    )


def test_poseidon_prover_toml_binding():
    """End-to-end input path: ABI + Prover.toml -> witness 0..7 -> solve."""
    import tomllib

    ex = "/root/reference/co-noir/co-noir/examples/test_vectors/poseidon"
    if not os.path.isdir(ex):
        pytest.skip("no example vectors")
    circuits, abi = load_program_json(os.path.join(TV, "poseidon", "kat", "poseidon.json"))
    inputs = tomllib.load(open(os.path.join(ex, "Prover.toml"), "rb"))
    vals = bind_toml_inputs(abi, inputs, P)
    solver = AcvmSolver(PlainNoirDriver(P), circuits[0])
    solver.bind_inputs(vals)
    got = solver.solve()
    want = parse_witness_stack(
        open(os.path.join(TV, "poseidon", "kat", "poseidon.gz"), "rb").read()
    )[0][1]
    assert got == want

    # witness stack writer round-trips bit-exactly through the parser
    blob = write_witness_stack([(0, got)])
    assert parse_witness_stack(blob) == [(0, got)]
