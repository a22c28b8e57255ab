"""End-to-end co-Groth16: prove from committed zkey+wtns, verify with our
pairing verifier — Plain driver and 3-party REP3."""

import os

import pytest

from cocircom_tpu.fields.params import curve_by_name
from cocircom_tpu.io.jsonio import parse_groth16_vk, parse_public_inputs
from cocircom_tpu.io.witness import read_wtns
from cocircom_tpu.io.zkey import read_groth16_zkey
from cocircom_tpu.mpc.driver import PlainDriver
from cocircom_tpu.mpc.rep3 import Rep3Driver
from cocircom_tpu.mpc.runner import run_parties
from cocircom_tpu.snark.groth16 import CoGroth16
from cocircom_tpu.snark.groth16_verify import verify_groth16
from cocircom_tpu.snark.shared import split_witness_plain, split_witness_rep3

TV = "/root/reference/test_vectors/Groth16"
pytestmark = pytest.mark.skipif(not os.path.isdir(TV), reason="no reference vectors")


def load_case(curve, circuit):
    base = os.path.join(TV, curve, circuit)
    with open(os.path.join(base, "circuit.zkey"), "rb") as fh:
        zk = read_groth16_zkey(fh.read())
    with open(os.path.join(base, "witness.wtns"), "rb") as fh:
        w = read_wtns(fh.read())
    with open(os.path.join(base, "verification_key.json"), "rb") as fh:
        vk = parse_groth16_vk(fh.read())
    with open(os.path.join(base, "public.json"), "rb") as fh:
        pub = parse_public_inputs(fh.read())
    return zk, w, vk, pub


@pytest.mark.parametrize(
    "curve,circuit",
    [("bn254", "multiplier2"), ("bn254", "poseidon"), ("bls12_381", "multiplier2")],
    ids=lambda v: str(v),
)
def test_plain_prove_verify(curve, circuit):
    zk, w, vk, pub = load_case(curve, circuit)
    d = PlainDriver(curve_by_name(curve), seed=42)
    shared = split_witness_plain(w, zk.n_public)
    assert [int(x) for x in shared.public_inputs[1:]] == pub
    proof = CoGroth16(d).prove(zk, shared)
    assert verify_groth16(vk, proof, pub)
    assert not verify_groth16(vk, proof, [x + 1 for x in pub])


def test_rep3_prove_verify():
    zk, w, vk, pub = load_case("bn254", "multiplier2")
    shares = split_witness_rep3(w, zk.n_public, seed=7)

    def party(i, net):
        d = Rep3Driver(curve_by_name("bn254"), net)
        return CoGroth16(d).prove(zk, shares[i])

    proofs = run_parties(party)
    # all parties produce the same opened proof
    assert proofs[0] == proofs[1] == proofs[2]
    assert verify_groth16(vk, proofs[0], pub)


def test_shamir_prove_verify():
    from cocircom_tpu.mpc.shamir import ShamirDriver
    from cocircom_tpu.snark.shared import split_witness_shamir

    zk, w, vk, pub = load_case("bn254", "multiplier2")
    shares = split_witness_shamir(w, zk.n_public, threshold=1, n_parties=3, seed=8)

    def party(i, net):
        d = ShamirDriver(curve_by_name("bn254"), net, threshold=1)
        return CoGroth16(d).prove(zk, shares[i])

    proofs = run_parties(party)
    assert proofs[0] == proofs[1] == proofs[2]
    assert verify_groth16(vk, proofs[0], pub)
