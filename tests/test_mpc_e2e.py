"""Cross-protocol e2e: REP3 co-PLONK proving and REP3 poseidon witness
extension (BASELINE.json configs)."""

import json
import os

import pytest

from cocircom_tpu.fields.params import BN254, curve_by_name
from cocircom_tpu.io.jsonio import parse_plonk_vk, parse_public_inputs
from cocircom_tpu.io.plonk_zkey import read_plonk_zkey
from cocircom_tpu.io.witness import read_wtns
from cocircom_tpu.mpc.rep3 import Rep3Driver, share_field_vec
from cocircom_tpu.mpc.runner import run_parties
from cocircom_tpu.ops.field import get_field
from cocircom_tpu.snark.plonk import CoPlonk
from cocircom_tpu.snark.plonk_verify import verify_plonk
from cocircom_tpu.snark.shared import split_witness_rep3
from cocircom_tpu.vm.compiler import compile_circom
from cocircom_tpu.vm.mpc_vm import WitnessExtension, flatten_inputs

TV = "/root/reference/test_vectors"
pytestmark = pytest.mark.skipif(not os.path.isdir(TV), reason="no reference vectors")

FR = get_field(BN254.fr.p, "bn254.fr")


def test_rep3_plonk_prove_verify():
    base = os.path.join(TV, "Plonk", "bn254", "multiplier2")
    zk = read_plonk_zkey(open(os.path.join(base, "circuit.zkey"), "rb").read())
    w = read_wtns(open(os.path.join(base, "witness.wtns"), "rb").read())
    vk = parse_plonk_vk(open(os.path.join(base, "verification_key.json"), "rb").read())
    pub = parse_public_inputs(open(os.path.join(base, "public.json"), "rb").read())
    shares = split_witness_rep3(w, zk.n_public, seed=13)

    def party(i, net):
        d = Rep3Driver(curve_by_name("bn254"), net)
        return CoPlonk(d).prove(zk, shares[i])

    proofs = run_parties(party)
    assert proofs[0] == proofs[1] == proofs[2]
    assert verify_plonk(vk, proofs[0], pub)


def test_rep3_poseidon_witness_extension():
    """Poseidon is arithmetic-only: the REP3 VM covers it end-to-end."""
    we = os.path.join(TV, "WitnessExtension")
    src = open(os.path.join(we, "tests", "poseidon_hasher1.circom")).read()
    circuit = compile_circom(src, BN254, link=[os.path.join(we, "tests", "libs")])
    inputs = json.load(open(os.path.join(we, "kats", "poseidon_hasher1", "input0.json")))
    want = read_wtns(
        open(os.path.join(we, "kats", "poseidon_hasher1", "witness0.wtns"), "rb").read()
    ).values_ints()

    flat = flatten_inputs(inputs["in"])
    shares = share_field_vec(FR, FR.encode(flat), seed=99)

    def party(i, net):
        d = Rep3Driver(BN254, net)
        vm = WitnessExtension(d, circuit)
        wshare = vm.run_shared(shares[i], vm.all_input_slots())
        out_slot = circuit.output_slots["out"][0]
        opened = d.open_many(wshare)
        return [int(v) for v in FR.from_limbs(FR.from_mont(opened))][out_slot]

    results = run_parties(party)
    # the KAT output (poseidon hash) — index 1 of the committed witness
    assert results[0] == results[1] == results[2] == want[1]


def test_shamir_plonk_prove_verify():
    """Shamir(n=3, t=1) co-PLONK on multiplier2 — the protocol-breadth leg
    the round-1 suite lacked (BASELINE configs; shamir degree-reduce +
    Vandermonde-preprocessed double shares on the prover's hot path)."""
    from cocircom_tpu.mpc.shamir import ShamirDriver
    from cocircom_tpu.snark.shared import split_witness_shamir

    base = os.path.join(TV, "Plonk", "bn254", "multiplier2")
    zk = read_plonk_zkey(open(os.path.join(base, "circuit.zkey"), "rb").read())
    w = read_wtns(open(os.path.join(base, "witness.wtns"), "rb").read())
    vk = parse_plonk_vk(open(os.path.join(base, "verification_key.json"), "rb").read())
    pub = parse_public_inputs(open(os.path.join(base, "public.json"), "rb").read())
    shares = split_witness_shamir(w, zk.n_public, 1, 3, seed=17)

    def party(i, net):
        d = ShamirDriver(curve_by_name("bn254"), net, threshold=1)
        return CoPlonk(d).prove(zk, shares[i])

    proofs = run_parties(party)
    assert proofs[0] == proofs[1] == proofs[2]
    assert verify_plonk(vk, proofs[0], pub)


def test_rep3_groth16_poseidon_prove_verify():
    """REP3 co-Groth16 at poseidon size against the committed snarkjs
    artifacts (the committed Plonk poseidon vectors have no zkey, so the
    larger-domain MPC leg rides Groth16)."""
    from cocircom_tpu.io.jsonio import parse_groth16_vk
    from cocircom_tpu.io.zkey import read_groth16_zkey
    from cocircom_tpu.snark.groth16 import CoGroth16
    from cocircom_tpu.snark.groth16_verify import verify_groth16

    base = os.path.join(TV, "Groth16", "bn254", "poseidon")
    zk = read_groth16_zkey(open(os.path.join(base, "circuit.zkey"), "rb").read())
    w = read_wtns(open(os.path.join(base, "witness.wtns"), "rb").read())
    vk = parse_groth16_vk(
        open(os.path.join(base, "verification_key.json"), "rb").read())
    pub = parse_public_inputs(
        open(os.path.join(base, "public.json"), "rb").read())
    shares = split_witness_rep3(w, zk.n_public, seed=23)

    def party(i, net):
        d = Rep3Driver(curve_by_name("bn254"), net)
        return CoGroth16(d).prove(zk, shares[i])

    proofs = run_parties(party)
    assert proofs[0] == proofs[1] == proofs[2]
    assert verify_groth16(vk, proofs[0], pub)


@pytest.mark.parametrize("protocol", ["rep3", "shamir"])
def test_mpc_groth16_bls12_381_poseidon(protocol):
    """Completes the reference e2e matrix ({Groth16,Plonk} x {bn254,
    bls12_381} x {multiplier2, poseidon}, e2e_tests/mod.rs:20-106): the
    bls12_381 poseidon leg under BOTH MPC protocols."""
    from cocircom_tpu.io.jsonio import parse_groth16_vk
    from cocircom_tpu.io.zkey import read_groth16_zkey
    from cocircom_tpu.snark.groth16 import CoGroth16
    from cocircom_tpu.snark.groth16_verify import verify_groth16

    base = os.path.join(TV, "Groth16", "bls12_381", "poseidon")
    zk = read_groth16_zkey(open(os.path.join(base, "circuit.zkey"), "rb").read())
    w = read_wtns(open(os.path.join(base, "witness.wtns"), "rb").read())
    vk = parse_groth16_vk(
        open(os.path.join(base, "verification_key.json"), "rb").read())
    pub = parse_public_inputs(
        open(os.path.join(base, "public.json"), "rb").read())
    curve = curve_by_name("bls12_381")

    if protocol == "rep3":
        shares = split_witness_rep3(w, zk.n_public, seed=29)

        def party(i, net):
            d = Rep3Driver(curve, net)
            return CoGroth16(d).prove(zk, shares[i])

    else:
        from cocircom_tpu.mpc.shamir import ShamirDriver
        from cocircom_tpu.snark.shared import split_witness_shamir

        shares = split_witness_shamir(
            w, zk.n_public, threshold=1, n_parties=3, seed=31)

        def party(i, net):
            d = ShamirDriver(curve, net, threshold=1)
            return CoGroth16(d).prove(zk, shares[i])

    proofs = run_parties(party)
    assert proofs[0] == proofs[1] == proofs[2]
    assert verify_groth16(vk, proofs[0], pub)
