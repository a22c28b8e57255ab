"""Groth16 trusted setup (snark/setup.py): .r1cs -> .zkey full circle.

The generated zkey must round-trip through our snarkjs-format reader and
produce proofs that verify under the setup's verification key — with the
COMMITTED circom witness, so wire ordering and the QAP instance-binding
rows match snarkjs semantics exactly.
"""

import os

import pytest

from cocircom_tpu.fields.params import BN254
from cocircom_tpu.io.jsonio import dump_groth16_vk, parse_groth16_vk
from cocircom_tpu.io.r1cs import read_r1cs
from cocircom_tpu.io.witness import read_wtns
from cocircom_tpu.io.zkey import read_groth16_zkey
from cocircom_tpu.mpc.driver import plain_driver
from cocircom_tpu.snark.groth16 import CoGroth16, SharedWitness
from cocircom_tpu.snark.groth16_verify import verify_groth16
from cocircom_tpu.snark.setup import groth16_setup

TV = "/root/reference/test_vectors/Groth16"
pytestmark = pytest.mark.skipif(not os.path.isdir(TV), reason="no vectors")


def _full_circle(curve_dir, curve_params, name="multiplier2"):
    base = f"{TV}/{curve_dir}/{name}"
    r1cs = read_r1cs(open(f"{base}/circuit.r1cs", "rb").read())
    zkey_bytes, vk = groth16_setup(r1cs, seed=b"test-setup")
    zkey = read_groth16_zkey(zkey_bytes)

    # structural parity with the committed snarkjs zkey
    committed = read_groth16_zkey(open(f"{base}/circuit.zkey", "rb").read())
    assert zkey.n_vars == committed.n_vars
    assert zkey.n_public == committed.n_public
    assert zkey.domain_size == committed.domain_size
    assert zkey.ic.n == committed.ic.n
    assert zkey.l_query.n == committed.l_query.n
    assert zkey.matrices.num_constraints == committed.matrices.num_constraints

    wtns = read_wtns(open(f"{base}/witness.wtns", "rb").read())
    vals = wtns.values_ints()
    d = plain_driver(curve_params)
    n_pub = zkey.n_public + 1
    shared = SharedWitness(
        [int(v) for v in vals[:n_pub]],
        d.promote_public(d.fr.encode([int(v) for v in vals[n_pub:]])),
    )
    proof = CoGroth16(d).prove(zkey, shared)
    publics = [int(v) for v in vals[1:n_pub]]
    assert verify_groth16(vk, proof, publics)
    # a wrong public input must not verify
    bad = list(publics)
    bad[0] = (bad[0] + 1) % curve_params.fr.p
    assert not verify_groth16(vk, proof, bad)
    return vk


def test_setup_full_circle_bn254():
    vk = _full_circle("bn254", BN254)
    # vk JSON round-trip (snarkjs verification_key.json format)
    vk2 = parse_groth16_vk(dump_groth16_vk(vk))
    assert vk2["ic"] == vk["ic"]
    assert vk2["alpha_1"] == vk["alpha_1"]


SLOW = os.environ.get("COCIRCOM_SLOW_TESTS") == "1"


@pytest.mark.skipif(not SLOW, reason="host ec_mul heavy; COCIRCOM_SLOW_TESTS=1")
def test_setup_full_circle_bls12_381():
    from cocircom_tpu.fields.params import curve_by_name

    _full_circle("bls12_381", curve_by_name("bls12_381"))


@pytest.mark.skipif(not SLOW, reason="host ec_mul heavy; COCIRCOM_SLOW_TESTS=1")
def test_setup_poseidon_bn254():
    """A circuit with real constraint structure (nonlinear + linear)."""
    _full_circle("bn254", BN254, name="poseidon")


def test_setup_deterministic_with_seed():
    base = f"{TV}/bn254/multiplier2"
    r1cs = read_r1cs(open(f"{base}/circuit.r1cs", "rb").read())
    z1, _ = groth16_setup(r1cs, seed=b"same")
    z2, _ = groth16_setup(r1cs, seed=b"same")
    z3, _ = groth16_setup(r1cs, seed=b"other")
    assert z1 == z2
    assert z1 != z3
