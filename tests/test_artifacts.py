"""Conformance vs committed snarkjs artifacts in /root/reference/test_vectors."""

import os

import numpy as np
import pytest

from cocircom_tpu.io.jsonio import (
    parse_groth16_proof,
    parse_groth16_vk,
    parse_public_inputs,
)
from cocircom_tpu.io.witness import read_wtns, write_wtns
from cocircom_tpu.io.zkey import read_groth16_zkey
from cocircom_tpu.snark.groth16_verify import verify_groth16

TV = "/root/reference/test_vectors/Groth16"

pytestmark = pytest.mark.skipif(not os.path.isdir(TV), reason="no reference vectors")

CASES = [
    ("bn254", "multiplier2"),
    ("bn254", "poseidon"),
    ("bls12_381", "multiplier2"),
    ("bls12_381", "poseidon"),
]


def load(curve, circuit, name):
    with open(os.path.join(TV, curve, circuit, name), "rb") as fh:
        return fh.read()


@pytest.mark.parametrize("curve,circuit", CASES, ids=lambda v: str(v))
def test_wtns_roundtrip(curve, circuit):
    data = load(curve, circuit, "witness.wtns")
    w = read_wtns(data)
    assert w.curve.name == curve
    assert w.values_ints()[0] == 1  # constant-one wire
    out = write_wtns(w.curve, w.values_std)
    w2 = read_wtns(out)
    assert np.array_equal(w.values_std, w2.values_std)


@pytest.mark.parametrize("curve,circuit", CASES[:2], ids=lambda v: str(v))
def test_zkey_matches_vk_json(curve, circuit):
    zk = read_groth16_zkey(load(curve, circuit, "circuit.zkey"))
    vk = parse_groth16_vk(load(curve, circuit, "verification_key.json"))
    assert zk.curve.name == curve
    assert zk.n_public == vk["n_public"]
    assert zk.alpha_g1 == vk["alpha_1"]
    assert zk.beta_g2 == vk["beta_2"]
    assert zk.gamma_g2 == vk["gamma_2"]
    assert zk.delta_g2 == vk["delta_2"]
    # IC array: decode montgomery limbs to ints and compare
    from cocircom_tpu.ops.field import get_field

    fq = get_field(zk.curve.fq.p, zk.curve.name + ".fq")
    xs = fq.from_limbs(fq.from_mont(zk.ic.x))
    ys = fq.from_limbs(fq.from_mont(zk.ic.y))
    got = [(int(x), int(y)) for x, y in zip(xs, ys)]
    assert got == vk["ic"]


@pytest.mark.parametrize("curve,circuit", CASES, ids=lambda v: str(v))
def test_verify_committed_snarkjs_proof(curve, circuit):
    vk = parse_groth16_vk(load(curve, circuit, "verification_key.json"))
    proof = parse_groth16_proof(load(curve, circuit, "circom.proof"))
    pub = parse_public_inputs(load(curve, circuit, "public.json"))
    assert verify_groth16(vk, proof, pub)
    # reject wrong public input
    assert not verify_groth16(vk, proof, [x + 1 for x in pub])
