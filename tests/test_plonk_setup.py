"""PLONK trusted setup (snark/plonk_setup.py): .r1cs -> .zkey full circle
through our snarkjs-format reader, the CoPlonk prover with the committed
circom witness, and the plonk verifier under the setup's vk."""

import os

import pytest

from cocircom_tpu.fields.params import BN254
from cocircom_tpu.io.jsonio import dump_plonk_vk, parse_plonk_vk
from cocircom_tpu.io.plonk_zkey import read_plonk_zkey
from cocircom_tpu.io.r1cs import read_r1cs
from cocircom_tpu.io.witness import read_wtns
from cocircom_tpu.mpc.driver import plain_driver
from cocircom_tpu.snark.plonk import CoPlonk
from cocircom_tpu.snark.plonk_verify import verify_plonk
from cocircom_tpu.snark.plonk_setup import plonk_setup
from cocircom_tpu.snark.shared import SharedWitness

TV = "/root/reference/test_vectors/Plonk"
pytestmark = pytest.mark.skipif(not os.path.isdir(TV), reason="no vectors")


def test_plonk_setup_full_circle_multiplier2():
    base = f"{TV}/bn254/multiplier2"
    r1cs = read_r1cs(open(f"{base}/circuit.r1cs", "rb").read())
    zkey_bytes, vk = plonk_setup(r1cs, seed=b"test-plonk-setup")
    zk = read_plonk_zkey(zkey_bytes)

    committed = read_plonk_zkey(open(f"{base}/circuit.zkey", "rb").read())
    assert zk.n_public == committed.n_public
    assert zk.domain_size == committed.domain_size
    assert zk.n_constraints == committed.n_constraints
    assert zk.n_additions == committed.n_additions
    assert zk.n_vars == committed.n_vars
    assert (zk.map_a == committed.map_a).all()
    assert (zk.map_b == committed.map_b).all()
    assert (zk.map_c == committed.map_c).all()
    assert zk.k1 == committed.k1 and zk.k2 == committed.k2

    # tau-independent sections (additions, wire maps, selectors, sigmas,
    # lagranges) must be BYTE-identical to what snarkjs wrote; only the
    # header vk points and p_tau depend on the sampled tau
    from cocircom_tpu.io.binfile import read_binfile

    ours = read_binfile(zkey_bytes, "zkey").sections
    theirs = read_binfile(open(f"{base}/circuit.zkey", "rb").read(), "zkey").sections
    for sid in range(3, 14):
        assert ours.get(sid) == theirs.get(sid), f"section {sid} differs"

    wtns = read_wtns(open(f"{base}/witness.wtns", "rb").read())
    vals = wtns.values_ints()
    d = plain_driver(BN254)
    n_pub = zk.n_public + 1
    shared = SharedWitness(
        [int(v) for v in vals[:n_pub]],
        d.promote_public(d.fr.encode([int(v) for v in vals[n_pub:]])),
    )
    proof = CoPlonk(d).prove(zk, shared)
    publics = [int(v) for v in vals[1:n_pub]]
    assert verify_plonk(vk, proof, publics)
    bad = list(publics)
    bad[0] = (bad[0] + 1) % BN254.fr.p
    assert not verify_plonk(vk, proof, bad)

    vk2 = parse_plonk_vk(dump_plonk_vk(vk))
    assert vk2["qm"] == vk["qm"] and vk2["x_2"] == vk["x_2"]


def test_plonk_setup_bls12_381_sections_byte_exact():
    """Same byte-exactness on the other curve's committed zkey."""
    from cocircom_tpu.io.binfile import read_binfile

    base = f"{TV}/bls12_381/multiplier2"
    r1cs = read_r1cs(open(f"{base}/circuit.r1cs", "rb").read())
    zkey_bytes, _ = plonk_setup(r1cs, seed=b"t")
    ours = read_binfile(zkey_bytes, "zkey").sections
    theirs = read_binfile(open(f"{base}/circuit.zkey", "rb").read(), "zkey").sections
    for sid in range(3, 14):
        assert ours.get(sid) == theirs.get(sid), f"section {sid} differs"


def test_plonk_setup_full_circle_poseidon():
    """Poseidon has 2228 addition wires — exercises the reduce_coefs LC
    reduction (multiplier2 has none) through prove+verify."""
    base = f"{TV}/bn254/poseidon"
    r1cs = read_r1cs(open(f"{base}/circuit.r1cs", "rb").read())
    zkey_bytes, vk = plonk_setup(r1cs, seed=b"test-poseidon")
    zk = read_plonk_zkey(zkey_bytes)
    assert zk.n_additions > 0

    wtns = read_wtns(open(f"{base}/witness.wtns", "rb").read())
    vals = wtns.values_ints()
    d = plain_driver(BN254)
    n_pub = zk.n_public + 1
    shared = SharedWitness(
        [int(v) for v in vals[:n_pub]],
        d.promote_public(d.fr.encode([int(v) for v in vals[n_pub:]])),
    )
    proof = CoPlonk(d).prove(zk, shared)
    publics = [int(v) for v in vals[1:n_pub]]
    assert verify_plonk(vk, proof, publics)


def test_plonk_setup_deterministic():
    base = f"{TV}/bn254/multiplier2"
    r1cs = read_r1cs(open(f"{base}/circuit.r1cs", "rb").read())
    z1, _ = plonk_setup(r1cs, seed=b"s")
    z2, _ = plonk_setup(r1cs, seed=b"s")
    assert z1 == z2
