"""UltraHonk end-to-end: build -> prove -> verify on the committed noir
KAT circuits, plus transcript/structure conformance checks.

Parity: /root/reference/tests/tests/noir/proof_tests/plain.rs (the
reference byte-KATs only poseidon, and only with the 6 GB Aztec CRS that
is not committed; we prove with a known-tau test CRS, so conformance is
(a) proof STRUCTURE byte-layout, (b) Poseidon2 transcript hash KATs,
(c) self prove->verify + tamper rejection, (d) the CRS-independent proof
prefix matches the committed poseidon.proof exactly).
"""

import os

import pytest

from cocircom_tpu.honk import prover, verifier
from cocircom_tpu.honk.builder import UltraCircuitBuilder, acir_to_format
from cocircom_tpu.honk.crs import TestCrs
from cocircom_tpu.honk.proving_key import create_keys
from cocircom_tpu.noir.acir import load_program_json, parse_witness_stack

TV = "/root/reference/test_vectors/noir"
pytestmark = pytest.mark.skipif(not os.path.isdir(TV), reason="no vectors")

# ALL 8 noir KATs prove+verify, including write_access (RAM blocks) — the
# reference todo!()s its RAM arm (builder.rs:520 BlockType::RAM) and the
# ROM/RAM consistency sorting (builder.rs:1772-1788); both are implemented
# here (honk/builder.py process_ROM/RAM_array)
PROVABLE = ["addition_multiplication", "poseidon", "poseidon2",
            "poseidon_input2", "poseidon_stdlib", "random_access", "slice",
            "write_access"]


def _setup(name):
    circuits, _abi = load_program_json(f"{TV}/{name}/kat/{name}.json")
    stack = parse_witness_stack(open(f"{TV}/{name}/kat/{name}.gz", "rb").read())
    wmap = stack[0][1]
    witness = [wmap.get(i, 0) for i in range(max(wmap) + 1)]
    builder = UltraCircuitBuilder(acir_to_format(circuits[0]), witness)
    return create_keys(builder, TestCrs())


@pytest.mark.parametrize("name", PROVABLE)
def test_prove_verify(name):
    pk, vk = _setup(name)
    proof = prover.prove(pk)
    # proof structure: 423 + num_public_inputs field elements (preamble 3,
    # publics m, 8 commitments*4, 28 sumcheck univariates*8, 44 evals,
    # 28 ZM quotient commitments*4, C_q 4, KZG:W 4)
    assert len(proof) == 423 + pk.num_public_inputs
    assert verifier.verify(proof, vk)


def test_tampered_proof_rejected():
    pk, vk = _setup("addition_multiplication")
    proof = prover.prove(pk)
    bad = list(proof)
    bad[3] = (bad[3] + 1) % prover.P
    assert not verifier.verify(bad, vk)


def test_wrong_witness_rejected():
    """A corrupted witness value either trips a builder consistency assert
    or yields a proof the verifier rejects — never a valid proof."""
    name = "addition_multiplication"
    circuits, _abi = load_program_json(f"{TV}/{name}/kat/{name}.json")
    stack = parse_witness_stack(open(f"{TV}/{name}/kat/{name}.gz", "rb").read())
    wmap = stack[0][1]
    witness = [wmap.get(i, 0) for i in range(max(wmap) + 1)]
    witness[len(witness) - 1] = (witness[len(witness) - 1] + 1) % prover.P
    af = acir_to_format(circuits[0])
    try:
        builder = UltraCircuitBuilder(af, witness)
        pk, vk = create_keys(builder, TestCrs())
        proof = prover.prove(pk)
    except AssertionError:
        return
    assert not verifier.verify(proof, vk)


def test_ram_memory_tamper_rejected():
    """RAM consistency soundness: flip the value wire of a sorted RAM
    consistency row after key construction — the aux relation (r3, value
    consistency between adjacent same-index reads) must kill the proof.
    This is the check the reference cannot run (its RAM path panics)."""
    from cocircom_tpu.honk.proving_key import Q_ARITH, Q_AUX

    pk, vk = _setup("write_access")
    w_o = pk.witness[2]
    # find a sorted RamConsistencyCheck row: q_arith=1 & q_aux=1
    rows = [i for i in range(pk.circuit_size)
            if pk.precomputed[Q_ARITH][i] == 1
            and pk.precomputed[Q_AUX][i] == 1]
    assert rows, "no RamConsistencyCheck rows found"
    for r in rows:
        w_o[r] = (w_o[r] + 1) % prover.P
    proof = prover.prove(pk)
    assert not verifier.verify(proof, vk)


def test_proof_prefix_matches_committed_kat():
    """The first proof elements (circuit size, public input size/offset,
    public inputs) are CRS-independent -> must equal the committed
    Barretenberg proof for poseidon byte-exactly."""
    pk, _vk = _setup("poseidon")
    proof = prover.prove(pk)
    committed = prover.proof_from_buffer(
        open(f"{TV}/poseidon/kat/poseidon.proof", "rb").read())
    assert len(proof) == len(committed)
    n_prefix = 3 + pk.num_public_inputs
    assert proof[:n_prefix] == committed[:n_prefix]


def test_assert_equalities_arm():
    """ACIR assert-equal opcodes become copy constraints (the reference
    todo!()s this arm, builder.rs:700): two witnesses tied by an
    equality, circuit proves and a violated tie is caught."""
    from cocircom_tpu.honk.builder import AcirFormat, PolyTriple

    af = AcirFormat(varnum=4, public_inputs=[1])
    # w1 * w2 = w3, and w3 == w1 (assert-equal)
    af.poly_triple_constraints.append(
        PolyTriple(a=1, b=2, c=3, q_m=1, q_o=prover.P - 1))
    af.assert_equalities.append(PolyTriple(a=3, b=1, q_l=1, q_r=prover.P - 1))
    builder = UltraCircuitBuilder(af, [0, 5, 1, 5])
    pk, vk = create_keys(builder, TestCrs())
    proof = prover.prove(pk)
    assert verifier.verify(proof, vk)
    with pytest.raises(AssertionError):
        UltraCircuitBuilder(af, [0, 5, 7, 35])  # 35 != 5: tie violated


def test_proof_buffer_roundtrip():
    pk, _vk = _setup("addition_multiplication")
    proof = prover.prove(pk)
    buf = prover.proof_to_buffer(proof)
    assert prover.proof_from_buffer(buf) == proof


def test_range_constraint_sorted_list():
    """bb-style range lists (the reference todo!()s process_range_lists,
    builder.rs:1782): a constrained variable in range proves+verifies via
    the q_delta_range sorted-list gates; an out-of-range value yields a
    proof the verifier rejects (a sorted delta exceeds 3 or an edge pin
    fails)."""
    from cocircom_tpu.honk.builder import AcirFormat, PolyTriple

    def build(val):
        af = AcirFormat(varnum=4, public_inputs=[1])
        # w1 + w2 = w3 keeps the witnesses constrained
        af.poly_triple_constraints.append(
            PolyTriple(a=1, b=2, c=3, q_l=1, q_r=1, q_o=prover.P - 1))
        builder = UltraCircuitBuilder(af, [0, val, 2, val + 2])
        builder.create_new_range_constraint(1, 10)
        return builder, create_keys(builder, TestCrs())

    b, (pk, vk) = build(7)
    assert not b.failed
    proof = prover.prove(pk)
    assert verifier.verify(proof, vk)

    b_bad, (pk_bad, vk_bad) = build(25)  # 25 > 10: out of range
    assert b_bad.failed  # bb failure flag raised at construction
    assert not verifier.verify(prover.prove(pk_bad), vk_bad)


def test_range_constraint_double_tag_copy():
    """A variable that already carries another tag gets range-constrained
    through a fresh copy tied by an add gate (bb fallback path)."""
    from cocircom_tpu.honk.builder import AcirFormat, PolyTriple

    af = AcirFormat(varnum=4, public_inputs=[1])
    af.poly_triple_constraints.append(
        PolyTriple(a=1, b=2, c=3, q_l=1, q_r=1, q_o=prover.P - 1))
    builder = UltraCircuitBuilder(af, [0, 5, 2, 7])
    builder.create_new_range_constraint(1, 10)
    builder.create_new_range_constraint(1, 12)  # second list: copy path
    pk, vk = create_keys(builder, TestCrs())
    proof = prover.prove(pk)
    assert verifier.verify(proof, vk)


def test_own_proof_byte_fences():
    """Pinned full-proof SHA-256 fences for every noir KAT (known-tau test
    CRS): a transcript or sumcheck regression flips a byte-equality here
    instead of hiding behind the Barretenberg prefix match (the full
    byte-KAT needs the uncommitted 6 GB Aztec CRS). Regenerate the pins
    with scripts/pin_honk_proofs.py after an INTENDED layout change."""
    import hashlib
    import json
    import os

    pins = json.load(open(os.path.join(os.path.dirname(__file__),
                                       "honk_proof_hashes.json")))
    for name in PROVABLE:
        pk, vk = _setup(name)
        proof = prover.prove(pk)
        blob = b"".join(int(x).to_bytes(32, "big") for x in proof)
        assert hashlib.sha256(blob).hexdigest() == pins[name]["sha256"], name
        assert len(proof) == pins[name]["n"], name
