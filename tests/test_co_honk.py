"""co-UltraHonk: 3 REP3 parties jointly produce an UltraHonk proof over a
secret-shared witness; the proof must BYTE-EQUAL the plain prover's (the
protocol is deterministic given witness+CRS) and verify.

Parity: /root/reference/tests/tests/noir/proof_tests/rep3.rs.
"""

import os

import jax.numpy as jnp
import pytest

from cocircom_tpu.fields.params import BN254
from cocircom_tpu.honk import prover as plain_prover
from cocircom_tpu.honk import verifier
from cocircom_tpu.honk.builder import UltraCircuitBuilder, acir_to_format
from cocircom_tpu.honk.co_prover import CoUltraHonk
from cocircom_tpu.honk.crs import TestCrs
from cocircom_tpu.honk.proving_key import create_keys
from cocircom_tpu.mpc.rep3 import Rep3Driver, share_field_vec
from cocircom_tpu.mpc.runner import run_parties
from cocircom_tpu.noir.acir import load_program_json, parse_witness_stack
from cocircom_tpu.ops.field import get_field

TV = "/root/reference/test_vectors/noir"
pytestmark = pytest.mark.skipif(not os.path.isdir(TV), reason="no vectors")

FR = get_field(BN254.fr.p, "bn254.fr")


def _load(name):
    circuits, _abi = load_program_json(f"{TV}/{name}/kat/{name}.json")
    stack = parse_witness_stack(open(f"{TV}/{name}/kat/{name}.gz", "rb").read())
    wmap = stack[0][1]
    witness = [wmap.get(i, 0) for i in range(max(wmap) + 1)]
    return circuits[0], witness


import os as _os

SLOW = _os.environ.get("COCIRCOM_SLOW_TESTS") == "1"
CASES = ["addition_multiplication"] + (["poseidon"] if SLOW else [])


@pytest.mark.parametrize("name", CASES)
def test_co_honk_matches_plain(name):
    circuit, witness = _load(name)
    af = acir_to_format(circuit)
    crs = TestCrs()

    # plain reference proof + vk
    b_plain = UltraCircuitBuilder(af, witness)
    pk, vk = create_keys(b_plain, crs)
    want = plain_prover.prove(pk)

    varnum = af.varnum
    vec = FR.to_mont(jnp.asarray(FR.to_limbs(witness[:varnum] +
                                             [0] * (varnum - len(witness)))))
    shares3 = share_field_vec(FR, vec, seed=31)

    def party(pid, net):
        d = Rep3Driver(BN254, net)
        b = UltraCircuitBuilder(acir_to_format(circuit), [0] * varnum)
        co = CoUltraHonk(d, TestCrs())
        return co.prove(b, shares3[pid])

    proofs = run_parties(party, 3)
    assert proofs[0] == proofs[1] == proofs[2]
    assert proofs[0] == want
    assert verifier.verify(proofs[0], vk)


def test_co_honk_shared_rom_matches_plain():
    """Memory circuits under MPC: random_access has ROM reads with SECRET
    indices. The builder runs in provider mode (honk/co_builder.py):
    oblivious LUT reads + an oblivious bitonic sort for the consistency
    gates. The reference cannot prove memory circuits collaboratively at
    all (co-ultrahonk memory handling is unreachable: the builder's ROM
    path todo!()s). 3 REP3 parties must byte-match the plain-driver
    provider run, and the proof must verify."""
    from cocircom_tpu.honk.co_builder import MpcBuilderValues
    from cocircom_tpu.mpc.driver import plain_driver

    name = "random_access"
    circuit, witness = _load(name)
    af = acir_to_format(circuit)
    varnum = af.varnum
    crs = TestCrs()
    vec = FR.to_mont(jnp.asarray(FR.to_limbs(witness[:varnum] +
                                             [0] * (varnum - len(witness)))))

    dp = plain_driver(BN254)
    wplain = dp.promote_public(vec)
    b_plain = UltraCircuitBuilder(acir_to_format(circuit), [0] * varnum,
                                  mpc=MpcBuilderValues(dp, wplain))
    want = CoUltraHonk(dp, crs).prove(b_plain, wplain)
    _pk, vk = create_keys(b_plain, crs)
    assert verifier.verify(want, vk)

    shares3 = share_field_vec(FR, vec, seed=33)

    def party(pid, net):
        d = Rep3Driver(BN254, net)
        b = UltraCircuitBuilder(acir_to_format(circuit), [0] * varnum,
                                mpc=MpcBuilderValues(d, shares3[pid]))
        return CoUltraHonk(d, TestCrs()).prove(b, shares3[pid])

    proofs = run_parties(party, 3)
    assert proofs[0] == proofs[1] == proofs[2]
    assert proofs[0] == want


def test_co_honk_shared_ram_matches_plain():
    """RAM under MPC: write_access has memory WRITES with secret indices.
    The state is an oblivious share map (LUT read/write), the consistency
    sort runs keyed by index*T + timestamp, and the sorted rows' access
    types stay SECRET (memory_mixed_records: the co-prover adds the access
    share into w_4). The reference cannot prove RAM circuits at all, even
    single-party."""
    from cocircom_tpu.honk.co_builder import MpcBuilderValues
    from cocircom_tpu.mpc.driver import plain_driver

    name = "write_access"
    circuit, witness = _load(name)
    af = acir_to_format(circuit)
    varnum = af.varnum
    crs = TestCrs()
    vec = FR.to_mont(jnp.asarray(FR.to_limbs(witness[:varnum] +
                                             [0] * (varnum - len(witness)))))

    dp = plain_driver(BN254)
    wplain = dp.promote_public(vec)
    b_plain = UltraCircuitBuilder(acir_to_format(circuit), [0] * varnum,
                                  mpc=MpcBuilderValues(dp, wplain))
    want = CoUltraHonk(dp, crs).prove(b_plain, wplain)
    _pk, vk = create_keys(b_plain, crs)
    assert verifier.verify(want, vk)

    shares3 = share_field_vec(FR, vec, seed=35)

    def party(pid, net):
        d = Rep3Driver(BN254, net)
        b = UltraCircuitBuilder(acir_to_format(circuit), [0] * varnum,
                                mpc=MpcBuilderValues(d, shares3[pid]))
        return CoUltraHonk(d, TestCrs()).prove(b, shares3[pid])

    proofs = run_parties(party, 3)
    assert proofs[0] == proofs[1] == proofs[2]
    assert proofs[0] == want


def test_co_honk_shamir_matches_plain():
    """The co prover is driver-generic: Shamir(n=3, t=1) parties produce
    the same proof bytes (reference: co-ultrahonk supports Shamir too,
    lib.rs share_shamir)."""
    from cocircom_tpu.mpc.shamir import ShamirDriver, share_field_vec_shamir

    name = "addition_multiplication"
    circuit, witness = _load(name)
    af = acir_to_format(circuit)
    crs = TestCrs()
    b_plain = UltraCircuitBuilder(af, witness)
    pk, vk = create_keys(b_plain, crs)
    want = plain_prover.prove(pk)

    varnum = af.varnum
    vec = FR.to_mont(jnp.asarray(FR.to_limbs(witness[:varnum])))
    shares3 = share_field_vec_shamir(FR, vec, 1, 3, seed=41)

    def party(pid, net):
        d = ShamirDriver(BN254, net, threshold=1)
        b = UltraCircuitBuilder(acir_to_format(circuit), [0] * varnum)
        co = CoUltraHonk(d, TestCrs())
        return co.prove(b, shares3[pid])

    proofs = run_parties(party, 3)
    assert proofs[0] == proofs[1] == proofs[2]
    assert proofs[0] == want
    assert verifier.verify(proofs[0], vk)
