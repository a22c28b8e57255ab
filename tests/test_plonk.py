"""co-PLONK: round KATs (deterministic blinding), e2e prove+verify, and
verification of committed snarkjs proofs."""

import json
import os

import pytest

from cocircom_tpu.fields.params import curve_by_name
from cocircom_tpu.io.jsonio import parse_plonk_proof, parse_plonk_vk, parse_public_inputs
from cocircom_tpu.io.plonk_zkey import read_plonk_zkey
from cocircom_tpu.io.witness import read_wtns
from cocircom_tpu.mpc.driver import PlainDriver
from cocircom_tpu.snark.groth16 import SharedWitness
from cocircom_tpu.snark.plonk import CoPlonk
from cocircom_tpu.snark.plonk_verify import verify_plonk

TV = "/root/reference/test_vectors/Plonk"
pytestmark = pytest.mark.skipif(not os.path.isdir(TV), reason="no reference vectors")


def load_case(curve, circuit):
    base = os.path.join(TV, curve, circuit)
    zk = read_plonk_zkey(open(os.path.join(base, "circuit.zkey"), "rb").read())
    w = read_wtns(open(os.path.join(base, "witness.wtns"), "rb").read())
    vk = parse_plonk_vk(open(os.path.join(base, "verification_key.json"), "rb").read())
    pub = parse_public_inputs(open(os.path.join(base, "public.json"), "rb").read())
    return zk, w, vk, pub


@pytest.mark.parametrize(
    "curve,circuit",
    [("bn254", "multiplier2"), ("bn254", "poseidon"), ("bls12_381", "multiplier2")],
    ids=lambda v: str(v),
)
def test_verify_committed_snarkjs_plonk_proof(curve, circuit):
    base = os.path.join(TV, curve, circuit)
    vk = parse_plonk_vk(open(os.path.join(base, "verification_key.json"), "rb").read())
    pub = parse_public_inputs(open(os.path.join(base, "public.json"), "rb").read())
    proof = parse_plonk_proof(open(os.path.join(base, "circom.proof"), "rb").read())
    assert verify_plonk(vk, proof, pub)
    assert not verify_plonk(vk, proof, [x + 1 for x in pub])


def test_plonk_zkey_parses():
    zk, w, vk, pub = load_case("bn254", "multiplier2")
    assert zk.n_public == 2
    assert zk.domain_size == 8
    assert zk.qm_c == vk["qm"]
    assert zk.s3_c == vk["s3"]
    assert zk.x_2 == vk["x_2"]
    assert zk.k1 == vk["k1"] and zk.k2 == vk["k2"]


def _shared(zk, w):
    from cocircom_tpu.snark.shared import split_witness_plain

    return split_witness_plain(w, zk.n_public)


def test_round_kats_deterministic():
    """Deterministic blinding b[i]=i: reference round2/3/5 test vectors
    (co-plonk round2.rs:330, round3.rs:576, round5.rs:414)."""
    import os

    zk, w, vk, pub = load_case("bn254", "multiplier2")
    d = PlainDriver(curve_by_name("bn254"), seed=1)
    os.environ["COCIRCOM_INSECURE_DETERMINISTIC"] = "1"
    try:
        prover = CoPlonk(d, deterministic_blinding=True)
    finally:
        del os.environ["COCIRCOM_INSECURE_DETERMINISTIC"]
    proof = prover.prove(zk, _shared(zk, w))
    assert proof["Z"] == (
        21851995660159341992573113210608672476110709810652234421585224566450425950906,
        9396597540042847815549199092556045933393323370500084953024302516882239981142,
    )
    assert proof["T1"] == (
        14195659590223391588638033663362337117591990036333098666602164584829450067964,
        3556648023705175372561455635244621029434015848660599980046006090530807598362,
    )
    assert proof["T2"] == (
        3735872884021926351213137728148437717828227598563721199864822205706753909354,
        18937554230046023488342718793325695277505320264073327441600348965411357658388,
    )
    assert proof["T3"] == (
        16143856432987537130591639896375147783771732347095191085601174356801897211531,
        181289684093540268434296060454656362990106137005120511426963659280111589561,
    )
    assert proof["Wxi"] == (
        17714933343167283383757911844657193439824158284537335005582807825912982308761,
        10956622068891399683012461981563789956666325407769410657364052444385845871778,
    )
    assert proof["Wxiw"] == (
        11975595019949715918668172153793336705506375746143971491421022814159658028345,
        21836122222240321064812409945656239690711148338716835775906941056446809090474,
    )


@pytest.mark.parametrize(
    "curve,circuit",
    [("bn254", "multiplier2"), ("bls12_381", "multiplier2")],
    ids=lambda v: str(v),
)
def test_plain_plonk_prove_verify(curve, circuit):
    zk, w, vk, pub = load_case(curve, circuit)
    d = PlainDriver(curve_by_name(curve), seed=3)
    proof = CoPlonk(d).prove(zk, _shared(zk, w))
    assert verify_plonk(vk, proof, pub)
