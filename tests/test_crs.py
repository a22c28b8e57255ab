"""FileCrs: the real-setup CRS path (.dat files + MSM commitments).

The reference reads the Aztec Ignition setup from ~/.bb-crs
(co-noir parse/crs.rs:44-66); the 6 GB g1.dat is not committed upstream,
so these tests generate a byte-identical-format fixture from a known tau
and check that FileCrs MSM commitments equal TestCrs's tau-evaluation
commitments — which validates the reader, the host Pippenger, and the
driver (TPU-engine) MSM route against an independent computation.
"""

import os

import pytest

from cocircom_tpu.honk.crs import (
    FileCrs,
    TestCrs,
    driver_msm,
    generate_test_setup_g1,
    read_g1_dat,
    write_g1_dat,
)
from cocircom_tpu.fields.params import BN254

P_FR = BN254.fr.p
N = 64


@pytest.fixture(scope="module")
def dat_files(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("crs")
    tc = TestCrs()
    pts = generate_test_setup_g1(N, tc.tau)
    g1 = str(tmp / "g1.dat")
    g2 = str(tmp / "g2.dat")
    write_g1_dat(g1, pts)
    with open(g2, "wb") as f:
        for c in (tc.g2_x[0].c0, tc.g2_x[0].c1, tc.g2_x[1].c0, tc.g2_x[1].c1):
            f.write(int(c.v).to_bytes(32, "big"))
    return g1, g2, tc


def test_g1_dat_roundtrip(dat_files):
    g1, _g2, tc = dat_files
    pts = read_g1_dat(g1, N)
    assert pts == generate_test_setup_g1(N, tc.tau)
    with pytest.raises(ValueError):
        read_g1_dat(g1, N + 1)


POLYS = [
    [0] * N,
    [1] + [0] * (N - 1),
    [7, 11, 13],
    [pow(5, i, P_FR) for i in range(N)],
]


@pytest.mark.parametrize("poly", POLYS, ids=["zero", "const", "short", "full"])
def test_filecrs_commit_matches_testcrs(dat_files, poly):
    g1, g2, tc = dat_files
    fc = FileCrs(g1, g2, N)
    want = tc.commit(poly)
    got = fc.commit(poly)
    if want is None:
        assert got is None
    else:
        assert (got[0].v, got[1].v) == (want[0].v, want[1].v)


def test_filecrs_g2_matches(dat_files):
    g1, g2, tc = dat_files
    fc = FileCrs(g1, g2, N)
    assert fc.g2_x[0].c0.v == tc.g2_x[0].c0.v
    assert fc.g2_x[1].c1.v == tc.g2_x[1].c1.v
    assert fc.g1[0].v == 1 and fc.g1[1].v == 2


def test_driver_msm_route(dat_files):
    """The TPU-engine MSM route (ops/msm.py Pippenger via the plain
    driver) must agree with the known-tau commitment."""
    from cocircom_tpu.mpc.driver import plain_driver

    g1, g2, tc = dat_files
    d = plain_driver(BN254)
    fc = FileCrs(g1, g2, N, msm=driver_msm(d))
    poly = [pow(3, i, P_FR) for i in range(N)]
    want = tc.commit(poly)
    got = fc.commit(poly)
    assert (got[0].v, got[1].v) == (want[0].v, want[1].v)


@pytest.mark.skipif(os.environ.get("COCIRCOM_SLOW_TESTS") != "1",
                    reason="host-MSM honk prove is slow")
def test_honk_prove_with_filecrs(tmp_path):
    """End-to-end UltraHonk prove+verify against a .dat-file CRS (no
    known-tau shortcut anywhere in the prover path)."""
    from cocircom_tpu.honk import prover, verifier
    from cocircom_tpu.honk.builder import UltraCircuitBuilder, acir_to_format
    from cocircom_tpu.honk.proving_key import create_keys
    from cocircom_tpu.mpc.driver import plain_driver
    from cocircom_tpu.noir.acir import load_program_json, parse_witness_stack

    TV = "/root/reference/test_vectors/noir"
    name = "addition_multiplication"
    circuits, _abi = load_program_json(f"{TV}/{name}/kat/{name}.json")
    stack = parse_witness_stack(open(f"{TV}/{name}/kat/{name}.gz", "rb").read())
    wmap = stack[0][1]
    witness = [wmap.get(i, 0) for i in range(max(wmap) + 1)]
    builder = UltraCircuitBuilder(acir_to_format(circuits[0]), witness)

    tc = TestCrs()
    n = 4096
    g1 = str(tmp_path / "g1.dat")
    g2 = str(tmp_path / "g2.dat")
    write_g1_dat(g1, generate_test_setup_g1(n, tc.tau))
    with open(g2, "wb") as f:
        for c in (tc.g2_x[0].c0, tc.g2_x[0].c1, tc.g2_x[1].c0, tc.g2_x[1].c1):
            f.write(int(c.v).to_bytes(32, "big"))
    d = plain_driver(BN254)
    fc = FileCrs(g1, g2, n, msm=driver_msm(d))
    pk, vk = create_keys(builder, fc)
    proof = prover.prove(pk)
    assert verifier.verify(proof, vk)
