"""TcpNetwork mesh: the real multi-process deployment path (localhost).

Parity: the reference's process-level e2e bash scripts with QUIC/TLS
(SURVEY.md section 4.4) — here a 3-party TCP mesh on loopback driving a
REP3 multiplication and a co-Groth16 proof.
"""

import os
import socket
import threading

import pytest

from cocircom_tpu.fields.params import BN254
from cocircom_tpu.mpc.net import TcpNetwork
from cocircom_tpu.mpc.rep3 import Rep3Driver, share_field_vec
from cocircom_tpu.ops.field import get_field

FR = get_field(BN254.fr.p, "bn254.fr")


def free_ports(n):
    socks = [socket.socket() for _ in range(n)]
    for s in socks:
        s.bind(("127.0.0.1", 0))
    ports = [s.getsockname()[1] for s in socks]
    for s in socks:
        s.close()
    return ports


def test_tcp_rep3_mul():
    ports = free_ports(3)
    addrs = [("127.0.0.1", p) for p in ports]
    x = [3, 5, 7]
    y = [11, 13, 17]
    xs = share_field_vec(FR, FR.encode(x), seed=91)
    ys = share_field_vec(FR, FR.encode(y), seed=92)
    results = [None] * 3
    errors = [None] * 3

    def party(i):
        try:
            net = TcpNetwork(i, addrs)
            d = Rep3Driver(BN254, net)
            z = d.mul_vec(xs[i], ys[i])
            opened = d.open_many(z)
            results[i] = [int(v) for v in FR.from_limbs(FR.from_mont(opened))]
            net.close()
        except BaseException as e:  # noqa: BLE001
            errors[i] = e

    threads = [threading.Thread(target=party, args=(i,)) for i in range(3)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(120)
    for e in errors:
        assert e is None, e
    want = [a * b % FR.p for a, b in zip(x, y)]
    assert results[0] == want == results[1] == results[2]


def test_cli_split_prove_verify(tmp_path):
    """CLI pipeline: split-witness -> (plain) generate-proof -> verify."""
    import subprocess
    import sys

    tv = "/root/reference/test_vectors/Groth16/bn254/multiplier2"
    if not os.path.isdir(tv):
        pytest.skip("no reference vectors")
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    env.pop("PALLAS_AXON_POOL_IPS", None)

    def run(*args):
        r = subprocess.run(
            [sys.executable, "-m", "cocircom_tpu.cli", *args],
            capture_output=True,
            text=True,
            cwd="/root/repo",
            env=env,
            timeout=500,
        )
        assert r.returncode == 0, r.stdout + r.stderr
        return r.stdout

    run(
        "split-witness",
        "--witness", f"{tv}/witness.wtns",
        "--r1cs", f"{tv}/circuit.r1cs",
        "--protocol", "plain",
        "--out-dir", str(tmp_path),
    )
    run(
        "generate-proof", "groth16",
        "--zkey", f"{tv}/circuit.zkey",
        "--witness", str(tmp_path / "witness.wtns.0.shared"),
        "--out", str(tmp_path / "proof.json"),
        "--public-out", str(tmp_path / "public.json"),
    )
    out = run(
        "verify", "groth16",
        "--proof", str(tmp_path / "proof.json"),
        "--vk", f"{tv}/verification_key.json",
        "--public", f"{tv}/public.json",
    )
    assert "OK" in out
