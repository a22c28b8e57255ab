"""co-noir CLI: the 8-subcommand noir pipeline over MPC.

Parity: /root/reference/co-noir/co-noir/src/bin/co-noir.rs:62-80 —
  split-witness | split-input | merge-input-shares | generate-witness |
  translate-witness | generate-proof | create-vk | verify

File formats:
  * .shared files use the safe fixed-schema wire codec (mpc/codec.py) with
    a {"protocol", "curve", "kind", ...} header — no pickle;
  * proofs use the Barretenberg HonkProof buffer layout (u32 BE count +
    32-byte BE field elements, ultrahonk types.rs:79-137);
  * vk files are JSON with hex commitments.

CRS: the insecure known-tau TestCrs (--crs test, default) — the real
Aztec setup's 6 GB g1.dat is not shipped in the reference repo either;
pass --crs-seed to pin a deterministic tau across parties.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np


def _codec():
    from ..mpc import codec

    return codec


def _curve():
    from ..fields.params import BN254

    return BN254


def _field():
    from ..fields.params import BN254
    from ..ops.field import get_field

    return get_field(BN254.fr.p, BN254.name + ".fr")


def _net(args):
    cfg = json.load(open(args.net_config))
    n = len(cfg["parties"])
    addrs = [None] * n
    for p in cfg["parties"]:
        addrs[int(p["id"])] = (p.get("host", "127.0.0.1"), int(p["port"]))
    from ..mpc.net import TcpNetwork

    return TcpNetwork(int(cfg["my_id"]), addrs)


def _write_shared(path, kind: str, payload: dict):
    blob = _codec().encode({"protocol": "rep3", "curve": "bn254",
                            "kind": kind, **payload})
    with open(path, "wb") as fh:
        fh.write(blob)
    print(f"wrote {path}")


def _read_shared(path, kind: str) -> dict:
    obj = _codec().decode(open(path, "rb").read())
    if obj.get("kind") != kind:
        raise SystemExit(f"{path}: expected {kind} share file, got "
                         f"{obj.get('kind')}")
    return obj


def _share_witness_vec(values: list[int]):
    """ints -> 3 REP3 (a, b) numpy component pairs (Montgomery limbs)."""
    import jax

    from ..mpc.rep3 import share_field_vec

    f = _field()
    import jax.numpy as jnp

    vec = f.to_mont(jnp.asarray(f.to_limbs(values)))
    shares = share_field_vec(f, vec)
    return [
        (np.asarray(jax.device_get(s.a)), np.asarray(jax.device_get(s.b)))
        for s in shares
    ]


def cmd_split_witness(args):
    """noir witness .gz -> 3 REP3 witness-share files (co-noir.rs
    run_split_witness / lib.rs share_rep3:427)."""
    from .acir import load_program_json, parse_witness_stack

    circuits, _abi = load_program_json(args.circuit)
    stack = parse_witness_stack(open(args.witness, "rb").read())
    wmap = stack[0][1]
    varnum = circuits[0].current_witness_index + 1
    values = [wmap.get(i, 0) for i in range(varnum)]
    os.makedirs(args.out_dir, exist_ok=True)
    for i, (a, b) in enumerate(_share_witness_vec(values)):
        _write_shared(os.path.join(args.out_dir, f"witness.gz.{i}.shared"),
                      "noir-witness", {"a": a, "b": b})


def cmd_split_input(args):
    """Prover.toml -> 3 SharedInput files (lib.rs share_input_rep3:482)."""
    import tomllib

    from .acir import load_program_json
    from .solver import bind_toml_inputs

    circuits, abi = load_program_json(args.circuit)
    inputs = tomllib.load(open(args.input, "rb"))
    values = bind_toml_inputs(abi, inputs, _curve().fr.p)
    os.makedirs(args.out_dir, exist_ok=True)
    base = os.path.basename(args.input)
    for i, (a, b) in enumerate(_share_witness_vec(values)):
        _write_shared(os.path.join(args.out_dir, f"{base}.{i}.shared"),
                      "noir-input", {"a": a, "b": b, "offset": 0})


def cmd_merge_input_shares(args):
    """Concatenate input share segments from independent providers in
    witness order (co-noir.rs run_merge_input_shares)."""
    parts = [_read_shared(p, "noir-input") for p in args.inputs]
    parts.sort(key=lambda o: int(o.get("offset", 0)))
    a = np.concatenate([np.asarray(p["a"]) for p in parts], axis=-1)
    b = np.concatenate([np.asarray(p["b"]) for p in parts], axis=-1)
    _write_shared(args.out, "noir-input", {"a": a, "b": b, "offset": 0})


def cmd_generate_witness(args):
    """REP3 ACVM witness extension over the TCP mesh."""
    import jax.numpy as jnp

    from ..mpc.rep3 import Rep3Driver, Rep3FieldShare
    from .acir import load_program_json
    from .rep3_driver import Rep3NoirDriver
    from .solver import AcvmSolver, Shared, is_shared

    circuits, _abi = load_program_json(args.circuit)
    c = circuits[0]
    share = _read_shared(args.input, "noir-input")
    net = _net(args)
    d = Rep3NoirDriver(Rep3Driver(_curve(), net))
    vec = Rep3FieldShare(jnp.asarray(share["a"]), jnp.asarray(share["b"]))
    solver = AcvmSolver(d, c)
    params = sorted(set(c.private_parameters) | set(c.public_parameters))
    for k, w in enumerate(params):
        solver.witness[w] = Shared(d.d.index_share(vec, k))
    out = solver.solve()
    varnum = c.current_witness_index + 1
    handles = []
    for i in range(varnum):
        v = out.get(i, 0)
        handles.append(v.v if is_shared(v) else d.promote(int(v)))
    stacked = d.d.stack_shares(handles)
    import jax

    _write_shared(args.out, "noir-witness", {
        "a": np.asarray(jax.device_get(stacked.a)),
        "b": np.asarray(jax.device_get(stacked.b)),
    })


def cmd_translate_witness(args):
    """REP3 noir witness share -> Shamir(t=1) (bridges parity)."""
    import jax
    import jax.numpy as jnp

    from ..mpc.bridges import translate_rep3_to_shamir
    from ..mpc.rep3 import Rep3FieldShare

    share = _read_shared(args.witness, "noir-witness")
    net = _net(args)
    new = translate_rep3_to_shamir(
        _curve(), net,
        Rep3FieldShare(jnp.asarray(share["a"]), jnp.asarray(share["b"])))
    blob = _codec().encode({"protocol": "shamir", "curve": "bn254",
                            "kind": "noir-witness-shamir",
                            "a": np.asarray(jax.device_get(new))})
    with open(args.out, "wb") as fh:
        fh.write(blob)
    print(f"wrote {args.out}")


def _build_builder(args, driver=None, wshare=None):
    """Builder in provider mode (honk/co_builder.py) so memory circuits
    get the oblivious ROM/RAM gate structure. With no driver (create-vk),
    a plain driver over zeros gives the IDENTICAL structure — the vk only
    commits to value-independent precomputed polynomials."""
    import jax.numpy as jnp

    from ..honk.builder import UltraCircuitBuilder, acir_to_format
    from ..honk.co_builder import MpcBuilderValues
    from .acir import load_program_json

    circuits, _abi = load_program_json(args.circuit)
    c = circuits[0]
    af = acir_to_format(c)
    if driver is None:
        from ..mpc.driver import plain_driver

        driver = plain_driver(_curve())
        f = driver.fr
        wshare = driver.promote_public(
            jnp.zeros((f.L, af.varnum), jnp.uint32))
    m = MpcBuilderValues(driver, wshare)
    return UltraCircuitBuilder(af, [0] * af.varnum, mpc=m), c


def _crs(args):
    from ..honk.crs import TestCrs

    seed = (args.crs_seed.encode()
            if args.crs_seed else b"cocircom-tpu insecure test crs")
    return TestCrs(seed)


def cmd_generate_proof(args):
    """co-UltraHonk proof over the TCP mesh (prover.rs:47)."""
    import jax.numpy as jnp

    from ..honk.co_prover import CoUltraHonk
    from ..honk.prover import proof_to_buffer
    from ..mpc.rep3 import Rep3Driver, Rep3FieldShare

    share = _read_shared(args.witness, "noir-witness")
    net = _net(args)
    d = Rep3Driver(_curve(), net)
    wshare = Rep3FieldShare(jnp.asarray(share["a"]), jnp.asarray(share["b"]))
    builder, _c = _build_builder(args, driver=d, wshare=wshare)
    co = CoUltraHonk(d, _crs(args))
    proof = co.prove(builder, wshare)
    with open(args.out, "wb") as fh:
        fh.write(proof_to_buffer(proof))
    print(f"wrote {args.out}")


def cmd_create_vk(args):
    """Verification key JSON (co-noir.rs CreateVK / run_create_vk)."""
    from ..honk.proving_key import create_keys

    builder, _c = _build_builder(args)
    pk, vk = create_keys(builder, _crs(args))
    data = {
        "circuit_size": vk.circuit_size,
        "num_public_inputs": vk.num_public_inputs,
        "pub_inputs_offset": vk.pub_inputs_offset,
        "commitments": [
            None if c is None else [hex(c[0].v), hex(c[1].v)]
            for c in vk.commitments
        ],
        "g2_x": [[hex(vk.g2_x[0].c0.v), hex(vk.g2_x[0].c1.v)],
                 [hex(vk.g2_x[1].c0.v), hex(vk.g2_x[1].c1.v)]],
    }
    with open(args.out, "w") as fh:
        json.dump(data, fh)
    print(f"wrote {args.out}")


def cmd_verify(args):
    from ..fields.params import BN254
    from ..honk import verifier
    from ..honk.prover import proof_from_buffer
    from ..honk.proving_key import VerifyingKey
    from ..pairing.tower import Fp, Fp2

    data = json.load(open(args.vk))
    p = BN254.fq.p

    def pt(c):
        return None if c is None else (Fp(int(c[0], 16), p),
                                       Fp(int(c[1], 16), p))

    g2 = (Fp2(Fp(int(data["g2_x"][0][0], 16), p),
              Fp(int(data["g2_x"][0][1], 16), p)),
          Fp2(Fp(int(data["g2_x"][1][0], 16), p),
              Fp(int(data["g2_x"][1][1], 16), p)))
    vk = VerifyingKey(
        g2_x=g2,
        circuit_size=data["circuit_size"],
        num_public_inputs=data["num_public_inputs"],
        pub_inputs_offset=data["pub_inputs_offset"],
        commitments=[pt(c) for c in data["commitments"]],
    )
    proof = proof_from_buffer(open(args.proof, "rb").read())
    ok = verifier.verify(proof, vk)
    print("verification: " + ("OK" if ok else "FAILED"))
    sys.exit(0 if ok else 1)


def main(argv=None):
    ap = argparse.ArgumentParser(
        prog="cocircom-tpu-noir", description=__doc__)
    sub = ap.add_subparsers(dest="cmd", required=True)

    sp = sub.add_parser("split-witness")
    sp.add_argument("--witness", required=True, help="noir witness .gz")
    sp.add_argument("--circuit", required=True, help="program artifact JSON")
    sp.add_argument("--protocol", default="rep3", choices=["rep3"])
    sp.add_argument("--out-dir", required=True)
    sp.set_defaults(fn=cmd_split_witness)

    sp = sub.add_parser("split-input")
    sp.add_argument("--input", required=True, help="Prover.toml")
    sp.add_argument("--circuit", required=True)
    sp.add_argument("--protocol", default="rep3", choices=["rep3"])
    sp.add_argument("--out-dir", required=True)
    sp.set_defaults(fn=cmd_split_input)

    sp = sub.add_parser("merge-input-shares")
    sp.add_argument("inputs", nargs="+")
    sp.add_argument("--out", required=True)
    sp.set_defaults(fn=cmd_merge_input_shares)

    sp = sub.add_parser("generate-witness")
    sp.add_argument("--input", required=True, help=".shared input file")
    sp.add_argument("--circuit", required=True)
    sp.add_argument("--net-config", required=True)
    sp.add_argument("--out", required=True)
    sp.set_defaults(fn=cmd_generate_witness)

    sp = sub.add_parser("translate-witness")
    sp.add_argument("--witness", required=True)
    sp.add_argument("--net-config", required=True)
    sp.add_argument("--out", required=True)
    sp.set_defaults(fn=cmd_translate_witness)

    sp = sub.add_parser("generate-proof")
    sp.add_argument("--witness", required=True, help=".shared witness file")
    sp.add_argument("--circuit", required=True)
    sp.add_argument("--net-config", required=True)
    sp.add_argument("--crs", default="test", choices=["test"])
    sp.add_argument("--crs-seed")
    sp.add_argument("--out", required=True)
    sp.set_defaults(fn=cmd_generate_proof)

    sp = sub.add_parser("create-vk")
    sp.add_argument("--circuit", required=True)
    sp.add_argument("--crs", default="test", choices=["test"])
    sp.add_argument("--crs-seed")
    sp.add_argument("--out", required=True)
    sp.set_defaults(fn=cmd_create_vk)

    sp = sub.add_parser("verify")
    sp.add_argument("--proof", required=True)
    sp.add_argument("--vk", required=True)
    sp.set_defaults(fn=cmd_verify)

    args = ap.parse_args(argv)
    # co-located parties default to CPU (one tunneled TPU chip)
    os.environ.pop("PALLAS_AXON_POOL_IPS", None)
    import jax

    jax.config.update("jax_platforms", "cpu")
    args.fn(args)


if __name__ == "__main__":
    main()
