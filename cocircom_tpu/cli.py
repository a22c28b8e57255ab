"""co-circom CLI parity: the 7-subcommand pipeline.

Parity: /root/reference/co-circom/co-circom/src/bin/co-circom.rs:82-97 —
  split-witness | split-input | merge-input-shares | generate-witness |
  translate-witness | generate-proof | verify
Config layering (TOML file -> env COCIRCOM_* -> CLI flags) mirrors the
figment setup at co-circom/src/lib.rs:447-482 in spirit: here CLI flags
override env vars over a JSON config file (--config).

Multi-party deployment: each party runs its own process; --net-config
points to a JSON file {"my_id": k, "parties": [{"id","host","port"},...]}
(mpc-net/src/config.rs equivalent) and parties connect over a TCP mesh.
"""

from __future__ import annotations

import argparse
import json
import os
import sys


def _load_net(path: str):
    """Net config JSON: {"my_id": k, "key_path"?: ..., "parties":
    [{"id", "host", "port", "cert_path"?}, ...]}. When key_path and every
    party's cert_path are present the mesh runs mutual TLS (parity:
    mpc-net/src/config.rs:52-98). Returns (my_id, addrs, TlsConfig|None)."""
    cfg = json.load(open(path))
    n = len(cfg["parties"])
    my_id = int(cfg["my_id"])
    addrs = [None] * n
    certs = [None] * n
    for p in cfg["parties"]:
        addrs[int(p["id"])] = (p.get("host", "127.0.0.1"), int(p["port"]))
        certs[int(p["id"])] = p.get("cert_path")
    tls = None
    if cfg.get("key_path") and all(certs):
        from .mpc.net import TlsConfig

        tls = TlsConfig(
            cfg["key_path"],
            certs[my_id],
            party_cert_paths={i: c for i, c in enumerate(certs)},
        )
    return my_id, addrs, tls


def _driver(protocol: str, curve, net_config: str | None, threshold: int = 1):
    from .mpc.driver import PlainDriver

    if protocol == "plain":
        return PlainDriver(curve)
    my_id, addrs, tls = _load_net(net_config)
    from .mpc.net import TcpNetwork

    net = TcpNetwork(my_id, addrs, tls=tls)
    if protocol == "rep3":
        from .mpc.rep3 import Rep3Driver

        return Rep3Driver(curve, net)
    if protocol == "shamir":
        from .mpc.shamir import ShamirDriver

        return ShamirDriver(curve, net, threshold)
    raise SystemExit(f"unknown protocol {protocol}")


def cmd_split_witness(args):
    from .io.shares_io import shared_witness_from_split
    from .io.witness import read_wtns
    from .snark.shared import (
        split_witness_plain,
        split_witness_rep3,
        split_witness_shamir,
    )

    w = read_wtns(open(args.witness, "rb").read())
    n_public = args.num_publics
    if n_public is None:
        if args.r1cs:
            from .io.r1cs import read_r1cs

            r = read_r1cs(open(args.r1cs, "rb").read())
            n_public = r.n_pub_in + r.n_pub_out
        else:
            raise SystemExit("need --num-publics or --r1cs")
    os.makedirs(args.out_dir, exist_ok=True)
    if args.protocol == "rep3":
        shares = split_witness_rep3(w, n_public)
    elif args.protocol == "shamir":
        shares = split_witness_shamir(w, n_public, args.threshold, args.num_parties)
    else:
        shares = [split_witness_plain(w, n_public)]
    for i, s in enumerate(shares):
        path = os.path.join(args.out_dir, f"witness.wtns.{i}.shared")
        with open(path, "wb") as fh:
            fh.write(shared_witness_from_split(args.protocol, w.curve, s))
        print(f"wrote {path}")


def cmd_generate_proof(args):
    from .fields.params import curve_by_name
    from .io.shares_io import shared_witness_to_split

    protocol, curve, shared = shared_witness_to_split(open(args.witness, "rb").read())
    d = _driver(protocol, curve, args.net_config, args.threshold)
    if args.proof_system == "groth16":
        from .io.zkey import read_groth16_zkey
        from .snark.groth16 import CoGroth16

        zk = read_groth16_zkey(open(args.zkey, "rb").read())
        from .utils.trace import Tracer

        tr = Tracer(net=getattr(d, "net", None))
        with tr.span("generate-proof groth16"):
            proof = CoGroth16(d, tracer=tr).prove(zk, shared)
        tr.report()
        from .io.jsonio import dump_groth16_proof, dump_public_inputs

        out = dump_groth16_proof(curve, proof["pi_a"], proof["pi_b"], proof["pi_c"])
    else:
        from .io.jsonio import dump_plonk_proof, dump_public_inputs
        from .io.plonk_zkey import read_plonk_zkey
        from .snark.plonk import CoPlonk

        zk = read_plonk_zkey(open(args.zkey, "rb").read())
        from .utils.trace import Tracer

        tr = Tracer(net=getattr(d, "net", None))
        with tr.span("generate-proof plonk"):
            proof = CoPlonk(d, tracer=tr).prove(zk, shared)
        tr.report()
        out = dump_plonk_proof(curve, proof)
    with open(args.out, "w") as fh:
        fh.write(out)
    print(f"wrote {args.out}")
    if args.public_out:
        with open(args.public_out, "w") as fh:
            fh.write(dump_public_inputs(shared.public_inputs[1:]))
        print(f"wrote {args.public_out}")


def cmd_verify(args):
    data = open(args.proof, "rb").read()
    vk_data = open(args.vk, "rb").read()
    pub = open(args.public, "rb").read()
    from .io.jsonio import parse_public_inputs

    publics = parse_public_inputs(pub)
    if args.proof_system == "groth16":
        from .io.jsonio import parse_groth16_proof, parse_groth16_vk
        from .snark.groth16_verify import verify_groth16

        ok = verify_groth16(parse_groth16_vk(vk_data), parse_groth16_proof(data), publics)
    else:
        from .io.jsonio import parse_plonk_proof, parse_plonk_vk
        from .snark.plonk_verify import verify_plonk

        ok = verify_plonk(parse_plonk_vk(vk_data), parse_plonk_proof(data), publics)
    print("verification: " + ("OK" if ok else "FAILED"))
    sys.exit(0 if ok else 1)


def cmd_setup(args):
    """Trusted setup from an .r1cs (`snarkjs {groth16,plonk} setup`
    equivalent): writes a snarkjs-format .zkey plus verification_key.json.
    Single-party setup — development keys; use a phase-2 ceremony for
    production."""
    from .io.r1cs import read_r1cs

    r1cs = read_r1cs(open(args.r1cs, "rb").read())
    seed = args.seed.encode() if args.seed else None
    if args.proof_system == "groth16":
        from .io.jsonio import dump_groth16_vk as dump_vk
        from .snark.setup import groth16_setup as run_setup
    else:
        from .io.jsonio import dump_plonk_vk as dump_vk
        from .snark.plonk_setup import plonk_setup as run_setup
    zkey_bytes, vk = run_setup(r1cs, seed=seed)
    with open(args.zkey, "wb") as f:
        f.write(zkey_bytes)
    if args.vk:
        with open(args.vk, "w") as f:
            f.write(dump_vk(vk))
    print(f"setup: {args.proof_system}, {r1cs.n_constraints} constraints, "
          f"{r1cs.n_wires} wires -> {args.zkey}")


def cmd_translate_witness(args):
    """REP3 share -> Shamir(t=1) share (bridges/rep3_to_shamir.rs parity)."""
    from .io.shares_io import shared_witness_from_split, shared_witness_to_split
    from .mpc.bridges import translate_rep3_to_shamir
    from .snark.groth16 import SharedWitness

    protocol, curve, shared = shared_witness_to_split(open(args.witness, "rb").read())
    if protocol != "rep3":
        raise SystemExit("translate-witness expects a rep3 share as input")
    my_id, addrs, tls = _load_net(args.net_config)
    from .mpc.net import TcpNetwork

    net = TcpNetwork(my_id, addrs, tls=tls)
    new_share = translate_rep3_to_shamir(curve, net, shared.witness)
    out_shared = SharedWitness(shared.public_inputs, new_share)
    with open(args.out, "wb") as fh:
        fh.write(shared_witness_from_split("shamir", curve, out_shared))
    print(f"wrote {args.out}")


def cmd_gen_cert(args):
    from .mpc.net import gen_self_signed_cert

    gen_self_signed_cert(args.key_out, args.cert_out, args.dns_name)
    print(f"wrote {args.key_out} and {args.cert_out}")


def cmd_split_input(args):
    """Split an input.json into per-party SharedInput files: public signals
    (the circuit's {public [...]} list) replicated in-clear, private signals
    secret-shared. Parity: bin/co-circom.rs run_split_input (:255-335)."""
    from .fields.params import curve_by_name
    from .io.shares_io import write_shared_input
    from .snark.shared import split_input_rep3
    from .vm.compiler import compile_circom

    if args.protocol != "rep3":
        raise SystemExit("only REP3 is supported for splitting inputs")
    curve = curve_by_name(args.curve)
    parsed = compile_circom(open(args.circuit).read(), curve, link=args.link or [])
    inputs = json.loads(open(args.input).read())
    shares = split_input_rep3(curve, inputs, set(parsed.public_names))
    os.makedirs(args.out_dir, exist_ok=True)
    base = os.path.basename(args.input)
    for i, s in enumerate(shares):
        path = os.path.join(args.out_dir, f"{base}.{i}.shared")
        with open(path, "wb") as fh:
            fh.write(write_shared_input("rep3", curve.name, s))
        print(f"wrote {path}")


def cmd_merge_input_shares(args):
    """Union SharedInput files from independent input providers.
    Parity: bin/co-circom.rs run_merge_input_shares (:338-368)."""
    from .io.shares_io import read_shared_input, write_shared_input
    from .snark.shared import merge_inputs

    if len(args.inputs) < 2:
        raise SystemExit("need at least two input shares to merge")
    merged = proto = curve = None
    for path in args.inputs:
        protocol, c, si = read_shared_input(open(path, "rb").read())
        if merged is None:
            merged, proto, curve = si, protocol, c
        else:
            if protocol != proto or c.name != curve.name:
                raise SystemExit("protocol/curve mismatch between input shares")
            merged = merge_inputs(merged, si)
    with open(args.out, "wb") as fh:
        fh.write(write_shared_input(proto, curve.name, merged))
    print(f"wrote {args.out}")


def _compile_cli(args, curve):
    """compile_circom with the optional --r1cs layout pin: the r1cs
    wire2label map forces the witness layout to the exact kept-set circom
    chose when it produced that r1cs/zkey (vm/compiler.py keep_labels)."""
    from .vm.compiler import compile_circom

    kw = {}
    r1cs_path = getattr(args, "r1cs", None)
    if r1cs_path:
        from .io.r1cs import read_r1cs

        r1 = read_r1cs(open(r1cs_path, "rb").read())
        kw = {"keep_labels": r1.wire_mapping[1:], "n_labels": r1.n_labels}
    return compile_circom(
        open(args.circuit).read(), curve, link=args.link or [], **kw
    )


def cmd_generate_witness(args):
    """MPC witness extension. plain: input.json -> .wtns on the host path.
    rep3: a .shared SharedInput file -> run_shared_input through the
    networked driver -> .shared witness (no cleartext witness ever exists).
    Parity: bin/co-circom.rs run_generate_witness (:369-404) +
    co_circom::generate_witness_rep3 (lib.rs:504)."""
    from .fields.params import curve_by_name
    from .vm.compiler import compile_circom
    from .vm.mpc_vm import WitnessExtension

    if args.protocol == "plain":
        curve = curve_by_name(args.curve)
        parsed = _compile_cli(args, curve)
        inputs = json.loads(open(args.input).read())
        d = _driver("plain", curve, None)
        vm = WitnessExtension(d, parsed)
        witness = vm.run_plain_inputs(inputs)
        from .io.witness import write_wtns

        with open(args.out, "wb") as fh:
            fh.write(write_wtns(curve, witness))
        print(f"wrote {args.out}")
        return
    if args.protocol != "rep3":
        raise SystemExit(
            "generate-witness supports plain and rep3 (translate a rep3 "
            "witness to shamir with translate-witness, bin/co-circom.rs:85)"
        )
    from .io.shares_io import read_shared_input, shared_witness_from_split

    protocol, curve, si = read_shared_input(open(args.input, "rb").read())
    if protocol != "rep3":
        raise SystemExit(f"input share file is {protocol}, expected rep3")
    parsed = _compile_cli(args, curve)
    d = _driver("rep3", curve, args.net_config)
    vm = WitnessExtension(d, parsed)
    sw = vm.run_shared_input(si)
    with open(args.out, "wb") as fh:
        fh.write(shared_witness_from_split("rep3", curve, sw))
    print(f"wrote {args.out}")


def _select_device(device: str):
    """Pick the jax backend before any compute module loads. Default cpu:
    co-located party processes must not contend for one tunneled TPU chip;
    production parties set --device tpu (each party owns its slice)."""
    import jax

    if device == "cpu":
        os.environ.pop("PALLAS_AXON_POOL_IPS", None)
        jax.config.update("jax_platforms", "cpu")
        # NO persistent cache on CPU: this jaxlib's CPU AOT cache roundtrip
        # is broken (cpu_aot_loader feature mismatch -> SIGILL/segfault on
        # read, docs/TPU_NOTES.md "CPU-backend stability").
        return
    cache = "/root/.cache/cocircom_tpu/xla-" + device
    os.makedirs(cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


def _layered_config(argv):
    """figment-style layering (co-circom/src/lib.rs:447-482 parity):
    config file (--config, TOML or JSON) -> env COCIRCOM_<KEY> -> CLI
    flags. Returns a dict of default overrides keyed by dest name."""
    cfgpath = None
    argv = list(sys.argv[1:] if argv is None else argv)
    for i, a in enumerate(argv):
        if a == "--config" and i + 1 < len(argv):
            cfgpath = argv[i + 1]
        elif a.startswith("--config="):
            cfgpath = a.split("=", 1)[1]
    layered: dict = {}
    if cfgpath:
        raw = open(cfgpath, "rb").read()
        if cfgpath.endswith(".toml"):
            import tomllib

            layered.update(tomllib.loads(raw.decode()))
        else:
            layered.update(json.loads(raw))
    _ENV_KEYS = ("protocol", "curve", "net_config", "threshold", "device",
                 "out_dir", "link")
    for key in _ENV_KEYS:
        env = os.environ.get("COCIRCOM_" + key.upper())
        if env is not None:
            layered[key] = env
    if "threshold" in layered:
        layered["threshold"] = int(layered["threshold"])
    return layered


def main(argv=None):
    ap = argparse.ArgumentParser(prog="cocircom-tpu", description=__doc__)
    ap.add_argument("--config", help="TOML/JSON config file (lowest layer)")
    ap.add_argument(
        "--device",
        default=os.environ.get("COCIRCOM_DEVICE", "cpu"),
        choices=["cpu", "tpu"],
        help="compute backend (default cpu; tpu = whatever jax exposes)",
    )
    sub = ap.add_subparsers(dest="cmd", required=True)

    sp = sub.add_parser("split-witness", help="split a wtns into MPC shares")
    sp.add_argument("--witness", required=True)
    sp.add_argument("--r1cs")
    sp.add_argument("--num-publics", type=int)
    sp.add_argument("--protocol", default="rep3", choices=["plain", "rep3", "shamir"])
    sp.add_argument("--threshold", type=int, default=1)
    sp.add_argument("--num-parties", type=int, default=3)
    sp.add_argument("--out-dir", required=True)
    sp.set_defaults(fn=cmd_split_witness)

    sp = sub.add_parser("generate-proof", help="run the collaborative prover")
    sp.add_argument("proof_system", choices=["groth16", "plonk"])
    sp.add_argument("--zkey", required=True)
    sp.add_argument("--witness", required=True, help=".shared witness file")
    sp.add_argument("--net-config", help="JSON net config (omit for plain)")
    sp.add_argument("--threshold", type=int, default=1)
    sp.add_argument("--out", required=True)
    sp.add_argument("--public-out")
    sp.set_defaults(fn=cmd_generate_proof)

    sp = sub.add_parser("verify", help="verify a proof (host-side pairing)")
    sp.add_argument("proof_system", choices=["groth16", "plonk"])
    sp.add_argument("--proof", required=True)
    sp.add_argument("--vk", required=True)
    sp.add_argument("--public", required=True)
    sp.set_defaults(fn=cmd_verify)

    sp = sub.add_parser(
        "setup", help="trusted setup: .r1cs -> .zkey (+ vk json)")
    sp.add_argument("proof_system", choices=["groth16", "plonk"])
    sp.add_argument("r1cs")
    sp.add_argument("zkey")
    sp.add_argument("--vk", help="also write verification_key.json here")
    sp.add_argument("--seed", help="deterministic toxic waste (TESTS ONLY)")
    sp.set_defaults(fn=cmd_setup)

    sp = sub.add_parser("translate-witness", help="rep3 share -> shamir share")
    sp.add_argument("--witness", required=True)
    sp.add_argument("--net-config", required=True)
    sp.add_argument("--out", required=True)
    sp.set_defaults(fn=cmd_translate_witness)

    sp = sub.add_parser("gen-cert", help="generate a self-signed TLS cert+key")
    sp.add_argument("--key-out", required=True)
    sp.add_argument("--cert-out", required=True)
    sp.add_argument("--dns-name", default="localhost")
    sp.set_defaults(fn=cmd_gen_cert)

    sp = sub.add_parser("split-input", help="split input.json into MPC shares")
    sp.add_argument("--input", required=True, help="input.json")
    sp.add_argument("--circuit", required=True, help=".circom source")
    sp.add_argument("--curve", default="bn254")
    sp.add_argument("--link", action="append", help="circom library search dir")
    sp.add_argument("--protocol", default="rep3", choices=["rep3"])
    sp.add_argument("--out-dir", required=True)
    sp.set_defaults(fn=cmd_split_input)

    sp = sub.add_parser("merge-input-shares", help="merge .shared input files")
    sp.add_argument("inputs", nargs="+")
    sp.add_argument("--out", required=True)
    sp.set_defaults(fn=cmd_merge_input_shares)

    sp = sub.add_parser("generate-witness", help="MPC witness extension")
    sp.add_argument("--circuit", required=True, help=".circom source")
    sp.add_argument(
        "--input",
        required=True,
        help="input.json (plain) or a .shared SharedInput file (rep3)",
    )
    sp.add_argument("--curve", default="bn254")
    sp.add_argument("--link", action="append", help="circom library search dir")
    sp.add_argument(
        "--r1cs",
        help="snarkjs .r1cs whose wire2label map pins the witness layout "
        "(use when proving against that r1cs's zkey)",
    )
    sp.add_argument("--protocol", default="plain", choices=["plain", "rep3", "shamir"])
    sp.add_argument("--net-config")
    sp.add_argument("--threshold", type=int, default=1)
    sp.add_argument("--out", required=True)
    sp.set_defaults(fn=cmd_generate_witness)

    layered = _layered_config(argv)
    if layered:
        # defaults only — explicit CLI flags still win (highest layer)
        for action in ap._actions:
            if action.dest in layered:
                action.default = layered[action.dest]
        for sp_action in ap._subparsers._group_actions[0].choices.values():
            for action in sp_action._actions:
                if action.dest in layered:
                    action.default = layered[action.dest]
                    action.required = False
    args = ap.parse_args(argv)
    _select_device(args.device)
    args.fn(args)


if __name__ == "__main__":
    main()
