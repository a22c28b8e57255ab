"""Diagnose the kept-set divergence on the 8 non-byte-exact KATs.

For a circuit, runs the plain VM at O0 (every signal has a value), maps
witness VALUES back to signals (unique values only), and prints which
signals circom kept (KAT witness) vs which we kept — grouped by owning
component — to expose circom's pivot rule in the divergent clusters.

Usage: python scripts/diag_pivot.py <circuit> [max_rows]
"""
import json
import os
import sys
from collections import Counter

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.pop("PALLAS_AXON_POOL_IPS", None)
os.environ["COCIRCOM_DEBUG_LAYOUT"] = "1"

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from cocircom_tpu.fields.params import BN254
from cocircom_tpu.io.witness import read_wtns
from cocircom_tpu.mpc.driver import plain_driver
from cocircom_tpu.vm.compiler import compile_circom
from cocircom_tpu.vm.mpc_vm import WitnessExtension

TV = "/root/reference/test_vectors/WitnessExtension"


def main():
    name = sys.argv[1]
    max_rows = int(sys.argv[2]) if len(sys.argv) > 2 else 40
    src = open(f"{TV}/tests/{name}.circom").read()
    links = [f"{TV}/tests", f"{TV}/tests/libs"]
    inputs = json.load(open(f"{TV}/kats/{name}/input0.json"))
    want = read_wtns(
        open(f"{TV}/kats/{name}/witness0.wtns", "rb").read()
    ).values_ints()

    # O0 run: every signal gets a value
    c0 = compile_circom(src, BN254, link=links, opt=0)
    d = plain_driver(BN254)
    full = WitnessExtension(d, c0).run_host(inputs)
    dbg0 = c0._debug
    order0 = dbg0["order"]
    slot0 = dbg0["slot_of"]
    el0 = dbg0["el"]
    val_of_uid = {}
    for s in order0:
        sl = slot0.get(s.uid)
        if sl is not None:
            val_of_uid[s.uid] = full[sl]

    # our O2 layout
    c2 = compile_circom(src, BN254, link=links)
    got = WitnessExtension(plain_driver(BN254), c2).run_host(inputs)
    dbg2 = c2._debug
    order2 = dbg2["order"]
    slot2 = dbg2["slot_of"]

    # value -> candidate uids (unique only)
    vc = Counter(val_of_uid.values())
    uid_of_val = {}
    for u, v in val_of_uid.items():
        if vc[v] == 1:
            uid_of_val[v] = u

    def describe(uid, el):
        own = el0.sig_owner.get(uid)
        nm = None
        for bucket in (own.outs, own.ins, own.inters) if own else ():
            for bname, flat, _dims in bucket:
                for k, s in enumerate(flat):
                    if s.uid == uid:
                        nm = f"{bname}[{k}]"
        tpl = getattr(own, "template", "?")
        args = getattr(own, "args", "")
        return f"{tpl}{list(args)[:1] if args else ''}.{nm}"

    ours_uids = {s.uid for s in order2 if s.uid in slot2}
    # map each witness slot value to signals
    print(f"{name}: len={len(want)} ours={len(got)}")
    shown = 0
    for i, (g, w) in enumerate(zip(got, want)):
        if g == w:
            continue
        gu = uid_of_val.get(g)
        wu = uid_of_val.get(w)
        gd = describe(gu, el0) if gu else "?ambig"
        wd = describe(wu, el0) if wu else "?ambig"
        print(f"  slot {i}: ours={gd}  circom={wd}")
        shown += 1
        if shown >= max_rows:
            print("  ...")
            break

    # aggregate: which signals circom kept that we didn't
    want_vals = set(want)
    got_vals = set(got)
    circom_only = [uid_of_val[v] for v in want_vals - got_vals
                   if v in uid_of_val]
    ours_only = [uid_of_val[v] for v in got_vals - want_vals
                 if v in uid_of_val]
    cc = Counter(describe(u, el0).split(".")[0] for u in circom_only)
    oc = Counter(describe(u, el0).split(".")[0] for u in ours_only)
    print("circom-only kept by template:", dict(cc))
    print("ours-only kept by template:  ", dict(oc))
    namec = Counter(describe(u, el0).split(".")[1].split("[")[0]
                    for u in circom_only)
    nameo = Counter(describe(u, el0).split(".")[1].split("[")[0]
                    for u in ours_only)
    print("circom-only kept by signal:", dict(namec))
    print("ours-only kept by signal:  ", dict(nameo))


if __name__ == "__main__":
    main()
