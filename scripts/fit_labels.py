"""Fit circom's label order against the 60 KAT witnesses.

Hypothesis under test: circom's witness order = kept signals sorted by
LABEL (proven: r1cs wire2label maps are monotone), and the label order is
a tree walk: each component's own signals (outputs, inputs, intermediates,
declaration order within each bucket), then its child instances GROUPED BY
TEMPLATE NAME (sorted), each group's instances in creation order, each
instance visited recursively (DFS).

Usage: python scripts/fit_labels.py [variant] [circuit ...]
"""
import json
import os
import sys

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


def label_order(el, root, publics, variant="dfs_alpha"):
    """Return the list of Sig in hypothesized circom label order."""
    order = []

    def visit(c, is_root=False):
        ins = c.ins
        if is_root and publics:
            pub = [b for b in ins if b[0] in publics]
            priv = [b for b in ins if b[0] not in publics]
            ins = pub + priv
        for bucket in (c.outs, ins, c.inters):
            for _name, flat, _dims in bucket:
                order.extend(flat)
        subs = [k for kind, k in c.local_events if kind == "create"]
        if variant == "dfs_alpha":
            subs.sort(key=lambda s: s.template)  # stable: creation within
        elif variant == "dfs_decl":
            pass  # creation order
        for s in subs:
            visit(s)

    visit(root, True)
    return order


def check(name, variant):
    src = open(os.path.join(TV, "tests", f"{name}.circom")).read()
    lib = os.path.join(TV, "tests")
    cc = compile_circom(src, BN254, link=[lib, os.path.join(lib, "libs")])
    dbg = cc._debug
    el, root, kept = dbg["el"], dbg["root"], dbg["kept"]
    slot_of = dbg["slot_of"]
    publics = cc.public_names
    lorder = label_order(el, root, publics, variant)
    d = plain_driver(BN254)
    vm = WitnessExtension(d, cc)
    kat = os.path.join(TV, "kats", name)
    inputs = json.load(open(os.path.join(kat, "input0.json")))
    mywit = vm.run_host(inputs)
    want = read_wtns(open(os.path.join(kat, "witness0.wtns"), "rb").read()).values_ints()
    # my witness permuted into hypothesized label order
    new = [1]
    seen = set()
    for s in lorder:
        if s.uid in slot_of and s.uid not in seen:
            seen.add(s.uid)
            new.append(mywit[slot_of[s.uid]])
    if len(new) != len(want):
        return "LEN", len(new), len(want)
    if new == want:
        return "OK", None, None
    # first mismatch index
    for i, (a, b) in enumerate(zip(new, want)):
        if a != b:
            return "VAL", i, len(want)
    return "???", None, None


def main():
    variant = sys.argv[1] if len(sys.argv) > 1 else "dfs_alpha"
    names = sys.argv[2:]
    if not names:
        names = []
        for f in sorted(os.listdir(os.path.join(TV, "tests"))):
            if f.endswith(".circom") and os.path.isdir(
                os.path.join(TV, "kats", f[:-7])
            ):
                names.append(f[:-7])
    ok = 0
    for n in names:
        try:
            st, a, b = check(n, variant)
        except Exception as e:
            st, a, b = "ERR", type(e).__name__, str(e)[:60]
        if st == "OK":
            ok += 1
        print(f"{n}: {st} {a if a is not None else ''} {b if b is not None else ''}",
              flush=True)
    print(f"byte-exact {ok}/{len(names)} (variant={variant})")


if __name__ == "__main__":
    main()
