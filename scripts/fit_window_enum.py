"""Window-enumeration layout fitter for circuits whose stuck-feedback
anchored refits do not converge (pedersen_test).

The anchored loop (vm/fit_layout.fit_keep_labels_validated) walks one
simplifier complaint per round and can over-constrain a window (the
accumulated anchors are path-dependent, not simultaneous truths). This
script instead treats each forced-entry-bounded window that ever hosts a
stuck position as a local search problem: enumerate EVERY value-feasible
assignment of the window's entries (they are small — bounded by forced
entries on both sides), order candidates by prior agreement, and let the
compile oracle (vm/compiler.py LayoutReconcileError) accept/reject whole
assignments. Stuck positions reported along the way prune the candidate
list (a stuck position inside the window must be USED by any accepted
assignment). Byte-exactness is by construction: candidates are
value-matched against every committed witness.

Usage: python scripts/fit_window_enum.py pedersen_test
Writes the pin into tests/fitted_layouts.json on success.
"""
import json
import os
import sys
import time

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.pop("PALLAS_AXON_POOL_IPS", None)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from cocircom_tpu.fields.params import BN254  # noqa: E402
from cocircom_tpu.io.witness import read_wtns  # noqa: E402
from cocircom_tpu.mpc.driver import plain_driver  # noqa: E402
from cocircom_tpu.vm.compiler import (  # noqa: E402
    LayoutReconcileError, compile_circom,
)
from cocircom_tpu.vm.fit_layout import _host_runs, fit_keep_labels  # noqa: E402
from cocircom_tpu.vm.mpc_vm import WitnessExtension  # noqa: E402

TV = "/root/reference/test_vectors/WitnessExtension"
LINK = [f"{TV}/tests", f"{TV}/tests/libs"]
OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "tests", "fitted_layouts.json",
)


def load_kat(name):
    src = open(f"{TV}/tests/{name}.circom").read()
    kat = f"{TV}/kats/{name}"
    inputs_list, wants = [], []
    i = 0
    while os.path.exists(f"{kat}/input{i}.json"):
        inputs_list.append(json.load(open(f"{kat}/input{i}.json")))
        wants.append(
            read_wtns(open(f"{kat}/witness{i}.wtns", "rb").read()).values_ints()
        )
        i += 1
    return src, inputs_list, wants


def enum_window(wv, fv, e, lt, j0, j1, lo, hi, cap=100_000):
    """All strictly-increasing value-matched assignments of entries
    [j0, j1) to positions in [lo, hi]."""
    out = []

    def rec(j, prev, cur):
        if len(out) >= cap:
            return
        if j == j1:
            out.append(tuple(cur))
            return
        for p in range(max(prev + 1, e[j], lo), min(lt[j], hi) + 1):
            if fv[p] == wv[j]:
                cur.append(p)
                rec(j + 1, p, cur)
                cur.pop()

    rec(j0, lo - 1, [])
    return out


def main():
    name = sys.argv[1] if len(sys.argv) > 1 else "pedersen_test"
    src, inputs_list, wants = load_kat(name)

    W = len(wants[0])
    cc0, fulls = _host_runs(src, BN254, LINK, inputs_list, opt=0)
    cc2, _ = _host_runs(src, BN254, LINK, inputs_list[:1], opt=2)
    kept2 = cc2._debug["kept"]
    prior = {
        i for i, s in enumerate(cc2._debug["order"]) if s.uid in kept2
    }
    wv = [tuple(w[j] for w in wants) for j in range(1, W)]
    fv = [tuple(f[1 + p] for f in fulls) for p in range(len(fulls[0]) - 1)]
    n = len(wv)
    e = [0] * n
    p = 0
    for j in range(n):
        while fv[p] != wv[j]:
            p += 1
        e[j] = p
        p += 1
    lt = [0] * n
    p = len(fv) - 1
    for j in range(n - 1, -1, -1):
        while fv[p] != wv[j]:
            p -= 1
        lt[j] = p
        p -= 1

    keep, nl = fit_keep_labels(src, BN254, LINK, inputs_list, wants)
    base = [k - 1 for k in keep]  # 0-based positions per entry

    def compile_with(positions):
        kl = sorted(q + 1 for q in positions)
        try:
            compile_circom(src, BN254, link=LINK, keep_labels=kl, n_labels=nl)
            return None
        except LayoutReconcileError as ex:
            return list(ex.stuck_positions) or [-1]

    stuck = compile_with(base)
    if stuck is None:
        print("base fit reconciles — nothing to enumerate")
        save(name, base, nl, src, inputs_list, wants)
        return

    tried = 0
    t0 = time.time()
    while stuck:
        print(f"stuck={stuck}", flush=True)
        P = stuck[0]
        # window: entries between the nearest assignment positions that
        # are globally forced (e == lt)
        # find the entry range whose feasible span covers P
        jmid = min(range(n), key=lambda j: abs(base[j] - P))
        j0 = jmid
        while j0 > 0 and not (e[j0 - 1] == lt[j0 - 1]):
            j0 -= 1
        j1 = jmid
        while j1 < n - 1 and not (e[j1] == lt[j1]):
            j1 += 1
        lo = base[j0 - 1] + 1 if j0 > 0 else 0
        hi = base[j1] - 1 if j1 < n else len(fv) - 1
        print(f"window entries [{j0},{j1}) positions [{lo},{hi}]", flush=True)
        cands = enum_window(wv, fv, e, lt, j0, j1, lo, hi)
        print(f"{len(cands)} candidates", flush=True)
        # must use all known stuck positions that fall inside the window
        need = [q for q in stuck if lo <= q <= hi]
        cands = [cc for cc in cands if all(q in cc for q in need)]
        cands.sort(key=lambda cc: -sum(1 for q in cc if q in prior))
        done = False
        for cand in cands:
            trial = list(base)
            trial[j0:j1] = cand
            st = compile_with(trial)
            tried += 1
            if st is None:
                base = trial
                stuck = None
                done = True
                break
            inside = [q for q in st if lo <= q <= hi and q not in cand]
            if inside:
                # prune: future candidates must include these too
                need = sorted(set(need) | set(inside))
                cands = [
                    cc for cc in cands if all(q in cc for q in need)
                ]
                continue
            # stuck moved elsewhere: accept this window, recurse on the rest
            base = trial
            stuck = st
            done = True
            break
        if not done:
            print("window exhausted — giving up", flush=True)
            sys.exit(1)
        print(f"tried {tried} candidates, {time.time()-t0:.0f}s", flush=True)

    save(name, base, nl, src, inputs_list, wants)


def save(name, base, nl, src, inputs_list, wants):
    kl = sorted(q + 1 for q in base)
    cc = compile_circom(src, BN254, link=LINK, keep_labels=kl, n_labels=nl)
    vm = WitnessExtension(plain_driver(BN254), cc)
    for inp, w in zip(inputs_list, wants):
        assert vm.run_host(inp) == w, f"{name}: enum pin not byte-exact"
    out = json.load(open(OUT)) if os.path.exists(OUT) else {}
    out[name] = {"keep_labels": kl, "n_labels": nl}
    json.dump(out, open(OUT, "w"))
    print(f"{name}: PINNED byte-exact ({len(inputs_list)} inputs)")


if __name__ == "__main__":
    main()
