"""Pin a circuit's witness layout to a sample witness (no r1cs needed).

`compile_circom(keep_labels=...)` reproduces circom's witness layout when
an r1cs supplies the kept-label set (io/r1cs.py wire2label — the snarkjs
interop path). Users with only a circuit + one known-good snarkjs witness
(.wtns) can recover the same pin from the witness itself: the witness IS
the kept labels' values in label order, so matching its values into the
full (unsimplified) label-ordered value sequence identifies circom's kept
set even where the elimination-pivot heuristic diverges from ours
(docs/O2_LAYOUT_NOTES.md: poseidon t>=6 partial rounds et al.).

Method:
  1. compile at --O0 (all labels kept): host witness = value of EVERY
     label in label order, one sequence per provided input.
  2. match the committed witness entries (monotone in label order, value
     tuple across all inputs must agree) into that sequence:
       - global earliest/latest greedy passes bound every entry's
         feasible position range;
       - entries whose value is RARE (few occurrences in the full
         sequence) and already sits at the default-O2 kept position are
         anchored there — low-entropy values (bit signals are mostly
         0/1) never anchor, so a coincidental equality cannot pin a
         wrong position;
       - the stretches between anchors are solved by a small DP that
         maximizes agreement with the default-O2 kept set; if a stretch
         is unsatisfiable (an anchor WAS a coincidence), its boundary
         anchors are dropped and the windows merge (escalating to the
         full-sequence DP in the worst case).
  3. return 1-based keep_labels for `compile_circom(keep_labels=...,
     n_labels=...)`, which re-validates via the simplifier (a label set
     whose complement it cannot eliminate raises ValueError). Callers
     should assert byte-exactness on at least one held-out witness.

Reference parity: circom-types/src/r1cs.rs:75-104 consumes wire2label for
the same purpose when an r1cs exists; this recovers the map without one.
"""

from __future__ import annotations

import os
from collections import Counter

from .compiler import compile_circom
from .mpc_vm import WitnessExtension

# values occurring more often than this in the full label sequence are
# considered low-entropy and never used as anchors
RARE_MAX = 3


def _host_runs(src, curve, link, inputs_list, opt):
    """Compile at `opt` and run every input on the host path."""
    from ..mpc.driver import plain_driver

    keep = os.environ.get("COCIRCOM_DEBUG_LAYOUT")
    os.environ["COCIRCOM_DEBUG_LAYOUT"] = "1"
    try:
        cc = compile_circom(src, curve, link=link, opt=opt)
    finally:
        if keep is None:
            os.environ.pop("COCIRCOM_DEBUG_LAYOUT", None)
        else:
            os.environ["COCIRCOM_DEBUG_LAYOUT"] = keep
    vm = WitnessExtension(plain_driver(curve), cc)
    return cc, [vm.run_host(inp) for inp in inputs_list]


def fit_keep_labels(src, curve, link, inputs_list, wants):
    """Fit circom's kept-label set from committed witnesses.

    inputs_list: list of input dicts; wants: matching list of full circom
    witness value lists (ints, index 0 == 1). Returns (keep_labels,
    n_labels) for compile_circom."""
    assert len(inputs_list) == len(wants) and wants
    W = len(wants[0])
    assert all(len(w) == W for w in wants), "witness lengths differ"

    cc0, fulls = _host_runs(src, curve, link, inputs_list, opt=0)
    order = cc0._debug["order"]
    F = len(fulls[0])
    assert F == len(order) + 1, (F, len(order))

    # default-O2 kept set as positions in the full label order (prior)
    cc2, _ = _host_runs(src, curve, link, inputs_list[:1], opt=2)
    kept2 = cc2._debug["kept"]
    prior = [
        i for i, s in enumerate(cc2._debug["order"]) if s.uid in kept2
    ]

    # value tuples (one per input) for want entry j / full position p
    wv = [tuple(w[j] for w in wants) for j in range(1, W)]
    fv = [tuple(f[1 + p] for f in fulls) for p in range(F - 1)]
    n = len(wv)
    if len(prior) != n:
        raise ValueError(
            f"witness length {W} != default-O2 kept count {len(prior) + 1}"
        )

    # global feasible-position bounds
    e = [0] * n
    p = 0
    for j in range(n):
        while p < len(fv) and fv[p] != wv[j]:
            p += 1
        if p >= len(fv):
            raise ValueError(
                f"witness entry {j + 1} has no matching label value — "
                "wrong circuit/witness pair?"
            )
        e[j] = p
        p += 1
    lt = [0] * n
    p = len(fv) - 1
    for j in range(n - 1, -1, -1):
        while p >= 0 and fv[p] != wv[j]:
            p -= 1
        assert p >= 0  # earliest pass proved feasibility
        lt[j] = p
        p -= 1

    freq = Counter(fv)
    prior_set = set(prior)

    def anchored(j):
        return (
            fv[prior[j]] == wv[j]
            and freq[wv[j]] <= RARE_MAX
            and e[j] <= prior[j] <= lt[j]
        )

    pos: list[int | None] = [None] * n
    for j in range(n):
        if e[j] == lt[j]:
            pos[j] = e[j]
        elif anchored(j):
            pos[j] = prior[j]

    # solve stretches between anchors; on unsatisfiability, drop the
    # boundary anchors and widen (forced e==lt entries are never dropped)
    j = 0
    while j < n:
        if pos[j] is not None:
            j += 1
            continue
        j0 = j
        while j < n and pos[j] is None:
            j += 1
        j1 = j
        while True:
            lo = pos[j0 - 1] + 1 if j0 > 0 else 0
            hi = (pos[j1] - 1) if j1 < n else (len(fv) - 1)
            try:
                _solve_window(wv, fv, prior_set, pos, e, lt, j0, j1, lo, hi)
                break
            except ValueError:
                widened = False
                if j0 > 0 and e[j0 - 1] != lt[j0 - 1]:
                    j0 -= 1
                    pos[j0] = None
                    widened = True
                if j1 < n and e[j1] != lt[j1]:
                    pos[j1] = None
                    j1 += 1
                    widened = True
                if not widened:
                    raise
        j = j1
    return [q + 1 for q in pos], F


def _solve_window(wv, fv, prior, pos, e, lt, j0, j1, lo, hi):
    """Fill pos[j0:j1) with strictly-increasing positions in [lo, hi]
    (further bounded by the global e/lt ranges) whose values match,
    maximizing membership in `prior`."""
    if (j1 - j0) * (hi - lo + 1) > 200_000:
        return _solve_window_np(wv, fv, prior, pos, e, lt, j0, j1, lo, hi)
    best_prev: dict[int, int] = {}
    back: list[dict] = []
    for j in range(j0, j1):
        cur: dict[int, int] = {}
        bk: dict = {}
        run_best, run_arg = -1, None
        prev_items = sorted(best_prev.items())
        pi = 0
        for pp in range(max(lo, e[j]), min(hi, lt[j]) + 1):
            while pi < len(prev_items) and prev_items[pi][0] < pp:
                if prev_items[pi][1] > run_best:
                    run_best = prev_items[pi][1]
                    run_arg = prev_items[pi][0]
                pi += 1
            if fv[pp] != wv[j]:
                continue
            if j > j0:
                if run_best < 0:
                    continue
                base = run_best
            else:
                base = 0
            cur[pp] = base + (1 if pp in prior else 0)
            bk[pp] = run_arg
        if not cur:
            raise ValueError(
                f"witness entries {j0 + 1}..{j1} cannot be matched inside "
                f"label window [{lo}, {hi}]"
            )
        best_prev = cur
        back.append(bk)
    pbest = max(best_prev, key=lambda q: best_prev[q])
    for j in range(j1 - 1, j0 - 1, -1):
        pos[j] = pbest
        pbest = back[j - j0][pbest]


def _solve_window_np(wv, fv, prior, pos, e, lt, j0, j1, lo, hi):
    """Vectorized variant of _solve_window for big stretches (sha256-class
    bit runs): per-row score arrays over the window with prefix-max/argmax
    transitions instead of dict DP. Same result, O(rows*win) numpy ops."""
    import numpy as np

    win = hi - lo + 1
    ids: dict = {}
    fvid = np.fromiter(
        (ids.setdefault(fv[p], len(ids)) for p in range(lo, hi + 1)),
        dtype=np.int64, count=win,
    )
    prior_mask = np.fromiter(
        ((1 if (lo + i) in prior else 0) for i in range(win)),
        dtype=np.int32, count=win,
    )
    idx = np.arange(win)
    NEG = np.int32(-1 << 20)
    prev = None
    backs: list = []
    for j in range(j0, j1):
        match = fvid == ids.get(wv[j], -2)
        if j == j0:
            cur = np.where(match, prior_mask, NEG)
            backs.append(None)
        else:
            pm = np.maximum.accumulate(prev)
            parg = np.maximum.accumulate(np.where(prev >= pm, idx, -1))
            shifted = np.concatenate(([NEG], pm[:-1]))
            sarg = np.concatenate(([0], parg[:-1])).astype(np.int32)
            cur = np.where(
                match & (shifted > NEG // 2), shifted + prior_mask, NEG
            ).astype(np.int32)
            backs.append(sarg)
        a, b = max(0, e[j] - lo), lt[j] - lo
        cur[:a] = NEG
        cur[b + 1:] = NEG
        if cur.max() <= NEG // 2:
            raise ValueError(
                f"witness entries {j0 + 1}..{j1} cannot be matched inside "
                f"label window [{lo}, {hi}]"
            )
        prev = cur
    p = int(np.argmax(prev))
    for j in range(j1 - 1, j0 - 1, -1):
        pos[j] = lo + p
        if backs[j - j0] is not None:
            p = int(backs[j - j0][p])
