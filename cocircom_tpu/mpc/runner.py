"""In-process multi-party runner: N parties as threads + LocalNetwork.

The reference's highest-leverage test asset (SURVEY.md section 4.2) rebuilt:
spawn N threads running the same function over a queue mesh, join, return
per-party results. Exceptions propagate (first one re-raised).
"""

from __future__ import annotations

import threading
from typing import Callable

from .net import LocalNetwork


def run_parties(fn: Callable, n: int = 3, timeout: float = 1800.0,
                device: bool = True) -> list:
    """fn(party_id, net) -> result; returns [result_0, ..., result_{n-1}]."""
    # device=True: co-located threads hand arrays over zero-copy (on the
    # CPU backend device arrays ARE host memory; materializing to numpy on
    # every send just forced a synchronous flush per round). The TCP path
    # exercises real serialization; this fixture exercises the protocol.
    # Pass device=False to route through the host-serialization path
    # (_to_host) that a real wire exercises — at least one protocol test
    # keeps codec coverage there (tests/test_rep3_binary.py).
    nets = LocalNetwork.create(n, device=device)
    results = [None] * n
    errors = [None] * n

    def work(i):
        from .net import ComputeGate

        try:
            ComputeGate.acquire()
            results[i] = fn(i, nets[i])
        except BaseException as e:  # noqa: BLE001 — propagate to the caller
            errors[i] = e
        finally:
            ComputeGate.release()

    threads = [threading.Thread(target=work, args=(i,), daemon=True) for i in range(n)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout)
        if t.is_alive():
            raise TimeoutError("party thread did not finish")
    for e in errors:
        if e is not None:
            raise e
    return results
