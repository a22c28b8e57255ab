"""Tracing / observability + leak gating.

Parity: the reference wraps every CLI command and hot kernel in `tracing`
spans with wall-clock logs (bin/co-circom.rs:57-72,503-506,
rep3.rs:886-889) and gates any logging that could print secret shares
behind the `dangerous` feature / VMConfig.allow_leaky_logs
(mpc-core/Cargo.toml:14-16, traits.rs:198-207, circom-mpc-vm mpc_vm.rs:29).

Spans nest; `report()` renders a per-phase wall-time table, and callers
can attach network byte counters per span (delta of Network.stats()).
Enable printing with COCIRCOM_TRACE=1 (or Tracer(enabled=True)).
"""

from __future__ import annotations

import contextlib
import os
import sys
import time


class Tracer:
    def __init__(self, enabled: bool | None = None, net=None):
        if enabled is None:
            enabled = bool(os.environ.get("COCIRCOM_TRACE"))
        self.enabled = enabled
        self.net = net
        self.rows: list[tuple[int, str, float, int, int]] = []
        self._depth = 0

    @contextlib.contextmanager
    def span(self, name: str):
        if not self.enabled:
            yield
            return
        sent0, recvd0 = self.net.stats() if self.net else (0, 0)
        t0 = time.perf_counter()
        self._depth += 1
        try:
            yield
        finally:
            self._depth -= 1
            dt = time.perf_counter() - t0
            sent1, recvd1 = self.net.stats() if self.net else (0, 0)
            self.rows.append(
                (self._depth, name, dt, sent1 - sent0, recvd1 - recvd0))

    def report(self, out=sys.stderr):
        if not self.enabled or not self.rows:
            return
        width = max(len("  " * d + n) for d, n, *_ in self.rows) + 2
        print(f"{'phase':<{width}} {'wall':>9} {'sent':>12} {'recvd':>12}",
              file=out)
        for depth, name, dt, sent, recvd in self.rows:
            label = "  " * depth + name
            print(f"{label:<{width}} {dt * 1e3:8.1f}ms {sent:>11}B "
                  f"{recvd:>11}B", file=out)


_NULL = Tracer(enabled=False)


def tracer_or_null(t: "Tracer | None") -> Tracer:
    return t if t is not None else _NULL


# ------------------------------------------------------------ leak gating

def leaky_logs_allowed() -> bool:
    """Opt-in gate for any log line that could contain secret-derived data
    (reference: `dangerous` cargo feature + allow_leaky_logs)."""
    return os.environ.get("COCIRCOM_ALLOW_LEAKY_LOGS") == "1"


def leak_guard(what: str):
    """Raise unless leaky output was explicitly enabled."""
    if not leaky_logs_allowed():
        raise PermissionError(
            f"{what} would reveal secret-derived values; set "
            "COCIRCOM_ALLOW_LEAKY_LOGS=1 to allow (reference parity: "
            "mpc-core 'dangerous' feature, traits.rs:198-207)")
