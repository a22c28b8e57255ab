"""Test configuration: force CPU with 8 virtual devices BEFORE jax import.

Mirrors the reference's in-process "fake cluster" testing strategy
(/root/reference/tests/src/rep3_network.rs): everything runs on one host,
multi-chip sharding is exercised on a virtual 8-device CPU mesh.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    flags = (flags + " --xla_force_host_platform_device_count=8").strip()
# single-threaded codegen: LLVM ORC JIT races against concurrently executing
# party threads otherwise (intermittent SIGSEGV in compile)
if "parallel_codegen" not in flags:
    flags += " --xla_cpu_parallel_codegen_split_count=1"
os.environ["XLA_FLAGS"] = flags
# Force the real CPU backend: the axon sitecustomize registers a remote-TPU
# PJRT plugin at interpreter boot (jax is already imported here), and per-op
# eager dispatch over that tunnel is ~1000x slower than local CPU. Backends
# initialize lazily, so flipping the config before first use still works.
# Tests are CPU-only; bench.py (fully jitted) is what runs on the TPU.
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.pop("PALLAS_AXON_POOL_IPS", None)

import jax  # noqa: E402,F401

jax.config.update("jax_platforms", "cpu")
# synchronous dispatch: XLA:CPU's async execution threads race LLVM codegen
# (segfault) — with this plus the ComputeGate, device work never overlaps a
# compile in another thread
jax.config.update("jax_cpu_enable_async_dispatch", False)
# The persistent compilation cache stays DISABLED on CPU: this jaxlib's
# CPU AOT serialize/deserialize roundtrip is broken on this machine — a
# fresh cache written by one clean run segfaults the next run on read
# (cpu_aot_loader feature-mismatch entries). The TPU cache (bench path)
# is unaffected. Compile-vs-execute races are handled by the ComputeGate +
# synchronous dispatch + the codegen clamp above.

import sys  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Serialize XLA compilation: concurrent compiles from the 3 MPC party
# threads can segfault the CPU backend (observed in jax 0.9 with the
# persistent cache). Execution stays fully parallel.
try:  # noqa: SIM105
    import threading as _threading

    import jax._src.compiler as _jc

    _compile_lock = _threading.RLock()

    def _lockwrap(name):
        orig = getattr(_jc, name)

        def wrapped(*args, **kwargs):
            with _compile_lock:
                return orig(*args, **kwargs)

        setattr(_jc, name, wrapped)

    _lockwrap("backend_compile_and_load")
    _lockwrap("compile_or_get_cached")  # covers cache reads/writes too
except (ImportError, AttributeError):  # private API moved — tolerate
    pass

REFERENCE = "/root/reference"

import pytest  # noqa: E402


@pytest.fixture(autouse=True, scope="module")
def _bound_backend_state():
    """Drop compiled executables between modules: long single-process runs
    accumulate XLA:CPU JIT state until a late compile segfaults (observed
    repeatedly in whatever module compiles last — test_sharded with the
    current ordering; each module passes in isolation). Recompiles cost a
    little wall time; an intermittently-red suite costs more."""
    yield
    jax.clear_caches()

# serialize device compute across in-process party threads (see ComputeGate).
# Default OFF since round 3: the compile locks above (+ synchronous dispatch
# + single-threaded codegen) cover the compile-vs-compile and
# compile-vs-execute races we could reproduce; COCIRCOM_COMPUTE_GATE=1
# restores the full serialization if the LLVM ORC JIT race ever resurfaces.
from cocircom_tpu.mpc.net import ComputeGate  # noqa: E402

ComputeGate.enabled = os.environ.get("COCIRCOM_COMPUTE_GATE", "0") == "1"


def reference_available() -> bool:
    return os.path.isdir(REFERENCE)
