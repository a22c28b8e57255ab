"""1/2/4/8-device scaling table on the virtual CPU mesh.

Wall-clock on virtual CPU devices is NOT a perf claim (they timeshare one
host) — this records that the sharded programs compile, execute, and stay
bit-exact at every mesh size, and shows the collective structure (see
MULTICHIP_r*.json for the driver's own dryrun). Run:
  XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu \
      python scripts/mesh_scaling.py
"""
import json
import os
import sys
import time

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ.pop("PALLAS_AXON_POOL_IPS", None)

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from cocircom_tpu.fields.params import BN254
from cocircom_tpu.ops.field import get_field
from cocircom_tpu.ops.ntt import ntt_engine
from cocircom_tpu.parallel.sharded import sharded_ntt


def main():
    f = get_field(BN254.fr.p, BN254.name + ".fr")
    eng = ntt_engine(f, BN254.fr)
    logn = 14
    n = 1 << logn
    rng = np.random.default_rng(3)
    a = f.to_mont(jnp.asarray(
        rng.integers(0, 1 << 16, size=(f.L, n), dtype=np.uint32) & 0x0FFF))
    want = np.asarray(jax.device_get(eng.ntt(a)))

    rows = []
    for nd in (1, 2, 4, 8):
        mesh = Mesh(np.array(jax.devices()[:nd]), ("data",))
        dist = sharded_ntt(f, BN254.fr, mesh)
        got = dist(a)
        jax.block_until_ready(got)
        t0 = time.time()
        for _ in range(3):
            got = dist(a)
        jax.block_until_ready(got)
        dt = (time.time() - t0) / 3
        ok = bool((np.asarray(jax.device_get(got)) == want).all())
        rows.append({"devices": nd, "ntt_n": n, "wall_ms": round(dt * 1e3, 1),
                     "bit_exact": ok})
        print(json.dumps(rows[-1]), flush=True)
    assert all(r["bit_exact"] for r in rows)


if __name__ == "__main__":
    main()
