"""Four-step Pallas NTT (ops/pallas_ntt.py) vs the per-stage engine.

Runs the Pallas kernels in interpret mode on the CPU backend with a small
kmax so the recursion is exercised at test-sized transforms; asserts
bit-exact equality with the radix-2 engine (same snarkjs root tower),
forward and inverse."""

import jax.numpy as jnp
import numpy as np
import pytest

from cocircom_tpu.fields.params import BN254
from cocircom_tpu.ops.field import get_field
from cocircom_tpu.ops.ntt import ntt_engine
from cocircom_tpu.ops.pallas_ntt import build_aux, fourstep_ntt

fr = get_field(BN254.fr.p, BN254.name + ".fr")
eng = ntt_engine(fr, BN254.fr)


def _rand(n, seed):
    rng = np.random.default_rng(seed)
    vals = [int(rng.integers(0, 1 << 62)) * 7919 % BN254.fr.p for _ in range(n)]
    return fr.encode(vals)


@pytest.mark.parametrize("logn,kmax", [(4, 4), (7, 4), (9, 4)])
@pytest.mark.parametrize("inverse", [False, True])
def test_fourstep_matches_engine(logn, kmax, inverse):
    # logn=7/kmax=4: one recursion level; logn=9: two levels (9=4+5, 5=4+1)
    n = 1 << logn
    a = _rand(n, logn * 2 + inverse)
    aux = build_aux(fr, BN254.fr, logn, inverse, kmax=kmax)
    got = fourstep_ntt(
        fr, a[:, :, None], logn, aux, interpret=True, kmax=kmax
    ).reshape(fr.L, n)
    eng._warm(logn, inverse)
    want = eng._ntt_jit(a, logn, inverse)
    assert jnp.array_equal(got, want)
