"""Property tests: JAX limb field kernels vs host python-int ground truth."""

import random

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cocircom_tpu.fields.params import BN254, BLS12_381
from cocircom_tpu.ops.field import get_field

FIELDS = [
    get_field(BN254.fr.p, "bn254.fr"),
    get_field(BN254.fq.p, "bn254.fq"),
    get_field(BLS12_381.fr.p, "bls.fr"),
    get_field(BLS12_381.fq.p, "bls.fq"),
]

N = 17  # deliberately non-aligned batch size


def rand_ints(f, n, rng):
    vals = [rng.randrange(f.p) for _ in range(n - 3)] + [0, 1, f.p - 1]
    return vals[:n]


@pytest.mark.parametrize("f", FIELDS, ids=lambda f: f.name)
def test_roundtrip(f):
    rng = random.Random(1)
    vals = rand_ints(f, N, rng)
    limbs = f.to_limbs(vals)
    back = f.from_limbs(limbs)
    assert [int(x) for x in back] == vals


@pytest.mark.parametrize("f", FIELDS, ids=lambda f: f.name)
def test_mont_roundtrip(f):
    rng = random.Random(2)
    vals = rand_ints(f, N, rng)
    m = f.encode(vals)
    assert [int(x) for x in f.decode(m)] == vals


@pytest.mark.parametrize("f", FIELDS, ids=lambda f: f.name)
def test_add_sub_neg(f):
    rng = random.Random(3)
    a = rand_ints(f, N, rng)
    b = list(reversed(rand_ints(f, N, rng)))
    am, bm = f.encode(a), f.encode(b)
    assert list(f.decode(f.add(am, bm))) == [(x + y) % f.p for x, y in zip(a, b)]
    assert list(f.decode(f.sub(am, bm))) == [(x - y) % f.p for x, y in zip(a, b)]
    assert list(f.decode(f.neg(am))) == [(-x) % f.p for x in a]


@pytest.mark.parametrize("f", FIELDS, ids=lambda f: f.name)
def test_mul(f):
    rng = random.Random(4)
    a = rand_ints(f, N, rng)
    b = list(reversed(rand_ints(f, N, rng)))
    am, bm = f.encode(a), f.encode(b)
    assert list(f.decode(f.mont_mul(am, bm))) == [(x * y) % f.p for x, y in zip(a, b)]


@pytest.mark.parametrize("f", FIELDS, ids=lambda f: f.name)
def test_pow_inv(f):
    rng = random.Random(5)
    a = [rng.randrange(1, f.p) for _ in range(5)]
    am = f.encode(a)
    e = 0xDEADBEEF12345
    assert list(f.decode(f.pow_static(am, e))) == [pow(x, e, f.p) for x in a]
    assert list(f.decode(f.inv(am))) == [pow(x, -1, f.p) for x in a]


@pytest.mark.parametrize("f", FIELDS[:2], ids=lambda f: f.name)
def test_batch_inv(f):
    rng = random.Random(6)
    a = [rng.randrange(1, f.p) for _ in range(N - 1)] + [0]
    am = f.encode(a)
    got = list(f.decode(f.batch_inv(am)))
    want = [pow(x, -1, f.p) if x else 0 for x in a]
    assert got == want


@pytest.mark.parametrize("f", FIELDS[:2], ids=lambda f: f.name)
def test_sum(f):
    rng = random.Random(7)
    a = rand_ints(f, 1000, rng) + rand_ints(f, 1000, rng) * 3  # length 4000 > 64^1
    a = a[:3000]
    am = f.encode(a)
    got = int(f.decode(f.sum(am, axis=1)))
    assert got == sum(a) % f.p


@pytest.mark.parametrize("f", FIELDS[:1], ids=lambda f: f.name)
def test_rand_mont(f):
    k = jax.random.key(0)
    r = f.rand_mont(k, (8,))
    vals = list(f.decode(r))
    assert len(set(vals)) == 8
    assert all(0 <= v < f.p for v in vals)
    # canonical limb invariant
    assert np.asarray(jax.device_get(r)).max() < (1 << 16)


@pytest.mark.parametrize("f", FIELDS[:2], ids=lambda f: f.name)
def test_bytes_roundtrip(f):
    rng = random.Random(8)
    vals = rand_ints(f, N, rng)
    data = b"".join(int(v).to_bytes(2 * f.L, "little") for v in vals)
    limbs = f.bytes_to_limbs(data, N)
    assert [int(x) for x in f.from_limbs(limbs)] == vals
    assert f.limbs_to_bytes(limbs) == data


def test_is_zero_eq_select():
    f = FIELDS[0]
    a = f.encode([0, 1, 5])
    b = f.encode([0, 2, 5])
    assert list(jax.device_get(f.is_zero(a))) == [True, False, False]
    assert list(jax.device_get(f.eq(a, b))) == [True, False, True]
    m = jnp.asarray([True, False, True])
    assert list(f.decode(f.select(m, a, b))) == [0, 2, 5]
