"""Shamir protocol ops: share/reconstruct, mul (degree reduce), open, EC."""

import random

import jax
import jax.numpy as jnp

from cocircom_tpu.fields.ec_host import ec_mul
from cocircom_tpu.fields.params import BN254
from cocircom_tpu.mpc.runner import run_parties
from cocircom_tpu.mpc.shamir import (
    ShamirDriver,
    combine_field_shares_shamir,
    share_field_vec_shamir,
)
from cocircom_tpu.ops.field import get_field
from cocircom_tpu.pairing.tower import Tower

CURVE = BN254
FR = get_field(CURVE.fr.p, "bn254.fr")


def test_share_combine_roundtrip():
    rng = random.Random(41)
    vals = [rng.randrange(FR.p) for _ in range(5)]
    shares = share_field_vec_shamir(FR, FR.encode(vals), threshold=1, n_parties=3, seed=1)
    back = combine_field_shares_shamir(FR, shares, threshold=1)
    assert list(FR.decode(back)) == vals


def test_shamir_mul_open_inv():
    rng = random.Random(42)
    n = 7
    x = [rng.randrange(FR.p) for _ in range(n)]
    y = [rng.randrange(FR.p) for _ in range(n)]
    xs = share_field_vec_shamir(FR, FR.encode(x), 1, 3, seed=2)
    ys = share_field_vec_shamir(FR, FR.encode(y), 1, 3, seed=3)

    def party(i, net):
        d = ShamirDriver(CURVE, net, threshold=1)
        z = d.mul_vec(xs[i], ys[i])
        opened = d.open_many(z)
        s_open = d.open_many(d.add(xs[i], ys[i]))
        inv_open = d.open_many(d.inv_many(xs[i]))
        r = d.rand((3,))
        r_open = d.open_many(r)
        return (
            list(FR.decode(opened)),
            list(FR.decode(s_open)),
            list(FR.decode(inv_open)),
            list(FR.decode(r_open)),
        )

    results = run_parties(party)
    want_mul = [a * b % FR.p for a, b in zip(x, y)]
    want_sum = [(a + b) % FR.p for a, b in zip(x, y)]
    want_inv = [pow(a, -1, FR.p) for a in x]
    for res in results:
        assert res[0] == want_mul
        assert res[1] == want_sum
        assert res[2] == want_inv
    assert results[0][3] == results[1][3] == results[2][3]


def test_shamir_ec_open():
    rng = random.Random(43)
    t = Tower(CURVE)
    g = (t.fp(CURVE.g1_gen[0]), t.fp(CURVE.g1_gen[1]))
    s = rng.randrange(FR.p)
    ss = share_field_vec_shamir(FR, FR.encode([s]), 1, 3, seed=5)

    def party(i, net):
        d = ShamirDriver(CURVE, net, threshold=1)
        gen = d.host_g1((CURVE.g1_gen[0], CURVE.g1_gen[1]))
        gen1 = jax.tree.map(lambda c: c[..., 0], gen)
        sh = d.scalar_mul_public_point(d.g1, gen1, ss[i][:, 0])
        p1 = d.open_point(d.g1, sh)
        exp = jax.tree.map(lambda c: jnp.expand_dims(c, 1), p1)
        return d.g1.decode_points(exp)[0]

    results = run_parties(party)
    want = ec_mul(g, s)
    for p1 in results:
        assert p1 == (want[0].v, want[1].v)
