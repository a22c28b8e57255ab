"""REP3 protocol ops: share/reconstruct, mul, open, inv, EC — 3 threads."""

import random

import jax
import jax.numpy as jnp

from cocircom_tpu.fields.ec_host import ec_add, ec_mul
from cocircom_tpu.fields.params import BN254
from cocircom_tpu.mpc.rep3 import (
    Rep3Driver,
    combine_field_shares,
    share_field_vec,
)
from cocircom_tpu.mpc.runner import run_parties
from cocircom_tpu.ops.field import get_field
from cocircom_tpu.pairing.tower import Tower

CURVE = BN254
FR = get_field(CURVE.fr.p, "bn254.fr")


def test_share_combine_roundtrip():
    rng = random.Random(31)
    vals = [rng.randrange(FR.p) for _ in range(5)]
    shares = share_field_vec(FR, FR.encode(vals), seed=1)
    back = combine_field_shares(FR, shares)
    assert list(FR.decode(back)) == vals


def test_rep3_mul_open():
    rng = random.Random(32)
    n = 9
    x = [rng.randrange(FR.p) for _ in range(n)]
    y = [rng.randrange(FR.p) for _ in range(n)]
    xs = share_field_vec(FR, FR.encode(x), seed=2)
    ys = share_field_vec(FR, FR.encode(y), seed=3)

    def party(i, net):
        d = Rep3Driver(CURVE, net)
        z = d.mul_vec(xs[i], ys[i])
        opened = d.open_many(z)
        s = d.add(xs[i], ys[i])
        opened_sum = d.open_many(s)
        inv = d.inv_many(xs[i])
        opened_inv = d.open_many(inv)
        return (
            list(FR.decode(opened)),
            list(FR.decode(opened_sum)),
            list(FR.decode(opened_inv)),
        )

    results = run_parties(party)
    want_mul = [a * b % FR.p for a, b in zip(x, y)]
    want_sum = [(a + b) % FR.p for a, b in zip(x, y)]
    want_inv = [pow(a, -1, FR.p) for a in x]
    for res in results:
        assert res[0] == want_mul
        assert res[1] == want_sum
        assert res[2] == want_inv


def test_rep3_rand_is_consistent_share():
    def party(i, net):
        d = Rep3Driver(CURVE, net)
        r = d.rand((4,))
        opened = d.open_many(r)
        return list(FR.decode(opened))

    results = run_parties(party)
    assert results[0] == results[1] == results[2]
    assert len(set(results[0])) == 4  # nonzero entropy


def test_rep3_promote_add_public():
    rng = random.Random(33)
    x = [rng.randrange(FR.p) for _ in range(4)]
    pub = [rng.randrange(FR.p) for _ in range(4)]
    xs = share_field_vec(FR, FR.encode(x), seed=4)

    def party(i, net):
        d = Rep3Driver(CURVE, net)
        p = d.encode_publics(pub)
        t = d.promote_public(p)
        z = d.add(xs[i], t)
        z = d.add_public(z, p)
        return list(FR.decode(d.open_many(z)))

    results = run_parties(party)
    want = [(a + 2 * b) % FR.p for a, b in zip(x, pub)]
    assert results[0] == want


def test_rep3_ec_ops():
    rng = random.Random(34)
    t = Tower(CURVE)
    g = (t.fp(CURVE.g1_gen[0]), t.fp(CURVE.g1_gen[1]))
    s = rng.randrange(FR.p)
    k = rng.randrange(FR.p)
    ss = share_field_vec(FR, FR.encode([s]), seed=5)
    ks = share_field_vec(FR, FR.encode([k]), seed=6)

    def party(i, net):
        d = Rep3Driver(CURVE, net)
        gen = d.host_g1((CURVE.g1_gen[0], CURVE.g1_gen[1]))
        gen1 = jax.tree.map(lambda c: c[..., 0], gen)
        sh = d.scalar_mul_public_point(
            d.g1, gen1, jax.tree.map(lambda c: c[..., 0], ss[i])
        )
        # open s*G
        p1 = d.open_point(d.g1, sh)
        # shared point * shared scalar -> (s*k)*G
        sh2 = d.scalar_mul(d.g1, sh, jax.tree.map(lambda c: c[..., 0], ks[i]))
        p2 = d.open_point(d.g1, sh2)
        exp = jax.tree.map(lambda c: jnp.expand_dims(c, 1), p1)
        exp2 = jax.tree.map(lambda c: jnp.expand_dims(c, 1), p2)
        return d.g1.decode_points(exp)[0], d.g1.decode_points(exp2)[0]

    results = run_parties(party)
    wantP = ec_mul(g, s)
    wantP2 = ec_mul(g, s * k % FR.p)
    for p1, p2 in results:
        assert p1 == (wantP[0].v, wantP[1].v)
        assert p2 == (wantP2[0].v, wantP2[1].v)
