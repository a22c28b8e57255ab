"""REP3 binary domain: a2b roundtrip, comparisons, bit injection."""

import random

import jax.numpy as jnp
import numpy as np

from cocircom_tpu.fields.params import BN254
from cocircom_tpu.mpc.rep3 import Rep3Driver, share_field_vec
from cocircom_tpu.mpc.rep3_binary import shl_bits, shr_bits
from cocircom_tpu.mpc.runner import run_parties
from cocircom_tpu.ops.field import get_field

FR = get_field(BN254.fr.p, "bn254.fr")


def test_bit_shifts_on_limbs():
    rng = random.Random(61)
    vals = [rng.randrange(1 << 254) for _ in range(4)]
    x = jnp.asarray(FR.to_limbs(vals))
    for s in (1, 5, 16, 23, 128):
        lsh = [int(v) for v in FR.from_limbs(shl_bits(x, s))]
        rsh = [int(v) for v in FR.from_limbs(shr_bits(x, s))]
        assert lsh == [(v << s) % (1 << 256) for v in vals]
        assert rsh == [v >> s for v in vals]


def test_a2b_roundtrip_and_compare():
    rng = random.Random(62)
    n = 5
    x = [rng.randrange(FR.p) for _ in range(n - 2)] + [0, FR.p - 1]
    y = [rng.randrange(FR.p) for _ in range(n)]
    xs = share_field_vec(FR, FR.encode(x), seed=71)
    ys = share_field_vec(FR, FR.encode(y), seed=72)

    def party(i, net):
        d = Rep3Driver(BN254, net)
        bx = d.binary.a2b(xs[i])
        opened_bits = d.binary.open(bx)
        bits = [int(v) for v in FR.from_limbs(opened_bits)]
        ge = d.binary.unsigned_ge(xs[i], ys[i])
        ge_arith = d.binary.bit_inject(ge)
        ge_open = [int(v) for v in FR.from_limbs(FR.from_mont(d.open_many(ge_arith)))]
        return bits, ge_open

    results = run_parties(party)
    want_ge = [int(a >= b) for a, b in zip(x, y)]
    for bits, ge in results:
        assert bits == x
        assert ge == want_ge


def test_a2b_roundtrip_host_codec():
    """Same a2b round-trip over the HOST-serialization network path
    (device=False): keeps encode/decode regression coverage on a protocol
    test rather than only the TCP smoke test (advisor r4)."""
    rng = random.Random(63)
    x = [rng.randrange(FR.p) for _ in range(3)]
    xs = share_field_vec(FR, FR.encode(x), seed=73)

    def party(i, net):
        d = Rep3Driver(BN254, net)
        bx = d.binary.a2b(xs[i])
        return [int(v) for v in FR.from_limbs(d.binary.open(bx))]

    for bits in run_parties(party, device=False):
        assert bits == x


def test_rep3_vm_comparisons():
    """Secret comparisons in the witness VM (signed circom semantics)."""
    from cocircom_tpu.mpc.driver import PlainDriver
    from cocircom_tpu.vm.compiler import compile_circom
    from cocircom_tpu.vm.mpc_vm import WitnessExtension

    src = """
    pragma circom 2.0.0;
    template Cmp() {
        signal input a;
        signal input b;
        signal output lt; signal output ge; signal output eq; signal output gt;
        lt <-- a < b;
        ge <-- a >= b;
        eq <-- a == b;
        gt <-- a > b;
    }
    component main = Cmp();
    """
    circuit = compile_circom(src, BN254)
    cases = [(3, 5), (5, 3), (7, 7), (FR.p - 1, 1)]  # p-1 is -1 (signed!)
    for a, b in cases:
        host = WitnessExtension(PlainDriver(BN254), circuit).run_host(
            {"a": a, "b": b}
        )
        shares = share_field_vec(FR, FR.encode([a, b]), seed=(a * 7 + b) % (1 << 31))

        def party(i, net):
            d = Rep3Driver(BN254, net)
            vm = WitnessExtension(d, circuit)
            w = vm.run_shared(shares[i], vm.all_input_slots())
            opened = d.open_many(w)
            return [int(v) for v in FR.from_limbs(FR.from_mont(opened))]

        results = run_parties(party)
        assert results[0] == host, (a, b)
