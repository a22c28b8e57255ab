"""REP3 ACVM witness extension: 3 in-process parties solve noir circuits
over secret-shared witnesses; reconstruction must match the committed
Barretenberg witness stacks byte-exactly.

Parity: /root/reference/tests/tests/noir/witness_extension_tests/rep3.rs
(add_rep3_acvm_test) + co-acvm Rep3CoSolver. Memory circuits exercise the
REP3 LUT provider (mpc/lut.py; reference rep3/lut.rs).
"""

import glob
import os

import numpy as np
import pytest

from cocircom_tpu.fields.params import BN254
from cocircom_tpu.mpc.rep3 import Rep3Driver, share_field_vec
from cocircom_tpu.mpc.runner import run_parties
from cocircom_tpu.noir.acir import load_program_json, parse_witness_stack
from cocircom_tpu.noir.rep3_driver import Rep3NoirDriver
from cocircom_tpu.noir.solver import AcvmSolver, Shared, is_shared

TV = "/root/reference/test_vectors/noir"
pytestmark = pytest.mark.skipif(not os.path.isdir(TV), reason="no vectors")

P = BN254.fr.p

# small circuits only: the in-process 3-party mesh runs per-opcode scalar
# rounds; poseidon-size circuits are covered by the plain-path KAT test
CIRCUITS = ["addition_multiplication", "random_access", "slice",
            "write_access"]


@pytest.mark.parametrize("name", CIRCUITS)
def test_rep3_acvm_matches_kat(name):
    js = glob.glob(os.path.join(TV, name, "kat", "*.json"))[0]
    gz = glob.glob(os.path.join(TV, name, "kat", "*.gz"))[0]
    circuits, _abi = load_program_json(js)
    c = circuits[0]
    want = parse_witness_stack(open(gz, "rb").read())[0][1]

    params = sorted(set(c.private_parameters) | set(c.public_parameters))
    f = None

    # deal input shares once (host side), one share list per party
    from cocircom_tpu.ops.field import get_field

    f = get_field(P, BN254.name + ".fr")
    import jax.numpy as jnp

    inputs = [want[w] for w in params]
    vec = f.to_mont(jnp.asarray(f.to_limbs(inputs)))
    shares3 = share_field_vec(f, vec)

    def party(pid, net):
        d = Rep3NoirDriver(Rep3Driver(BN254, net))
        solver = AcvmSolver(d, c)
        my = shares3[pid]
        for k, w in enumerate(params):
            solver.witness[w] = Shared(d.d.index_share(my, k))
        out = solver.solve()
        # open every still-shared witness for the comparison
        keys = sorted(out)
        sh = [k for k in keys if is_shared(out[k])]
        opened = d.open_many([out[k].v for k in sh]) if sh else []
        full = {}
        it = iter(opened)
        for k in keys:
            full[k] = next(it) if is_shared(out[k]) else out[k] % P
        return full

    results = run_parties(party, 3)
    assert results[0] == results[1] == results[2]
    assert results[0] == want, (
        f"{name}: {len(results[0])} vs {len(want)} entries")


def test_lut_contains_set():
    """Secret set-membership (lut.rs contains_set parity): OR-tree over
    batched equality bits, arithmetic 0/1 result."""
    import jax.numpy as jnp

    from cocircom_tpu.mpc.lut import Rep3Lut
    from cocircom_tpu.ops.field import get_field

    f = get_field(P, BN254.name + ".fr")
    values = [5, 9, 13, 21, 30]
    vec = f.to_mont(jnp.asarray(f.to_limbs(values)))
    shares3 = share_field_vec(f, vec, seed=77)
    hit = f.to_mont(jnp.asarray(f.to_limbs([13])))
    miss = f.to_mont(jnp.asarray(f.to_limbs([14])))
    hit3 = share_field_vec(f, hit, seed=78)
    miss3 = share_field_vec(f, miss, seed=79)

    def party(pid, net):
        d = Rep3Driver(BN254, net)
        lut = Rep3Lut(d)
        s = lut.init_set(shares3[pid])
        out = []
        for needle in (hit3[pid], miss3[pid]):
            nd = d.index_share(needle, 0)
            r = lut.contains_set(nd, s)
            out.append(r)
        opened = d.open_many(d.stack_shares(out))
        return [int(v) for v in
                np.atleast_1d(f.from_limbs(f.from_mont(opened)))]

    results = run_parties(party, 3)
    assert results[0] == results[1] == results[2] == [1, 0]
