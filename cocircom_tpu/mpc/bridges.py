"""Protocol bridges: REP3 -> Shamir share translation.

Parity: /root/reference/mpc-core/src/protocols/bridges/rep3_to_shamir.rs —
the reference degree-reduces the replicated sharing into a t=1 Shamir
sharing reusing the same network. Here each party deals a fresh degree-t
Shamir sharing of its additive component x_i (x = x0+x1+x2) and parties sum
the received sub-shares: one communication round, semi-honest.
"""

from __future__ import annotations


import jax
import jax.numpy as jnp

from ..fields.params import CurveParams
from ..ops.field import get_field
from .net import Network
from .rep3 import Rep3FieldShare
from .shamir import _eval_poly_shares


def translate_rep3_to_shamir(
    curve: CurveParams, net: Network, share: Rep3FieldShare, threshold: int = 1
):
    """Each party Shamir-deals its additive component `a`; result is the sum
    of all parties' deals — a degree-t sharing of the replicated secret."""
    fr = get_field(curve.fr.p, curve.name + ".fr")
    n = net.n_parties
    from ..utils.chacha import ChaChaStream, fresh_seed

    stream = ChaChaStream(fresh_seed(), domain=5)
    batch = share.a.shape[1:]
    coeffs = [stream.rand_mont(fr, batch) for _ in range(threshold)]
    deals = _eval_poly_shares(fr, share.a, coeffs, list(range(1, n + 1)))
    for p in range(n):
        if p != net.id:
            net.send(p, deals[p])
    acc = deals[net.id]
    for p in range(n):
        if p != net.id:
            acc = fr.add(acc, jnp.asarray(net.recv(p)))
    return acc
