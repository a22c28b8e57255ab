"""SharedWitness / SharedInput construction and merging.

Parity: /root/reference/co-circom/co-circom-snarks/src/lib.rs (SharedWitness
:24, SharedInput :45, merge :119, share_rep3 :151, share_shamir :177).
"""

from __future__ import annotations

import numpy as np

from ..fields.params import CurveParams
from ..io.witness import Witness
from ..ops.field import get_field
from .groth16 import SharedWitness


def witness_layout(w: Witness, n_public: int):
    """(public ints incl leading 1, aux standard limbs (L, N_aux))."""
    num_inputs = n_public + 1
    vals = w.values_ints()
    publics = vals[:num_inputs]
    aux_std = w.values_std[:, num_inputs:]
    return publics, aux_std


def split_witness_plain(w: Witness, n_public: int) -> SharedWitness:
    fr = get_field(w.curve.fr.p, w.curve.name + ".fr")
    publics, aux_std = witness_layout(w, n_public)
    import jax.numpy as jnp

    aux_mont = fr.to_mont(jnp.asarray(aux_std))
    return SharedWitness(publics, aux_mont)


def split_witness_rep3(w: Witness, n_public: int, seed: int | None = None):
    """Dealer-side split into 3 SharedWitness (one per party).

    Parity: co-circom-snarks share_rep3 + the `split-witness` subcommand
    (bin/co-circom.rs:82-97)."""
    from ..mpc.rep3 import share_field_vec

    fr = get_field(w.curve.fr.p, w.curve.name + ".fr")
    publics, aux_std = witness_layout(w, n_public)
    import jax.numpy as jnp

    aux_mont = fr.to_mont(jnp.asarray(aux_std))
    shares = share_field_vec(fr, aux_mont, seed=seed)
    return [SharedWitness(publics, s) for s in shares]


def split_witness_shamir(w: Witness, n_public: int, threshold: int, n_parties: int,
                         seed: int | None = None):
    from ..mpc.shamir import share_field_vec_shamir

    fr = get_field(w.curve.fr.p, w.curve.name + ".fr")
    publics, aux_std = witness_layout(w, n_public)
    import jax.numpy as jnp

    aux_mont = fr.to_mont(jnp.asarray(aux_std))
    shares = share_field_vec_shamir(fr, aux_mont, threshold, n_parties, seed=seed)
    return [SharedWitness(publics, s) for s in shares]
