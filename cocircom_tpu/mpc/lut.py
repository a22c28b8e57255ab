"""Secret-shared lookup tables (REP3) — the memory backend for co-noir.

Parity: /root/reference/mpc-core/src/protocols/rep3/lut.rs
(LookupTableProvider: init_set/contains_set :16-38, init_map :40-46,
get_from_lut :48-76, write_to_lut :78-95, or_tree :98-142).

TPU-first redesign: the reference scans the table with ONE equality +
cmux per entry (each a full a2b round-trip — O(table) communication
rounds). Here the needle is broadcast against the whole key vector and
every step is batched: one a2b + AND-tree for ALL equality bits, one
bit-inject, one mul_vec for the select — a CONSTANT number of rounds
(~log bitlen + 3) regardless of table size, with all the work running
as (L, N) limb tensors on the device.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from .rep3 import Rep3Driver, Rep3FieldShare
from .rep3_binary import Rep3Binary


class SharedMap(NamedTuple):
    """Batched key/value share vectors ((L, N) components)."""

    keys: Rep3FieldShare | jnp.ndarray  # shares, or a public (L, N) array
    values: Rep3FieldShare
    public_keys: bool


class Rep3Lut:
    def __init__(self, driver: Rep3Driver):
        self.d = driver
        self.bin = Rep3Binary(driver)

    # ------------------------------------------------------------- sets

    def init_set(self, values: Rep3FieldShare) -> Rep3FieldShare:
        return values

    def contains_set(self, needle: Rep3FieldShare, s: Rep3FieldShare):
        """[1 if needle in set else 0] arithmetic share (lut.rs:24-38).
        OR-tree computed as NOT(AND_i NOT(eq_i)) on the batched bits."""
        bits = self._eq_bits_binary(needle, s, public_keys=False)
        f = self.d.fr
        batch = bits.a.shape[1:]
        onec = f._bcast_const(f._int_to_limbs_np(1), batch)
        nots = self.bin.xor_public(bits, onec)  # complement each bit
        acc = nots
        n = acc.a.shape[-1]
        while n > 1:
            half = n // 2
            lo = type(acc)(acc.a[..., :half], acc.b[..., :half])
            hi = type(acc)(acc.a[..., half : 2 * half], acc.b[..., half : 2 * half])
            red = self.bin.and_(lo, hi)
            if n % 2:
                tail = type(acc)(acc.a[..., -1:], acc.b[..., -1:])
                red = type(acc)(
                    jnp.concatenate([red.a, tail.a], -1),
                    jnp.concatenate([red.b, tail.b], -1),
                )
            acc = red
            n = acc.a.shape[-1]
        onec1 = f._bcast_const(f._int_to_limbs_np(1), acc.a.shape[1:])
        result_bit = self.bin.xor_public(acc, onec1)
        # scrub the AND-round mask bits above bit 0 from the components
        # (value-neutral; bit_inject lifts raw component values)
        result_bit = self.bin.and_public(result_bit, onec1)
        return self.d.index_share(self.bin.bit_inject(result_bit), 0)

    # ------------------------------------------------------------- maps

    def init_map_public_keys(self, values: Rep3FieldShare) -> SharedMap:
        """Map with keys = 0..N-1 in clear (the ACVM memory-block case —
        co-acvm memory_solver.rs indexes by position)."""
        import numpy as np

        f = self.d.fr
        n = values.a.shape[-1]
        keys = f.to_mont(jnp.asarray(f.to_limbs(np.arange(n))))
        return SharedMap(keys, values, True)

    def init_map(self, keys: Rep3FieldShare, values: Rep3FieldShare) -> SharedMap:
        return SharedMap(keys, values, False)

    def _eq_bits_binary(self, needle, keys, public_keys: bool):
        """1-bit binary shares of (needle == key_i) for the whole vector."""
        d = self.d
        n = (keys.shape if public_keys else keys.a.shape)[-1]
        nb = d.broadcast_share(needle, n)
        if public_keys:
            # share - public via the party-dependent convention
            # (rep3.rs add_with_public; only one additive component shifts)
            diff = d.add_public(nb, d.fr.neg(keys))
        else:
            diff = d.sub(nb, keys)
        return self.bin.is_zero(self.bin.a2b(diff))

    def eq_bits(self, needle, keys, public_keys: bool) -> Rep3FieldShare:
        """Arithmetic 0/1 share vector of needle==key_i."""
        return self.bin.bit_inject(
            self._eq_bits_binary(needle, keys, public_keys))

    def read(self, needle: Rep3FieldShare, m: SharedMap) -> Rep3FieldShare:
        """sum_i [needle==key_i]*value_i — 0 if the needle is absent
        (reference blinds misses with zero-shares; the arithmetic sum form
        needs no blinding: the eq bits are themselves shares)."""
        b = self.eq_bits(needle, m.keys, m.public_keys)
        return self.d.sum_vec(self.d.mul_vec(b, m.values))

    def write(self, needle: Rep3FieldShare, value: Rep3FieldShare,
              m: SharedMap) -> SharedMap:
        """value_i' = value_i + [needle==key_i]*(value - value_i)."""
        d = self.d
        b = self.eq_bits(needle, m.keys, m.public_keys)
        n = m.values.a.shape[-1]
        delta = d.sub(d.broadcast_share(value, n), m.values)
        new_vals = d.add(m.values, d.mul_vec(b, delta))
        return SharedMap(m.keys, new_vals, m.public_keys)
