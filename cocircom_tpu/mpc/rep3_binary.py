"""REP3 binary domain: XOR-shares, AND rounds, Kogge-Stone arithmetic.

Parity: /root/reference/mpc-core/src/protocols/rep3/a2b.rs — the machinery
behind secret comparisons/shifts/bit-ops:
  * Rep3BinaryShare: XOR-sharing x = x0 ^ x1 ^ x2 packed as (L, N) 16-bit
    limb tensors (bit-sliced-friendly, fully vectorized over the batch)
  * and/and_twice: 1-round masked AND (both ANDs of a Kogge-Stone level
    ride ONE message)
  * kogge_stone_inner: log-depth carry propagation (a2b.rs:286)
  * a2b: arithmetic -> binary via one masked reshare + binary add mod p
    (a2b.rs:367)
  * unsigned_ge / cmux / bit_inject: comparison outputs back to arithmetic
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.field import U32, Field

MASK16 = np.uint32(0xFFFF)


class Rep3BinaryShare(NamedTuple):
    a: jnp.ndarray  # (L, *batch) uint32, 16-bit limbs
    b: jnp.ndarray


def _mask_np(f: Field, nbits: int) -> np.ndarray:
    """limb array of ((1 << nbits) - 1)."""
    return f._int_to_limbs_np((1 << nbits) - 1)


def shl_bits(x, s: int):
    """left shift packed 16-bit limbs by s bits (drop overflow)."""
    if s == 0:
        return x
    w, b = divmod(s, 16)
    L = x.shape[0]
    idx = np.arange(L)
    keep = jnp.asarray((idx >= w).astype(np.uint32).reshape((L,) + (1,) * (x.ndim - 1)))
    xr = jnp.roll(x, w, axis=0) * keep
    if b == 0:
        return xr
    lo = (xr << b) & MASK16
    carry = xr >> (16 - b)
    carry = jnp.roll(carry, 1, axis=0) * keep_first_zero(L, x.ndim)
    return lo | carry


def shr_bits(x, s: int):
    """logical right shift by s bits."""
    if s == 0:
        return x
    w, b = divmod(s, 16)
    L = x.shape[0]
    idx = np.arange(L)
    keep = jnp.asarray((idx < L - w).astype(np.uint32).reshape((L,) + (1,) * (x.ndim - 1)))
    xr = jnp.roll(x, -w, axis=0) * keep
    if b == 0:
        return xr
    hi = xr >> b
    carry = (xr & ((1 << b) - 1)) << (16 - b)
    carry = jnp.roll(carry, -1, axis=0) * jnp.asarray(
        (idx < L - 1).astype(np.uint32).reshape((L,) + (1,) * (x.ndim - 1))
    )
    return hi | carry


def keep_first_zero(L, ndim):
    idx = np.arange(L)
    return jnp.asarray((idx >= 1).astype(np.uint32).reshape((L,) + (1,) * (ndim - 1)))


# --------------------------------------------------------- fused kernels
# One jitted program per protocol step between communication points: on
# XLA:CPU every eager op costs ~1-3 ms of dispatch under the 3 party
# threads, so the eager chains (not the math, not ChaCha) dominated a2b
# (~1.3 s/call) and with it the whole REP3 corpus sweep.


import functools


@functools.lru_cache(maxsize=None)
def _and_local_call(batch: tuple):
    @jax.jit
    def go(xa, xb, ya, yb, mask):
        return (xa & ya) ^ (xa & yb) ^ (xb & ya) ^ mask

    return go


@functools.lru_cache(maxsize=None)
def _ks_pre_call(f, bit_len: int, shift: int, batch: tuple):
    """(p, g, masks) -> the two AND-round locals of one Kogge-Stone level
    (l1 = g_mask & p_shift, l2 = p_shift & p_mask)."""
    maskc = jnp.asarray(_mask_np(f, bit_len - shift)).reshape(
        (f.L,) + (1,) * len(batch)
    )

    @jax.jit
    def go(pa, pb, ga, gb, m1, m2):
        pma, pmb = pa & maskc, pb & maskc
        gma, gmb = ga & maskc, gb & maskc
        psa, psb = shr_bits(pa, shift), shr_bits(pb, shift)
        l1 = (gma & psa) ^ (gma & psb) ^ (gmb & psa) ^ m1
        l2 = (psa & pma) ^ (psa & pmb) ^ (psb & pma) ^ m2
        return l1, l2

    return go


@functools.lru_cache(maxsize=None)
def _ks_post_call(shift: int, batch: tuple):
    """(locals, peer halves, g) -> next level's (p, g)."""

    @jax.jit
    def go(l1, l2, r1b, r2b, ga, gb):
        return (
            shl_bits(l2, shift),
            shl_bits(r2b, shift),
            ga ^ shl_bits(l1, shift),
            gb ^ shl_bits(r1b, shift),
        )

    return go


@functools.lru_cache(maxsize=None)
def _ks_fin_call(batch: tuple):
    @jax.jit
    def go(ga, gb, sa, sb):
        return shl_bits(ga, 1) ^ sa, shl_bits(gb, 1) ^ sb

    return go


class Rep3Binary:
    """Binary-domain protocol ops bound to a Rep3Driver."""

    def __init__(self, driver):
        self.d = driver
        self.f: Field = driver.fr
        self.bitlen = driver.curve.fr.p.bit_length()

    # ------------------------------------------------------------ helpers

    def _maskc(self, nbits: int, batch):
        return self.f._bcast_const(_mask_np(self.f, nbits), batch)

    def _rand_mask(self, batch):
        """r_self ^ r_prev over bitlen bits (zero-sum XOR mask; ChaCha12)."""
        return self.d.rngs.binary_mask(self.f, self.bitlen, batch)

    def _rand_mask2(self, batch):
        """two masks from one fused draw (one program, one counter step)."""
        return self.d.rngs.binary_masks(self.f, self.bitlen, batch, 2)

    def zeros(self, batch=()) -> Rep3BinaryShare:
        z = jnp.zeros((self.f.L,) + tuple(batch), jnp.uint32)
        return Rep3BinaryShare(z, z)

    def promote_public(self, pub_bits) -> Rep3BinaryShare:
        """Public (L, *batch) standard-form bits as an XOR share: party 0
        holds the value in `a`, party 1 sees it as prev's share in `b`
        (x = a0 ^ a1 ^ a2 with a1 = a2 = 0 — the same convention as the
        arithmetic promote_public, rep3.py:133)."""
        z = jnp.zeros_like(pub_bits)
        if self.d.id == 0:
            return Rep3BinaryShare(pub_bits, z)
        if self.d.id == 1:
            return Rep3BinaryShare(z, pub_bits)
        return Rep3BinaryShare(z, z)

    def xor(self, x: Rep3BinaryShare, y: Rep3BinaryShare):
        return Rep3BinaryShare(x.a ^ y.a, x.b ^ y.b)

    def xor_public(self, x: Rep3BinaryShare, pub):
        if self.d.id == 0:
            return Rep3BinaryShare(x.a ^ pub, x.b)
        if self.d.id == 1:
            return Rep3BinaryShare(x.a, x.b ^ pub)
        return x

    def and_public(self, x: Rep3BinaryShare, pub):
        return Rep3BinaryShare(x.a & pub, x.b & pub)

    def shl(self, x, s):
        return Rep3BinaryShare(shl_bits(x.a, s), shl_bits(x.b, s))

    def shr(self, x, s):
        return Rep3BinaryShare(shr_bits(x.a, s), shr_bits(x.b, s))

    # ------------------------------------------------------------ AND round

    def and_(self, x: Rep3BinaryShare, y: Rep3BinaryShare) -> Rep3BinaryShare:
        batch = jnp.broadcast_shapes(x.a.shape[1:], y.a.shape[1:])
        mask = self._rand_mask(batch)
        local = _and_local_call(batch)(x.a, x.b, y.a, y.b, mask)
        self.d.net.send_next(local)
        prev = jnp.asarray(self.d.net.recv_prev())
        return Rep3BinaryShare(local, prev)

    def and_twice(self, a, b1, b2):
        """(b1 & a, a & b2) in ONE round (a2b.rs:168)."""
        batch = a.a.shape[1:]
        m1, m2 = self._rand_mask2(batch)
        call = _and_local_call(batch)
        l1 = call(b1.a, b1.b, a.a, a.b, m1)
        l2 = call(a.a, a.b, b2.a, b2.b, m2)
        self.d.net.send_next((l1, l2))
        p1, p2 = self.d.net.recv_prev()
        return (
            Rep3BinaryShare(l1, jnp.asarray(p1)),
            Rep3BinaryShare(l2, jnp.asarray(p2)),
        )

    # ------------------------------------------------------------ adder

    def kogge_stone_inner(self, p, g, bit_len: int) -> Rep3BinaryShare:
        """Each level is 2 fused programs + 1 mask-pair draw + 1 message:
        the round count is protocol-fixed (a2b.rs:286), so the CPU wall
        time is all in per-round overhead — the eager op chain was ~10
        dispatches/level and dominated the shared-VM corpus sweep."""
        d = 0
        while (1 << d) < bit_len:
            d += 1
        s_ = p
        batch = p.a.shape[1:]
        for i in range(d):
            shift = 1 << i
            m1, m2 = self._rand_mask2(batch)
            l1, l2 = _ks_pre_call(self.f, bit_len, shift, batch)(
                p.a, p.b, g.a, g.b, m1, m2
            )
            self.d.net.send_next((l1, l2))
            r1b, r2b = self.d.net.recv_prev()
            pa, pb, ga, gb = _ks_post_call(shift, batch)(
                l1, l2, jnp.asarray(r1b), jnp.asarray(r2b), g.a, g.b
            )
            p = Rep3BinaryShare(pa, pb)
            g = Rep3BinaryShare(ga, gb)
        ga, gb = _ks_fin_call(batch)(g.a, g.b, s_.a, s_.b)
        return Rep3BinaryShare(ga, gb)

    def binary_add(self, x1, x2, bit_len=None) -> Rep3BinaryShare:
        bl = bit_len or self.bitlen
        p = self.xor(x1, x2)
        g = self.and_(x1, x2)
        return self.kogge_stone_inner(p, g, bl)

    def binary_sub(self, x1, x2) -> Rep3BinaryShare:
        """2^bitlen + x1 - x2 (two's complement add, cin=1) (a2b.rs:215)."""
        bl = self.bitlen
        batch = x1.a.shape[1:]
        maskc = self._maskc(bl, batch)
        x2n = self.xor_public(x2, maskc)
        p = self.xor(x1, x2n)
        g = self.and_(x1, x2n)
        onec = self.f._bcast_const(self.f._int_to_limbs_np(1), batch)
        g = self.xor(g, self.and_public(p, onec))
        res = self.kogge_stone_inner(p, g, bl)
        return self.xor_public(res, onec)

    def binary_sub_p(self, x) -> Rep3BinaryShare:
        """x + (2^(bitlen+1) - p) (a2b.rs:276)."""
        bl = self.bitlen
        batch = x.a.shape[1:]
        p_ = (1 << (bl + 1)) - self.f.p
        pc = self.f._bcast_const(self.f._int_to_limbs_np(p_), batch)
        p = self.xor_public(x, pc)
        g = self.and_public(x, pc)
        return self.kogge_stone_inner(p, g, bl + 1)

    def cmux(self, c, x_t, x_f) -> Rep3BinaryShare:
        x = self.xor(x_t, x_f)
        a = self.and_(c, x)
        return self.xor(a, x_f)

    def sub_p_cmux(self, x) -> Rep3BinaryShare:
        """reduce sum < 2p into [0, p) (a2b.rs:328)."""
        bl = self.bitlen
        batch = x.a.shape[1:]
        maskc = self._maskc(bl, batch)
        x_msb = self.shr(x, bl)
        x = self.and_public(x, maskc)
        y = self.binary_sub_p(x)
        y_msb = self.shr(y, bl + 1)
        y = self.and_public(y, maskc)
        # spread (x_msb ^ y_msb) & 1 to a full-width mask, componentwise
        ov_a = (x_msb.a[0] ^ y_msb.a[0]) & 1
        ov_b = (x_msb.b[0] ^ y_msb.b[0]) & 1
        full = self._maskc(bl, batch)
        ov = Rep3BinaryShare(ov_a[None] * full, ov_b[None] * full)
        return self.cmux(ov, y, x)

    # ------------------------------------------------------------ a2b & co

    def a2b(self, x) -> Rep3BinaryShare:
        """arithmetic Rep3FieldShare -> binary share of the same value
        (a2b.rs:367): x01 = masked (x0+x1), x2 injected locally, then a
        binary add mod p."""
        d = self.d
        f = self.f
        batch = x.a.shape[1:]
        # components leave the Montgomery domain first: bits must be of the
        # standard residues (the additive relation is linear, so per-component
        # conversion preserves the sharing)
        xa = f.from_mont(x.a)
        xb = f.from_mont(x.b)
        r = self._rand_mask(batch)
        zero = jnp.zeros_like(x.a)
        if d.id == 0:
            x01_a = r
            x2 = Rep3BinaryShare(zero, xb)
        elif d.id == 1:
            val = f.add(xa, xb)  # x1 + x0 (canonical limbs = plain bits)
            x01_a = val ^ r
            x2 = Rep3BinaryShare(zero, zero)
        else:
            x01_a = r
            x2 = Rep3BinaryShare(xa, zero)
        d.net.send_next(x01_a)
        x01 = Rep3BinaryShare(x01_a, jnp.asarray(d.net.recv_prev()))
        summed = self.binary_add(x01, x2, self.bitlen + 1)
        return self.sub_p_cmux(summed)

    def open(self, x: Rep3BinaryShare):
        self.d.net.send_next(x.b)
        c = jnp.asarray(self.d.net.recv_prev())
        return x.a ^ x.b ^ c

    def unsigned_ge(self, x, y) -> Rep3BinaryShare:
        """[x] >= [y] over field values; 1-bit binary share (a2b.rs:398)."""
        ax = self.a2b(x)
        ay = self.a2b(y)
        diff = self.binary_sub(ax, ay)
        bit = self.shr(diff, self.bitlen)
        onec = self.f._bcast_const(self.f._int_to_limbs_np(1), bit.a.shape[1:])
        return self.and_public(bit, onec)

    def is_zero(self, x: Rep3BinaryShare) -> Rep3BinaryShare:
        """binary share -> 1-bit share of (x == 0) via an AND tree over the
        negated bits (a2b.rs:498)."""
        f = self.f
        batch = x.a.shape[1:]
        maskc = self._maskc(self.bitlen, batch)
        x = self.xor_public(x, maskc)
        # public padding bit trick: set bit in BOTH components of EVERY party
        # (1 ^ 1 ^ 1 == 1)
        length = self.bitlen
        while length > 1:
            if length % 2 == 1:
                length += 1
                bitc = f._bcast_const(f._int_to_limbs_np(1 << (length - 1)), batch)
                x = Rep3BinaryShare(x.a | bitc, x.b | bitc)
            length //= 2
            mc = self._maskc(length, batch)
            y = self.shr(x, length)
            x = self.and_(self.and_public(x, mc), self.and_public(y, mc))
        onec = self.f._bcast_const(self.f._int_to_limbs_np(1), batch)
        return self.and_public(x, onec)

    def bit_inject(self, x: Rep3BinaryShare):
        """single-bit binary share -> arithmetic share (a2b.rs:526):
        b0 ^ b1 ^ b2 lifted via two arithmetic XORs (2 mul rounds)."""
        from .rep3 import Rep3FieldShare

        d = self.d
        f = self.f
        # arithmetic trivial sharings of each XOR component: component x_i is
        # known to parties i (as .a) and i+1 (as .b)
        def to_field(bits):
            return f.cond_sub_p(bits)  # 0/1 limbs are canonical already

        zero = jnp.zeros_like(x.a)
        if d.id == 0:
            b0 = Rep3FieldShare(f.to_mont(to_field(x.a)), zero)  # own comp x0
            b1 = Rep3FieldShare(zero, zero)
            b2 = Rep3FieldShare(zero, f.to_mont(to_field(x.b)))  # prev comp
        elif d.id == 1:
            b0 = Rep3FieldShare(zero, f.to_mont(to_field(x.b)))
            b1 = Rep3FieldShare(f.to_mont(to_field(x.a)), zero)
            b2 = Rep3FieldShare(zero, zero)
        else:
            b0 = Rep3FieldShare(zero, zero)
            b1 = Rep3FieldShare(zero, f.to_mont(to_field(x.b)))
            b2 = Rep3FieldShare(f.to_mont(to_field(x.a)), zero)
        t = self.arithmetic_xor(b0, b1)
        return self.arithmetic_xor(t, b2)

    def arithmetic_xor(self, x, y):
        """x + y - 2xy on arithmetic shares (1 mul round)."""
        d = self.d
        prod = d.mul_vec(x, y)
        s = d.add(x, y)
        return d.sub(s, d.add(prod, prod))

    def b2a(self, x: Rep3BinaryShare):
        """General binary -> arithmetic conversion (a2b.rs:440).

        Correlated field elements from the domain-separated bitcomp ChaCha
        streams: k2 is known to parties {1,2} (keyed by party 1's seed),
        k3 to parties {2,0} (party 2's seed). Party 2 injects the bits of
        k2+k3 XOR-masked; a binary add mod p yields z = x + k2 + k3, which
        is opened to parties 0 and 1 only. Components:
        c0 = open(z), c1 = -k2, c2 = -k3 (sum = x)."""
        from .rep3 import Rep3FieldShare

        d = self.d
        f = self.f
        batch = x.a.shape[1:]
        r = self._rand_mask(batch)
        zero = jnp.zeros((f.L,) + tuple(batch), U32)
        if d.id == 0:
            k3 = d.rngs.bit2.rand_mont(f, batch)  # party2's seed stream
            res_b = f.neg(k3)
            ya = r
        elif d.id == 1:
            k2 = d.rngs.bit1.rand_mont(f, batch)  # own seed (shared w/ next)
            res_a = f.neg(k2)
            ya = r
        else:
            k2 = d.rngs.bit2.rand_mont(f, batch)  # party1's seed stream
            k3 = d.rngs.bit1.rand_mont(f, batch)  # own seed (shared w/ p0)
            val_bits = f.from_mont(f.add(k2, k3))  # standard residue bits
            ya = val_bits ^ r
            res_a = f.neg(k3)
            res_b = f.neg(k2)
        d.net.send_next(ya)
        y = Rep3BinaryShare(ya, jnp.asarray(d.net.recv_prev()))
        z = self.sub_p_cmux(self.binary_add(x, y, self.bitlen + 1))
        # partial open of z to parties 0 and 1
        if d.id == 0:
            d.net.send_next(z.b)
            c1 = jnp.asarray(d.net.recv_prev())
            opened = z.a ^ z.b ^ c1
            res_a = f.to_mont(f.cond_sub_p(opened))
        elif d.id == 1:
            c2 = jnp.asarray(d.net.recv_prev())
            opened = z.a ^ z.b ^ c2
            res_b = f.to_mont(f.cond_sub_p(opened))
        else:
            d.net.send_next(z.b)
        return Rep3FieldShare(res_a, res_b)

    # ------------------------------------------- arithmetic-level bit ops

    def shr_arith(self, x, s: int):
        """[x] >> s with public s (witness_extension_impl.rs:367):
        a2b -> logical shift -> b2a."""
        if s == 0:
            return x
        if s >= self.bitlen:
            from .rep3 import Rep3FieldShare

            z = jnp.zeros_like(x.a)
            return Rep3FieldShare(z, z)
        return self.b2a(self.shr(self.a2b(x), s))

    def bitwise_arith(self, op: str, x, y):
        """[x] op [y] for op in and/or/xor (1 a2b pair + 1-2 AND rounds +
        b2a), parity witness_extension_impl.rs:455-560."""
        bx = self.a2b(x)
        by = self.a2b(y)
        if op == "band":
            res = self.and_(bx, by)
        elif op == "bxor":
            res = self.xor(bx, by)
        elif op == "bor":
            res = self.xor(self.xor(bx, by), self.and_(bx, by))
        else:
            raise ValueError(op)
        return self.b2a(res)
