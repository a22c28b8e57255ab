"""Vectorized ChaCha12 as the MPC correlated PRF (on-device, JAX).

The reference keys every correlated randomness stream with 256-bit ChaCha12
seeds from OS entropy (/root/reference/mpc-core/src/protocols/rep3/rngs.rs,
rand_chacha; SEED_SIZE = 32 bytes). Round-1 used 32-bit jax.random seeds —
a brute-forceable mask space (ADVICE.md high). This module replaces that
with a faithful-strength construction that is also TPU-idiomatic: the
ChaCha block function is pure u32 adds/xors/rotls, vectorized over block
counters, so mask tensors of any batch shape are generated on-device at
VPU speed with no host transfer.

Layout: state rows held as four (4, n) u32 arrays (A=consts, B/C=key,
D=counter/domain/nonce); a double round is one column QR + one diagonal QR
with sublane rolls — ~150 fused elementwise ops per 64n bytes of stream.
"""

from __future__ import annotations

import functools
import hashlib
import secrets

import jax
import jax.numpy as jnp
import numpy as np

U32 = jnp.uint32
_SIGMA = np.array([0x61707865, 0x3320646E, 0x79622D32, 0x6B206574], np.uint32)


def _rotl(x, n: int):
    return (x << n) | (x >> (32 - n))


def _qr(a, b, c, d):
    a = a + b
    d = _rotl(d ^ a, 16)
    c = c + d
    b = _rotl(b ^ c, 12)
    a = a + b
    d = _rotl(d ^ a, 8)
    c = c + d
    b = _rotl(b ^ c, 7)
    return a, b, c, d


@functools.partial(jax.jit, static_argnums=(3, 4))
def chacha_blocks(key8, ctr0, domain, nblocks: int, rounds: int = 12):
    """key8: (8,) u32 key words; ctr0/domain: u32 scalars. Returns
    (16, nblocks) u32 — one ChaCha block per column."""
    n = nblocks
    ctr = ctr0 + jnp.arange(n, dtype=U32)
    zero = jnp.zeros((n,), U32)
    a0 = jnp.broadcast_to(jnp.asarray(_SIGMA)[:, None], (4, n))
    b0 = jnp.broadcast_to(key8[0:4][:, None], (4, n))
    c0 = jnp.broadcast_to(key8[4:8][:, None], (4, n))
    d0 = jnp.stack([ctr, jnp.broadcast_to(domain, (n,)), zero, zero])
    a, b, c, d = a0, b0, c0, d0
    for _ in range(rounds // 2):
        a, b, c, d = _qr(a, b, c, d)  # column round (4 QRs batched)
        b = jnp.roll(b, -1, axis=0)
        c = jnp.roll(c, -2, axis=0)
        d = jnp.roll(d, -3, axis=0)
        a, b, c, d = _qr(a, b, c, d)  # diagonal round
        b = jnp.roll(b, 1, axis=0)
        c = jnp.roll(c, 2, axis=0)
        d = jnp.roll(d, 3, axis=0)
    return jnp.concatenate([a + a0, b + b0, c + c0, d + d0], axis=0)


def seed_to_words(seed: bytes | int) -> jnp.ndarray:
    """32-byte seed -> (8,) u32 key words. Integer seeds (tests) are
    expanded through SHA-256 so no path ever keys ChaCha with < 256 bits."""
    if isinstance(seed, int):
        seed = hashlib.sha256(seed.to_bytes(32, "little", signed=False)).digest()
    if len(seed) != 32:
        raise ValueError("ChaCha seed must be exactly 32 bytes")
    return jnp.asarray(np.frombuffer(seed, dtype="<u4").copy())


def fresh_seed() -> bytes:
    return secrets.token_bytes(32)


class ChaChaStream:
    """A counter-mode ChaCha12 stream over one (key, domain) pair.

    Streams shared between two parties advance in lockstep as long as both
    sides make the same sequence of requests (the reference's Rep3Rand
    discipline, rngs.rs:25-74)."""

    def __init__(self, seed: bytes | int, domain: int = 0):
        self.key = seed_to_words(seed)
        self.domain = jnp.uint32(domain)
        self.ctr = 0

    def words(self, shape) -> jnp.ndarray:
        """uniform u32 tensor of `shape`."""
        total = 1
        for s in shape:
            total *= s
        nblk = max(1, -(-total // 16))
        out = chacha_blocks(self.key, jnp.uint32(self.ctr), self.domain, nblk)
        self.ctr += nblk
        return out.T.reshape(-1)[:total].reshape(shape)

    def limbs16(self, shape) -> jnp.ndarray:
        """uniform 16-bit limbs (leading axis even): each u32 word yields
        two limbs, halving the stream draw."""
        L = shape[0]
        rest = shape[1:]
        half = -(-L // 2)
        w = self.words((half,) + tuple(rest))
        lo = w & jnp.uint32(0xFFFF)
        hi = w >> 16
        both = jnp.concatenate([lo[:, None], hi[:, None]], axis=1).reshape(
            (2 * half,) + tuple(rest)
        )
        return both[:L]

    def rand_mont(self, f, batch_shape=()):
        """uniform field element in Montgomery form (bias < 2^-240, same
        wide-reduce construction as Field.rand_mont)."""
        raw = self.limbs16((2 * f.L,) + tuple(batch_shape))
        raw = raw.at[2 * f.L - 1].set(0)
        return f.mont_reduce_wide(raw)
