"""ChaCha12/20 correlated-PRF kernel vs an independent pure-int model."""

import jax.numpy as jnp
import numpy as np

from cocircom_tpu.fields.params import BN254
from cocircom_tpu.ops.field import get_field
from cocircom_tpu.utils.chacha import ChaChaStream, chacha_blocks, seed_to_words

M = 0xFFFFFFFF


def _qr(st, a, b, c, d):
    st[a] = (st[a] + st[b]) & M
    st[d] ^= st[a]
    st[d] = ((st[d] << 16) | (st[d] >> 16)) & M
    st[c] = (st[c] + st[d]) & M
    st[b] ^= st[c]
    st[b] = ((st[b] << 12) | (st[b] >> 20)) & M
    st[a] = (st[a] + st[b]) & M
    st[d] ^= st[a]
    st[d] = ((st[d] << 8) | (st[d] >> 24)) & M
    st[c] = (st[c] + st[d]) & M
    st[b] ^= st[c]
    st[b] = ((st[b] << 7) | (st[b] >> 25)) & M


def _block(keywords, ctr, domain, rounds):
    st0 = [0x61707865, 0x3320646E, 0x79622D32, 0x6B206574]
    st0 += list(keywords) + [ctr, domain, 0, 0]
    st = list(st0)
    for _ in range(rounds // 2):
        _qr(st, 0, 4, 8, 12)
        _qr(st, 1, 5, 9, 13)
        _qr(st, 2, 6, 10, 14)
        _qr(st, 3, 7, 11, 15)
        _qr(st, 0, 5, 10, 15)
        _qr(st, 1, 6, 11, 12)
        _qr(st, 2, 7, 8, 13)
        _qr(st, 3, 4, 9, 14)
    return [(a + b) & M for a, b in zip(st, st0)]


def test_block_function_matches_model():
    key = bytes(range(32))
    k8 = seed_to_words(key)
    kw = [int(v) for v in np.frombuffer(key, "<u4")]
    for rounds in (12, 20):
        for ctr, dom in [(0, 0), (1, 0x09000000), (12345, 7)]:
            want = _block(kw, ctr, dom, rounds)
            got = [
                int(v)
                for v in np.asarray(
                    chacha_blocks(k8, jnp.uint32(ctr), jnp.uint32(dom), 1, rounds)[:, 0]
                )
            ]
            assert got == want


def test_counter_vectorization_and_stream():
    k8 = seed_to_words(bytes(range(32)))
    multi = np.asarray(chacha_blocks(k8, jnp.uint32(5), jnp.uint32(0), 4, 12))
    single = np.asarray(chacha_blocks(k8, jnp.uint32(7), jnp.uint32(0), 1, 12))
    assert (multi[:, 2] == single[:, 0]).all()
    # two streams with the same seed produce the same sequence (lockstep)
    s1 = ChaChaStream(bytes(range(32)), domain=1)
    s2 = ChaChaStream(bytes(range(32)), domain=1)
    a = np.asarray(s1.words((3, 7)))
    b = np.asarray(s2.words((3, 7)))
    assert (a == b).all()
    # and a different domain diverges
    s3 = ChaChaStream(bytes(range(32)), domain=2)
    assert not (np.asarray(s3.words((3, 7))) == a).all()


def test_rand_mont_is_canonical():
    f = get_field(BN254.fr.p, "bn254.fr")
    s = ChaChaStream(123456789, domain=0)
    x = s.rand_mont(f, (9,))
    vals = f.from_limbs(x)
    assert all(0 <= int(v) < f.p for v in vals)
    # 16-bit limb halves both populated (hi half of words used)
    w = s.limbs16((4, 5))
    assert int(np.asarray(w).max()) > 0
