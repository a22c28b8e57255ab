"""Radix-2 NTT over Fr with the snarkjs root-of-unity convention.

TPU-first design: data is (L, n) Montgomery limbs; each butterfly stage is a
reshape + one batched mont_mul + add/sub over (L, n/2) lanes. log2(n) stages
compile into one fused XLA program; twiddles are built on device in log2(n)
doubling steps and cached per (field, n, direction).

Parity: FFTProvider (/root/reference/mpc-core/src/traits.rs:535-559) with the
share-local FFT property (linearity) preserved: MPC drivers call these same
kernels on each additive share component independently (rep3.rs:880-932).
Root convention: co-circom-snarks/src/lib.rs:208-221 (see fields/params.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..fields.params import HostField
from .field import Field


class NTTEngine:
    # smallest log-size routed to the four-step Pallas path on TPU: below
    # this the per-stage program is already compile-cached and cheap
    PALLAS_MIN_LOG = 12

    def __init__(self, f: Field, host: HostField):
        assert f.p == host.p
        self.f = f
        self.host = host
        self._ntt_jit = jax.jit(self._ntt, static_argnums=(1, 2))
        self._fourstep_jit = jax.jit(self._fourstep, static_argnums=(2,))

    # -------------------------------------------------- twiddle tables

    @functools.lru_cache(maxsize=None)
    def _twiddles(self, logn: int, inverse: bool):
        """(L, max(n/2,1)) powers w^0..w^(n/2-1), device array, Montgomery."""
        f = self.f
        n = 1 << logn
        w = self.host.root_of_unity(logn)
        if inverse:
            w = self.host.inv(w)
        t = f.encode([1, w] if n >= 2 else [1])
        wcur = w * w % self.host.p  # w^len for len = 2
        while t.shape[1] < max(n // 2, 1):
            wl = f.encode([wcur])
            t = jnp.concatenate([t, f.mont_mul(t, wl)], axis=1)
            wcur = wcur * wcur % self.host.p
        return t[:, : max(n // 2, 1)]

    @functools.lru_cache(maxsize=None)
    def _bitrev(self, logn: int):
        n = 1 << logn
        idx = np.arange(n, dtype=np.uint32)
        rev = np.zeros(n, dtype=np.uint32)
        for b in range(logn):
            rev |= ((idx >> b) & 1) << (logn - 1 - b)
        return jnp.asarray(rev.astype(np.int32))

    @functools.lru_cache(maxsize=None)
    def _n_inv(self, logn: int):
        return self.f.encode([self.host.inv(1 << logn)])

    # -------------------------------------------------- transforms

    def _ntt(self, a, logn: int, inverse: bool):
        f = self.f
        n = 1 << logn
        tw = self._twiddles(logn, inverse)
        a = jnp.take(a, self._bitrev(logn), axis=1)
        # trace-time backend split: on TPU each stage is ONE fused Pallas
        # butterfly kernel (mont_mul + modular add/sub share a VMEM
        # residency — the separate XLA add/sub carry chains cost ~40% of a
        # stage); tests pin the CPU backend and keep the pure-XLA path
        fused = f._pallas_ok(a, a)
        if fused:
            from .pallas_field import butterfly_pallas
        for s in range(1, logn + 1):
            m = 1 << s
            half = m // 2
            stride = n // m
            v = a.reshape(f.L, n // m, m)
            even = v[:, :, :half]
            odd = v[:, :, half:]
            wj = tw[:, :: stride][:, :half]  # (L, half)
            if fused:
                wflat = jnp.broadcast_to(
                    wj[:, None, :], (f.L, n // m, half)
                ).reshape(f.L, n // 2)
                oe, oo = butterfly_pallas(
                    f, even.reshape(f.L, n // 2), odd.reshape(f.L, n // 2), wflat
                )
                a = jnp.concatenate(
                    [oe.reshape(f.L, n // m, half), oo.reshape(f.L, n // m, half)],
                    axis=2,
                ).reshape(f.L, n)
            else:
                t = f.mont_mul(odd, wj[:, None, :])
                a = jnp.concatenate([f.add(even, t), f.sub(even, t)], axis=2).reshape(
                    f.L, n
                )
        if inverse:
            a = f.mont_mul(a, self._n_inv(logn))
        return a

    def _warm(self, logn: int, inverse: bool):
        """Materialize cached tables eagerly (never under a jit trace)."""
        self._twiddles(logn, inverse)
        self._bitrev(logn)
        if inverse:
            self._n_inv(logn)

    # ------------------------------------------- four-step Pallas path

    @functools.lru_cache(maxsize=None)
    def _fourstep_aux(self, logn: int, inverse: bool):
        from .pallas_ntt import build_aux

        return build_aux(self.f, self.host, logn, inverse)

    def _fourstep(self, a, aux, logn: int):
        from .pallas_ntt import fourstep_ntt

        f = self.f
        return fourstep_ntt(f, a[:, :, None], logn, aux).reshape(
            f.L, 1 << logn
        )

    def _use_fourstep(self, a, logn: int) -> bool:
        return logn >= self.PALLAS_MIN_LOG and self.f._pallas_ok(a, a)

    def ntt(self, a):
        """Forward NTT of (L, n) Montgomery coeffs -> evals (natural order)."""
        n = a.shape[1]
        logn = n.bit_length() - 1
        assert 1 << logn == n, "size must be a power of two"
        if n == 1:
            return a
        if self._use_fourstep(a, logn):
            return self._fourstep_jit(a, self._fourstep_aux(logn, False), logn)
        self._warm(logn, False)
        return self._ntt_jit(a, logn, False)

    def intt(self, a):
        n = a.shape[1]
        logn = n.bit_length() - 1
        assert 1 << logn == n
        if n == 1:
            return a
        if self._use_fourstep(a, logn):
            return self._fourstep_jit(a, self._fourstep_aux(logn, True), logn)
        self._warm(logn, True)
        return self._ntt_jit(a, logn, True)

    def coset_shift(self, a, g: int | None = None):
        """a[i] *= g^i (distribute_powers), g defaults to the snarkjs Groth16
        coset root (co-groth16/src/groth16.rs:57-77)."""
        n = a.shape[1]
        logn = n.bit_length() - 1
        if g is None:
            g = self.host.groth16_coset_root(logn)
        pows = self._power_table(g, n)
        return self.f.mont_mul(a, pows)

    @functools.lru_cache(maxsize=None)
    def _power_table(self, g: int, n: int):
        f = self.f
        t = f.encode([1, g] if n >= 2 else [1])
        gcur = g * g % self.host.p
        while t.shape[1] < n:
            gl = f.encode([gcur])
            t = jnp.concatenate([t, f.mont_mul(t, gl)], axis=1)
            gcur = gcur * gcur % self.host.p
        return t[:, :n]


def power_table(f: Field, g: int, n: int):
    """[1, g, g^2, ..., g^(n-1)] as (L, n) Montgomery limbs (uncached — for
    per-proof dynamic bases like Fiat-Shamir challenges)."""
    if n == 1:
        return f.encode([1])
    t = f.encode([1, g % f.p])
    gcur = g * g % f.p
    while t.shape[1] < n:
        t = jnp.concatenate([t, f.mont_mul(t, f.encode([gcur]))], axis=1)
        gcur = gcur * gcur % f.p
    return t[:, :n]


@functools.lru_cache(maxsize=None)
def ntt_engine(f: Field, host: HostField) -> NTTEngine:
    return NTTEngine(f, host)
