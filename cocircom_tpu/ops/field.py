"""TPU-native prime-field arithmetic: limb-decomposed Montgomery kernels in JAX.

Design (TPU-first, not a port):
  * A field element is ``L`` limbs of ``W=16`` bits stored in ``uint32``.
  * Arrays are **limb-axis-first**: shape ``(L, *batch)``. The batch axis lands
    on TPU lanes (last dim 128), the limb axis on sublanes — every op below is
    a short unrolled sequence of (L, N)-shaped VPU ops, which XLA fuses.
  * Montgomery domain with R = 2^(16 L).  For BN254 (L=16, R=2^256) and
    BLS12-381 (Fq L=24 R=2^384, Fr L=16 R=2^256) this is *exactly* the R the
    circom/snarkjs file formats use, so zkey artifacts load with zero
    conversion cost (see /root/reference/co-circom/circom-types/src/traits.rs:543-637).
  * Products of 16-bit limbs fit u32; partial products are split into lo/hi
    16-bit halves and accumulated into 2L columns whose values stay < 2^23,
    so carries are deferred to a single propagation pass (no u64 anywhere —
    TPU-friendly).

Ground truth: cocircom_tpu.fields.params.HostField (python ints).
Reference parity: mpc-core's reliance on arkworks ark-ff (SURVEY.md L0).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np

from ..fields.params import HostField

W = 16
MASK = np.uint32(0xFFFF)
U32 = jnp.uint32


class Field:
    """JAX limb arithmetic for one prime field. Hash/eq by identity: create
    singletons via :func:`get_field`."""

    def __init__(self, p: int, name: str = "F"):
        self.p = p
        self.name = name
        self.host = HostField(p, name)
        self.bits = p.bit_length()
        self.L = -(-self.bits // W)
        L = self.L
        self.R = 1 << (W * L)
        if not (2 * p < self.R):
            raise ValueError("need 2p < R for single conditional subtraction")
        self.n0inv = np.uint32((-pow(p, -1, 1 << W)) % (1 << W))
        self.nprime = (-pow(p, -1, self.R)) % self.R  # full -N^{-1} mod R
        self.p_limbs = self._int_to_limbs_np(p)
        self.nprime_limbs = self._int_to_limbs_np(self.nprime)
        self.r_mod_p = self.R % p  # == to_mont(1)
        self.one_mont_np = self._int_to_limbs_np(self.r_mod_p)
        self.r2 = (self.R * self.R) % p
        self.r2_np = self._int_to_limbs_np(self.r2)
        self.zero_np = np.zeros((L,), np.uint32)
        # jit-cache the hot entry points (per-instance; instances are
        # singletons via get_field, so compilations are shared globally)
        self.add = jax.jit(self.add)
        self.sub = jax.jit(self.sub)
        self.neg = jax.jit(self.neg)
        self.mont_mul = jax.jit(self.mont_mul)
        self.to_mont = jax.jit(self.to_mont)
        self.from_mont = jax.jit(self.from_mont)
        self.pow_static = jax.jit(self.pow_static, static_argnums=1)
        self.batch_inv = jax.jit(self.batch_inv, static_argnums=1)
        self.sum = jax.jit(self.sum, static_argnums=1)
        # jitted as one fused program: the eager op-by-op path compiles many
        # tiny scan programs, one of which reliably crashes LLVM codegen on
        # this jaxlib (see tests/conftest.py stability notes)
        self.rand_mont = jax.jit(self.rand_mont, static_argnums=1)
        # jitted wide-reduction entry point for EAGER callers (chacha PRF,
        # segment sums): an eager _mont_reduce compiles a tiny lax.scan
        # per shape, which is exactly the program that intermittently
        # crashes this jaxlib's CPU LLVM codegen in threaded processes
        # (docs/TPU_NOTES.md); routing through jit hits the pjit cache
        self.mont_reduce_wide = jax.jit(self._mont_reduce)
        self.cond_sub_p = jax.jit(self._cond_sub_p)

    # ------------------------------------------------------------------
    # host conversions
    # ------------------------------------------------------------------

    def _int_to_limbs_np(self, x: int) -> np.ndarray:
        return np.array([(x >> (W * i)) & 0xFFFF for i in range(self.L)], np.uint32)

    def to_limbs(self, vals) -> np.ndarray:
        """python int(s) -> (L, *batch) uint32 (standard, NOT Montgomery)."""
        arr = np.asarray(vals, dtype=object)
        out = np.empty((self.L,) + arr.shape, np.uint32)
        flat = arr.reshape(-1)
        cols = np.empty((flat.shape[0], self.L), np.uint32)
        for j, v in enumerate(flat):
            v = int(v) % self.p
            for i in range(self.L):
                cols[j, i] = (v >> (W * i)) & 0xFFFF
        out[...] = cols.T.reshape((self.L,) + arr.shape)
        return out

    def from_limbs(self, limbs) -> np.ndarray:
        """(L, *batch) uint32 -> object ndarray of python ints (host)."""
        limbs = np.asarray(jax.device_get(limbs), np.uint64)
        batch_shape = limbs.shape[1:]
        flat = limbs.reshape(self.L, -1)
        out = np.zeros(flat.shape[1], dtype=object)
        for i in range(self.L - 1, -1, -1):
            out = (out << W) | flat[i].astype(object)
        return out.reshape(batch_shape) if batch_shape else out[()]

    def to_int(self, limbs) -> int:
        return int(self.from_limbs(limbs))

    def bytes_to_limbs(self, data: bytes, n: int) -> np.ndarray:
        """n little-endian 2L-byte field elements -> (L, n) uint32. Zero-copy
        style fast path for artifact IO (elements interpreted as-is)."""
        a = np.frombuffer(data, dtype="<u2", count=n * self.L)
        return np.ascontiguousarray(a.reshape(n, self.L).T).astype(np.uint32)

    def limbs_to_bytes(self, limbs) -> bytes:
        arr = np.asarray(jax.device_get(limbs), np.uint32)
        flat = arr.reshape(self.L, -1).T.astype("<u2")
        return flat.tobytes()

    # ------------------------------------------------------------------
    # Montgomery conversions
    # ------------------------------------------------------------------

    def to_mont(self, a):
        return self.mont_mul(a, self._bcast_const(self.r2_np, a.shape[1:]))

    def from_mont(self, a):
        L = self.L
        acc = jnp.concatenate([a.astype(U32), jnp.zeros((L,) + a.shape[1:], U32)], 0)
        return self._mont_reduce(acc)

    def encode(self, vals):
        """host ints -> device Montgomery limbs."""
        return self.to_mont(jnp.asarray(self.to_limbs(vals)))

    def decode(self, limbs) -> np.ndarray:
        """device Montgomery limbs -> host python ints."""
        return self.from_limbs(self.from_mont(limbs))

    # ------------------------------------------------------------------
    # constants / shaping
    # ------------------------------------------------------------------

    def _bcast_const(self, np_limbs: np.ndarray, batch_shape) -> jnp.ndarray:
        return jnp.asarray(np_limbs.reshape((self.L,) + (1,) * len(batch_shape)))

    def zeros(self, batch_shape=()):
        return jnp.zeros((self.L,) + tuple(batch_shape), U32)

    def one_mont(self, batch_shape=()):
        return jnp.broadcast_to(
            self._bcast_const(self.one_mont_np, batch_shape),
            (self.L,) + tuple(batch_shape),
        )

    # ------------------------------------------------------------------
    # carry machinery
    # ------------------------------------------------------------------

    def _carry(self, x):
        """Propagate deferred carries; returns canonical limbs (drops final
        carry — callers guarantee the value fits L limbs). lax.scan over the
        limb axis keeps the XLA graph tiny (compile time!)."""

        def step(carry, xi):
            t = xi + carry
            return t >> W, t & MASK

        _, out = jax.lax.scan(step, jnp.zeros_like(x[0]), x)
        return out

    def _sub_limbs(self, a, b):
        """(a - b) mod 2^(16L) with borrow chain; returns (diff, borrow)."""
        big = np.uint32(1 << W)
        a, b = jnp.broadcast_arrays(a, b)

        def step(borrow, ab):
            ai, bi = ab
            t = ai + big - borrow - bi
            return jnp.uint32(1) - (t >> W), t & MASK

        borrow, out = jax.lax.scan(step, jnp.zeros_like(a[0]), (a, b))
        return out, borrow

    def _cond_sub_p(self, x):
        """x < 2p canonical -> x mod p."""
        pb = self._bcast_const(self.p_limbs, x.shape[1:])
        d, borrow = self._sub_limbs(x, pb)
        return jnp.where(borrow.astype(bool), x, d)

    # ------------------------------------------------------------------
    # ring ops (inputs canonical < p, limb-first (L, *batch))
    # ------------------------------------------------------------------

    def add(self, a, b):
        return self._cond_sub_p(self._carry(a + b))

    def sub(self, a, b):
        d, borrow = self._sub_limbs(a, b)
        pb = self._bcast_const(self.p_limbs, d.shape[1:])
        dp = self._carry(d + pb)
        return jnp.where(borrow.astype(bool), dp, d)

    def neg(self, a):
        z = jnp.zeros_like(a)
        return self.sub(z, a)

    def double(self, a):
        return self.add(a, a)

    def _mul_cols(self, a, b, ncols: int):
        """Schoolbook product of 16-bit-limb operands into `ncols`
        deferred-carry columns (each < 2L * 2^16 < 2^21).

        Static pad-and-add rows: no gathers (TPU gathers off the lane axis
        are slow), no dynamic-update-slices, fuses into a handful of
        elementwise passes."""
        L = self.L
        batch = jnp.broadcast_shapes(a.shape[1:], b.shape[1:])
        a = jnp.broadcast_to(a, (L,) + batch)
        b = jnp.broadcast_to(b, (L,) + batch)
        acc = jnp.zeros((ncols,) + batch, U32)
        zpad = [(0, 0)] * len(batch)
        for i in range(L):
            prod = a[i] * b  # (L, *batch) u32 < 2^32
            lo = prod & MASK
            hi = prod >> W
            wlo = min(L, ncols - i)
            whi = min(L, ncols - i - 1)
            if wlo > 0:
                acc = acc + jnp.pad(lo[:wlo], [(i, ncols - i - wlo)] + zpad)
            if whi > 0:
                acc = acc + jnp.pad(hi[:whi], [(i + 1, ncols - i - 1 - whi)] + zpad)
        return acc

    def _mul_wide(self, a, b):
        return self._mul_cols(a, b, 2 * self.L)

    def _mont_reduce(self, acc):
        """Wide deferred-carry columns (VALUE < R*p) -> canonical Montgomery
        residue < p, via full-width REDC:
            q = (T mod R) * (-p^-1 mod R) mod R ;  res = (T + q*p) / R < 2p
        Three parallel wide multiplies + carry scans — no serial per-limb
        reduction loop (the TPU-friendly formulation)."""
        L = self.L
        batch = acc.shape[1:]
        nb = self._bcast_const(self.p_limbs, batch)
        npb = self._bcast_const(self.nprime_limbs, batch)
        Tc = self._carry(acc)  # canonical 2L limbs (value < R^2 always fits)
        q = self._carry(self._mul_cols(Tc[:L], npb, L))  # q = T*N' mod R
        S = Tc + self._mul_cols(q, nb, 2 * L)
        Sc = self._carry(S)
        return self._cond_sub_p(Sc[L:])

    def mont_mul(self, a, b):
        if self._pallas_ok(a, b):
            from .pallas_field import mont_mul_pallas

            return mont_mul_pallas(self, a, b)
        return self._mont_reduce(self._mul_wide(a, b))

    def _pallas_ok(self, a, b) -> bool:
        """Route to the Pallas VMEM kernel on TPU (trace-time decision; tests
        pin the CPU backend and keep the pure-XLA path). ALWAYS on for TPU:
        besides throughput, collapsing each mont_mul from hundreds of HLO ops
        to one custom call is what keeps big programs (MSM 2^20) compilable —
        XLA-path compiles crash the worker (docs/TPU_NOTES.md)."""
        if os.environ.get("COCIRCOM_NO_PALLAS"):
            return False
        if jax.default_backend() != "tpu":
            return False
        n = 1
        for d in jnp.broadcast_shapes(a.shape[1:], b.shape[1:]):
            n *= d
        return n >= int(os.environ.get("COCIRCOM_PALLAS_MIN", "1"))

    def mont_sqr(self, a):
        return self.mont_mul(a, a)

    # ------------------------------------------------------------------
    # predicates / selection
    # ------------------------------------------------------------------

    def is_zero(self, a):
        return jnp.all(a == 0, axis=0)

    def eq(self, a, b):
        return jnp.all(a == b, axis=0)

    def select(self, mask, a, b):
        """mask: bool (*batch); a where mask else b."""
        return jnp.where(mask[None], a, b)

    # ------------------------------------------------------------------
    # exponentiation / inversion (Montgomery domain)
    # ------------------------------------------------------------------

    def pow_static(self, a, e: int):
        """a^e with host-static exponent; rolled loop (compile-friendly)."""
        if e == 0:
            return self.one_mont(a.shape[1:])
        bits = [int(c) for c in bin(e)[2:]]
        bits_arr = jnp.asarray(np.array(bits, np.uint32))

        def body(i, acc):
            acc = self.mont_mul(acc, acc)
            with_mul = self.mont_mul(acc, a)
            take = bits_arr[i].astype(bool)
            return jnp.where(take, with_mul, acc)

        acc0 = jnp.broadcast_to(
            self._bcast_const(self.one_mont_np, a.shape[1:]), a.shape
        )
        return jax.lax.fori_loop(0, len(bits), body, acc0)

    def inv(self, a):
        """Fermat inverse; a must be nonzero (0 -> 0 garbage-free: returns 0)."""
        return self.pow_static(a, self.p - 2)

    def batch_inv(self, a, axis: int = 1):
        """Montgomery's trick over a batch axis: 2 log-depth scans + 1 inverse.

        Zero entries map to zero (masked, like reference semantics where
        provers guarantee nonzero denominators).
        """
        one = jnp.broadcast_to(self._bcast_const(self.one_mont_np, a.shape[1:]), a.shape)
        zmask = self.is_zero(a)
        safe = jnp.where(zmask[None], one, a)
        scan_axis = axis - 1  # axis in batch coords for associative_scan below

        def comb(x, y):
            return self.mont_mul(x, y)

        # prefix[i] = x0*...*xi ; suffix[i] = xi*...*x_{n-1}
        prefix = jax.lax.associative_scan(comb, safe, axis=axis)
        suffix = jax.lax.associative_scan(comb, safe, axis=axis, reverse=True)
        n = a.shape[axis]
        total = jax.lax.index_in_dim(prefix, n - 1, axis=axis, keepdims=True)
        total_inv = self.inv(total)
        # inv_i = prefix_{i-1} * suffix_{i+1} * total_inv
        pad_one = jax.lax.index_in_dim(one, 0, axis=axis, keepdims=True)
        pre = jnp.concatenate(
            [pad_one, jax.lax.slice_in_dim(prefix, 0, n - 1, axis=axis)], axis=axis
        )
        suf = jnp.concatenate(
            [jax.lax.slice_in_dim(suffix, 1, n, axis=axis), pad_one], axis=axis
        )
        out = self.mont_mul(self.mont_mul(pre, suf), total_inv)
        return jnp.where(zmask[None], jnp.zeros_like(out), out)

    def prefix_sums(self, a, axis: int = 1):
        """Inclusive prefix sums along a batch axis (masked Hillis-Steele,
        one modular add per fori body)."""
        batch = a.shape[1:]
        n = batch[axis - 1]
        if n <= 1:
            return a
        steps = (n - 1).bit_length()
        pos_shape = tuple(d if i == axis - 1 else 1 for i, d in enumerate(batch))
        pos = jnp.arange(n, dtype=jnp.int32).reshape(pos_shape)
        pos = jnp.broadcast_to(pos, batch)

        def body(s, x):
            shift = jnp.left_shift(jnp.int32(1), s)
            rolled = jnp.roll(x, shift, axis=axis)
            valid = pos >= shift
            return jnp.where(valid[None], self.add(x, rolled), x)

        return jax.lax.fori_loop(0, steps, body, a)

    def cumprod(self, a, axis: int = 1):
        """Inclusive prefix products (public values, Montgomery domain)."""
        batch = a.shape[1:]
        n = batch[axis - 1]
        if n <= 1:
            return a
        steps = (n - 1).bit_length()
        pos_shape = tuple(d if i == axis - 1 else 1 for i, d in enumerate(batch))
        pos = jnp.arange(n, dtype=jnp.int32).reshape(pos_shape)
        pos = jnp.broadcast_to(pos, batch)
        one = jnp.broadcast_to(self._bcast_const(self.one_mont_np, batch), a.shape)

        def body(s, x):
            shift = jnp.left_shift(jnp.int32(1), s)
            rolled = jnp.roll(x, shift, axis=axis)
            rolled = jnp.where((pos >= shift)[None], rolled, one)
            return self.mont_mul(x, rolled)

        return jax.lax.fori_loop(0, steps, body, a)

    # ------------------------------------------------------------------
    # randomness
    # ------------------------------------------------------------------

    def rand_mont(self, key, batch_shape=()):
        """Uniform field element (already in Montgomery domain).

        Top limb zeroed so the wide value stays < R*p (single cond-sub bound);
        statistical bias is ~2^-(16L-16-bits) — negligible."""
        raw = jax.random.bits(key, (2 * self.L,) + tuple(batch_shape), U32) & MASK
        raw = raw.at[2 * self.L - 1].set(0)
        return self._mont_reduce(raw)

    # ------------------------------------------------------------------
    # reductions
    # ------------------------------------------------------------------

    def sum(self, a, axis: int = 1):
        """Modular sum over one batch axis (inputs canonical Montgomery).

        Per level: plain u32 column sums of <=64 elements (limbs < 2^22, no
        overflow), then one wide Montgomery reduction (divides by R) and one
        mont_mul by R^2 to restore the domain. log_64(n) levels.
        """
        if axis < 1:
            raise ValueError("axis 0 is the limb axis")
        while a.shape[axis] > 1:
            n = a.shape[axis]
            take = min(64, n)
            pad = (-n) % take
            if pad:
                padw = [(0, 0)] * a.ndim
                padw[axis] = (0, pad)
                a = jnp.pad(a, padw)
                n += pad
            shp = list(a.shape)
            shp[axis : axis + 1] = [n // take, take]
            cols = jnp.sum(a.reshape(shp), axis=axis + 1)  # limbs < 64*2^16
            wide = jnp.concatenate([cols, jnp.zeros_like(cols)], axis=0)
            red = self._mont_reduce(wide)  # = (sum) * R^{-1} mod p
            a = self.mont_mul(red, self._bcast_const(self.r2_np, red.shape[1:]))
        return jnp.squeeze(a, axis=axis)


@functools.lru_cache(maxsize=None)
def get_field(p: int, name: str = "F") -> Field:
    return Field(p, name)
