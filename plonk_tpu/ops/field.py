"""Vectorized prime-field arithmetic on uint32 lanes.

TPU-native replacement for the reference's two hand-specialized scalar field
modules (src/hf.h: F17 with a lookup-table inverse; src/gf.h: F101 with a
Fermat inverse). One parameterized kernel family serves every modulus:

- `Field` (direct strategy): a*b reduced with a single uint32 remainder.
  Valid for p <= 65535 (so (p-1)^2 < 2^32). Covers the toy fields.
- `MontField` (Montgomery strategy): products formed from 16-bit limbs with
  explicit carry handling, Montgomery-reduced with R = 2^32. Valid for any
  odd p < 2^31 (e.g. BabyBear). Elements are kept in Montgomery form inside
  hot loops; `encode`/`decode` convert at the boundary.

All functions operate elementwise on uint32 arrays of any shape, so an
entire vector/tensor of field elements is one VPU op stream. XLA fuses the
add/sub/mul chains; the NTT/MSM kernels build on these.

Reference behaviors preserved exactly (asserted in tests/test_field.py):
- value % p with negative fix-up (src/hf.h:25-34, src/gf.h:24-33)
- inv(0) = 0 (LUT row 0 in src/hf.h:145-180; 0^(p-2) = 0 in src/gf.h:159-162)
- div(a, 0) = 0 (src/hf.h:201-203, src/gf.h:170-172)
- pow(0, 0) = 1 (square-and-multiply identity, src/hf.h:127-137)
"""
from __future__ import annotations

import dataclasses
from typing import Union

import jax
import jax.numpy as jnp

from ..utils.params import FieldParams

U32 = jnp.uint32
_MASK16 = jnp.uint32(0xFFFF)

ArrayLike = Union[jnp.ndarray, int]


def _u32(x) -> jnp.ndarray:
    return jnp.asarray(x, dtype=U32)


@dataclasses.dataclass(frozen=True)
class Field:
    """Direct-reduction field: p <= 65535."""
    params: FieldParams

    def __post_init__(self):
        if self.p > 0xFFFF:
            raise ValueError(
                f"direct Field requires p <= 65535 (got {self.p}); "
                "use MontField")

    @property
    def p(self) -> int:
        return self.params.p

    # ---- constructors ----
    def const(self, v: int) -> jnp.ndarray:
        """Host-side reduction of a python int (handles negatives like
        hf_new / gf_new)."""
        return _u32(v % self.p)

    def array(self, xs) -> jnp.ndarray:
        import numpy as np
        return jnp.asarray(np.mod(np.asarray(xs, dtype=np.int64), self.p),
                           dtype=U32)

    def from_signed(self, x: jnp.ndarray) -> jnp.ndarray:
        """Reduce a signed int32 array into [0, p). Matches C semantics of
        `v % p` followed by `+ p` fix-up (src/hf.h:25-34)."""
        x = jnp.asarray(x, dtype=jnp.int32)
        r = x % jnp.int32(self.p)
        r = jnp.where(r < 0, r + jnp.int32(self.p), r)
        return r.astype(U32)

    def zeros(self, shape) -> jnp.ndarray:
        return jnp.zeros(shape, dtype=U32)

    def ones(self, shape=()) -> jnp.ndarray:
        return jnp.ones(shape, dtype=U32)

    # ---- arithmetic ----
    def add(self, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
        s = _u32(a) + _u32(b)
        return jnp.where(s >= self.p, s - jnp.uint32(self.p), s)

    def sub(self, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
        a, b = _u32(a), _u32(b)
        d = a - b  # wraps mod 2^32 when a < b
        return jnp.where(a >= b, d, d + jnp.uint32(self.p))

    def neg(self, a: jnp.ndarray) -> jnp.ndarray:
        a = _u32(a)
        return jnp.where(a == 0, a, jnp.uint32(self.p) - a)

    def mul(self, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
        return (_u32(a) * _u32(b)) % jnp.uint32(self.p)

    def square(self, a: jnp.ndarray) -> jnp.ndarray:
        return self.mul(a, a)

    # ---- exponentiation ----
    def pow_static(self, a: jnp.ndarray, e: int) -> jnp.ndarray:
        """a^e for a python-int exponent: unrolled square-and-multiply
        (log2(e) fused VPU ops). pow(_, 0) == 1 including 0^0
        (src/hf-test.c:113-118)."""
        if e < 0:
            raise ValueError("negative exponent")
        r = jnp.broadcast_to(self.ones(), jnp.shape(a)).astype(U32)
        base = _u32(a)
        while e > 0:
            if e & 1:
                r = self.mul(r, base)
            e >>= 1
            if e:
                base = self.square(base)
        return r

    def pow(self, a: jnp.ndarray, e: jnp.ndarray, nbits: int = 32
            ) -> jnp.ndarray:
        """a^e for traced integer exponents (elementwise)."""
        e = jnp.asarray(e, dtype=U32)
        a = _u32(a)
        a, e = jnp.broadcast_arrays(a, e)

        def body(i, carry):
            r, base, ee = carry
            bit = (ee & 1).astype(jnp.bool_)
            r = jnp.where(bit, self.mul(r, base), r)
            return (r, self.square(base), ee >> 1)

        r0 = jnp.ones_like(a)
        r, _, _ = jax.lax.fori_loop(0, nbits, body, (r0, a, e))
        return r

    def inv(self, a: jnp.ndarray) -> jnp.ndarray:
        """Fermat inverse a^(p-2); inv(0) = 0 by convention, matching both
        the F17 LUT (src/hf.h:145-191) and F101 Fermat path
        (src/gf.h:159-162)."""
        return self.pow_static(a, self.p - 2)

    def div(self, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
        """a * inv(b); div by zero yields 0 (src/hf.h:201-203)."""
        return self.mul(a, self.inv(b))

    # ---- host-side helpers (python ints) ----
    def hconst(self, v: int) -> int:
        return v % self.p

    def hpow(self, a: int, e: int) -> int:
        return pow(a % self.p, e, self.p)

    def hinv(self, a: int) -> int:
        return pow(a % self.p, self.p - 2, self.p)


def _mul_full_u32(a: jnp.ndarray, b: jnp.ndarray):
    """Full 64-bit product of two uint32 arrays as (hi, lo) uint32 pairs,
    via 16-bit limb schoolbook. All partials stay < 2^32."""
    a0 = a & _MASK16
    a1 = a >> 16
    b0 = b & _MASK16
    b1 = b >> 16
    p00 = a0 * b0
    p01 = a0 * b1
    p10 = a1 * b0
    p11 = a1 * b1
    mid = (p00 >> 16) + (p01 & _MASK16) + (p10 & _MASK16)  # < 3*2^16
    lo = (p00 & _MASK16) | ((mid & _MASK16) << 16)
    hi = p11 + (p01 >> 16) + (p10 >> 16) + (mid >> 16)
    return hi, lo


@dataclasses.dataclass(frozen=True)
class MontField:
    """Montgomery-form field for odd p < 2^31 (R = 2^32).

    add/sub/neg are representation-agnostic; mul multiplies two
    Montgomery-form elements. Use encode()/decode() at the boundary, or
    mul_std() for occasional standard-form products.
    """
    params: FieldParams

    def __post_init__(self):
        p = self.p
        if p % 2 == 0 or p >= (1 << 31):
            raise ValueError("MontField requires odd p < 2^31")

    @property
    def p(self) -> int:
        return self.params.p

    # host-side precomputed constants
    @property
    def n_prime(self) -> int:
        # -p^{-1} mod 2^32
        return (-pow(self.p, -1, 1 << 32)) % (1 << 32)

    @property
    def r_mod_p(self) -> int:
        return (1 << 32) % self.p

    @property
    def r2_mod_p(self) -> int:
        return (1 << 64) % self.p

    # ---- representation ----
    def encode(self, a: jnp.ndarray) -> jnp.ndarray:
        """standard -> Montgomery form (a * R mod p)."""
        return self.mont_mul(_u32(a), _u32(self.r2_mod_p))

    def decode(self, a: jnp.ndarray) -> jnp.ndarray:
        """Montgomery -> standard form (a * R^{-1} mod p)."""
        return self.mont_mul(_u32(a), _u32(1))

    def const(self, v: int) -> jnp.ndarray:
        """Montgomery-form constant."""
        return _u32((v % self.p) * self.r_mod_p % self.p)

    def array(self, xs) -> jnp.ndarray:
        return jnp.asarray(self.encode_host(xs))

    def encode_host(self, xs):
        """Host-side (numpy uint64) Montgomery encoding — produces a plain
        constant instead of an encode-op chain in the traced graph (XLA's
        SPMD partitioner is catastrophically slow at folding those)."""
        import numpy as np
        std = np.mod(np.asarray(xs, dtype=np.int64), self.p).astype(np.uint64)
        return (std * np.uint64(self.r_mod_p) % np.uint64(self.p)).astype(
            np.uint32)

    def zeros(self, shape) -> jnp.ndarray:
        return jnp.zeros(shape, dtype=U32)

    def ones(self, shape=()) -> jnp.ndarray:
        # Montgomery form of 1 is R mod p
        return jnp.full(shape, jnp.uint32(self.r_mod_p), dtype=U32)

    # ---- arithmetic (inputs in Montgomery form, outputs in Montgomery form)
    def add(self, a, b):
        s = _u32(a) + _u32(b)
        return jnp.where(s >= self.p, s - jnp.uint32(self.p), s)

    def sub(self, a, b):
        a, b = _u32(a), _u32(b)
        d = a - b
        return jnp.where(a >= b, d, d + jnp.uint32(self.p))

    def neg(self, a):
        a = _u32(a)
        return jnp.where(a == 0, a, jnp.uint32(self.p) - a)

    def mont_mul(self, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
        """REDC(a*b): ~20 uint32 VPU ops, no 64-bit emulation."""
        p = jnp.uint32(self.p)
        hi, lo = _mul_full_u32(_u32(a), _u32(b))
        m = lo * jnp.uint32(self.n_prime)          # mod 2^32 wrap is intended
        mhi, mlo = _mul_full_u32(m, p)
        # lo + mlo == 0 mod 2^32 by construction; carry iff lo != 0
        carry = (lo != 0).astype(U32)
        t = hi + mhi + carry                       # < 2p, no overflow
        return jnp.where(t >= p, t - p, t)

    mul = mont_mul

    def square(self, a):
        return self.mont_mul(a, a)

    def pow_static(self, a: jnp.ndarray, e: int) -> jnp.ndarray:
        if e < 0:
            raise ValueError("negative exponent")
        r = jnp.broadcast_to(self.ones(), jnp.shape(a)).astype(U32)
        base = _u32(a)
        while e > 0:
            if e & 1:
                r = self.mul(r, base)
            e >>= 1
            if e:
                base = self.square(base)
        return r

    def pow(self, a: jnp.ndarray, e: jnp.ndarray, nbits: int = 32
            ) -> jnp.ndarray:
        e = jnp.asarray(e, dtype=U32)
        a = _u32(a)
        a, e = jnp.broadcast_arrays(a, e)

        def body(i, carry):
            r, base, ee = carry
            bit = (ee & 1).astype(jnp.bool_)
            r = jnp.where(bit, self.mul(r, base), r)
            return (r, self.square(base), ee >> 1)

        r0 = jnp.broadcast_to(self.ones(), a.shape).astype(U32)
        r, _, _ = jax.lax.fori_loop(0, nbits, body, (r0, a, e))
        return r

    def pow_static_rolled(self, a: jnp.ndarray, e: int) -> jnp.ndarray:
        """a^e for a static exponent as a ROLLED fori loop (compile-size
        friendly: the unrolled square-and-multiply inlines ~30 Montgomery
        muls (~1400 HLO) at every call site — ruinous inside scanned EC
        formulas). MSB-first over the exponent's bits."""
        if e <= 3:
            return self.pow_static(a, e)
        bits = jnp.asarray(
            [int(b) for b in bin(e)[3:]], dtype=jnp.uint32)
        a = _u32(a)

        def body(i, acc):
            acc = self.mont_mul(acc, acc)
            withx = self.mont_mul(acc, a)
            return jnp.where(bits[i] == 1, withx, acc)

        return jax.lax.fori_loop(0, bits.shape[0], body, a)

    def inv(self, a):
        return self.pow_static_rolled(a, self.p - 2)

    def div(self, a, b):
        return self.mul(a, self.inv(b))


def make_field(params: FieldParams):
    """Pick the strategy for a modulus: direct for tiny fields, Montgomery
    otherwise."""
    if params.p <= 0xFFFF:
        return Field(params)
    return MontField(params)
