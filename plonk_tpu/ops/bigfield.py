"""Multi-limb Montgomery field arithmetic for 64..384-bit moduli.

Generalizes ops/field.py's single-word MontField (p < 2^31) to the
limb-based design promised in SURVEY §7 step 2: one parameterized kernel
family whose modulus is data, serving real pairing-curve fields
(BN254-Fr/Fq, BLS12-381-Fr) on TPU integer lanes.

Representation: an element is a uint32 array with a TRAILING limb axis of
`limbs` 16-bit words, little-endian (each u32 lane holds one 16-bit word).
16-bit words keep every partial product of the CIOS Montgomery multiply
exact in uint32 (16x16 -> 32) with carry chains that provably never
overflow: the inner-step value t + a_i*b_j + c is at most
(2^16-1) + (2^16-1)^2 + (2^16-1) = 2^32 - 1.

All kernels are elementwise over any batch shape, so a whole vector of
254-bit field elements is one fused VPU op stream; the per-mul cost is
O(limbs^2) u32 ops with a static (unrolled) limb loop.

Reference lineage: the reference hardcodes two 8-bit toy fields
(src/hf.h:9, src/gf.h:8); this module is the scale-out of the same "field
as parameter" design to production-size moduli (BASELINE.md).
"""
from __future__ import annotations

import dataclasses
import functools

import numpy as np
import jax
import jax.numpy as jnp

from ..utils.params import FieldParams

U32 = jnp.uint32
_MASK = jnp.uint32(0xFFFF)
_W = 16                      # word width in bits


def _to_words(v: int, limbs: int) -> np.ndarray:
    return np.array([(v >> (_W * k)) & 0xFFFF for k in range(limbs)],
                    dtype=np.uint32)


@dataclasses.dataclass(frozen=True)
class BigMontField:
    """Montgomery-form field over p with R = 2^(16*limbs)."""
    params: FieldParams
    limbs: int = 0  # 0 -> derived from p

    def __post_init__(self):
        L = self.limbs or -(-self.p.bit_length() // _W)
        if self.p.bit_length() == _W * L:
            L += 1  # keep a spare bit so a+b < 2p never overflows R
        object.__setattr__(self, "limbs", L)
        if self.p % 2 == 0:
            raise ValueError("BigMontField requires odd p")
        if self.p.bit_length() >= _W * L:
            raise ValueError("modulus does not fit the limb count")

    @property
    def p(self) -> int:
        return self.params.p

    @property
    def R(self) -> int:
        return 1 << (_W * self.limbs)

    @functools.cached_property
    def n_prime0(self) -> int:
        """-p^{-1} mod 2^16 (per-word Montgomery factor)."""
        return (-pow(self.p, -1, 1 << _W)) % (1 << _W)

    @functools.cached_property
    def _p_words(self) -> np.ndarray:
        return _to_words(self.p, self.limbs)

    # ---- host-side encoding ----
    def encode_host(self, xs) -> np.ndarray:
        """python ints / numpy -> Montgomery-form limb array (host)."""
        arr = np.asarray(xs, dtype=object).reshape(-1)
        R, p = self.R, self.p
        out = np.empty((arr.shape[0], self.limbs), dtype=np.uint32)
        for i, v in enumerate(arr):
            out[i] = _to_words((int(v) % p) * R % p, self.limbs)
        return out.reshape(np.shape(xs) + (self.limbs,))

    def decode_host(self, words) -> np.ndarray:
        """Montgomery-form limb array -> python-int numpy array (host)."""
        a = np.asarray(words, dtype=np.uint64)
        flat = a.reshape(-1, self.limbs)
        Rinv = pow(self.R, -1, self.p)
        out = np.empty(flat.shape[0], dtype=object)
        for i, ws in enumerate(flat):
            v = 0
            for k in range(self.limbs - 1, -1, -1):
                v = (v << _W) | int(ws[k])
            out[i] = (v * Rinv) % self.p
        return out.reshape(np.shape(words)[:-1])

    def array(self, xs) -> jnp.ndarray:
        return jnp.asarray(self.encode_host(xs))

    def const(self, v: int) -> jnp.ndarray:
        return jnp.asarray(_to_words((v % self.p) * self.R % self.p,
                                     self.limbs))

    def zeros(self, shape=()) -> jnp.ndarray:
        return jnp.zeros(tuple(shape) + (self.limbs,), U32)

    def ones(self, shape=()) -> jnp.ndarray:
        one = self.const(1)
        return jnp.broadcast_to(one, tuple(shape) + (self.limbs,))

    # ---- limb helpers (device) ----
    def _ge_p(self, a: jnp.ndarray) -> jnp.ndarray:
        """a >= p, lexicographic from the top limb (shape (...,))."""
        pw = self._p_words
        ge = jnp.ones(a.shape[:-1], jnp.bool_)
        decided = jnp.zeros(a.shape[:-1], jnp.bool_)
        for k in range(self.limbs - 1, -1, -1):
            w = a[..., k]
            pk = jnp.uint32(int(pw[k]))
            gt = w > pk
            lt = w < pk
            ge = jnp.where(~decided & gt, True, jnp.where(~decided & lt,
                                                          False, ge))
            decided = decided | gt | lt
        return ge

    def _sub_p(self, a: jnp.ndarray) -> jnp.ndarray:
        pw = self._p_words
        out = []
        borrow = jnp.zeros(a.shape[:-1], U32)
        for k in range(self.limbs):
            d = a[..., k] - jnp.uint32(int(pw[k])) - borrow
            borrow = (d >> 31) & 1  # 16-bit words: underflow sets high bits
            out.append(d & _MASK)
        return jnp.stack(out, axis=-1)

    def _add_p(self, a: jnp.ndarray) -> jnp.ndarray:
        pw = self._p_words
        out = []
        carry = jnp.zeros(a.shape[:-1], U32)
        for k in range(self.limbs):
            s = a[..., k] + jnp.uint32(int(pw[k])) + carry
            carry = s >> _W
            out.append(s & _MASK)
        return jnp.stack(out, axis=-1)

    # ---- arithmetic (Montgomery form in, Montgomery form out) ----
    def add(self, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
        a, b = jnp.broadcast_arrays(a, b)
        out = []
        carry = jnp.zeros(a.shape[:-1], U32)
        for k in range(self.limbs):
            s = a[..., k] + b[..., k] + carry
            carry = s >> _W
            out.append(s & _MASK)
        s = jnp.stack(out, axis=-1)
        need = self._ge_p(s)
        return jnp.where(need[..., None], self._sub_p(s), s)

    def sub(self, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
        a, b = jnp.broadcast_arrays(a, b)
        out = []
        borrow = jnp.zeros(a.shape[:-1], U32)
        for k in range(self.limbs):
            d = a[..., k] - b[..., k] - borrow
            borrow = (d >> 31) & 1
            out.append(d & _MASK)
        d = jnp.stack(out, axis=-1)
        return jnp.where((borrow != 0)[..., None], self._add_p(d), d)

    def neg(self, a: jnp.ndarray) -> jnp.ndarray:
        return self.sub(jnp.zeros_like(a), a)

    def is_zero(self, a: jnp.ndarray) -> jnp.ndarray:
        return jnp.all(a == 0, axis=-1)

    def eq(self, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
        return jnp.all(a == b, axis=-1)

    def mont_mul(self, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
        """CIOS Montgomery product with 16-bit words; fully unrolled limb
        loops (static), elementwise over any batch shape."""
        a, b = jnp.broadcast_arrays(a, b)
        L = self.limbs
        pw = [jnp.uint32(int(w)) for w in self._p_words]
        np0 = jnp.uint32(self.n_prime0)
        shape = a.shape[:-1]
        t = [jnp.zeros(shape, U32) for _ in range(L)]
        tN = jnp.zeros(shape, U32)
        tN1 = jnp.zeros(shape, U32)
        for i in range(L):
            ai = a[..., i]
            c = jnp.zeros(shape, U32)
            for j in range(L):
                s = t[j] + ai * b[..., j] + c
                t[j] = s & _MASK
                c = s >> _W
            s = tN + c
            tN = s & _MASK
            tN1 = s >> _W
            m = (t[0] * np0) & _MASK
            c = (t[0] + m * pw[0]) >> _W
            for j in range(1, L):
                s = t[j] + m * pw[j] + c
                t[j - 1] = s & _MASK
                c = s >> _W
            s = tN + c
            t[L - 1] = s & _MASK
            tN = tN1 + (s >> _W)
        r = jnp.stack(t, axis=-1)
        # r + tN*2^(16L) < 2p; fold the top bit into the conditional subtract
        need = (tN != 0) | self._ge_p(r)
        fixed = self._sub_p(r)
        # when tN == 1 the subtraction's missing borrow is absorbed by it
        return jnp.where(need[..., None], fixed, r)

    mul = mont_mul

    def square(self, a):
        return self.mont_mul(a, a)

    def encode(self, a: jnp.ndarray) -> jnp.ndarray:
        """standard-form limbs -> Montgomery form."""
        r2 = jnp.asarray(_to_words(self.R * self.R % self.p, self.limbs))
        return self.mont_mul(a, r2)

    def decode(self, a: jnp.ndarray) -> jnp.ndarray:
        one = jnp.zeros((self.limbs,), U32).at[0].set(1)
        return self.mont_mul(a, one)

    # ---- exponentiation / inverse ----
    def pow_static(self, a: jnp.ndarray, e: int) -> jnp.ndarray:
        if e < 0:
            raise ValueError("negative exponent")
        r = jnp.broadcast_to(self.const(1), a.shape)
        base = a
        while e > 0:
            if e & 1:
                r = self.mont_mul(r, base)
            e >>= 1
            if e:
                base = self.square(base)
        return r

    def pow_static_rolled(self, a: jnp.ndarray, e: int) -> jnp.ndarray:
        """MSB-first square-and-multiply as a rolled fori_loop over the
        exponent's bit table (an unrolled chain would inline hundreds of
        CIOS bodies — ops/field.py:300 rationale, amplified 16x here)."""
        if e <= 3:
            return self.pow_static(a, e)
        bits = jnp.asarray([int(b) for b in bin(e)[3:]], dtype=U32)

        def body(i, acc):
            acc = self.mont_mul(acc, acc)
            withx = self.mont_mul(acc, a)
            return jnp.where((bits[i] == 1)[..., None], withx, acc)

        return jax.lax.fori_loop(0, bits.shape[0], body, a)

    def inv(self, a: jnp.ndarray) -> jnp.ndarray:
        """Fermat inverse; inv(0) = 0 (0^(p-2) = 0), matching the
        reference's division convention (src/hf.h:201-203)."""
        return self.pow_static_rolled(a, self.p - 2)

    def div(self, a, b):
        return self.mont_mul(a, self.inv(b))


# ---- big-field NTT (limb-aware; simple reshape-butterfly layout) ----

@functools.lru_cache(maxsize=None)
def _twiddle_words(p: int, w: int, n: int, limbs: int):
    tw = []
    cur = 1
    R = 1 << (_W * limbs)
    for _ in range(n // 2):
        tw.append(cur * R % p)
        cur = (cur * w) % p
    out = np.empty((n // 2, limbs), dtype=np.uint32)
    for i, v in enumerate(tw):
        out[i] = _to_words(v, limbs)
    return out


def big_ntt(F: BigMontField, x: jnp.ndarray, w: int) -> jnp.ndarray:
    """Forward NTT over a BigMontField. x: (..., n, limbs) Montgomery-form;
    returns the same shape. Iterative DIT, element axis -2."""
    n = x.shape[-2]
    if n & (n - 1):
        raise ValueError("NTT size must be a power of two")
    if n == 1:
        return x
    if pow(w, n, F.p) != 1 or pow(w, n // 2, F.p) == 1:
        raise ValueError(f"{w} is not a primitive order-{n} root mod {F.p}")
    from .ntt import _bit_reverse_perm
    tw_all = jnp.asarray(_twiddle_words(F.p, w, n, F.limbs))
    y = x[..., jnp.asarray(_bit_reverse_perm(n)), :]
    half = 1
    while half < n:
        stride = n // (2 * half)
        tw = tw_all[::stride][:half]
        shape = y.shape[:-2] + (n // (2 * half), 2, half, F.limbs)
        yv = y.reshape(shape)
        even = yv[..., 0, :, :]
        odd = F.mont_mul(yv[..., 1, :, :], tw)
        y = jnp.concatenate([F.add(even, odd), F.sub(even, odd)],
                            axis=-2).reshape(y.shape[:-2] + (n, F.limbs))
        half *= 2
    return y


def big_intt(F: BigMontField, x: jnp.ndarray, w: int) -> jnp.ndarray:
    n = x.shape[-2]
    y = big_ntt(F, x, pow(w, -1, F.p))
    return F.mont_mul(y, F.const(pow(n, -1, F.p)))
