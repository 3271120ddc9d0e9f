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


# ---- whole-limb-axis carry machinery ----
#
# XLA's CPU backend compiles data-movement ops (slice/concat/pad/roll)
# ~50x slower than elementwise ops (measured: 192 roll-adds 10.9 s vs
# 192 pure adds 0.17 s), and a small dot_general ~10x faster than a roll.
# The per-limb sliced carry chains the first version of this module used
# (~35 movement ops per modular add) made big graphs — the BN254 pairing
# above all — take tens of MINUTES to compile. Everything below therefore
# runs on the whole limb axis: Kogge-Stone carry propagation with log2(L)
# shift steps, where the limb shift is a tiny constant-matrix dot_general
# on CPU (compile-friendly) and a pad+slice on accelerators (a free fused
# data movement at runtime).


@functools.lru_cache(maxsize=None)
def _shift_mat(L: int, d: int):
    return np.eye(L, k=d, dtype=np.int32)


def _shift_up(x: jnp.ndarray, d: int) -> jnp.ndarray:
    """out[..., k] = x[..., k-d] (zero fill below); limb axis is last."""
    import os
    L = x.shape[-1]
    if d >= L:
        return jnp.zeros_like(x)
    mode = os.environ.get("PLONK_TPU_SHIFT", "")
    if mode == "pad":
        pad = [(0, 0)] * (x.ndim - 1) + [(d, 0)]
        return jnp.pad(x, pad)[..., :L]
    if jax.default_backend() == "cpu":
        S = jnp.asarray(_shift_mat(L, d))
        y = jax.lax.dot_general(x.astype(jnp.int32), S,
                                (((x.ndim - 1,), (0,)), ((), ())),
                                preferred_element_type=jnp.int32)
        return y.astype(U32)
    pad = [(0, 0)] * (x.ndim - 1) + [(d, 0)]
    return jnp.pad(x, pad)[..., :L]


def _fold1(s: jnp.ndarray) -> jnp.ndarray:
    """One non-propagating carry fold: limbs < 2^32 -> limbs <
    0xFFFF + (max_limb >> 16). Top-limb carry must be provably zero
    (value fits the register) — callers guarantee it."""
    return (s & _MASK) + _shift_up(s >> _W, 1)


@functools.lru_cache(maxsize=None)
def _colsum_mat(L: int, out_limbs: int) -> np.ndarray:
    """(2L^2, out_limbs) 0/1 matrix summing flattened lo|hi partial
    products onto their anti-diagonal columns (hi lands one higher);
    out_limbs < 2L truncates mod 2^(16*out_limbs)."""
    M = np.zeros((2 * L * L, out_limbs), np.int32)
    for i in range(L):
        for j in range(L):
            c = i + j
            if c < out_limbs:
                M[i * L + j, c] = 1
            if c + 1 < out_limbs:
                M[L * L + i * L + j, c + 1] = 1
    return M


def _ks_prop(s: jnp.ndarray):
    """Exact carry propagation of limbs <= 0x1FFFE (carries 0/1) via a
    Kogge-Stone generate/propagate scan: log2(L) shift steps instead of
    an L-deep sliced ripple chain. Returns (lo16, carry_out)."""
    L = s.shape[-1]
    lo = s & _MASK
    g = s >> _W                                   # carry generate (0/1)
    p = (lo == _MASK).astype(U32)                 # carry propagate
    d = 1
    while d < L:
        g = g | (p & _shift_up(g, d))
        p = p & _shift_up(p, d)
        d *= 2
    cin = _shift_up(g, 1)
    return (lo + cin) & _MASK, g[..., L - 1]


@dataclasses.dataclass(frozen=True)
class BigMontField:
    """Montgomery-form field over p with R = 2^(16*limbs).

    `rolled=True` switches mont_mul to the compact vectorized kernel
    (mont_mul_vec): whole-limb-axis ops instead of per-word scalar
    slices, ~10x fewer HLO ops per multiply and ZERO control flow.
    Required inside graphs that already contain hundreds of multiplies,
    e.g. the pairing's Miller scan body (ops/bigpairing.py) — a
    fori_loop-per-multiply variant was tried first and made XLA compile
    time explode superlinearly in the number of while loops (a single
    Fq6 mul took >6 min on the CPU backend)."""
    params: FieldParams
    limbs: int = 0  # 0 -> derived from p
    rolled: bool = False

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
    @functools.cached_property
    def _rp_words(self) -> np.ndarray:
        """R - p: adding it == subtracting p mod R; the carry-out of the
        sum is the s >= p flag (replaces lexicographic compare)."""
        return _to_words(self.R - self.p, self.limbs)

    @functools.cached_property
    def _e0_words(self) -> np.ndarray:
        e0 = np.zeros(self.limbs, dtype=np.uint32)
        e0[0] = 1
        return e0

    def _csub_p(self, s: jnp.ndarray) -> jnp.ndarray:
        """s in [0, 2p) with exact 16-bit limbs -> s mod p."""
        d, ge = _ks_prop(s + jnp.asarray(self._rp_words))
        return jnp.where((ge == 1)[..., None], d, s)

    # ---- arithmetic (Montgomery form in, Montgomery form out) ----
    def add(self, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
        a, b = jnp.broadcast_arrays(a, b)
        s, _ = _ks_prop(a + b)        # a+b < 2p < R: no overflow
        return self._csub_p(s)

    def sub(self, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
        a, b = jnp.broadcast_arrays(a, b)
        # a - b = a + ~b + 1 mod R; carry-out <=> a >= b
        raw = a + (_MASK - b) + jnp.asarray(self._e0_words)
        d, ge = _ks_prop(raw)
        d2, _ = _ks_prop(d + jnp.asarray(self._p_words))   # wraps mod R
        return jnp.where((ge == 1)[..., None], d, d2)

    def neg(self, a: jnp.ndarray) -> jnp.ndarray:
        return self.sub(jnp.zeros_like(a), a)

    def is_zero(self, a: jnp.ndarray) -> jnp.ndarray:
        return jnp.all(a == 0, axis=-1)

    def eq(self, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
        return jnp.all(a == b, axis=-1)

    def mont_mul(self, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
        """CIOS Montgomery product with 16-bit words; fully unrolled limb
        loops (static), elementwise over any batch shape."""
        if self.rolled:
            return self.mont_mul_vec(a, b)
        return self._mont_mul_unrolled(a, b)

    def _mont_mul_unrolled(self, a: jnp.ndarray, b: jnp.ndarray
                           ) -> jnp.ndarray:
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
        # r + tN*2^(16L) < 2p; fold the top bit into the conditional
        # subtract (when tN == 1 the mod-R wrap absorbs the borrow)
        d, ge = _ks_prop(r + jnp.asarray(self._rp_words))
        need = (tN != 0) | (ge == 1)
        return jnp.where(need[..., None], d, r)

    @functools.cached_property
    def _nprime_words(self) -> np.ndarray:
        """-p^{-1} mod R (full-width REDC factor)."""
        return _to_words((-pow(self.p, -1, self.R)) % self.R, self.limbs)

    def _full_product_cols(self, a: jnp.ndarray, b: jnp.ndarray,
                           out_limbs: int) -> jnp.ndarray:
        """Anti-diagonal column sums of the LxL 16-bit partial-product
        tensor. Columns < 2L*2^16 <= 2^21 — relaxed, no carries.
        out_limbs < 2L truncates (mod 2^(16*out_limbs)).

        Two lowerings, bit-identical results:
        - CPU: ONE dot_general with a constant 0/1 matrix (XLA CPU
          compiles a dot ~10x faster than the equivalent pad/concat
          chain; see module header).
        - accelerators: schoolbook shifted accumulation — the dot path
          materializes a (..., L, L) partial-product tensor per multiply
          (~8x the operand bytes of HBM traffic; at 2^12-gate commit
          trees it crashed the remote compile outright, round 4), while
          L shifted multiply-adds keep every temporary operand-sized."""
        import os
        L = self.limbs
        mode = os.environ.get("PLONK_TPU_BIGMUL", "auto")
        use_dot = (jax.default_backend() == "cpu" if mode == "auto"
                   else mode == "dot")
        if use_dot:
            P = a[..., :, None] * b[..., None, :]    # (..., L, L) < 2^32
            both = jnp.concatenate(
                [(P & _MASK).reshape(P.shape[:-2] + (L * L,)),
                 (P >> _W).reshape(P.shape[:-2] + (L * L,))], axis=-1)
            M = jnp.asarray(_colsum_mat(L, out_limbs))
            cols = jax.lax.dot_general(both.astype(jnp.int32), M,
                                       (((both.ndim - 1,), (0,)), ((), ())),
                                       preferred_element_type=jnp.int32)
            return cols.astype(U32)

        def place(x, d):
            # x's limbs at offset d of an out_limbs buffer (trailing axis)
            keep = min(x.shape[-1], out_limbs - d)
            if keep <= 0:
                return None
            if keep < x.shape[-1]:
                x = x[..., :keep]
            pad = [(0, 0)] * (x.ndim - 1) + [(d, out_limbs - d - keep)]
            return jnp.pad(x, pad)

        acc = jnp.zeros(jnp.broadcast_shapes(a.shape, b.shape)[:-1]
                        + (out_limbs,), U32)
        for i in range(L):
            prod = a[..., i:i + 1] * b               # (..., L) < 2^32
            lo = place(prod & _MASK, i)
            if lo is not None:
                acc = acc + lo
            hi = place(prod >> _W, i + 1)
            if hi is not None:
                acc = acc + hi
        return acc

    def mont_mul_vec(self, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
        """Montgomery product as full-width REDC on the whole limb axis:
        T = a*b (one outer product + one column-sum dot), m = T*n' mod R
        (outer product with the constant n' words), result =
        (T + m*p) / R, then one conditional subtract. Every carry chain
        is a log2-depth Kogge-Stone pass — zero per-limb slicing, which
        is what keeps graphs with hundreds of multiplies (the BN254
        pairing, ops/bigpairing.py) compilable on the CPU test backend.
        Bit-identical to _mont_mul_unrolled (same R, canonical output)."""
        a, b = jnp.broadcast_arrays(a, b)
        L = self.limbs
        T, _ = _ks_prop(_fold1(self._full_product_cols(a, b, 2 * L)))
        m, _ = _ks_prop(_fold1(self._full_product_cols(
            T[..., :L], jnp.asarray(self._nprime_words), L)))
        mp = self._full_product_cols(m, jnp.asarray(self._p_words), 2 * L)
        V, _ = _ks_prop(_fold1(T + mp))              # T + m*p < 2Rp < R^2
        r = V[..., L:]                               # exact division by R
        return self._csub_p(r)                       # r < 2p

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
