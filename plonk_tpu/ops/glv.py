"""GLV endomorphism scalar decomposition for BN254 G1 MSM.

BN254 has CM discriminant -3, so G1 carries the efficient endomorphism
phi(x, y) = (beta*x, y) with phi(P) = lam*P, where beta is a primitive
cube root of unity in Fq and lam the matching cube root of unity mod r.
Splitting each 254-bit scalar k = k1 + k2*lam (|ki| ~ 2^128) and doubling
the point set with phi(P) halves the Pippenger window count: same bucket
work per window, ~2x fewer windows -> ~1.9x less EC work per MSM
(DESIGN.md §8 item 3; reference counterpart src/srs.h:53-68 has no MSM
at all — this is on the performance-extension axis).

Everything derived, nothing hardcoded: beta/lam come from Tonelli-Shanks
square roots of -3 (the matching pair is picked by checking
phi(G) == lam*G on a python-int curve oracle at import), the short
lattice basis from the extended Euclidean algorithm on (r, lam), and the
device decomposition uses Barrett-style multiply-high by precomputed
floor(|b_i|*2^S/r) constants — the +-1 rounding slack only widens the
ki bound by one bit, which the window count absorbs.

Device arithmetic: the decomposition runs on (L, 16)-word scalars with
the same whole-limb-axis carry machinery as ops/bigfield.py (Kogge-Stone
propagation, column-sum dot_generals) — no per-limb slicing, so the
graphs stay compilable on the XLA:CPU test backend.

Parity: tests/test_glv.py (python-int decomposition oracle, phi/lam
consistency, GLV MSM == plain Pippenger).
"""
from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from .bigfield import (BigMontField, _ks_prop, _fold1, _shift_up,
                       _to_words, _MASK, _W)
from . import bigcurve as BC
from ..utils.params import BN254_FR

U32 = jnp.uint32


# ---------------- host constant derivation ----------------


def _sqrt_mod(a: int, p: int) -> int:
    """Tonelli-Shanks (general p); assumes a is a QR mod p."""
    a %= p
    if p % 4 == 3:
        return pow(a, (p + 1) // 4, p)
    q, s = p - 1, 0
    while q % 2 == 0:
        q //= 2
        s += 1
    z = 2
    while pow(z, (p - 1) // 2, p) != p - 1:
        z += 1
    m, c, t, r = s, pow(z, q, p), pow(a, q, p), pow(a, (q + 1) // 2, p)
    while t != 1:
        t2, i = t, 0
        while t2 != 1:
            t2 = (t2 * t2) % p
            i += 1
        b = pow(c, 1 << (m - i - 1), p)
        m, c = i, (b * b) % p
        t, r = (t * c) % p, (r * b) % p
    return r


def _cube_roots_of_unity(p: int):
    """The two primitive cube roots of unity mod p (p = 1 mod 3)."""
    s = _sqrt_mod(p - 3, p)                      # sqrt(-3)
    w1 = ((-1 + s) * pow(2, -1, p)) % p
    return w1, (w1 * w1) % p


class _HostG1:
    """Tiny python-int affine oracle on y^2 = x^3 + 3 over Fq (only for
    picking the matching (beta, lam) pair at import)."""

    def __init__(self, q: int):
        self.q = q

    def add(self, P, Q):
        q = self.q
        if P is None:
            return Q
        if Q is None:
            return P
        x1, y1 = P
        x2, y2 = Q
        if x1 == x2 and (y1 + y2) % q == 0:
            return None
        if P == Q:
            lam = 3 * x1 * x1 * pow(2 * y1, -1, q) % q
        else:
            lam = (y2 - y1) * pow(x2 - x1, -1, q) % q
        x3 = (lam * lam - x1 - x2) % q
        return x3, (lam * (x1 - x3) - y1) % q

    def mul(self, P, k):
        acc = None
        while k:
            if k & 1:
                acc = self.add(acc, P)
            P = self.add(P, P)
            k >>= 1
        return acc


@functools.lru_cache(maxsize=None)
def glv_constants():
    """(beta, lam, basis) with basis = ((a1, b1), (a2, b2)) short vectors
    of the lattice {(x, y): x + y*lam = 0 mod r}; signed python ints."""
    q, r = BC.BN254_FQ.p, BN254_FR.p
    betas = _cube_roots_of_unity(q)
    lams = _cube_roots_of_unity(r)
    curve = _HostG1(q)
    G = BC.BN254_G1_GEN
    beta_lam = None
    for beta in betas:
        for lam in lams:
            if curve.mul(G, lam) == ((beta * G[0]) % q, G[1]):
                beta_lam = (beta, lam)
    assert beta_lam is not None, "no matching (beta, lam) pair"
    beta, lam = beta_lam

    # EEA on (r, lam): rows (r_i, t_i) with s_i*r + t_i*lam = r_i ->
    # (r_i, -t_i) is a lattice vector. Take the first remainder below
    # sqrt(r) and its predecessor's successor pair (Guide to ECC 3.74).
    rows = [(r, 0), (lam, 1)]
    while rows[-1][0] != 0:
        q_i = rows[-2][0] // rows[-1][0]
        rows.append((rows[-2][0] - q_i * rows[-1][0],
                     rows[-2][1] - q_i * rows[-1][1]))
    sqrt_r = int(r ** 0.5) + 1
    m = next(i for i, (ri, _) in enumerate(rows) if ri < sqrt_r)
    a1, b1 = rows[m][0], -rows[m][1]
    # the shorter of the two neighbours for v2
    c_a, c_b = rows[m - 1][0], -rows[m - 1][1]
    d_a, d_b = rows[m + 1][0], -rows[m + 1][1]
    if c_a * c_a + c_b * c_b <= d_a * d_a + d_b * d_b:
        a2, b2 = c_a, c_b
    else:
        a2, b2 = d_a, d_b
    for (x, y) in ((a1, b1), (a2, b2)):
        assert (x + y * lam) % r == 0
    return beta, lam, ((a1, b1), (a2, b2))


_S_BITS = 272                      # 17 words; >= 254 + guard for rounding
_KL = 9                           # |ki| < 2^130 -> 9 words


@functools.lru_cache(maxsize=None)
def _decomp_consts():
    """Unsigned magnitudes + signs for the device decomposition."""
    _, lam, ((a1, b1), (a2, b2)) = glv_constants()
    r = BN254_FR.p
    # solving (k, 0) = c1*(a1, b1) + c2*(a2, b2) over Q gives
    # c1 = b2*k/D, c2 = -b1*k/D with D = a1*b2 - a2*b1 = +-r — the
    # determinant's sign must fold into the ci signs. Device computes
    # ci = (k*gi + 2^(S-1)) >> S with gi = floor(|coef|*2^S/r) and
    # applies the sign to the correction terms instead
    D = a1 * b2 - a2 * b1
    assert abs(D) == r, "EEA basis determinant must be +-r"
    sD = 1 if D > 0 else -1
    g1 = (abs(b2) << _S_BITS) // r
    g2 = (abs(b1) << _S_BITS) // r
    return dict(
        lam=lam,
        g1=g1, s_c1=(1 if b2 >= 0 else -1) * sD,
        g2=g2, s_c2=(-1 if b1 >= 0 else 1) * sD,
        a1=abs(a1), s_a1=1 if a1 >= 0 else -1,
        b1=abs(b1), s_b1=1 if b1 >= 0 else -1,
        a2=abs(a2), s_a2=1 if a2 >= 0 else -1,
        b2=abs(b2), s_b2=1 if b2 >= 0 else -1,
    )


def glv_decompose_host(k: int):
    """Python-int oracle: k -> (k1, k2) signed with k1 + k2*lam = k
    (mod r), matching the device rounding exactly."""
    C = _decomp_consts()
    half = 1 << (_S_BITS - 1)
    c1 = ((k * C["g1"] + half) >> _S_BITS) * C["s_c1"]
    c2 = ((k * C["g2"] + half) >> _S_BITS) * C["s_c2"]
    a1 = C["a1"] * C["s_a1"]
    b1 = C["b1"] * C["s_b1"]
    a2 = C["a2"] * C["s_a2"]
    b2 = C["b2"] * C["s_b2"]
    k1 = k - c1 * a1 - c2 * a2
    k2 = -c1 * b1 - c2 * b2
    return k1, k2


# ---------------- device decomposition ----------------
#
# All values are unsigned word vectors; signs are boolean masks. The
# wide products use rectangular column-sum dot_generals (the
# bigfield._full_product_cols pattern, generalized to La x Lb).


@functools.lru_cache(maxsize=None)
def _colsum_rect(La: int, Lb: int, out_limbs: int) -> np.ndarray:
    M = np.zeros((2 * La * Lb, out_limbs), np.int32)
    for i in range(La):
        for j in range(Lb):
            c = i + j
            if c < out_limbs:
                M[i * Lb + j, c] = 1
            if c + 1 < out_limbs:
                M[La * Lb + i * Lb + j, c + 1] = 1
    return M


def _wide_mul(a: jnp.ndarray, b_words: np.ndarray,
              out_limbs: int) -> jnp.ndarray:
    """(..., La) x constant (Lb,) -> (..., out_limbs) exact product words
    (truncated mod 2^(16*out_limbs))."""
    La = a.shape[-1]
    Lb = b_words.shape[0]
    b = jnp.asarray(b_words.astype(np.uint32))
    P = a[..., :, None] * b[None, :]               # (..., La, Lb) < 2^32
    both = jnp.concatenate(
        [(P & _MASK).reshape(P.shape[:-2] + (La * Lb,)),
         (P >> _W).reshape(P.shape[:-2] + (La * Lb,))], axis=-1)
    M = jnp.asarray(_colsum_rect(La, Lb, out_limbs))
    cols = jax.lax.dot_general(both.astype(jnp.int32), M,
                               (((both.ndim - 1,), (0,)), ((), ())),
                               preferred_element_type=jnp.int32)
    out, _ = _ks_prop(_fold1(cols.astype(U32)))
    return out


def _words_const(v: int, limbs: int) -> np.ndarray:
    return _to_words(int(v), limbs)


def _sub_words(a: jnp.ndarray, b: jnp.ndarray):
    """(a - b) mod 2^(16L) plus an a >= b flag (exact words in/out)."""
    L = a.shape[-1]
    e0 = np.zeros(L, np.uint32)
    e0[0] = 1
    raw = a + (_MASK - b) + jnp.asarray(e0)
    d, ge = _ks_prop(raw)
    return d, ge == 1


def _add_words(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    s, _ = _ks_prop(a + b)
    return s


def glv_decompose(scalar_words: jnp.ndarray):
    """(L, 16) standard-form scalar words -> (k1_words, k1_neg, k2_words,
    k2_neg): unsigned (L, _KL)-word magnitudes + sign masks with
    k1 + k2*lam = k (mod r). Matches glv_decompose_host bit for bit."""
    C = _decomp_consts()
    S_words = _S_BITS // _W                        # 17
    wide = S_words + 16                            # enough for k*gi
    half = np.zeros(wide, np.uint32)
    half[S_words - 1] = 0x8000
    g1w = _words_const(C["g1"], S_words + 1)
    g2w = _words_const(C["g2"], S_words + 1)

    def mul_high(k, gw):
        prod = _wide_mul(k, gw, wide)
        rounded = _add_words(prod, jnp.asarray(half))
        return rounded[..., S_words:S_words + _KL]  # >> S (word-aligned)

    k = scalar_words
    c1 = mul_high(k, g1w)                          # (L, _KL), unsigned
    c2 = mul_high(k, g2w)

    # k1 = k - (s_c1*c1*a1_signed + s_c2*c2*a2_signed): collect the two
    # correction terms into positive/negative buckets by total sign
    KW = 17                                        # working width
    kw = jnp.concatenate(
        [k, jnp.zeros(k.shape[:-1] + (KW - k.shape[-1],), U32)], axis=-1)

    def corr(c, coef_mag, sign_total):
        t = _wide_mul(c, _words_const(coef_mag, 17), KW)
        return t, sign_total

    t1a, s1a = corr(c1, C["a1"], C["s_c1"] * C["s_a1"])
    t2a, s2a = corr(c2, C["a2"], C["s_c2"] * C["s_a2"])
    t1b, s1b = corr(c1, C["b1"], C["s_c1"] * C["s_b1"])
    t2b, s2b = corr(c2, C["b2"], C["s_c2"] * C["s_b2"])

    def signed_sum(base, base_neg, terms):
        """base (words, neg-flag) minus sum of signed terms, two's-
        complement style over KW words: accumulate pos and neg piles,
        subtract, fix sign."""
        pos = base if not base_neg else jnp.zeros_like(base)
        neg = base if base_neg else jnp.zeros_like(base)
        for t, s in terms:
            if s > 0:                              # subtracted positive
                neg = _add_words(neg, t)
            else:                                  # subtracted negative
                pos = _add_words(pos, t)
        d, ge = _sub_words(pos, neg)
        dneg, _ = _sub_words(neg, pos)
        mag = jnp.where(ge[..., None], d, dneg)
        return mag[..., :_KL], ~ge

    k1_mag, k1_neg = signed_sum(kw, False, [(t1a, s1a), (t2a, s2a)])
    zero = jnp.zeros_like(kw)
    k2_mag, k2_neg = signed_sum(zero, False, [(t1b, s1b), (t2b, s2b)])
    return k1_mag, k1_neg, k2_mag, k2_neg


# ---------------- GLV MSM ----------------


def glv_split_points(F: BigMontField, pts: BC.BigG1J,
                     k1_neg: jnp.ndarray, k2_neg: jnp.ndarray
                     ) -> BC.BigG1J:
    """[P_i | phi(P_i)] with per-point negation folded in (negative
    sub-scalar -> negate the point: Y -> -Y)."""
    beta, _, _ = glv_constants()
    beta_m = F.const(beta)
    phiX = F.mont_mul(pts.X, jnp.broadcast_to(beta_m, pts.X.shape))
    y1 = jnp.where(k1_neg[..., None], F.neg(pts.Y), pts.Y)
    y2 = jnp.where(k2_neg[..., None], F.neg(pts.Y), pts.Y)
    return BC.BigG1J(
        X=jnp.concatenate([pts.X, phiX]),
        Y=jnp.concatenate([y1, y2]),
        Z=jnp.concatenate([pts.Z, pts.Z]))


def big_msm_glv(F: BigMontField, pts: BC.BigG1J,
                scalar_words: jnp.ndarray, window_bits: int = 8
                ) -> BC.BigG1J:
    """GLV-accelerated Pippenger MSM: decompose, double the points with
    the endomorphism, run the bucket MSM over ~131-bit sub-scalars —
    half the windows of the plain 254-bit walk. Group-identical output
    to big_msm_pippenger (asserted in tests/test_glv.py)."""
    k1_mag, k1_neg, k2_mag, k2_neg = glv_decompose(scalar_words)
    pts2 = glv_split_points(F, pts, k1_neg, k2_neg)
    pad = jnp.zeros(k1_mag.shape[:-1] + (16 - _KL,), U32)
    sc = jnp.concatenate([
        jnp.concatenate([k1_mag, pad], axis=-1),
        jnp.concatenate([k2_mag, pad], axis=-1)])
    # |ki| <= ~2^129 + rounding slack -> 131 bits covers it
    return BC.big_msm_pippenger(F, pts2, sc, window_bits=window_bits,
                                scalar_bits=131)


def big_msm_glv_many(F: BigMontField, pts: BC.BigG1J,
                     scalar_words: jnp.ndarray, window_bits: int = 8
                     ) -> BC.BigG1J:
    """Batched GLV MSMs sharing one compiled graph: (B, L, words) ->
    (B,) Jacobian batch (drop-in for bigcurve.big_msm_pippenger_many)."""
    return jax.vmap(lambda sw: big_msm_glv(
        F, pts, sw, window_bits=window_bits))(scalar_words)
