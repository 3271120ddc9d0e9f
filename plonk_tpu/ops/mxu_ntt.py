"""NTT on the MXU: four-step transform with the row transforms executed
as int8 limb matmuls on the systolic array.

The size-C row transform IS a matmul: Y = X @ W with W[j, k] = w^{jk} the
DFT matrix. TPU MXUs multiply s8 x s8 -> s32 at full rate, so the modular
matmul runs limb-decomposed, with the WHOLE pipeline in Montgomery form:

    inputs   x~ = x * R mod p           (R = 2^32; the prover's native form)
    matrix   W~[j,k] = w^{jk} * 2^64 mod p, split into 7-bit s8 limb
             planes (5 planes for p < 2^31; products of 1024-term rows
             stay exact in s32: 1024 * 127^2 < 2^24)
    MXU      S_ab = X_a @ W_b for all limb pairs (one batched dot_general)
    VPU      V = sum_k 2^{7k} (sum_{a+b=k} S_ab)   (shift-add
             recomposition into 96 bits -- NO multiplies)
             Y~ = REDC64(V) = V * 2^{-64} = (X @ W) * R mod p
             (+ fused twiddle mont_mul after the first pass)

This moves every butterfly multiply onto the MXU as O(n * C) MAC work
(C = row width): more raw MACs, but on the unit with far higher integer
throughput than the VPU lanes, and with NO bit-reversal, NO per-stage
twiddle loads, and the output order baked into the matrix.

Four-step decomposition (n = n1*n2, i = i1*n2 + i2, k = k1 + n1*k2 — the
same math as parallel/dist_ntt.py):

    1. A (n1, n2) -> transpose -> (n2, n1)
    2. column transforms:  @ W1 (n1 x n1, (w^{n2})^{jk})
    3. twiddle w^{i2 k1}   (fused mont_mul)
    4. transpose -> (n1, n2)
    5. row transforms:     @ W2 (n2 x n2, (w^{n1})^{jk})
       output X[k1, k2] flat at j = k1*n2 + k2 (`mxu_perm` layout);
       mxu_intt consumes that layout and returns natural order.

Reference lineage: replaces the reference's O(n^2) schoolbook products
(src/poly.h:106-122) like ops/ntt.py, but mapped to the MXU instead of
VPU butterflies.
"""
from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

U32 = jnp.uint32
_LB = 7                      # limb bits (s8-exact: values < 128)
_MASK16 = jnp.uint32(0xFFFF)


def _n_limbs(p: int) -> int:
    return -(-p.bit_length() // _LB)


def _split(n: int):
    log_n = n.bit_length() - 1
    n1 = 1 << (log_n // 2)
    return n1, n // n1


@functools.lru_cache(maxsize=None)
def mxu_perm(n: int) -> np.ndarray:
    """perm[j] = natural index of the element mxu_ntt leaves at flat
    position j = k1*n2 + k2 (the dist_ntt 'transposed' layout)."""
    n1, n2 = _split(n)
    k1, k2 = np.meshgrid(np.arange(n1), np.arange(n2), indexing="ij")
    return (k1 + n1 * k2).reshape(-1)


@functools.lru_cache(maxsize=None)
def _dft_limbs(p: int, w: int, C: int) -> np.ndarray:
    """(L, C, C) s8 limb planes of W~[j, k] = w^{jk} * 2^64 mod p.
    Built with vectorized uint64 modular cumprods (p < 2^31 keeps every
    product < 2^62)."""
    t = np.empty(C, dtype=np.uint64)           # t[k] = w^k
    cur = 1
    for k in range(C):
        t[k] = cur
        cur = (cur * w) % p
    mat = np.empty((C, C), dtype=np.uint64)
    accrow = np.full(C, pow(2, 64, p), dtype=np.uint64)  # row j: w^{jk}*2^64
    for j in range(C):
        mat[j] = accrow
        accrow = accrow * t % np.uint64(p)
    L = _n_limbs(p)
    out = np.empty((L, C, C), dtype=np.int8)
    for a in range(L):
        out[a] = ((mat >> np.uint64(_LB * a))
                  & np.uint64((1 << _LB) - 1)).astype(np.int8)
    return out


@functools.lru_cache(maxsize=None)
def _twiddle_std(p: int, w: int, n1: int, n2: int,
                 inverse: bool) -> np.ndarray:
    """(n2, n1) standard-form table w^{+-i2*k1}, natural k1 order."""
    wq = pow(w, -1, p) if inverse else w
    row = np.empty(n1, dtype=np.uint64)
    cur = 1
    for k in range(n1):
        row[k] = cur
        cur = (cur * wq) % p
    out = np.empty((n2, n1), dtype=np.uint32)
    acc = np.ones(n1, dtype=np.uint64)
    for i2 in range(n2):
        out[i2] = acc
        acc = acc * row % np.uint64(p)
    return out


def _mulfull(a, b):
    a0 = a & _MASK16
    a1 = a >> 16
    b0 = b & _MASK16
    b1 = b >> 16
    p00 = a0 * b0
    p01 = a0 * b1
    p10 = a1 * b0
    p11 = a1 * b1
    mid = (p00 >> 16) + (p01 & _MASK16) + (p10 & _MASK16)
    lo = (p00 & _MASK16) | ((mid & _MASK16) << 16)
    hi = p11 + (p01 >> 16) + (p10 >> 16) + (mid >> 16)
    return hi, lo


def _mont_mat_transform(F, x_mont: jnp.ndarray, limb_mats: jnp.ndarray,
                        tw_mont=None) -> jnp.ndarray:
    """rows of x_mont (R, C) Montgomery u32 -> Montgomery (X @ W) with an
    optional fused elementwise Montgomery twiddle multiply."""
    p = F.p
    pj = jnp.uint32(p)
    npj = jnp.uint32(F.n_prime)
    L = limb_mats.shape[0]
    mask = jnp.uint32((1 << _LB) - 1)
    xs = jnp.stack([((x_mont >> (_LB * a)) & mask).astype(jnp.int8)
                    for a in range(L)])
    # S[a, r, b, k] = X_a @ W_b — ONE batched MXU call for all limb pairs
    S = jax.lax.dot_general(
        xs, limb_mats,
        dimension_numbers=(((2,), (1,)), ((), ())),
        preferred_element_type=jnp.int32)
    nk = 2 * L - 1
    buckets = [None] * nk
    for a in range(L):
        for b in range(L):
            k = a + b
            t = S[a, :, b, :]
            buckets[k] = t if buckets[k] is None else buckets[k] + t
    # shift-add recomposition: V = sum_k buckets[k] << (7k) into 16-bit
    # words. Bucket bound: L terms of C products of (2^7-1)^2 each.
    C = x_mont.shape[-1]
    bmax_bits = (L * C * ((1 << _LB) - 1) ** 2).bit_length()
    assert bmax_bits <= 31, "row width too large for s32 accumulation"
    n_words = (_LB * (nk - 1) + bmax_bits + 15) // 16
    words = [jnp.zeros_like(x_mont) for _ in range(n_words)]
    for k in range(nk):
        bk = buckets[k].astype(U32)
        off = _LB * k
        m0, sh = divmod(off, 16)
        words[m0] = words[m0] + ((bk & jnp.uint32((1 << (16 - sh)) - 1))
                                 << sh)
        words[m0 + 1] = words[m0 + 1] + ((bk >> (16 - sh)) & _MASK16)
        if sh + bmax_bits > 32:
            words[m0 + 2] = words[m0 + 2] + (bk >> (32 - sh))
    carry = jnp.zeros_like(x_mont)
    for m in range(n_words):
        s = words[m] + carry
        words[m] = s & _MASK16
        carry = s >> 16
    # V < 2^96, so after carry normalization the words fit in three u32s
    # and the final carry is zero
    while len(words) < 6:
        words.append(jnp.zeros_like(x_mont))
    v0 = words[0] | (words[1] << 16)
    v1 = words[2] | (words[3] << 16)
    v2 = words[4] | (words[5] << 16)

    # REDC twice: (v0, v1, v2) * 2^{-64} mod p, result < 2p
    m = v0 * npj
    mhi, _ = _mulfull(m, pj)
    c0 = (v0 != 0).astype(U32)
    s = v1 + mhi
    c1 = (s < v1).astype(U32)
    s2 = s + c0
    c2 = (s2 < s).astype(U32)
    u0, u1 = s2, v2 + c1 + c2

    m = u0 * npj
    mhi, _ = _mulfull(m, pj)
    c0 = (u0 != 0).astype(U32)
    r = u1 + mhi + c0
    r = jnp.where(r >= pj, r - pj, r)

    if tw_mont is not None:
        r = F.mont_mul(r, tw_mont)
    return r


def mxu_ntt(F, x: jnp.ndarray, w: int, inverse: bool = False) -> jnp.ndarray:
    """Forward transform, Montgomery form in/out, batched over leading
    dims; output in the mxu_perm (transposed) layout. inverse=True uses
    the inverse root (unscaled)."""
    n = x.shape[-1]
    p = F.p
    batch = x.shape[:-1]
    nb = int(np.prod(batch)) if batch else 1
    n1, n2 = _split(n)
    wq = pow(w, -1, p) if inverse else w

    W1 = jnp.asarray(_dft_limbs(p, pow(wq, n2, p), n1))
    W2 = jnp.asarray(_dft_limbs(p, pow(wq, n1, p), n2))
    tw = jnp.asarray(F.encode_host(_twiddle_std(p, w, n1, n2, inverse)))

    a = x.reshape((nb, n1, n2)).swapaxes(-1, -2)     # (nb, i2, i1)
    a = _mont_mat_transform(
        F, a.reshape(nb * n2, n1), W1,
        jnp.tile(tw, (nb, 1))).reshape(nb, n2, n1)
    a = a.swapaxes(-1, -2)                           # (nb, k1, i2)
    a = _mont_mat_transform(F, a.reshape(nb * n1, n2), W2)
    return a.reshape(batch + (n,))


def mxu_intt(F, y: jnp.ndarray, w: int) -> jnp.ndarray:
    """Inverse of mxu_ntt: mxu_perm-layout Montgomery input, natural-order
    Montgomery coefficients out, scaled by 1/n."""
    n = y.shape[-1]
    p = F.p
    batch = y.shape[:-1]
    nb = int(np.prod(batch)) if batch else 1
    n1, n2 = _split(n)
    w_inv = pow(w, -1, p)

    W2i = jnp.asarray(_dft_limbs(p, pow(w_inv, n1, p), n2))
    W1i = jnp.asarray(_dft_limbs(p, pow(w_inv, n2, p), n1))
    tw = jnp.asarray(F.encode_host(_twiddle_std(p, w, n1, n2, True)))

    a = y.reshape(nb * n1, n2)                       # rows k1, cols k2
    a = _mont_mat_transform(F, a, W2i).reshape(nb, n1, n2)  # cols i2
    a = a.swapaxes(-1, -2)                           # (nb, i2, k1)
    # the inverse twiddle attaches to the INTERMEDIATE (pre-multiplied
    # before the second transform, unlike the forward's post-fusion)
    a = F.mont_mul(a, tw)
    a = _mont_mat_transform(
        F, a.reshape(nb * n2, n1), W1i).reshape(nb, n2, n1)
    a = a.swapaxes(-1, -2).reshape(batch + (n,))     # natural (i1, i2)
    return F.mont_mul(a, F.const(pow(n, -1, p)))


def mxu_ntt_natural(F, x: jnp.ndarray, w: int) -> jnp.ndarray:
    """mxu_ntt + untranspose to natural evaluation order."""
    y = mxu_ntt(F, x, w)
    n = y.shape[-1]
    n1, n2 = _split(n)
    m = y.reshape(y.shape[:-1] + (n1, n2))
    return m.swapaxes(-1, -2).reshape(y.shape[:-1] + (n,))
