"""Polynomial kernels over multi-limb fields (ops/bigfield.py).

The single-word helpers in ops/poly.py operate on (..., n) coefficient
tensors; these are the same closed-form, data-parallel algorithms lifted
to (..., n, limbs) — the COEFFICIENT axis is -2, the trailing axis is the
16-bit-word limb axis. Reference lineage is identical (src/poly.h), see
ops/poly.py; the BN254 prover (models/plonk_bn254.py) is the consumer.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from .bigfield import BigMontField

U32 = jnp.uint32


def pad_to(c: jnp.ndarray, length: int) -> jnp.ndarray:
    """Zero-pad the coefficient axis (-2) to `length`."""
    n = c.shape[-2]
    if n > length:
        raise ValueError(f"cannot pad length {n} down to {length}")
    if n == length:
        return c
    pad = [(0, 0)] * c.ndim
    pad[-2] = (0, length - n)
    return jnp.pad(c, pad)


def padd(F: BigMontField, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    L = max(a.shape[-2], b.shape[-2])
    return F.add(pad_to(a, L), pad_to(b, L))


def psub(F: BigMontField, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    L = max(a.shape[-2], b.shape[-2])
    return F.sub(pad_to(a, L), pad_to(b, L))


def pscale(F: BigMontField, a: jnp.ndarray, s: jnp.ndarray) -> jnp.ndarray:
    """a * s with s a (..., limbs) scalar."""
    return F.mont_mul(a, s[..., None, :])


def padd_const(F: BigMontField, a: jnp.ndarray, s: jnp.ndarray
               ) -> jnp.ndarray:
    """a + s (constant term)."""
    return a.at[..., 0, :].set(F.add(a[..., 0, :], s))


def pow_vector(F: BigMontField, x: jnp.ndarray, L: int) -> jnp.ndarray:
    """pows[i] = x^i for i in [0, L): binary-decomposition products
    (log2 L full-width multiplies; see ops/plonk_scaled._pow_vector)."""
    nbits = max((L - 1).bit_length(), 1)
    idx = jnp.arange(L, dtype=U32)
    acc = jnp.broadcast_to(F.const(1), (L, F.limbs))
    cur = x
    for j in range(nbits):
        bit = (idx >> j) & 1
        acc = jnp.where((bit == 1)[..., None], F.mont_mul(acc, cur), acc)
        if j + 1 < nbits:
            cur = F.mont_mul(cur, cur)
    return acc


def tree_sum(F: BigMontField, t: jnp.ndarray) -> jnp.ndarray:
    """Log-depth modular sum along axis -2, contiguous halves."""
    L = t.shape[-2]
    m = 1 << (L - 1).bit_length() if L > 1 else 1
    if m != L:
        t = pad_to(t, m)
    while m > 1:
        h = m // 2
        t = F.add(t[..., :h, :], t[..., h:, :])
        m = h
    return t[..., 0, :]


def peval(F: BigMontField, coeffs: jnp.ndarray, x: jnp.ndarray
          ) -> jnp.ndarray:
    """Evaluate at a scalar point, O(log n) depth."""
    L = coeffs.shape[-2]
    return tree_sum(F, F.mont_mul(coeffs, pow_vector(F, x, L)))


def suffix_sums(F: BigMontField, u: jnp.ndarray) -> jnp.ndarray:
    """Inclusive modular suffix sums along axis -2 (log-depth shifted
    adds; associative_scan over the limb pytree would interleave the limb
    axis into its strided slicing)."""
    L = u.shape[-2]
    acc = jnp.flip(u, axis=-2)
    k = 1
    while k < L:
        shifted = jnp.pad(acc, [(0, 0)] * (acc.ndim - 2) + [(k, 0), (0, 0)]
                          )[..., :L, :]
        acc = F.add(acc, shifted)
        k *= 2
    return jnp.flip(acc, axis=-2)


def divide_by_linear(F: BigMontField, t: jnp.ndarray, c: jnp.ndarray):
    """Division by (x - c), nonzero c, fully data-parallel
    (q[i] = sum_{j>i} t[j] c^{j-i-1}; ops/poly.py:232). Returns
    (q, rem) with q of static length len(t) - 1 and rem = t(c)."""
    L = t.shape[-2]
    u = F.mont_mul(t, pow_vector(F, c, L))
    suf = suffix_sums(F, u)
    s_excl = F.sub(suf, u)
    ic = F.inv(c)
    icpow = F.mont_mul(pow_vector(F, ic, L), ic)
    q = F.mont_mul(s_excl, icpow)[..., :L - 1, :]
    rem = suf[..., 0, :]
    return q, rem


def batch_inv(F: BigMontField, a: jnp.ndarray) -> jnp.ndarray:
    """Montgomery-trick batched inverse of an (n, limbs) vector: ONE
    Fermat chain + ~4n multiplies instead of n chains (a 254-bit Fermat
    inverse is ~380 CIOS multiplies each — the reference pays the analog
    per element too, src/gf.h:159-162). inv(a_i) = P_{i-1} * S_{i+1} *
    (prod a)^-1 from an inclusive prefix- and suffix-product pass.
    Zero elements invert to 0 (the division convention of
    src/hf.h:201-203), masked out of the products. The outputs are
    bit-identical to F.inv per element — Montgomery representatives are
    unique and every kernel keeps values fully reduced."""
    n = a.shape[-2]
    one = jnp.broadcast_to(F.const(1), a.shape).astype(U32)
    is_zero = jnp.all(a == 0, axis=-1, keepdims=True)
    b = jnp.where(is_zero, one, a)
    pre = prefix_prod_chunked(F, b)                     # P_i, inclusive
    suf = jnp.flip(prefix_prod_chunked(F, jnp.flip(b, axis=-2)), axis=-2)
    tot_inv = F.inv(pre[-1])
    p_excl = jnp.concatenate([one[:1], pre[:-1]], axis=-2)
    s_excl = jnp.concatenate([suf[1:], one[:1]], axis=-2)
    out = F.mont_mul(F.mont_mul(p_excl, s_excl), tot_inv[None])
    return jnp.where(is_zero, jnp.zeros_like(out), out)


def prefix_prod_chunked(F: BigMontField, x: jnp.ndarray,
                        n_chunks: int = 256) -> jnp.ndarray:
    """Inclusive prefix product of a (n, limbs) array: per-chunk rolled
    scans + cross-chunk stitch (the limb port of
    plonk_scaled._prefix_prod_chunked; ordered products, exact)."""
    n = x.shape[-2]
    n_chunks = min(n_chunks, n)
    while n % n_chunks:
        n_chunks -= 1
    K = n // n_chunks
    lim = F.limbs
    cols = x.reshape(n_chunks, K, lim).swapaxes(0, 1)      # (K, nc, lim)

    def step(carry, col):
        acc = F.mont_mul(carry, col)
        return acc, acc

    ones = jnp.broadcast_to(F.const(1), (n_chunks, lim))
    totals, scans = jax.lax.scan(step, ones, cols)         # (K, nc, lim)

    def stitch(carry, tot):
        return F.mont_mul(carry, tot), carry

    _, excl = jax.lax.scan(stitch, ones[0], scans[-1])     # (nc, lim)
    return F.mont_mul(scans, excl[None]).swapaxes(0, 1).reshape(n, lim)
