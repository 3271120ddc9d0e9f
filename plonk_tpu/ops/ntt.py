"""Radix-2 number-theoretic transform (NTT/INTT) over prime fields.

This is the TPU-native replacement for two reference components:

- O(n^2) schoolbook polynomial multiplication (src/poly.h:106-122) becomes
  pointwise products in the evaluation domain.
- O(n^3) Vandermonde-inverse interpolation (src/plonk.h:106-113 builds the
  matrix via Gauss-Jordan; src/plonk.h:162-195 applies it as a matvec)
  becomes a single INTT: the inverse Vandermonde at the roots of unity IS
  (1/n) * V(omega^{-1}), so outputs are bit-identical (asserted in
  tests/test_ntt.py against the reference's h_pows_inv fixture).

The transform is an iterative Cooley-Tukey with a static Python loop over
the log2(n) stages — each stage is a pure reshape + fused VPU butterfly, so
XLA sees a fixed dataflow graph with no dynamic shapes. Distributed
(multi-chip) transforms build on this as the local step of a four-step NTT
(parallel/dist_ntt.py).

All twiddle tables are computed host-side with Python ints and cached.
"""
from __future__ import annotations

import functools
import os

import numpy as np
import jax.numpy as jnp

U32 = jnp.uint32

# fused Pallas kernel for the intra-row stages (Montgomery fields only).
# Defaults ON for real accelerators; the CPU backend always uses the XLA
# path (guarded at the call site). Override with PLONK_TPU_PALLAS=0/1.
_PALLAS_ENV = os.environ.get("PLONK_TPU_PALLAS")


def _use_pallas() -> bool:
    if _PALLAS_ENV is not None:
        return _PALLAS_ENV == "1"
    import jax
    return jax.default_backend() != "cpu"


@functools.lru_cache(maxsize=None)
def _bit_reverse_perm(n: int) -> np.ndarray:
    bits = n.bit_length() - 1
    idx = np.arange(n, dtype=np.int32)
    rev = np.zeros(n, dtype=np.int32)
    for b in range(bits):
        rev |= ((idx >> b) & 1) << (bits - 1 - b)
    return rev


@functools.lru_cache(maxsize=None)
def _twiddle_table(p: int, w: int, n: int) -> np.ndarray:
    """Powers w^0 .. w^(n/2 - 1) (host-side)."""
    tw = np.empty(n // 2, dtype=np.uint32)
    cur = 1
    for i in range(n // 2):
        tw[i] = cur
        cur = (cur * w) % p
    return tw


def _bit_reverse(x: jnp.ndarray, n: int) -> jnp.ndarray:
    """Bit-reversal permutation along the last axis.

    A flat n-element gather is catastrophically slow on TPU (scalar gather
    engine); instead factor n = A*B and use the identity
    rev_n(hi*B + lo) = rev_b(lo)*A + rev_a(hi): one transpose plus two
    small axis permutations (contiguous-block gathers)."""
    if n <= 4096:
        return x[..., _bit_reverse_perm(n)]
    a = (n.bit_length() - 1) // 2
    A = 1 << a
    B = n // A
    batch = x.shape[:-1]
    m = x.reshape(batch + (A, B)).swapaxes(-1, -2)      # (B, A)
    m = m[..., _bit_reverse_perm(B), :]
    m = m[..., :, _bit_reverse_perm(A)]
    return m.reshape(batch + (n,))


def _check_root(p: int, w: int, n: int):
    if pow(w, n, p) != 1 or (n > 1 and pow(w, n // 2, p) == 1):
        raise ValueError(f"{w} is not a primitive order-{n} root mod {p}")


# Row width for the blocked transform: keeps the minor dimension at full
# TPU lane width (128+) in EVERY butterfly stage. Small-distance stages act
# within rows via lane rolls; large-distance stages pair whole rows.
_ROW = 1024


@functools.lru_cache(maxsize=None)
def _stage_tables(p: int, w: int, n: int, C: int):
    """Per-stage twiddle tables (host): for half < C a length-C lane vector
    tw[(j mod half) * stride]; for half >= C a (D, C) row-block matrix."""
    tw = _twiddle_table(p, w, n)
    tables = []
    half = 1
    while half < n:
        stride = n // (2 * half)
        if half < C:
            j = np.arange(C)
            tables.append(tw[(j % half) * stride])
        else:
            j = np.arange(half)
            tables.append(tw[j * stride].reshape(half // C, C))
        half *= 2
    return tuple(tables)


def ntt(F, x: jnp.ndarray, w: int, layout: str = "auto") -> jnp.ndarray:
    """Forward transform: y[k] = sum_i x[i] * w^(ik), vectorized over any
    leading batch dims. `w` is a host-side primitive n-th root of unity.
    n = x.shape[-1] must be a power of two.

    layout="blocked": iterative DIT over a (rows, C) blocked layout. Stages
    with butterfly distance < C use lane rolls + masked selects (full VPU
    lane utilization — the naive (..., 2, half) reshape starves the
    hardware when half < 128); stages with distance >= C pair row blocks
    with the minor dimension intact.

    layout="simple": the plain (..., 2, half) reshape butterflies — used
    inside shard_map bodies, where the SPMD partitioner pathologically
    blows up compiling the roll-based stages (measured 100x compile-time
    regressions), and for small transforms where layout doesn't matter.

    layout="auto": blocked for n >= 4096, simple otherwise."""
    n = x.shape[-1]
    if n & (n - 1):
        raise ValueError("NTT size must be a power of two")
    if n == 1:
        return x
    _check_root(F.p, w, n)
    if layout == "auto":
        layout = "blocked" if n >= 4096 else "simple"
    if layout == "simple":
        return _ntt_simple(F, x, w)
    C = min(n, _ROW)
    R = n // C
    tables = [F.array(t) for t in _stage_tables(F.p, w, n, C)]

    y = _bit_reverse(x, n)
    batch = y.shape[:-1]
    y = y.reshape(batch + (R, C))
    pos = jnp.arange(C)

    n_intra = (C.bit_length() - 1)
    import math
    nbatch = math.prod(batch) if batch else 1
    if (_use_pallas() and hasattr(F, "n_prime") and nbatch * R >= 8
            and C >= 256):
        from .pallas_ntt import row_stages
        tw_stack = jnp.stack(tables[:n_intra])
        # intra-row stages are row-independent: fold any batch dims into
        # the row axis so the fused kernel covers stacked transforms too
        y = row_stages(F.p, F.n_prime, y.reshape(nbatch * R, C),
                       tw_stack).reshape(batch + (R, C))
        tables_rest = tables[n_intra:]
        half = C
        for tv in tables_rest:
            D = half // C
            yv = y.reshape(batch + (R // (2 * D), 2, D, C))
            even = yv[..., 0, :, :]
            odd = F.mul(yv[..., 1, :, :], tv)
            y = jnp.concatenate([F.add(even, odd)[..., None, :, :],
                                 F.sub(even, odd)[..., None, :, :]],
                                axis=-3).reshape(batch + (R, C))
            half *= 2
        return y.reshape(batch + (n,))

    half = 1
    for tv in tables:
        if half < C:
            in_low = (pos % (2 * half)) < half
            down = jnp.roll(y, -half, axis=-1)   # high partner, at low pos
            up = jnp.roll(y, half, axis=-1)      # low partner, at high pos
            low_new = F.add(y, F.mul(down, tv))
            high_new = F.sub(up, F.mul(y, tv))
            y = jnp.where(in_low, low_new, high_new)
        else:
            D = half // C
            yv = y.reshape(batch + (R // (2 * D), 2, D, C))
            even = yv[..., 0, :, :]
            odd = F.mul(yv[..., 1, :, :], tv)
            y = jnp.concatenate([F.add(even, odd)[..., None, :, :],
                                 F.sub(even, odd)[..., None, :, :]],
                                axis=-3).reshape(batch + (R, C))
        half *= 2
    return y.reshape(batch + (n,))


def _ntt_simple(F, x: jnp.ndarray, w: int) -> jnp.ndarray:
    """Reshape-butterfly DIT (shard_map-friendly; see ntt docstring)."""
    n = x.shape[-1]
    tw_all = F.array(_twiddle_table(F.p, w, n))
    y = _bit_reverse(x, n)
    half = 1
    while half < n:
        stride = n // (2 * half)
        tw = tw_all[::stride][:half]
        shape = y.shape[:-1] + (n // (2 * half), 2, half)
        yv = y.reshape(shape)
        even = yv[..., 0, :]
        odd = F.mul(yv[..., 1, :], tw)
        y = jnp.concatenate([F.add(even, odd), F.sub(even, odd)],
                            axis=-1).reshape(y.shape[:-1] + (n,))
        half *= 2
    return y


def intt(F, x: jnp.ndarray, w: int, layout: str = "auto") -> jnp.ndarray:
    """Inverse transform with the forward root `w`:
    coeffs[i] = (1/n) sum_k x[k] w^(-ik)."""
    n = x.shape[-1]
    w_inv = pow(w, -1, F.p)
    y = ntt(F, x, w_inv, layout=layout)
    return F.mul(y, F.const(pow(n, -1, F.p)))


def interpolate(F, values: jnp.ndarray, w: int) -> jnp.ndarray:
    """The reference's interpolate_at_h (src/plonk.h:162-195): coefficients
    of the unique degree<n polynomial taking `values` on H = {w^0..w^{n-1}}.
    Identical output to h_pows_inv @ values."""
    return intt(F, values, w)


def evaluate_on_domain(F, coeffs: jnp.ndarray, w: int, n: int) -> jnp.ndarray:
    """Evaluate a (padded) coefficient vector on the order-n domain of w."""
    from .poly import pad_to
    return ntt(F, pad_to(coeffs, n), w)


def ntt_mul(F, a: jnp.ndarray, b: jnp.ndarray, root_fn=None) -> jnp.ndarray:
    """Polynomial product via NTT: O(n log n) field-muls. Static output
    length la + lb - 1. The field needs 2-adicity >= log2(next_pow2(out))."""
    la, lb = a.shape[-1], b.shape[-1]
    L = la + lb - 1
    n = 1 << (L - 1).bit_length()
    if root_fn is None:
        w = F.params.root_of_unity(n)
    else:
        w = root_fn(n)
    from .poly import pad_to
    fa = ntt(F, pad_to(a, n), w)
    fb = ntt(F, pad_to(b, n), w)
    return intt(F, F.mul(fa, fb), w)[..., :L]
