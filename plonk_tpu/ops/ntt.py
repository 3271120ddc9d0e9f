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

import numpy as np
import jax.numpy as jnp

U32 = jnp.uint32


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


def _check_root(p: int, w: int, n: int):
    if pow(w, n, p) != 1 or (n > 1 and pow(w, n // 2, p) == 1):
        raise ValueError(f"{w} is not a primitive order-{n} root mod {p}")


def ntt(F, x: jnp.ndarray, w: int) -> jnp.ndarray:
    """Forward transform: y[k] = sum_i x[i] * w^(ik), vectorized over any
    leading batch dims. `w` is a host-side primitive n-th root of unity.
    n = x.shape[-1] must be a power of two."""
    n = x.shape[-1]
    if n & (n - 1):
        raise ValueError("NTT size must be a power of two")
    if n == 1:
        return x
    _check_root(F.p, w, n)
    tw_std = _twiddle_table(F.p, w, n)
    tw_all = F.array(tw_std)  # MontField.array encodes to Montgomery form

    y = x[..., _bit_reverse_perm(n)]
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


def intt(F, x: jnp.ndarray, w: int) -> jnp.ndarray:
    """Inverse transform with the forward root `w`:
    coeffs[i] = (1/n) sum_k x[k] w^(-ik)."""
    n = x.shape[-1]
    w_inv = pow(w, -1, F.p)
    y = ntt(F, x, w_inv)
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
