"""Fused four-step NTT: two Pallas whole-row transforms + transposes,
no bit-reversal permutations anywhere.

Decomposition (n = n1*n2, i = i1*n2 + i2, k = k1 + n1*k2 — the same math
as the distributed transform, parallel/dist_ntt.py, executed on one chip):

    X[k1 + n1 k2] = sum_{i2} w^{i2 k1} (w^{n1})^{i2 k2}
                        [ sum_{i1} A[i1, i2] (w^{n2})^{i1 k1} ]

Forward (natural coefficients in, SCRAMBLED evaluations out):
  1. transpose            A (n1, n2)        -> (n2, n1)
  2. row DIF transforms   (root w^n2)       -> Y[i2, rev(k1)]
  3. twiddle multiply     w^{i2 k1} (table rev-permuted on k1)
  4. transpose                              -> (rev(k1), i2)
  5. row DIF transforms   (root w^n1)       -> X[rev(k1), rev(k2)]

Inverse (scrambled evaluations in, natural coefficients out) runs the
mirror with DIT rows (bit-reversed input -> natural output) and inverse
roots/twiddles, + the 1/n scale. DIF forward + DIT inverse means the
bit-reversals cancel structurally — the classic scrambled-order
convolution trick, exactly what the prover's coset quotient needs
(pointwise algebra is layout-agnostic; the coset point table is permuted
host-side via `scrambled_perm`).

Traffic per transform: 2 Pallas passes (all log2 stages in one VMEM
residency each) + 2 transposes + 1 twiddle pass ~= 5 HBM round trips,
vs log2(n) round trips for stage-at-a-time XLA butterflies.
"""
from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from .ntt import _stage_tables, _check_root
from .pallas_ntt import row_transform

U32 = jnp.uint32


def _split(n: int):
    """n = n1 * n2 with both powers of two, n1 <= n2, rows >= 256 wide."""
    log_n = n.bit_length() - 1
    n1 = 1 << (log_n // 2)
    return n1, n // n1


@functools.lru_cache(maxsize=None)
def _bitrev(n: int) -> np.ndarray:
    bits = n.bit_length() - 1
    idx = np.arange(n, dtype=np.int64)
    rev = np.zeros(n, dtype=np.int64)
    for b in range(bits):
        rev |= ((idx >> b) & 1) << (bits - 1 - b)
    return rev


@functools.lru_cache(maxsize=None)
def scrambled_perm(n: int) -> np.ndarray:
    """perm[j] = natural index of the element the forward transform
    leaves at flat position j = rev(k1)*n2 + rev(k2). Apply to a
    natural-order host table to align it with fused_ntt's output."""
    n1, n2 = _split(n)
    r1, r2 = _bitrev(n1), _bitrev(n2)
    k1 = np.empty(n1, dtype=np.int64)
    k1[r1] = np.arange(n1)
    k2 = np.empty(n2, dtype=np.int64)
    k2[r2] = np.arange(n2)
    a, b = np.meshgrid(k1, k2, indexing="ij")
    return (a + n1 * b).reshape(-1)


@functools.lru_cache(maxsize=None)
def _twiddle_matrix(p: int, w: int, n1: int, n2: int,
                    inverse: bool) -> np.ndarray:
    """(n2, n1) table w^{+-i2*k1} with the k1 axis bit-reversed (matching
    the DIF row output order). Built with vectorized uint64 cumprods."""
    wq = pow(w, -1, p) if inverse else w
    row = np.empty(n1, dtype=np.uint64)   # wq^{k1}
    cur = 1
    for k in range(n1):
        row[k] = cur
        cur = (cur * wq) % p
    out = np.empty((n2, n1), dtype=np.uint32)
    acc = np.ones(n1, dtype=np.uint64)
    for i2 in range(n2):
        out[i2] = acc
        acc = (acc * row) % p
    return out[:, _bitrev(n1)].copy()


def _row_pass(F, x2d: jnp.ndarray, w_row: int, n_row: int, dif: bool,
              interpret: bool) -> jnp.ndarray:
    """Full size-n_row transforms on the last axis of x2d (rows, n_row)."""
    tables = _stage_tables(F.p, w_row, n_row, n_row)
    tw_stack = jnp.stack([F.array(t) for t in tables])
    return row_transform(F.p, F.n_prime, x2d, tw_stack, dif,
                         interpret=interpret)


def fused_ntt(F, x: jnp.ndarray, w: int, inverse: bool = False,
              interpret: bool = False) -> jnp.ndarray:
    """Forward transform, batched over leading dims: natural-order input,
    SCRAMBLED-layout output (see scrambled_perm). `inverse=True` uses the
    inverse root (unscaled inverse transform, still scrambled out)."""
    n = x.shape[-1]
    _check_root(F.p, w, n)
    batch = x.shape[:-1]
    nb = int(np.prod(batch)) if batch else 1
    n1, n2 = _split(n)
    wq = pow(w, -1, F.p) if inverse else w

    a = x.reshape((nb, n1, n2)).swapaxes(-1, -2)         # (nb, n2, n1)
    a = _row_pass(F, a.reshape(nb * n2, n1), pow(wq, n2, F.p), n1, True,
                  interpret).reshape(nb, n2, n1)
    tw = jnp.asarray(F.encode_host(
        _twiddle_matrix(F.p, w, n1, n2, inverse)))
    a = F.mul(a, tw)
    a = a.swapaxes(-1, -2)                               # (nb, rev(k1), n2)
    a = _row_pass(F, a.reshape(nb * n1, n2), pow(wq, n1, F.p), n2, True,
                  interpret).reshape(batch + (n,))
    return a


def fused_intt(F, y: jnp.ndarray, w: int,
               interpret: bool = False) -> jnp.ndarray:
    """Inverse transform: SCRAMBLED-layout input (fused_ntt's output),
    natural-order coefficients out, scaled by 1/n."""
    n = y.shape[-1]
    batch = y.shape[:-1]
    nb = int(np.prod(batch)) if batch else 1
    n1, n2 = _split(n)
    w_inv = pow(w, -1, F.p)

    a = y.reshape(nb * n1, n2)                           # rows rev(k1)
    a = _row_pass(F, a, pow(w_inv, n1, F.p), n2, False,
                  interpret).reshape(nb, n1, n2)         # cols natural i2
    a = a.swapaxes(-1, -2)                               # (nb, i2, rev(k1))
    tw = jnp.asarray(F.encode_host(
        _twiddle_matrix(F.p, w, n1, n2, True)))
    a = F.mul(a, tw)
    a = _row_pass(F, a.reshape(nb * n2, n1), pow(w_inv, n2, F.p), n1,
                  False, interpret).reshape(nb, n2, n1)  # natural i1
    a = a.swapaxes(-1, -2).reshape(batch + (n,))
    return F.mul(a, F.const(pow(n, -1, F.p)))


def fused_ntt_natural(F, x: jnp.ndarray, w: int,
                      interpret: bool = False) -> jnp.ndarray:
    """fused_ntt + unscramble to natural evaluation order (for callers
    that need the standard layout; the prover's quotient path keeps the
    scrambled layout and skips this)."""
    y = fused_ntt(F, x, w, interpret=interpret)
    n = y.shape[-1]
    inv = np.empty(n, dtype=np.int64)
    inv[scrambled_perm(n)] = np.arange(n)
    n1, n2 = _split(n)
    # factored unscramble: out[k] = y[rev2(k2)*?]; a flat n-gather is slow
    # on TPU — use two axis permutations + transpose instead
    r1, r2 = _bitrev(n1), _bitrev(n2)
    m = y.reshape(y.shape[:-1] + (n1, n2))
    m = m[..., jnp.asarray(r1), :][..., :, jnp.asarray(r2)]
    # position (k1, k2) now holds X[k1 + n1*k2]; natural = k2-major
    return m.swapaxes(-1, -2).reshape(y.shape[:-1] + (n,))
