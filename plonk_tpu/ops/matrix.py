"""Modular dense-matrix utilities (parity with src/matrix.h).

In the reference the only production consumer of this module is the
Vandermonde-inverse interpolation setup (src/plonk.h:106-113); the TPU
framework replaces that wholesale with the INTT (ops/ntt.py), which computes
the mathematically identical matrix-vector product without the O(n^3)
Gauss-Jordan. This module remains for:

- parity tests mirroring src/matrix-test.c (with real asserts — the
  reference's matrix-test discards its matrix_equal results, see
  src/matrix-test.c:24,40,53),
- cross-validating INTT == h_pows_inv @ values on the toy domain,
- the h_pows_inv fixture check (src/plonk-test.c:38).

Gauss-Jordan / inversion run host-side on numpy int64 (they are
O(n^3)-sequential test utilities, not device kernels); matmul/add have jnp
device paths.
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

U32 = jnp.uint32


def mat_add(F, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    return F.add(a, b)


def mat_mul(F, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """(m,k) @ (k,n) with modular accumulation (src/matrix.h:81-98)."""
    k = a.shape[-1]
    acc = F.mul(a[..., :, 0:1], b[..., 0, :][..., None, :])
    for i in range(1, k):
        acc = F.add(acc, F.mul(a[..., :, i:i + 1], b[..., i, :][..., None, :]))
    return acc


def gauss_jordan_host(p: int, mat: np.ndarray) -> np.ndarray:
    """Reference Gauss-Jordan (src/matrix.h:100-149), host-side, exact
    semantics including the pivot search / row swap order."""
    m = np.array(mat, dtype=np.int64) % p
    rows, cols = m.shape
    lead = 0
    inv = lambda x: pow(int(x), p - 2, p)
    for r in range(rows):
        if cols <= lead:
            return m
        i = r
        while m[i, lead] == 0:
            i += 1
            if i == rows:
                i = r
                lead += 1
                if lead == cols:
                    return m
        if i != r:
            m[[i, r]] = m[[r, i]]
        div = m[r, lead]
        if div != 0:
            m[r] = (m[r] * inv(div)) % p
        for i2 in range(rows):
            if i2 != r:
                mult = m[i2, lead]
                m[i2] = (m[i2] - m[r] * mult) % p
        lead += 1
    return m


def mat_inv_host(p: int, mat: np.ndarray) -> np.ndarray:
    """Matrix inverse via augmented [M | I] (src/matrix.h:151-176)."""
    mat = np.asarray(mat, dtype=np.int64) % p
    n = mat.shape[0]
    assert mat.shape == (n, n), "only square matrices can be inverted"
    aug = np.zeros((n, 2 * n), dtype=np.int64)
    aug[:, :n] = mat
    aug[np.arange(n), np.arange(n) + n] = 1
    aug = gauss_jordan_host(p, aug)
    return aug[:, n:]


def vandermonde_host(p: int, points) -> np.ndarray:
    """h_pows[r][c] = points[r]^c (src/plonk.h:106-111)."""
    pts = np.asarray(points, dtype=np.int64) % p
    n = len(pts)
    m = np.empty((n, n), dtype=np.int64)
    for r in range(n):
        cur = 1
        for c in range(n):
            m[r, c] = cur
            cur = (cur * pts[r]) % p
    return m
