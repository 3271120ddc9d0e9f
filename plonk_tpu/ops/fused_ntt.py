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


# ---------------- single-kernel whole transform ----------------
#
# The five-step fused_ntt above still pays 5 HBM round trips (2 Pallas
# row passes + 2 XLA transposes + 1 twiddle pass). But a full 2^16-2^19
# transform is only 0.25-2 MB of u32 — the WHOLE matrix fits in VMEM. The
# kernel below runs the complete four-step transform in one residency:
#
#   pass 1: DIF butterflies along the SUBLANE axis (length n1, root
#           w^n2) — no transpose needed, pltpu.roll(axis=0);
#   twiddle: elementwise by the (rev(k1), i2)-layout w^{i2 k1} matrix;
#   pass 2: DIF butterflies along the LANE axis (length n2, root w^n1).
#
# Output flat layout rev(k1)*n2 + rev(k2) == scrambled_perm — identical
# arrays to fused_ntt/fused_intt (asserted in tests/test_fused_ntt.py),
# so the prover's scrambled-layout quotient path can swap it in as prims
# without touching protocol code. HBM traffic: read + write, period.

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _full2d_kernel(p: int, n_prime: int, n1: int, n2: int, mirror: bool,
                   scale: int | None, tw1_ref, twm_ref, tw2_ref,
                   y_ref, out_ref):
    """mirror=False: forward structure (DIF sublanes, twiddle, DIF
    lanes) — root inversion is a table property, not a structure one;
    mirror=True: the fused_intt structure (DIT lanes, twiddle, DIT
    sublanes, optional 1/n scale)."""
    from .pallas_ntt import _mont_ops
    add, sub, mul = _mont_ops(p, n_prime)
    y = y_ref[0]
    pos0 = jax.lax.broadcasted_iota(jnp.int32, (n1, n2), 0)
    pos1 = jax.lax.broadcasted_iota(jnp.int32, (n1, n2), 1)

    def stages(C):
        out, half, s = [], 1, 0
        while half < C:
            out.append((half, s))
            half *= 2
            s += 1
        return out

    def axis_pass(y, tw_ref, pos, axis, C, dif):
        st = stages(C)
        if dif:
            st = st[::-1]
        for half, s in st:
            # axis-0 tables arrive pre-shaped (S, n1, 1) from the host —
            # reshaping a lane vector to a sublane vector in-kernel would
            # be a Mosaic relayout per stage
            tv = tw_ref[s] if axis == 0 else tw_ref[s, :][None, :]
            in_low = (pos % (2 * half)) < half
            down = pltpu.roll(y, C - half, axis)
            up = pltpu.roll(y, half, axis)
            if dif:
                low_new = add(y, down)
                high_new = mul(sub(up, y), tv)
            else:
                low_new = add(y, mul(down, tv))
                high_new = sub(up, mul(y, tv))
            y = jnp.where(in_low, low_new, high_new)
        return y

    if not mirror:
        y = axis_pass(y, tw1_ref, pos0, 0, n1, dif=True)
        y = mul(y, twm_ref[:])
        y = axis_pass(y, tw2_ref, pos1, 1, n2, dif=True)
    else:
        # mirror: DIT lanes (scrambled k2 -> natural i2), twiddle,
        # DIT sublanes (scrambled k1 -> natural i1), 1/n scale
        y = axis_pass(y, tw2_ref, pos1, 1, n2, dif=False)
        y = mul(y, twm_ref[:])
        y = axis_pass(y, tw1_ref, pos0, 0, n1, dif=False)
        if scale is not None:
            y = mul(y, jnp.uint32(scale))
    out_ref[0] = y


def _onepass(F, x: jnp.ndarray, w: int, inverse: bool, mirror: bool,
             intt_scale: bool, interpret: bool) -> jnp.ndarray:
    import functools as _ft
    n = x.shape[-1]
    _check_root(F.p, w, n)
    batch = x.shape[:-1]
    nb = int(np.prod(batch)) if batch else 1
    n1, n2 = _split(n)
    wq = pow(w, -1, F.p) if inverse else w

    tw1 = jnp.stack([F.array(t) for t in
                     _stage_tables(F.p, pow(wq, n2, F.p), n1, n1)]
                    )[..., None]                     # (S1, n1, 1)
    tw2 = jnp.stack([F.array(t) for t in
                     _stage_tables(F.p, pow(wq, n1, F.p), n2, n2)])
    twm_nat = _twiddle_matrix(F.p, w, n1, n2, inverse)   # (n2, rev k1)
    twm = jnp.asarray(F.encode_host(np.ascontiguousarray(twm_nat.T)))
    scale = None
    if intt_scale:
        R = (1 << 32) % F.p
        scale = (pow(n, -1, F.p) * R) % F.p
    kern = _ft.partial(_full2d_kernel, F.p, F.n_prime, n1, n2, mirror,
                       scale)
    mem = pl.ANY if interpret else pltpu.VMEM
    out = pl.pallas_call(
        kern,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((tw1.shape[0], n1, 1), lambda b: (0, 0, 0),
                         memory_space=mem),
            pl.BlockSpec((n1, n2), lambda b: (0, 0), memory_space=mem),
            pl.BlockSpec((tw2.shape[0], n2), lambda b: (0, 0),
                         memory_space=mem),
            pl.BlockSpec((1, n1, n2), lambda b: (b, 0, 0),
                         memory_space=mem),
        ],
        out_specs=pl.BlockSpec((1, n1, n2), lambda b: (b, 0, 0),
                               memory_space=mem),
        out_shape=jax.ShapeDtypeStruct((nb, n1, n2), U32),
        interpret=interpret,
    )(tw1, twm, tw2, x.reshape(nb, n1, n2))
    return out.reshape(batch + (n,))


def fused_ntt_1k(F, x: jnp.ndarray, w: int, inverse: bool = False,
                 interpret: bool = False) -> jnp.ndarray:
    """fused_ntt as ONE Pallas kernel per transform (natural in,
    scrambled out; bit-identical to fused_ntt)."""
    return _onepass(F, x, w, inverse, mirror=False, intt_scale=False,
                    interpret=interpret)


def fused_intt_1k(F, y: jnp.ndarray, w: int,
                  interpret: bool = False) -> jnp.ndarray:
    """fused_intt as ONE Pallas kernel per transform (scrambled in,
    natural 1/n-scaled coefficients out; bit-identical to fused_intt)."""
    return _onepass(F, y, w, inverse=True, mirror=True, intt_scale=True,
                    interpret=interpret)


def fused_ntt_natural(F, x: jnp.ndarray, w: int,
                      interpret: bool = False,
                      onepass: bool = False) -> jnp.ndarray:
    """fused_ntt + unscramble to natural evaluation order (for callers
    that need the standard layout; the prover's quotient path keeps the
    scrambled layout and skips this). onepass=True runs the whole
    transform as one Pallas kernel (fused_ntt_1k) before unscrambling."""
    if onepass:
        y = fused_ntt_1k(F, x, w, interpret=interpret)
    else:
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
