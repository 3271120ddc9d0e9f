"""Pippenger bucket-method multi-scalar multiplication.

Replaces the reference's naive per-coefficient fold (src/srs.h:53-68, one
full scalar-mul + add per term) with the TPU-native bucket method:

1. split scalars into w-bit windows;
2. per window, bucket-accumulate points by digit — implemented as
   sort-by-digit + segmented associative scan (EC addition is associative,
   so `lax.associative_scan` over masked-affine point ops is exact);
3. bucket totals combine with the standard descending running sum;
4. windows combine with w doublings each.

Everything is static-shape and batched; the segmented scan is the same
primitive the grand-product uses. The distributed version shards points
across the mesh and combines per-shard partial sums (parallel/dist_msm.py).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from .curve import G1, g1_add, g1_double, _sel_g1

U32 = jnp.uint32


def _seg_scan_add(F, pts: G1, starts: jnp.ndarray) -> G1:
    """Segmented inclusive prefix EC-sum: within each segment (delimited by
    `starts`), element i becomes the sum of elements start..i."""

    def combine(a, b):
        ax, ay, ainf, aflag = a
        bx, by, binf, bflag = b
        s = g1_add(F, G1(ax, ay, ainf), G1(bx, by, binf))
        keep_b = bflag
        return (jnp.where(keep_b, bx, s.x),
                jnp.where(keep_b, by, s.y),
                jnp.where(keep_b, binf, s.inf),
                jnp.logical_or(aflag, bflag))

    x, y, inf, _ = jax.lax.associative_scan(
        combine, (pts.x, pts.y, pts.inf, starts))
    return G1(x, y, inf)


def msm_window_buckets(F, pts: G1, digits: jnp.ndarray, n_buckets: int) -> G1:
    """Bucket sums for one window: bucket[b] = EC-sum of points with
    digits == b. Returns a G1 batch of shape (n_buckets,). Bucket 0 is
    unused by the caller."""
    n = digits.shape[0]
    order = jnp.argsort(digits)
    sd = digits[order]
    sp = G1(pts.x[order], pts.y[order], pts.inf[order])
    starts = jnp.concatenate([jnp.ones((1,), jnp.bool_), sd[1:] != sd[:-1]])
    scanned = _seg_scan_add(F, sp, starts)
    # segment ends hold the full per-digit sums
    is_end = jnp.concatenate([sd[:-1] != sd[1:], jnp.ones((1,), jnp.bool_)])
    write_idx = jnp.where(is_end, sd.astype(jnp.int32), n_buckets)
    bx = jnp.zeros((n_buckets + 1,), U32).at[write_idx].set(scanned.x)
    by = jnp.zeros((n_buckets + 1,), U32).at[write_idx].set(scanned.y)
    binf = jnp.ones((n_buckets + 1,), jnp.bool_).at[write_idx].set(scanned.inf)
    # buckets that received no points stay at infinity: .set on untouched
    # lanes leaves the init value
    return G1(bx[:n_buckets], by[:n_buckets], binf[:n_buckets])


def _bucket_reduce(F, buckets: G1) -> G1:
    """sum_b b * bucket[b] via the descending running-sum trick."""
    n_buckets = buckets.x.shape[0]

    def body(i, carry):
        running, total = carry
        b = n_buckets - 1 - i  # from top bucket down to 1
        pt = G1(buckets.x[b], buckets.y[b], buckets.inf[b])
        running = g1_add(F, running, pt)
        total = g1_add(F, total, running)
        return running, total

    running0 = G1.identity()
    total0 = G1.identity()
    _, total = jax.lax.fori_loop(0, n_buckets - 1, body, (running0, total0))
    return total


def msm_pippenger(F, pts: G1, scalars: jnp.ndarray, window_bits: int = 5,
                  scalar_bits: int = 32) -> G1:
    """Full Pippenger MSM: sum_i scalars[i] * pts[i].

    All windows are processed by ONE vmapped bucket-accumulation graph
    (a python loop would replicate the segmented-scan graph per window —
    a compile-size problem at production sizes)."""
    scalars = jnp.asarray(scalars, dtype=U32)
    n_windows = -(-scalar_bits // window_bits)
    n_buckets = 1 << window_bits

    shifts = jnp.asarray([wi * window_bits for wi in range(n_windows)],
                         dtype=U32)
    digits = (scalars[None, :] >> shifts[:, None]) & (n_buckets - 1)

    def one_window(d):
        buckets = msm_window_buckets(F, pts, d, n_buckets)
        return _bucket_reduce(F, buckets)

    wtot = jax.vmap(one_window)(digits)      # G1 batch of shape (n_windows,)

    total = G1.identity()
    for wi in reversed(range(n_windows)):
        if wi != n_windows - 1:
            for _ in range(window_bits):
                total = g1_double(F, total)
        total = g1_add(F, total, G1(wtot.x[wi], wtot.y[wi], wtot.inf[wi]))
    return total


def msm_pippenger_many(F, pts: G1, scalars_batch: jnp.ndarray,
                       window_bits: int = 5, scalar_bits: int = 32) -> G1:
    """Batched MSM over a (B, L) scalar matrix against shared points:
    ONE compiled graph for all B commitments (the prover commits 9
    polynomials against the same SRS)."""
    fn = jax.vmap(lambda s: msm_pippenger(F, pts, s, window_bits,
                                          scalar_bits))
    return fn(jnp.asarray(scalars_batch, dtype=U32))


def msm(F, pts: G1, scalars: jnp.ndarray, window_bits: int = 5,
        scalar_bits: int = 32) -> G1:
    return msm_pippenger(F, pts, scalars, window_bits, scalar_bits)


# TODO(next round): _seg_scan_add uses lax.associative_scan, which unrolls
# log2(n) levels of the EC-add combine into the graph — at 2^16+ points the
# XLA graph (and compile time) grows into the hundreds of thousands of ops.
# Replace with a chunked segmented scan: reshape the sorted points to
# (chunks, chunk_len), run ONE rolled lax.scan of length chunk_len
# vectorized across chunks, then stitch chunk boundaries with a small scan.
# Compile size becomes O(chunk body), runtime stays vectorized.


# ---------------- Jacobian-coordinate MSM (hot path) ----------------
#
# Identical group outputs to msm_pippenger (asserted in tests); avoids the
# per-add Fermat inversion of the affine formulas — the dominant cost in
# production-size commitments.

from .curve import G1J, jac_from_affine, jac_to_affine, jac_add, jac_double


def _seg_scan_add_jac(F, pts: G1J, starts: jnp.ndarray) -> G1J:
    def combine(a, b):
        ax, ay, az, aflag = a
        bx, by, bz, bflag = b
        s = jac_add(F, G1J(ax, ay, az), G1J(bx, by, bz))
        keep_b = bflag
        return (jnp.where(keep_b, bx, s.X),
                jnp.where(keep_b, by, s.Y),
                jnp.where(keep_b, bz, s.Z),
                jnp.logical_or(aflag, bflag))

    X, Y, Z, _ = jax.lax.associative_scan(
        combine, (pts.X, pts.Y, pts.Z, starts))
    return G1J(X, Y, Z)


def _window_buckets_jac(F, pts: G1J, digits: jnp.ndarray,
                        n_buckets: int) -> G1J:
    n = digits.shape[0]
    order = jnp.argsort(digits)
    sd = digits[order]
    sp = G1J(pts.X[order], pts.Y[order], pts.Z[order])
    starts = jnp.concatenate([jnp.ones((1,), jnp.bool_), sd[1:] != sd[:-1]])
    scanned = _seg_scan_add_jac(F, sp, starts)
    is_end = jnp.concatenate([sd[:-1] != sd[1:], jnp.ones((1,), jnp.bool_)])
    write_idx = jnp.where(is_end, sd.astype(jnp.int32), n_buckets)
    ident = G1J.identity(F)
    bx = jnp.full((n_buckets + 1,), ident.X, U32).at[write_idx].set(scanned.X)
    by = jnp.full((n_buckets + 1,), ident.Y, U32).at[write_idx].set(scanned.Y)
    bz = jnp.zeros((n_buckets + 1,), U32).at[write_idx].set(scanned.Z)
    return G1J(bx[:n_buckets], by[:n_buckets], bz[:n_buckets])


def _bucket_reduce_jac(F, buckets: G1J) -> G1J:
    n_buckets = buckets.X.shape[0]

    def body(i, carry):
        running, total = carry
        b = n_buckets - 1 - i
        pt = G1J(buckets.X[b], buckets.Y[b], buckets.Z[b])
        running = jac_add(F, running, pt)
        total = jac_add(F, total, running)
        return running, total

    ident = G1J.identity(F)
    _, total = jax.lax.fori_loop(0, n_buckets - 1, body, (ident, ident))
    return total


def msm_pippenger_jac(F, pts: G1, scalars: jnp.ndarray, window_bits: int = 7,
                      scalar_bits: int = 32) -> G1:
    """Pippenger with Jacobian bucket arithmetic; returns an affine G1."""
    scalars = jnp.asarray(scalars, dtype=U32)
    n_windows = -(-scalar_bits // window_bits)
    n_buckets = 1 << window_bits
    jpts = jac_from_affine(F, pts)

    shifts = jnp.asarray([wi * window_bits for wi in range(n_windows)],
                         dtype=U32)
    digits = (scalars[None, :] >> shifts[:, None]) & (n_buckets - 1)

    def one_window(d):
        return _bucket_reduce_jac(F, _window_buckets_jac(F, jpts, d,
                                                         n_buckets))

    wtot = jax.vmap(one_window)(digits)

    total = G1J.identity(F)
    for wi in reversed(range(n_windows)):
        if wi != n_windows - 1:
            for _ in range(window_bits):
                total = jac_double(F, total)
        total = jac_add(F, total, G1J(wtot.X[wi], wtot.Y[wi], wtot.Z[wi]))
    return jac_to_affine(F, total)


def msm_pippenger_jac_many(F, pts: G1, scalars_batch: jnp.ndarray,
                           window_bits: int = 7,
                           scalar_bits: int = 32) -> G1:
    fn = jax.vmap(lambda s: msm_pippenger_jac(F, pts, s, window_bits,
                                              scalar_bits))
    return fn(jnp.asarray(scalars_batch, dtype=U32))
