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


# Graph-size note: _seg_scan_add (associative_scan) unrolls log2(n) levels
# of the EC-add combine into the XLA graph. The Jacobian hot path uses the
# chunked rolled variant below instead (ONE rolled scan body + a small
# chunk-stitch loop — O(1) graph size, O(n) work vs associative_scan's 2n).


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


def _seg_scan_add_jac_chunked(F, pts: G1J, starts: jnp.ndarray,
                              n_chunks: int = 1024) -> G1J:
    """Chunked segmented inclusive EC-prefix-sum: reshape to
    (n_chunks, clen), run ONE rolled lax.scan of length clen vectorized
    across chunks, then stitch chunk boundaries with a small rolled loop.
    Identical outputs to _seg_scan_add_jac with O(1) graph size (the
    associative_scan unrolls log2(n) jac_add combine levels)."""
    n = pts.X.shape[0]
    n_chunks = min(n_chunks, n)
    while n % n_chunks:
        n_chunks -= 1
    clen = n // n_chunks
    shape = (n_chunks, clen)
    Xc = pts.X.reshape(shape)
    Yc = pts.Y.reshape(shape)
    Zc = pts.Z.reshape(shape)
    Sc = starts.reshape(shape)

    def step(carry, col):
        acc, seen = carry                       # per-chunk running state
        x, y, z, s = col
        pt = G1J(x, y, z)
        acc = _sel_jac(s, pt, jac_add(F, acc, pt))
        seen = jnp.logical_or(seen, s)
        return (acc, seen), (acc, seen)

    ident = G1J.identity(F, (n_chunks,))
    (_, _), (scan_pts, seen) = jax.lax.scan(
        step, (ident, jnp.zeros((n_chunks,), jnp.bool_)),
        (Xc.T, Yc.T, Zc.T, Sc.T))
    # scan over columns: outputs are (clen, n_chunks)
    l_last = G1J(scan_pts.X[-1], scan_pts.Y[-1], scan_pts.Z[-1])
    seen_last = seen[-1]

    # exclusive segmented scan over the n_chunks chunk-summaries (rolled)
    def stitch(i, carry_arr):
        prev = G1J(carry_arr.X[i - 1], carry_arr.Y[i - 1],
                   carry_arr.Z[i - 1])
        cur_in = G1J(l_last.X[i - 1], l_last.Y[i - 1], l_last.Z[i - 1])
        # carry into chunk i = chunk (i-1) tail sum, plus the carry into
        # chunk (i-1) if chunk (i-1) contains no segment start
        tot = _sel_jac(seen_last[i - 1], cur_in,
                       jac_add(F, prev, cur_in))
        return G1J(carry_arr.X.at[i].set(tot.X),
                   carry_arr.Y.at[i].set(tot.Y),
                   carry_arr.Z.at[i].set(tot.Z))

    carries = jax.lax.fori_loop(1, n_chunks, stitch,
                                G1J.identity(F, (n_chunks,)))
    # add the chunk carry to positions before the chunk's first start
    with_carry = jac_add(F, G1J(carries.X[None, :], carries.Y[None, :],
                                carries.Z[None, :]), scan_pts)
    out = _sel_jac(seen, scan_pts, with_carry)
    X = out.X.T.reshape(n)
    Y = out.Y.T.reshape(n)
    Z = out.Z.T.reshape(n)
    return G1J(X, Y, Z)


def _sel_jac(mask, a: G1J, b: G1J) -> G1J:
    return G1J(jnp.where(mask, a.X, b.X), jnp.where(mask, a.Y, b.Y),
               jnp.where(mask, a.Z, b.Z))


def _window_buckets_jac(F, pts: G1J, digits: jnp.ndarray,
                        n_buckets: int) -> G1J:
    n = digits.shape[0]
    order = jnp.argsort(digits)
    sd = digits[order]
    sp = G1J(pts.X[order], pts.Y[order], pts.Z[order])
    starts = jnp.concatenate([jnp.ones((1,), jnp.bool_), sd[1:] != sd[:-1]])
    if n >= 4096:
        scanned = _seg_scan_add_jac_chunked(F, sp, starts)
    else:
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
