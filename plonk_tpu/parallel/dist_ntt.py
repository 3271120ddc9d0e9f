"""Distributed four-step (Bailey) NTT over a device mesh.

This is the workload's sequence-parallelism analog (SURVEY §5): the
evaluation domain is sharded across chips, butterfly work is local, and the
only communication is the matrix transposes — `jax.lax.all_to_all` over the
mesh axis (ICI within a slice).

Decomposition (n = n1 * n2, x in natural order, i = i1*n2 + i2,
k = k1 + n1*k2):

    X[k1 + n1 k2] = sum_{i2} w^{i2 k1} [ sum_{i1} x[i1, i2] (w^{n2})^{i1 k1} ]
                    * (w^{n1})^{i2 k2}

  1. all_to_all transpose -> columns local
  2. local size-n1 NTT (root w^{n2}) along i1
  3. twiddle w^{i2 k1}
  4. all_to_all transpose back -> rows local
  5. local size-n2 NTT (root w^{n1}) along i2

The forward transform leaves results in the (k1, k2) "transposed" layout
(flat index j = k1*n2 + k2; `transposed_perm` maps natural-order tables to
it); pointwise products are layout-agnostic and the inverse transform
consumes that layout and restores natural order, so NTT-domain
multiplication never pays an extra transpose (dist_ntt_mul).
`dist_interpolate` adds the one layout-restoring transpose needed to return
natural-order coefficients.

All entry points accept leading batch dimensions (the scaled prover's
15-polynomial coset stack rides ONE sharded transform, batched along the
leading axis — models/plonk_scaled.py round 3).
"""
from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops.ntt import ntt as _ntt


def local_ntt(F, x, w):
    # the roll-based blocked layout makes the SPMD partitioner blow up
    # compile times inside shard_map; use the reshape butterflies here
    return _ntt(F, x, w, layout="simple")

U32 = jnp.uint32


def _twiddle_block(Fp: int, w: int, n1: int, n2: int, d: int, n_dev: int,
                   inverse: bool) -> np.ndarray:
    """Host-side twiddle block w^{+-i2*k1} for device d's column chunk:
    shape (n1, n2/n_dev), rows k1, cols i2 in [d*n2/n_dev, ...)."""
    wq = pow(w, -1, Fp) if inverse else w
    cols = n2 // n_dev
    # row_pows[k1] = wq^{k1}; column c holds row_pows^{i2}, built by a
    # cumulative modular product in uint64 (p < 2^31 keeps products < 2^62)
    row_pows = np.empty(n1, dtype=np.uint64)
    cur = 1
    for r in range(n1):
        row_pows[r] = cur
        cur = (cur * wq) % Fp
    i2_start = d * cols
    col0 = np.array([pow(int(x), i2_start, Fp) for x in row_pows],
                    dtype=np.uint64)
    out = np.empty((n1, cols), dtype=np.uint32)
    acc = col0
    for c in range(cols):
        out[:, c] = acc
        acc = (acc * row_pows) % Fp
    return out


@functools.lru_cache(maxsize=None)
def _twiddle_all(Fp: int, w: int, n1: int, n2: int, n_dev: int,
                 inverse: bool) -> np.ndarray:
    """(n_dev, n1, n2/n_dev) stack of per-device twiddle blocks."""
    return np.stack([_twiddle_block(Fp, w, n1, n2, d, n_dev, inverse)
                     for d in range(n_dev)])


def _split(n: int, n_dev: int):
    """Pick n1 (columns transform length) divisible by n_dev and n2 = n/n1,
    also divisible by n_dev, both powers of two."""
    log_n = n.bit_length() - 1
    n1 = 1 << (log_n // 2)
    n2 = n // n1
    if n1 % n_dev or n2 % n_dev:
        n1 = max(n1, n_dev)
        n2 = n // n1
    if n1 % n_dev or n2 % n_dev or n1 * n2 != n:
        raise ValueError(f"cannot split n={n} across {n_dev} devices")
    return n1, n2


def transposed_perm(n: int, n_dev: int) -> np.ndarray:
    """Host permutation: perm[j] = natural index of the element the
    forward transform leaves at flat position j = k1*n2 + k2. Apply to a
    natural-order host table to align it with dist_ntt's output layout."""
    n1, n2 = _split(n, n_dev)
    k1, k2 = np.meshgrid(np.arange(n1), np.arange(n2), indexing="ij")
    return (k1 + n1 * k2).reshape(-1)



def _a2a(x, axis: str, n_dev: int, split_axis: int, concat_axis: int,
         exchange: str):
    """The transpose exchange: XLA collective (default) or the
    concurrent direct-RDMA Pallas kernel (pallas_collectives.py);
    "pallas_sim"/"pallas_races" run that kernel on the TPU interpret
    machine (CPU-testable). Bit-identical layouts."""
    if exchange == "xla":
        return jax.lax.all_to_all(x, axis, split_axis=split_axis,
                                  concat_axis=concat_axis, tiled=True)
    from .pallas_collectives import all_to_all_in_body
    mode = {"pallas": None, "pallas_sim": "sim",
            "pallas_races": "races"}[exchange]
    return all_to_all_in_body(axis, n_dev, x, split_axis, concat_axis,
                              mode)


def _spec(nbatch: int, axis: str) -> P:
    return P(*((None,) * nbatch + (axis,)))


def _fwd_local(F, x_loc, *, w, n1, n2, n_dev, axis, inverse,
               exchange="xla"):
    """Per-device body of the four-step transform. x_loc: batch +
    (n1/n_dev, n2) rows of the natural-order matrix. Returns rows of the
    (k1, k2) result matrix, same shape."""
    nb = x_loc.ndim - 2
    d = jax.lax.axis_index(axis)
    wq = pow(w, -1, F.p) if inverse else w
    # 1. transpose: -> batch + (n1, n2/n_dev) full columns
    cols = _a2a(x_loc, axis, n_dev, nb + 1, nb, exchange)
    # 2. local column transform (axis -2), root w^{n2} of order n1
    cols_t = local_ntt(F, cols.swapaxes(-1, -2),
                       pow(wq, n2, F.p)).swapaxes(-1, -2)
    # 3. twiddle w^{i2 k1}
    tw_all = F.array(_twiddle_all(F.p, w, n1, n2, n_dev, inverse))
    cols_t = F.mul(cols_t, tw_all[d])
    # 4. transpose back: -> batch + (n1/n_dev, n2) rows (rows = k1 chunks)
    rows = _a2a(cols_t, axis, n_dev, nb, nb + 1, exchange)
    # 5. local row transform (axis -1), root w^{n1} of order n2
    return local_ntt(F, rows, pow(wq, n1, F.p))


# Compiled-callable cache: on the virtual-CPU backend every distinct
# shard_map body costs ~n_dev times a normal compile (the partitions are
# replicated), so recompiling per call is ruinous for the test suite.
_SHMAP_CACHE: dict = {}


def _cached_shmap(key, build):
    f = _SHMAP_CACHE.get(key)
    if f is None:
        f = jax.jit(build())
        _SHMAP_CACHE[key] = f
    return f


def dist_ntt(F, mesh: Mesh, x, w: int, axis: str = "sp",
             inverse: bool = False, exchange: str = "xla"):
    """Forward (or unscaled-inverse) transform of an array of shape
    batch + (n,) sharded on the last axis. Input natural order; output in
    (k1, k2) transposed layout, sharded the same way."""
    n = x.shape[-1]
    batch = x.shape[:-1]
    nb = len(batch)
    n_dev = mesh.shape[axis]
    n1, n2 = _split(n, n_dev)

    def build():
        def body(x_loc):
            loc = x_loc.reshape(batch + (n1 // n_dev, n2))
            out = _fwd_local(F, loc, w=w, n1=n1, n2=n2, n_dev=n_dev,
                             axis=axis, inverse=inverse,
                             exchange=exchange)
            return out.reshape(batch + (n // n_dev,))

        return jax.shard_map(body, mesh=mesh, in_specs=_spec(nb, axis),
                             out_specs=_spec(nb, axis), check_vma=False)

    f = _cached_shmap(("fwd", F.p, mesh, axis, batch, n, w, inverse,
                       exchange), build)
    return f(x)


def _untranspose(F, mesh, y, n1, n2, axis, exchange="xla"):
    """(k1, k2) layout -> natural order k = k1 + n1*k2 (one all_to_all +
    local transpose)."""
    n_dev = mesh.shape[axis]
    batch = y.shape[:-1]
    nb = len(batch)

    def build():
        def body(y_loc):
            rows = y_loc.reshape(batch + (n1 // n_dev, n2))  # k1 rows
            cols = _a2a(rows, axis, n_dev, nb + 1, nb, exchange)
            # natural order as (k2, k1) row-major: transpose locally
            return cols.swapaxes(-1, -2).reshape(
                batch + (n1 * n2 // n_dev,))

        return jax.shard_map(body, mesh=mesh, in_specs=_spec(nb, axis),
                             out_specs=_spec(nb, axis), check_vma=False)

    f = _cached_shmap(("untrans", F.p, mesh, axis, batch, n1, n2,
                       exchange), build)
    return f(y)


def dist_intt(F, mesh: Mesh, y, w: int, axis: str = "sp",
              exchange: str = "xla"):
    """Inverse of dist_ntt: input in (k1, k2) layout, output natural-order
    coefficients (scaled by 1/n). Runs the forward steps backwards with
    inverse roots/twiddles — so a fwd/pointwise/inv chain costs exactly four
    all_to_alls total."""
    n = y.shape[-1]
    batch = y.shape[:-1]
    nb = len(batch)
    n_dev = mesh.shape[axis]
    n1, n2 = _split(n, n_dev)
    w_inv = pow(w, -1, F.p)

    def body(y_loc):
        rows = y_loc.reshape(batch + (n1 // n_dev, n2))  # k1 rows, k2 cols
        d = jax.lax.axis_index(axis)
        # undo step 5: inverse row transform (root (w^{n1})^{-1}, unscaled)
        rows = local_ntt(F, rows, pow(w_inv, n1, F.p))   # cols now i2
        # undo step 4: -> batch + (n1, n2/n_dev) full columns
        cols = _a2a(rows, axis, n_dev, nb + 1, nb, exchange)
        # undo step 3: inverse twiddle w^{-i2 k1}
        tw_all = F.array(_twiddle_all(F.p, w, n1, n2, n_dev, True))
        cols = F.mul(cols, tw_all[d])
        # undo step 2: inverse column transform (root (w^{n2})^{-1})
        cols = local_ntt(F, cols.swapaxes(-1, -2),
                         pow(w_inv, n2, F.p)).swapaxes(-1, -2)
        # undo step 1: -> batch + (n1/n_dev, n2) natural-order rows
        nat = _a2a(cols, axis, n_dev, nb, nb + 1, exchange)
        return nat.reshape(batch + (n // n_dev,))

    def build():
        return jax.shard_map(body, mesh=mesh, in_specs=_spec(nb, axis),
                             out_specs=_spec(nb, axis), check_vma=False)

    f = _cached_shmap(("inv", F.p, mesh, axis, batch, n, w, exchange),
                      build)
    out = f(y)
    return F.mul(out, F.const(pow(n, -1, F.p)))


def dist_ntt_mul(F, mesh: Mesh, a, b, w: int, axis: str = "sp"):
    """Pointwise product in the transform domain; inputs/outputs natural
    order, length n (cyclic convolution — callers pad to avoid wraparound)."""
    fa = dist_ntt(F, mesh, a, w, axis)
    fb = dist_ntt(F, mesh, b, w, axis)
    return dist_intt(F, mesh, F.mul(fa, fb), w, axis)


def dist_interpolate(F, mesh: Mesh, values, w: int, axis: str = "sp",
                     exchange: str = "xla"):
    """Natural-order INTT (the distributed interpolate_at_h)."""
    n = values.shape[-1]
    n_dev = mesh.shape[axis]
    n1, n2 = _split(n, n_dev)
    y = dist_ntt(F, mesh, values, w, axis, inverse=True,
                 exchange=exchange)
    y = _untranspose(F, mesh, y, n1, n2, axis, exchange)
    return F.mul(y, F.const(pow(n, -1, F.p)))
