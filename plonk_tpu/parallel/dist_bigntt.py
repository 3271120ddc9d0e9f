"""Distributed four-step NTT over multi-limb (BigMontField) arrays.

The limb lift of parallel/dist_ntt.py: coefficients live on axis -2 with
the 16-bit-word limb axis trailing (ops/bigfield.py), the evaluation
domain is sharded across the mesh, local transforms are `big_ntt`, and
the only communication is the two matrix transposes — `lax.all_to_all`
over the coefficient axis (the limb axis rides along untouched). Same
decomposition and (k1, k2) transposed output layout as the scalar
version (see dist_ntt.py's header); `transposed_perm` from dist_ntt
applies unchanged to natural-order tables.

This powers the mesh-sharded BN254 prover (parallel/dist_bn254.py) —
the production-curve analog of dist_prover.make_dist_prims. Twiddle
blocks are computed host-side with python ints (254-bit moduli overflow
the uint64 fast path of dist_ntt._twiddle_block) and Montgomery-encoded
once per (p, w, split).
"""
from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..ops.bigfield import BigMontField, big_ntt
from .dist_ntt import _split, _cached_shmap, _a2a

U32 = jnp.uint32


@functools.lru_cache(maxsize=None)
def _twiddle_words(p: int, w: int, n1: int, n2: int, n_dev: int,
                   inverse: bool, limbs: int) -> np.ndarray:
    """(n_dev, n1, n2/n_dev, limbs) Montgomery-encoded twiddle blocks
    w^{+-i2*k1} (python-int exponentiation — 254-bit safe)."""
    wq = pow(w, -1, p) if inverse else w
    cols = n2 // n_dev
    vals = np.empty((n_dev, n1, cols), dtype=object)
    for d in range(n_dev):
        for k1 in range(n1):
            base = pow(wq, k1, p)
            cur = pow(base, d * cols, p)
            for c in range(cols):
                vals[d, k1, c] = cur
                cur = cur * base % p
    # Montgomery-encode: x * 2^(16*limbs) mod p, little-endian 16-bit words
    R = 1 << (16 * limbs)
    out = np.empty((n_dev, n1, cols, limbs), dtype=np.uint32)
    flat_v = vals.reshape(-1)
    flat_o = out.reshape(-1, limbs)
    for i, v in enumerate(flat_v):
        m = v * R % p
        flat_o[i] = [(m >> (16 * j)) & 0xFFFF for j in range(limbs)]
    return out


def dist_big_ntt(F: BigMontField, mesh: Mesh, x, w: int, axis: str = "sp",
                 inverse: bool = False, exchange: str = "xla"):
    """Forward (or unscaled-inverse) transform of batch + (n, limbs)
    sharded on the COEFFICIENT axis (-2). Natural order in, (k1, k2)
    transposed layout out, same sharding."""
    n = x.shape[-2]
    limbs = x.shape[-1]
    batch = x.shape[:-2]
    nb = len(batch)
    n_dev = mesh.shape[axis]
    n1, n2 = _split(n, n_dev)
    wq = pow(w, -1, F.p) if inverse else w
    tw_all = jnp.asarray(_twiddle_words(F.p, w, n1, n2, n_dev, inverse,
                                        limbs))

    def build():
        def body(x_loc):
            d = jax.lax.axis_index(axis)
            loc = x_loc.reshape(batch + (n1 // n_dev, n2, limbs))
            # 1. transpose -> batch + (n1, n2/n_dev, limbs) full columns
            cols = _a2a(loc, axis, n_dev, nb + 1, nb, exchange)
            # 2. local size-n1 NTT along the n1 axis (root w^{n2})
            cols_t = big_ntt(F, cols.swapaxes(-3, -2),
                             pow(wq, n2, F.p)).swapaxes(-3, -2)
            # 3. twiddle w^{i2 k1}
            cols_t = F.mont_mul(cols_t, tw_all[d])
            # 4. transpose back -> batch + (n1/n_dev, n2, limbs) k1 rows
            rows = _a2a(cols_t, axis, n_dev, nb, nb + 1, exchange)
            # 5. local size-n2 NTT along the n2 axis (root w^{n1})
            out = big_ntt(F, rows, pow(wq, n1, F.p))
            return out.reshape(batch + (n // n_dev, limbs))

        spec = P(*((None,) * nb + (axis, None)))
        return jax.shard_map(body, mesh=mesh, in_specs=spec,
                             out_specs=spec, check_vma=False)

    f = _cached_shmap(("big_fwd", F.p, mesh, axis, batch, n, w, inverse,
                       limbs, exchange), build)
    return f(x)


def dist_big_intt(F: BigMontField, mesh: Mesh, y, w: int,
                  axis: str = "sp", exchange: str = "xla"):
    """Inverse of dist_big_ntt: (k1, k2) layout in, natural-order
    coefficients out (scaled by 1/n)."""
    n = y.shape[-2]
    limbs = y.shape[-1]
    batch = y.shape[:-2]
    nb = len(batch)
    n_dev = mesh.shape[axis]
    n1, n2 = _split(n, n_dev)
    w_inv = pow(w, -1, F.p)
    tw_all = jnp.asarray(_twiddle_words(F.p, w, n1, n2, n_dev, True,
                                        limbs))

    def build():
        def body(y_loc):
            d = jax.lax.axis_index(axis)
            rows = y_loc.reshape(batch + (n1 // n_dev, n2, limbs))
            # undo 5: inverse row transform (root (w^{n1})^{-1}, unscaled)
            rows = big_ntt(F, rows, pow(w_inv, n1, F.p))
            # undo 4: -> full columns
            cols = _a2a(rows, axis, n_dev, nb + 1, nb, exchange)
            # undo 3: inverse twiddle
            cols = F.mont_mul(cols, tw_all[d])
            # undo 2: inverse column transform
            cols = big_ntt(F, cols.swapaxes(-3, -2),
                           pow(w_inv, n2, F.p)).swapaxes(-3, -2)
            # undo 1: -> natural-order rows
            nat = _a2a(cols, axis, n_dev, nb, nb + 1, exchange)
            return nat.reshape(batch + (n // n_dev, limbs))

        spec = P(*((None,) * nb + (axis, None)))
        return jax.shard_map(body, mesh=mesh, in_specs=spec,
                             out_specs=spec, check_vma=False)

    f = _cached_shmap(("big_inv", F.p, mesh, axis, batch, n, w, limbs,
                       exchange), build)
    out = f(y)
    return F.mont_mul(out, F.const(pow(n, -1, F.p)))


def _untranspose_big(F, mesh, y, n1, n2, axis, exchange="xla"):
    """(k1, k2) layout -> natural order (one all_to_all + local swap)."""
    limbs = y.shape[-1]
    batch = y.shape[:-2]
    nb = len(batch)
    n_dev = mesh.shape[axis]

    def build():
        def body(y_loc):
            rows = y_loc.reshape(batch + (n1 // n_dev, n2, limbs))
            cols = _a2a(rows, axis, n_dev, nb + 1, nb, exchange)
            return cols.swapaxes(-3, -2).reshape(
                batch + (n1 * n2 // n_dev, limbs))

        spec = P(*((None,) * nb + (axis, None)))
        return jax.shard_map(body, mesh=mesh, in_specs=spec,
                             out_specs=spec, check_vma=False)

    f = _cached_shmap(("big_untrans", F.p, mesh, axis, batch, n1, n2,
                       limbs, exchange), build)
    return f(y)


def dist_big_interpolate(F: BigMontField, mesh: Mesh, values, w: int,
                         axis: str = "sp", exchange: str = "xla"):
    """Natural-order INTT (the distributed interpolate) over limbs."""
    n = values.shape[-2]
    n_dev = mesh.shape[axis]
    n1, n2 = _split(n, n_dev)
    y = dist_big_ntt(F, mesh, values, w, axis, inverse=True,
                     exchange=exchange)
    y = _untranspose_big(F, mesh, y, n1, n2, axis, exchange)
    return F.mont_mul(y, F.const(pow(n, -1, F.p)))
