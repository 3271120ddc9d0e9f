"""Distributed prefix product — the sharded grand-product argument.

The prover's round-2 accumulator is a prefix product of per-row fractions
(src/plonk.h:320-359 computes it as a sequential O(n^2) loop; the
single-chip prover uses `lax.associative_scan`). When the row dimension is
sharded across the mesh, the scan splits into:

1. a local inclusive scan per shard,
2. an exchange of shard totals (all_gather over ICI — D values),
3. a broadcasted multiply by the product of all preceding shards' totals.

Exact in a field (multiplication is associative/commutative), so the result
is bit-identical to the sequential fold.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

U32 = jnp.uint32

_CACHE: dict = {}


def dist_prefix_prod(F, mesh: Mesh, x, axis: str = "sp",
                     exchange: str = "xla"):
    """Inclusive prefix product of a sharded 1-D array (same sharding out).

    exchange: how the D shard totals are exchanged — "xla"
    (lax.all_gather, default), "pallas" (remote-DMA ring kernel,
    parallel/pallas_collectives.py) or "pallas_sim"/"pallas_races" (the
    same kernel on the TPU interpret machine — CPU-testable, the latter
    with vector-clock race detection). Bit-identical outputs."""
    n = x.shape[-1]
    n_dev = mesh.shape[axis]
    key = ("pscan", F.p, mesh, axis, n, exchange)
    f = _CACHE.get(key)
    if f is None:
        def gather_totals(t):
            if exchange == "xla":
                return jax.lax.all_gather(t, axis)
            from .pallas_collectives import gather_in_body
            mode = {"pallas": None, "pallas_sim": "sim",
                    "pallas_races": "races"}[exchange]
            return gather_in_body(axis, n_dev, t[None], mode)

        def body(xl):
            local = jax.lax.associative_scan(F.mul, xl)
            totals = gather_totals(local[-1])                 # (D,)
            idx = jax.lax.axis_index(axis)
            mask = jnp.arange(n_dev) < idx
            prior = jnp.where(mask, totals,
                              jnp.broadcast_to(F.ones(), (n_dev,)).astype(U32))

            def fold(i, acc):
                return F.mul(acc, prior[i])

            carry = jax.lax.fori_loop(0, n_dev, fold,
                                      F.ones(()).astype(U32))
            return F.mul(local, carry)

        f = jax.jit(jax.shard_map(body, mesh=mesh, in_specs=P(axis),
                                  out_specs=P(axis), check_vma=False))
        _CACHE[key] = f
    return f(x)


def dist_grand_product(F, mesh: Mesh, fractions, axis: str = "sp",
                       exchange: str = "xla"):
    """The permutation accumulator: [1, f0, f0*f1, ...] over sharded
    fractions of length n-1 padded to n (the caller supplies n-1 fractions
    padded with a trailing 1 so the shard shapes stay uniform); returns the
    length-n accumulator [1, prefix products...]."""
    scanned = dist_prefix_prod(F, mesh, fractions, axis, exchange)
    one = jnp.broadcast_to(F.ones(), (1,)).astype(U32)
    # shift right by one with a leading 1 (drop the final element)
    return jnp.concatenate([one, scanned[..., :-1]])
