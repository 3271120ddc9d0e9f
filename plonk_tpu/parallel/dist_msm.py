"""Sharded multi-scalar multiplication.

Points and scalars are partitioned across the mesh axis (data parallel over
the MSM terms — SURVEY §2.3); each chip runs a local Pippenger bucket pass,
then the per-chip partial sums are combined with an all_gather + local
EC-add fold (EC points don't reduce with psum, the fold is log-depth over
n_dev partials and trivially cheap)."""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..ops.curve import G1, g1_add, _sel_g1
from ..ops.msm import msm_pippenger

U32 = jnp.uint32


def dist_msm(F, mesh: Mesh, pts: G1, scalars: jnp.ndarray,
             axis: str = "sp", window_bits: int = 5,
             scalar_bits: int = 32) -> G1:
    """sum_i scalars[i] * pts[i] with terms sharded along `axis`. Returns a
    replicated G1 scalar."""

    def body(px, py, pinf, sc):
        partial = msm_pippenger(F, G1(px, py, pinf), sc,
                                window_bits=window_bits,
                                scalar_bits=scalar_bits)
        # gather all partials and fold identically on every device
        xs = jax.lax.all_gather(partial.x, axis)
        ys = jax.lax.all_gather(partial.y, axis)
        infs = jax.lax.all_gather(partial.inf, axis)

        def fold(i, acc):
            return g1_add(F, acc, G1(xs[i], ys[i], infs[i]))

        total = jax.lax.fori_loop(0, xs.shape[0], fold, G1.identity())
        return total.x, total.y, total.inf

    f = jax.shard_map(body, mesh=mesh,
                      in_specs=(P(axis), P(axis), P(axis), P(axis)),
                      out_specs=(P(), P(), P()), check_vma=False)
    x, y, inf = f(pts.x, pts.y, pts.inf, jnp.asarray(scalars, U32))
    return G1(x, y, inf)
