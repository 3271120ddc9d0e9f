"""Multi-proof data parallelism: independent proofs batched with vmap and
sharded over a mesh 'dp' axis with pjit (SURVEY §2.3 — the reference proves
one circuit at a time, single thread).

The circuit (selectors, copy constraints) is shared; witnesses, challenges
and blinding vary per proof. One compiled program proves the whole batch.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models.plonk import PlonkContext, prove_core, Proof, Diagnostics

U32 = jnp.uint32


def make_batched_prover(ctx: PlonkContext, selectors, copies):
    """Returns fn(a_w, b_w, c_w, challenges, rands) vmapped over a leading
    batch axis of every argument."""
    selectors = jnp.asarray(selectors, U32)
    copies = jnp.asarray(copies)

    def single(a_w, b_w, c_w, challenge, rand9):
        return prove_core(ctx, selectors, copies, a_w, b_w, c_w, challenge,
                          rand9)

    return jax.vmap(single)


def make_sharded_prover(ctx: PlonkContext, selectors, copies, mesh: Mesh,
                        axis: str = "dp"):
    """jit-compiled batched prover with the batch dimension sharded over the
    mesh `axis` (DP): XLA partitions the whole 5-round pipeline."""
    batched = make_batched_prover(ctx, selectors, copies)
    batch_sharding = NamedSharding(mesh, P(axis))

    @jax.jit
    def run(a_w, b_w, c_w, challenges, rands):
        args = [jax.lax.with_sharding_constraint(x, batch_sharding)
                for x in (a_w, b_w, c_w, challenges, rands)]
        return batched(*args)

    return run
