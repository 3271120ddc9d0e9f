"""Mesh-sharded scaled prover: the distributed kernels wired INTO the
5-round pipeline (SURVEY §2.3 — these components *replace* the prover's
NTT/MSM/scan over the mesh; reference counterparts src/poly.h:106-122,
src/srs.h:53-68, src/plonk.h:320-359).

`make_dist_prims(ctx, mesh)` builds a ProverPrims whose heavy kernels are:

- interpolations / coset stack: distributed four-step NTT (dist_ntt) —
  the 15-poly round-3 stack rides ONE domain-sharded batched transform,
  staying in the (k1, k2) transposed layout through the pointwise quotient
  algebra (the coset-point table is host-permuted to match);
- grand product: sharded prefix scan (dist_scan);
- commitments: fixed-base gather MSM with the window TABLE sharded across
  the mesh (each chip gathers + tree-reduces its slice of the SRS terms;
  an all_gather of per-chip Jacobian partials + a tiny fold finishes).

Field/EC math is exact, so `prove_scaled(..., prims=make_dist_prims(...))`
produces the BIT-IDENTICAL Proof to the single-chip prover (asserted in
tests/test_dist_prover.py on the 8-device CPU mesh).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..models import plonk_scaled as PS
from ..ops.curve import G1, G1J, jac_add, jac_to_affine
from ..ops import poly as Poly
from . import dist_ntt as DN
from .dist_scan import dist_grand_product

U32 = jnp.uint32

_SHMAP_CACHE: dict = {}


def _pad_table(ctx, n_dev: int):
    """Fixed-base table with the point axis padded to a multiple of the
    mesh axis size (identity entries contribute nothing); cached on ctx."""
    key = "_fb_table_pad%d" % n_dev
    tbl = getattr(ctx, key, None)
    if tbl is None:
        from ..ops.fixed_base import FixedBaseTable
        base = PS.fixed_base_table(ctx)
        W, B, L = base.x.shape
        Lp = -(-L // n_dev) * n_dev
        if Lp != L:
            with jax.ensure_compile_time_eval():
                padx = jnp.zeros((W, B, Lp - L), U32)
                pady = jnp.zeros((W, B, Lp - L), U32)
                padi = jnp.ones((W, B, Lp - L), jnp.bool_)
                tbl = FixedBaseTable(
                    x=jnp.concatenate([base.x, padx], axis=2),
                    y=jnp.concatenate([base.y, pady], axis=2),
                    inf=jnp.concatenate([base.inf, padi], axis=2),
                    window_bits=base.window_bits)
        else:
            tbl = base
        object.__setattr__(ctx, key, tbl)
    return tbl


def dist_commit_many(ctx, mesh: Mesh, coeff_list, axis: str = "sp") -> G1:
    """Batched fixed-base commitments with the SRS table sharded along the
    point axis. Identical group outputs (hence identical affine bits) to
    the single-chip path."""
    from ..ops.fixed_base import _gather_terms, _tree_reduce, FixedBaseTable
    Fr, Fq = ctx.Fr, ctx.Fq
    n_dev = mesh.shape[axis]
    tbl = _pad_table(ctx, n_dev)
    L = ctx.srs.length
    Lp = tbl.x.shape[2]
    wb = tbl.window_bits
    nB = len(coeff_list)
    padded = jnp.stack([Poly.pad_to(c, Lp)[..., :Lp] for c in coeff_list])
    scalars = Fr.decode(padded)
    # padding lanes beyond the SRS length must contribute nothing
    scalars = scalars * (jnp.arange(Lp) < L).astype(U32)

    key = ("commit", ctx.params.field.p, mesh, axis, nB, Lp, wb)
    f = _SHMAP_CACHE.get(key)
    if f is None:
        def body(tx, ty, tinf, sc):
            local = FixedBaseTable(tx, ty, tinf, wb)

            def one(s):
                return _tree_reduce(Fq, _gather_terms(Fq, local, s))

            part = jax.vmap(one)(sc)                      # G1J (nB,)
            Xs = jax.lax.all_gather(part.X, axis)          # (D, nB)
            Ys = jax.lax.all_gather(part.Y, axis)
            Zs = jax.lax.all_gather(part.Z, axis)

            def fold(i, acc):
                return jac_add(Fq, acc, G1J(Xs[i], Ys[i], Zs[i]))

            tot = jax.lax.fori_loop(0, Xs.shape[0], fold,
                                    G1J.identity(Fq, (nB,)))
            return tot.X, tot.Y, tot.Z

        f = jax.jit(jax.shard_map(
            body, mesh=mesh,
            in_specs=(P(None, None, axis), P(None, None, axis),
                      P(None, None, axis), P(None, axis)),
            out_specs=(P(), P(), P()), check_vma=False))
        _SHMAP_CACHE[key] = f
    X, Y, Z = f(tbl.x, tbl.y, tbl.inf, scalars)
    return jac_to_affine(Fq, G1J(X, Y, Z))


def make_dist_prims(ctx, mesh: Mesh, axis: str = "sp",
                    exchange: str = "xla") -> PS.ProverPrims:
    """ProverPrims running every heavy kernel sharded over `axis`.
    exchange: "xla" (lax collectives) or "pallas" (remote-DMA kernels,
    parallel/pallas_collectives.py) for the NTT transposes and the
    grand-product totals exchange; bit-identical proofs either way."""
    m = ctx.domain8
    n_dev = mesh.shape[axis]
    perm = DN.transposed_perm(m, n_dev)

    def grand_product(F, fractions):
        one = jnp.broadcast_to(F.ones(), (1,)).astype(U32)
        padded = jnp.concatenate([fractions, one])
        return dist_grand_product(F, mesh, padded, axis, exchange)

    return PS.ProverPrims(
        intt_n=lambda F, x, w: DN.dist_interpolate(F, mesh, x, w, axis,
                                                    exchange=exchange),
        ntt8=lambda F, x, w: DN.dist_ntt(F, mesh, x, w, axis,
                                         exchange=exchange),
        intt8=lambda F, x, w: DN.dist_intt(F, mesh, x, w, axis,
                                           exchange=exchange),
        grand_product=grand_product,
        commit_many=lambda c, lst: dist_commit_many(c, mesh, lst, axis),
        perm8=lambda tbl: tbl[perm])
