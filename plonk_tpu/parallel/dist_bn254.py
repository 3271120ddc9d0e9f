"""Mesh-sharded BN254 prover kernels — the production-curve analog of
parallel/dist_prover.py.

`make_dist_bn254_prims(ctx, mesh)` returns a `plonk_bn254.BN254Prims`
whose heavy kernels run sharded over the mesh axis:

- the 12-poly interpolation stack, the accumulator INTT, and the 4n
  coset transforms through the distributed limb four-step NTT
  (parallel/dist_bigntt.py — all_to_all transposes over ICI);
- the grand product as per-shard prefix products + a totals exchange
  (the limb lift of dist_scan.dist_prefix_prod);
- the 9 commitments as per-shard Pippenger partials over the point
  shards + a log-depth cross-shard Jacobian reduction.

Proofs are BIT-IDENTICAL to the single-chip prover (field ops are
exact; tested in tests/test_dist_prover.py's heavy lane). Reference
counterparts: src/poly.h:106-122, src/srs.h:53-68, src/plonk.h:320-359
(all single-threaded loops there).
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..ops.bigfield import BigMontField
from ..ops import bigpoly as BPol
from ..ops.bigcurve import BigG1J, big_jac_add, big_msm_pippenger_many, \
    big_to_affine
from ..models import plonk_bn254 as PB
from . import dist_bigntt as DBN
from .dist_ntt import transposed_perm, _cached_shmap

U32 = jnp.uint32


def dist_big_prefix_prod(F: BigMontField, mesh: Mesh, x,
                         axis: str = "sp", exchange: str = "xla"):
    """Inclusive prefix product of a sharded (n, limbs) array (sharded on
    the coefficient axis; same sharding out). Exact/bit-identical to the
    sequential fold — field multiplication is associative."""
    n = x.shape[-2]
    n_dev = mesh.shape[axis]

    def build():
        def body(xl):
            local = BPol.prefix_prod_chunked(F, xl)
            if exchange == "xla":
                totals = jax.lax.all_gather(local[-1], axis)   # (D, limbs)
            else:
                from .pallas_collectives import gather_in_body
                mode = {"pallas": None, "pallas_sim": "sim",
                        "pallas_races": "races"}[exchange]
                totals = gather_in_body(axis, n_dev, local[-1][None], mode)
            idx = jax.lax.axis_index(axis)
            ones = jnp.broadcast_to(F.const(1), (n_dev, F.limbs))
            prior = jnp.where((jnp.arange(n_dev) < idx)[:, None],
                              totals, ones)

            def fold(carry, t):
                return F.mont_mul(carry, t), None

            carry, _ = jax.lax.scan(fold, F.const(1).astype(U32), prior)
            return F.mont_mul(local, carry[None])

        spec = P(axis, None)
        return jax.shard_map(body, mesh=mesh, in_specs=spec,
                             out_specs=spec, check_vma=False)

    f = _cached_shmap(("big_pscan", F.p, mesh, axis, n, exchange), build)
    return f(x)


def dist_big_commit_many(ctx, mesh: Mesh, coeff_list,
                         axis: str = "sp", window_bits: int = 8):
    """The 9 commitments with SRS points sharded across the mesh:
    per-shard Pippenger partial MSMs + a log-depth Jacobian tree over the
    gathered shard partials (reference MSM loop: src/srs.h:53-68)."""
    Fr, Fq = ctx.Fr, ctx.Fq
    n_dev = mesh.shape[axis]
    L = ctx.srs.length
    Lp = -(-L // n_dev) * n_dev
    B = len(coeff_list)

    padded = jnp.stack([BPol.pad_to(c, L)[..., :L, :] for c in coeff_list])
    scalars = Fr.decode(padded)                    # (B, L, words) standard
    if Lp != L:
        scalars = jnp.pad(scalars, ((0, 0), (0, Lp - L), (0, 0)))

    g1s = ctx.srs.g1s
    one = jnp.broadcast_to(Fq.const(1), g1s.x.shape)
    Z = jnp.where(g1s.inf[..., None], jnp.zeros_like(one), one)
    px = jnp.where(g1s.inf[..., None], one, g1s.x)
    py = jnp.where(g1s.inf[..., None], one, g1s.y)
    if Lp != L:
        pad_pt = BigG1J.identity(Fq, (Lp - L,))
        px = jnp.concatenate([px, pad_pt.X])
        py = jnp.concatenate([py, pad_pt.Y])
        Z = jnp.concatenate([Z, pad_pt.Z])

    def build():
        def body(pxl, pyl, pzl, sl):
            part = big_msm_pippenger_many(
                Fq, BigG1J(pxl, pyl, pzl), sl, window_bits=window_bits,
                scalar_bits=PB.FR_BITS)            # (B,) Jacobian partials
            gx = jax.lax.all_gather(part.X, axis)  # (D, B, limbs)
            gy = jax.lax.all_gather(part.Y, axis)
            gz = jax.lax.all_gather(part.Z, axis)
            acc = BigG1J(gx, gy, gz)
            m = n_dev
            while m > 1:
                h = m // 2
                take = lambda t, a, b: jax.tree_util.tree_map(
                    lambda u: u[a:b], t)
                acc = big_jac_add(Fq, take(acc, 0, h), take(acc, h, m))
                m = h
            return acc.X[0], acc.Y[0], acc.Z[0]

        return jax.shard_map(
            body, mesh=mesh,
            in_specs=(P(axis, None), P(axis, None), P(axis, None),
                      P(None, axis, None)),
            out_specs=(P(None, None), P(None, None), P(None, None)),
            check_vma=False)

    f = _cached_shmap(("big_commit", Fq.p, mesh, axis, Lp, B,
                       window_bits), build)
    X, Y, Zc = f(px, py, Z, scalars)
    x, y, inf = big_to_affine(Fq, BigG1J(X, Y, Zc))
    return PB.BigG1Affine(x=x, y=y, inf=inf)


def make_dist_bn254_prims(ctx, mesh: Mesh, axis: str = "sp",
                          exchange: str = "xla") -> PB.BN254Prims:
    """BN254Prims running every heavy kernel sharded over `axis`;
    exchange as in dist_ntt._a2a (xla | pallas | pallas_sim)."""
    m = 4 * ctx.n
    n_dev = mesh.shape[axis]
    perm = transposed_perm(m, n_dev)

    def grand_product(F, fractions):
        one = jnp.broadcast_to(F.const(1), (1, F.limbs)).astype(U32)
        padded = jnp.concatenate([fractions, one])
        scanned = dist_big_prefix_prod(F, mesh, padded, axis, exchange)
        return jnp.concatenate([one, scanned[:-1]])

    return PB.BN254Prims(
        intt_n=lambda F, x: DBN.dist_big_interpolate(
            F, mesh, x, ctx.omega, axis, exchange),
        ntt4n=lambda F, x: DBN.dist_big_ntt(
            F, mesh, x, ctx.omega4, axis, exchange=exchange),
        intt4n=lambda F, x: DBN.dist_big_intt(
            F, mesh, x, ctx.omega4, axis, exchange),
        grand_product=grand_product,
        commit_many=lambda coeffs: dist_big_commit_many(
            ctx, mesh, coeffs, axis),
        perm4n=lambda tbl: tbl[perm])
