"""Batched Miller-loop pairing (replaces src/pairing.h).

The reference computes the Miller function recursively, re-deriving r*P from
scratch with a full scalar-mul at every level (src/pairing.h:31-64 — O(log^2)
point ops). Here the recursion is unrolled host-side into the identical
sequence of even ("square + tangent line") and odd ("multiply + chord line")
steps, with the running multiple of P carried incrementally — the field
values at every step are identical (point coordinates are unique), so the
output is bit-exact while doing O(log r) point ops.

Everything is expressed on batched point structs, so verifying a batch of
KZG openings is a single vmapped kernel.

Final exponentiation: exp = (p^k - 1) / r (src/pairing.h:71-78) applied via
gt_pow_static, which follows the reference's Frobenius-conjugation recursion
(src/gt.h:30-51).

e(infinity, Q) is defined as 1 here (the reference has no G1 infinity
handling in lines and never pairs with it; the verifier needs the case).
"""
from __future__ import annotations

import jax.numpy as jnp

from .curve import (G1, G2, GT, g1_add, g1_double, g1_neg, gt_mul, gt_conj,
                    gt_pow_static, _sel)

U32 = jnp.uint32


def _line(F, a: G1, b: G1):
    """Line through two (distinct-x) G1 points as (lx, ly, c) coefficients
    (src/pairing.h:17-29)."""
    m = F.sub(b.x, a.x)
    n = F.sub(b.y, a.y)
    lx = n
    ly = F.neg(m)
    c = F.sub(F.mul(m, a.y), F.mul(n, a.x))
    return lx, ly, c


def _gt_term(F, q: G2, lx, ly, c) -> GT:
    """Evaluate the line at the twisted point Q: (qx*lx + c) + (qy*ly) u
    (src/pairing.h:42-44, 57-59)."""
    return GT(F.add(F.mul(q.x, lx), c), F.mul(q.y, ly))


def _miller_schedule(r: int):
    """The reference recursion r -> (r-1 | r/2) -> ... -> 1, replayed
    bottom-up: list of ('dbl' | 'add') steps from 1 to r."""
    steps = []
    while r > 1:
        if r % 2 == 1:
            steps.append("add")
            r -= 1
        else:
            steps.append("dbl")
            r //= 2
    return list(reversed(steps))


def miller_loop(F, curve, p: G1, q: G2, r: int | None = None) -> GT:
    """pairing_f(r, P, Q) (src/pairing.h:31-64), iterative and batched."""
    r = curve.r if r is None else r
    shape = jnp.broadcast_shapes(jnp.shape(p.x), jnp.shape(q.x))
    f = GT.one(F, shape)
    t = G1(jnp.broadcast_to(p.x, shape), jnp.broadcast_to(p.y, shape),
           jnp.broadcast_to(p.inf, shape))  # running multiple m*P, m=1
    cur = t
    for step in _miller_schedule(r):
        if step == "dbl":
            # f <- f^2 * line(T, -2T)(Q);  T <- 2T
            neg_t = g1_neg(F, cur)
            two_neg_t = g1_double(F, neg_t)
            lx, ly, c = _line(F, cur, two_neg_t)
            f = gt_mul(F, curve.d, gt_mul(F, curve.d, f, f),
                       _gt_term(F, q, lx, ly, c))
            cur = g1_double(F, cur)
        else:
            # f <- f * line(T, P)(Q);  T <- T + P  (odd step: r = m+1)
            lx, ly, c = _line(F, cur, t)
            f = gt_mul(F, curve.d, f, _gt_term(F, q, lx, ly, c))
            cur = g1_add(F, cur, t)
    return f


def pairing(F, curve, p: G1, q: G2) -> GT:
    """Full pairing e(P, Q) = f^((p^k - 1)/r) (src/pairing.h:66-83).
    e(infinity, Q) = 1."""
    f = miller_loop(F, curve, p, q)
    out = gt_pow_static(F, curve.d, f, curve.final_exp)
    one = GT.one(F, jnp.shape(out.a))
    return GT(_sel(p.inf, one.a, out.a), _sel(p.inf, one.b, out.b))
