"""Batched Miller-loop pairing (replaces src/pairing.h).

The reference computes the Miller function recursively, re-deriving r*P from
scratch with a full scalar-mul at every level (src/pairing.h:31-64 — O(log^2)
point ops). Here the recursion is unrolled host-side into the identical
sequence of even ("square + tangent line") and odd ("multiply + chord line")
steps, and executed as ONE `lax.scan` over the step schedule with the
running multiple of P carried incrementally — the field values at every step
are identical (affine coordinates are unique), so the output is bit-exact
while doing O(log r) point ops and compiling to a single rolled loop body
(the naive unroll at 31-bit field sizes explodes XLA compile times).

Everything is expressed on batched point structs, so verifying a batch of
KZG openings is a single vmapped kernel.

Final exponentiation: exp = (p^k - 1) / r (src/pairing.h:71-78) via the
Frobenius split x^e = conj(x^(e // p)) * x^(e % p) for e >= p — exactly the
reference's shortcut (src/gt.h:30-51); the sub-exponentiations run as
scans over the exponent bits. Any correct exponentiation yields the same
field element; the structure is kept for clarity.

e(infinity, Q) is defined as 1 here (the reference has no G1 infinity
handling in lines and never pairs with it; the verifier needs the case).
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from .curve import (G1, G2, GT, g1_add, g1_double, g1_neg, gt_mul, gt_conj,
                    _sel)

U32 = jnp.uint32


def _line(F, a: G1, b: G1):
    """Line through two (distinct-x) G1 points as (lx, ly, c) coefficients
    (src/pairing.h:17-29)."""
    m = F.sub(b.x, a.x)
    n = F.sub(b.y, a.y)
    return n, F.neg(m), F.sub(F.mul(m, a.y), F.mul(n, a.x))


def _gt_term(F, q: G2, lx, ly, c) -> GT:
    """Evaluate the line at the twisted point Q: (qx*lx + c) + (qy*ly) u
    (src/pairing.h:42-44, 57-59)."""
    return GT(F.add(F.mul(q.x, lx), c), F.mul(q.y, ly))


def _miller_schedule(r: int) -> np.ndarray:
    """The reference recursion r -> (r-1 | r/2) -> ... -> 1, replayed
    bottom-up: per-step flags (1 = double step, 0 = add step)."""
    steps = []
    while r > 1:
        if r % 2 == 1:
            steps.append(0)
            r -= 1
        else:
            steps.append(1)
            r //= 2
    return np.array(list(reversed(steps)), dtype=np.int32)


def miller_loop(F, curve, p: G1, q: G2, r: int | None = None) -> GT:
    """pairing_f(r, P, Q) (src/pairing.h:31-64): one scan over the step
    schedule, batched over any leading point dims."""
    r = curve.r if r is None else r
    d = curve.d
    shape = jnp.broadcast_shapes(jnp.shape(p.x), jnp.shape(q.x))
    f0 = GT.one(F, shape)
    base = G1(jnp.broadcast_to(p.x, shape), jnp.broadcast_to(p.y, shape),
              jnp.broadcast_to(p.inf, shape))
    qb = G2(jnp.broadcast_to(q.x, shape), jnp.broadcast_to(q.y, shape))
    sched = jnp.asarray(_miller_schedule(r))

    def step(carry, is_dbl):
        f, cur = carry
        # double step: f <- f^2 * line(T, -2T)(Q); T <- 2T
        neg_t = g1_neg(F, cur)
        two_neg_t = g1_double(F, neg_t)
        lxd, lyd, cd = _line(F, cur, two_neg_t)
        f_dbl = gt_mul(F, d, gt_mul(F, d, f, f),
                       _gt_term(F, qb, lxd, lyd, cd))
        cur_dbl = g1_double(F, cur)
        # add step: f <- f * line(T, P)(Q); T <- T + P
        lxa, lya, ca = _line(F, cur, base)
        f_add = gt_mul(F, d, f, _gt_term(F, qb, lxa, lya, ca))
        cur_add = g1_add(F, cur, base)

        m = is_dbl == 1
        f = GT(_sel(m, f_dbl.a, f_add.a), _sel(m, f_dbl.b, f_add.b))
        cur = G1(_sel(m, cur_dbl.x, cur_add.x),
                 _sel(m, cur_dbl.y, cur_add.y),
                 _sel(m, cur_dbl.inf, cur_add.inf))
        return (f, cur), None

    (f, _), _ = jax.lax.scan(step, (f0, base), sched)
    return f


def gt_pow_scan(F, d_const: int, x: GT, e: int) -> GT:
    """x^e for a static exponent as an MSB-first square-and-multiply scan
    (one rolled loop body; bit pattern is a compile-time constant)."""
    if e == 0:
        return GT.one(F, jnp.shape(x.a))
    bits = jnp.asarray(
        np.array([int(b) for b in bin(e)[3:]], dtype=np.int32))
    if bits.shape[0] == 0:
        return x

    def step(acc, bit):
        sq = gt_mul(F, d_const, acc, acc)
        withx = gt_mul(F, d_const, sq, x)
        m = bit == 1
        return GT(_sel(m, withx.a, sq.a), _sel(m, withx.b, sq.b)), None

    acc, _ = jax.lax.scan(step, x, bits)
    return acc


def final_exponentiation(F, curve, f: GT) -> GT:
    """f^((p^k - 1)/r) with the reference's Frobenius split for exponents
    >= p (src/gt.h:30-51): x^e = conj(x^(e//p)) * x^(e%p)."""
    e = curve.final_exp
    p = F.p
    if e >= p:
        hi = gt_pow_scan(F, curve.d, f, e // p)
        lo = gt_pow_scan(F, curve.d, f, e % p)
        return gt_mul(F, curve.d, gt_conj(F, hi), lo)
    return gt_pow_scan(F, curve.d, f, e)


def pairing(F, curve, p: G1, q: G2) -> GT:
    """Full pairing e(P, Q) (src/pairing.h:66-83). e(infinity, Q) = 1."""
    f = miller_loop(F, curve, p, q)
    out = final_exponentiation(F, curve, f)
    one = GT.one(F, jnp.shape(out.a))
    return GT(_sel(p.inf, one.a, out.a), _sel(p.inf, one.b, out.b))
