"""Batched elliptic-curve group kernels: G1, G2 (quadratic twist), GT.

TPU-native replacement for src/g1.h, src/g2.h, src/gt.h. Points are structs
of uint32 coordinate arrays (any batch shape); the point at infinity is a
lane mask instead of a branch (src/g1.h:8-11 uses a bool field + branches).
Addition/doubling are branchless: every candidate (chord, tangent, identity)
is computed on all lanes and selected with masks, so a whole vector of point
ops is one fused VPU stream. Scalar multiplication is a masked
double-and-add ladder over a fixed bit count (src/g1.h:91-103 loops
data-dependently; XLA needs the static bound).

Semantics preserved exactly (asserted against golden vectors):
- g1_add dispatch order: infinity, then x1==x2 with y1+y2==0 -> infinity,
  x1==x2 otherwise -> double (src/g1.h:59-83)
- g1_double returns infinity when y == 0 (src/g1.h:37-56)
- G2 has NO infinity handling (src/g2.h:7-9) and bakes the twist constant
  u^2 = -2 into its formulas (src/g2.h:32-66); we parameterize the constant
  (CurveParams.d) but keep the exact formula structure, including the
  asymmetric use of d vs 1/d between the double and add branches.
- g2_mul(base, 0) is undefined behavior in the reference (src/g2.h:68-84,
  uninitialized result); here it returns the (0, 0) struct deterministically.
- GT multiplication a + bu: (a1a2 + d*b1b2, a1b2 + b1a2) (src/gt.h:23-28);
  gtp_pow's Frobenius shortcut x^p == conj(x) (src/gt.h:30-51) is applied
  for static exponents >= p exactly as the reference recursion does.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

U32 = jnp.uint32


class G1(NamedTuple):
    x: jnp.ndarray
    y: jnp.ndarray
    inf: jnp.ndarray  # bool

    @staticmethod
    def of(F, x: int, y: int) -> "G1":
        return G1(F.const(x), F.const(y), jnp.asarray(False))

    @staticmethod
    def identity(shape=()) -> "G1":
        return G1(jnp.zeros(shape, U32), jnp.zeros(shape, U32),
                  jnp.ones(shape, jnp.bool_))


class G2(NamedTuple):
    x: jnp.ndarray
    y: jnp.ndarray

    @staticmethod
    def of(F, x: int, y: int) -> "G2":
        return G2(F.const(x), F.const(y))


class GT(NamedTuple):
    a: jnp.ndarray
    b: jnp.ndarray

    @staticmethod
    def one(F, shape=()) -> "GT":
        return GT(jnp.broadcast_to(F.ones(), shape).astype(U32),
                  jnp.zeros(shape, U32))


def _sel(mask, a, b):
    return jnp.where(mask, a, b)


def _sel_g1(mask, a: G1, b: G1) -> G1:
    return G1(_sel(mask, a.x, b.x), _sel(mask, a.y, b.y),
              _sel(mask, a.inf, b.inf))


# ---------------- G1 ----------------

def g1_generator(curve, F) -> G1:
    return G1.of(F, *curve.g1_gen)


def g1_is_on_curve(F, b_const: int, p: G1) -> jnp.ndarray:
    """y^2 == x^3 + b, infinity counts as on-curve (src/g1.h:26-31)."""
    lhs = F.mul(p.y, p.y)
    rhs = F.add(F.mul(F.mul(p.x, p.x), p.x), F.const(b_const))
    return jnp.logical_or(p.inf, lhs == rhs)


def g1_neg(F, p: G1) -> G1:
    return G1(p.x, F.neg(p.y), p.inf)


def g1_double(F, a: G1) -> G1:
    """Tangent doubling with y==0 -> infinity (src/g1.h:37-56)."""
    two, three = F.const(2), F.const(3)
    m = F.div(F.mul(three, F.mul(a.x, a.x)), F.mul(two, a.y))
    m_sq = F.mul(m, m)
    x_r = F.sub(m_sq, F.mul(two, a.x))
    y_r = F.sub(F.mul(m, F.sub(F.mul(three, a.x), m_sq)), a.y)
    is_inf = jnp.logical_or(a.inf, a.y == 0)
    return G1(_sel(is_inf, jnp.zeros_like(x_r), x_r),
              _sel(is_inf, jnp.zeros_like(y_r), y_r),
              is_inf)


def g1_add(F, a: G1, b: G1) -> G1:
    """Complete-ish addition with the reference's dispatch order
    (src/g1.h:59-83), branchless."""
    # chord case (x1 != x2)
    m = F.div(F.sub(b.y, a.y), F.sub(b.x, a.x))
    m_sq = F.mul(m, m)
    x_r = F.sub(F.sub(m_sq, a.x), b.x)
    y_r = F.sub(F.mul(m, F.sub(a.x, x_r)), a.y)
    chord = G1(x_r, y_r, jnp.zeros_like(a.inf))

    dbl = g1_double(F, a)

    same_x = (a.x == b.x)
    inverse = jnp.logical_and(same_x, F.add(a.y, b.y) == 0)
    both_fin = jnp.logical_and(~a.inf, ~b.inf)

    r = _sel_g1(same_x, _sel_g1(inverse, G1.identity(x_r.shape), dbl), chord)
    r = _sel_g1(both_fin, r, _sel_g1(a.inf, b, a))
    return r


def g1_mul(F, p: G1, scalar, nbits: int = 32) -> G1:
    """Masked double-and-add, LSB first (src/g1.h:91-103)."""
    scalar = jnp.asarray(scalar, dtype=U32)
    shape = jnp.broadcast_shapes(jnp.shape(p.x), jnp.shape(scalar))
    acc = G1.identity(shape)
    added = G1(jnp.broadcast_to(p.x, shape), jnp.broadcast_to(p.y, shape),
               jnp.broadcast_to(p.inf, shape))
    sc = jnp.broadcast_to(scalar, shape)

    def body(i, carry):
        acc, added, sc = carry
        bit = (sc & 1).astype(jnp.bool_)
        acc = _sel_g1(bit, g1_add(F, acc, added), acc)
        return acc, g1_double(F, added), sc >> 1

    acc, _, _ = jax.lax.fori_loop(0, nbits, body, (acc, added, sc))
    return acc


def g1_equal(a: G1, b: G1) -> jnp.ndarray:
    both_inf = jnp.logical_and(a.inf, b.inf)
    coords = jnp.logical_and(a.x == b.x, a.y == b.y)
    fin = jnp.logical_and(jnp.logical_and(~a.inf, ~b.inf), coords)
    return jnp.logical_or(both_inf, fin)


# ---------------- G2 (points on the quadratic twist by d) ----------------

def g2_generator(curve, F) -> G2:
    return G2.of(F, *curve.g2_gen)


def g2_neg(F, p: G2) -> G2:
    return G2(p.x, F.neg(p.y))


def g2_add(F, d_const: int, p: G2, q: G2) -> G2:
    """Reference formula structure (src/g2.h:32-66) with the twist constant
    parameterized: d = u^2 (reference hardcodes neg_two)."""
    two, three = F.const(2), F.const(3)
    d = F.const(d_const % F.p)

    # doubling branch (p == q): slope scaled by 1/d
    m_dbl = F.div(F.mul(three, F.mul(p.x, p.x)), F.mul(two, p.y))
    d_inv = F.inv(d)
    msq_d = F.mul(F.mul(m_dbl, m_dbl), d_inv)
    x_dbl = F.sub(msq_d, F.mul(two, p.x))
    y_dbl = F.sub(F.mul(F.mul(d_inv, m_dbl),
                        F.sub(F.mul(three, p.x), msq_d)), p.y)

    # chord branch: slope-squared scaled by d
    m_add = F.div(F.sub(q.y, p.y), F.sub(q.x, p.x))
    msq_d2 = F.mul(F.mul(m_add, m_add), d)
    x_add = F.sub(F.sub(msq_d2, p.x), q.x)
    y_add = F.sub(F.mul(m_add, F.sub(p.x, x_add)), p.y)

    same = jnp.logical_and(p.x == q.x, p.y == q.y)
    return G2(_sel(same, x_dbl, x_add), _sel(same, y_dbl, y_add))


def g2_mul(F, d_const: int, base: G2, scalar, nbits: int = 32) -> G2:
    """Flag-style ladder (src/g2.h:68-84): the accumulator starts as the
    first set-bit multiple of base because G2 has no identity encoding."""
    scalar = jnp.asarray(scalar, dtype=U32)
    shape = jnp.broadcast_shapes(jnp.shape(base.x), jnp.shape(scalar))
    res = G2(jnp.zeros(shape, U32), jnp.zeros(shape, U32))
    cur = G2(jnp.broadcast_to(base.x, shape), jnp.broadcast_to(base.y, shape))
    flag = jnp.zeros(shape, jnp.bool_)
    sc = jnp.broadcast_to(scalar, shape)

    def body(i, carry):
        res, cur, flag, sc = carry
        bit = (sc & 1).astype(jnp.bool_)
        summed = g2_add(F, d_const, res, cur)
        new_x = _sel(bit, _sel(flag, summed.x, cur.x), res.x)
        new_y = _sel(bit, _sel(flag, summed.y, cur.y), res.y)
        flag = jnp.logical_or(flag, bit)
        return (G2(new_x, new_y), g2_add(F, d_const, cur, cur), flag, sc >> 1)

    res, _, _, _ = jax.lax.fori_loop(0, nbits, body, (res, cur, flag, sc))
    return res


# ---------------- GT = F_p[u] / (u^2 - d) ----------------

def gt_mul(F, d_const: int, x: GT, y: GT) -> GT:
    """(a1 + b1 u)(a2 + b2 u) with u^2 = d (src/gt.h:23-28 uses d = -2 as
    the -2*b1*b2 term)."""
    d = F.const(d_const % F.p)
    a = F.add(F.mul(x.a, y.a), F.mul(F.mul(d, x.b), y.b))
    b = F.add(F.mul(x.a, y.b), F.mul(x.b, y.a))
    return GT(a, b)


def gt_conj(F, x: GT) -> GT:
    """gtp_neg: conjugation a - bu == Frobenius x^p (src/gt.h:19-21)."""
    return GT(x.a, F.neg(x.b))


def gt_pow_static(F, d_const: int, x: GT, e: int) -> GT:
    """x^e for a static exponent, with the reference's Frobenius recursion
    for e >= p (src/gt.h:30-51): x^e = conj(x^(e // p)) * x^(e % p).
    Mathematically equal to plain square-and-multiply; kept for parity."""
    if e >= F.p:
        acc = gt_conj(F, gt_pow_static(F, d_const, x, e // F.p))
        e = e % F.p
    else:
        acc = GT.one(F, jnp.shape(x.a))
    cur = x
    while e > 0:
        if e & 1:
            acc = gt_mul(F, d_const, acc, cur)
        e >>= 1
        if e:
            cur = gt_mul(F, d_const, cur, cur)
    return acc


def gt_pow(F, d_const: int, x: GT, e, nbits: int = 32) -> GT:
    """x^e for traced exponents (no Frobenius shortcut needed: exact field
    math makes any correct exponentiation bit-identical)."""
    e = jnp.asarray(e, dtype=U32)
    shape = jnp.broadcast_shapes(jnp.shape(x.a), jnp.shape(e))
    acc = GT.one(F, shape)
    cur = GT(jnp.broadcast_to(x.a, shape), jnp.broadcast_to(x.b, shape))
    ee = jnp.broadcast_to(e, shape)

    def body(i, carry):
        acc, cur, ee = carry
        bit = (ee & 1).astype(jnp.bool_)
        mul = gt_mul(F, d_const, acc, cur)
        acc = GT(_sel(bit, mul.a, acc.a), _sel(bit, mul.b, acc.b))
        return acc, gt_mul(F, d_const, cur, cur), ee >> 1

    acc, _, _ = jax.lax.fori_loop(0, nbits, body, (acc, cur, ee))
    return acc


def gt_equal(x: GT, y: GT) -> jnp.ndarray:
    return jnp.logical_and(x.a == y.a, x.b == y.b)


def gt_inv(F, d_const: int, x: GT) -> GT:
    """(a + bu)^{-1} = (a - bu) / (a^2 - d*b^2) — one base-field inversion
    per element; lets pairing equalities e1 == e2 run as ONE final
    exponentiation of the Miller ratio (models/plonk_scaled.verify_many)."""
    d = F.const(d_const % F.p)
    norm = F.sub(F.mul(x.a, x.a), F.mul(F.mul(d, x.b), x.b))
    ninv = F.inv(norm)
    return GT(F.mul(x.a, ninv), F.mul(F.neg(x.b), ninv))


# ---------------- Jacobian coordinates (performance path) ----------------
#
# The affine kernels above are the bit-exact parity path; every add costs a
# Fermat inversion (src/g1.h mirrors). For MSM/commitment hot loops the
# framework uses Jacobian projective coordinates: ~16 field muls per add,
# NO inversions, one batched affine conversion at the end. Same group
# elements, exact in the field (tests assert equality with the affine path).

class G1J(NamedTuple):
    X: jnp.ndarray
    Y: jnp.ndarray
    Z: jnp.ndarray  # Z == 0 encodes the point at infinity

    @staticmethod
    def identity(F, shape=()):
        return G1J(jnp.broadcast_to(F.ones(), shape).astype(U32),
                   jnp.broadcast_to(F.ones(), shape).astype(U32),
                   jnp.zeros(shape, U32))


def jac_from_affine(F, p: G1) -> G1J:
    one = jnp.broadcast_to(F.ones(), jnp.shape(p.x)).astype(U32)
    z = jnp.where(p.inf, jnp.zeros_like(one), one)
    return G1J(jnp.where(p.inf, one, p.x), jnp.where(p.inf, one, p.y), z)


def jac_to_affine(F, p: G1J) -> G1:
    zinv = F.inv(p.Z)                     # inv(0) = 0 -> garbage, masked
    zi2 = F.mul(zinv, zinv)
    x = F.mul(p.X, zi2)
    y = F.mul(p.Y, F.mul(zi2, zinv))
    inf = p.Z == 0
    return G1(jnp.where(inf, jnp.zeros_like(x), x),
              jnp.where(inf, jnp.zeros_like(y), y), inf)


def jac_double(F, p: G1J) -> G1J:
    """2P for a = 0 curves (y^2 = x^3 + b). Z=0 and Y=0 map to infinity."""
    A = F.mul(p.X, p.X)
    B = F.mul(p.Y, p.Y)
    Cc = F.mul(B, B)
    t = F.add(p.X, B)
    D = F.mul(F.const(2), F.sub(F.sub(F.mul(t, t), A), Cc))
    E = F.mul(F.const(3), A)
    Ff = F.mul(E, E)
    X3 = F.sub(Ff, F.mul(F.const(2), D))
    Y3 = F.sub(F.mul(E, F.sub(D, X3)),
               F.mul(F.const(8), Cc))
    Z3 = F.mul(F.const(2), F.mul(p.Y, p.Z))
    return G1J(X3, Y3, Z3)


def jac_add(F, p: G1J, q: G1J) -> G1J:
    """Complete-ish Jacobian addition: identity, equal and inverse points
    handled with masked selects (branchless)."""
    Z1Z1 = F.mul(p.Z, p.Z)
    Z2Z2 = F.mul(q.Z, q.Z)
    U1 = F.mul(p.X, Z2Z2)
    U2 = F.mul(q.X, Z1Z1)
    S1 = F.mul(p.Y, F.mul(q.Z, Z2Z2))
    S2 = F.mul(q.Y, F.mul(p.Z, Z1Z1))
    H = F.sub(U2, U1)
    r = F.sub(S2, S1)

    HH = F.mul(H, H)
    HHH = F.mul(H, HH)
    V = F.mul(U1, HH)
    rr = F.mul(r, r)
    X3 = F.sub(F.sub(rr, HHH), F.mul(F.const(2), V))
    Y3 = F.sub(F.mul(r, F.sub(V, X3)), F.mul(S1, HHH))
    Z3 = F.mul(F.mul(p.Z, q.Z), H)
    gen = G1J(X3, Y3, Z3)

    dbl = jac_double(F, p)

    p_inf = p.Z == 0
    q_inf = q.Z == 0
    same_x = jnp.logical_and(H == 0, jnp.logical_and(~p_inf, ~q_inf))
    same_pt = jnp.logical_and(same_x, r == 0)
    inverse = jnp.logical_and(same_x, r != 0)

    def sel(m, a, b):
        return jnp.where(m, a, b)

    out = G1J(sel(same_pt, dbl.X, gen.X), sel(same_pt, dbl.Y, gen.Y),
              sel(same_pt, dbl.Z, gen.Z))
    zero = jnp.zeros_like(out.Z)
    out = G1J(out.X, out.Y, sel(inverse, zero, out.Z))
    out = G1J(sel(p_inf, q.X, out.X), sel(p_inf, q.Y, out.Y),
              sel(p_inf, q.Z, out.Z))
    out = G1J(sel(q_inf, p.X, out.X), sel(q_inf, p.Y, out.Y),
              sel(q_inf, p.Z, out.Z))
    return out
