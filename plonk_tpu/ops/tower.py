"""BN254 extension-field tower on TPU integer lanes:
Fq2 = Fq[u]/(u^2+1), Fq6 = Fq2[v]/(v^3 - xi), Fq12 = Fq6[w]/(w^2 - v),
with xi = 9 + u (the arkworks/gnark standard).

Elements are NamedTuple pytrees of BigMontField limb arrays
(ops/bigfield.py): an Fq2 is two (..., limbs) uint32 arrays, etc. All
kernels are elementwise over any batch prefix, so a batch of pairings is
one fused op stream; multiplications use Karatsuba at every tower level
(3 Fq muls per Fq2 mul, 6 Fq2 muls per Fq6 mul, 3 Fq6 muls per Fq12 mul).

This generalizes the reference's hardcoded GT = F_101[u]/(u^2+2)
(src/gt.h:7-28, one quadratic level, 8-bit) to the full degree-12 tower a
production pairing needs; the Frobenius shortcut the reference exploits
recursively (x^101 = conj, src/gt.h:30-51) appears here as the
gamma-constant Frobenius maps (precomputed on host).
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import numpy as np
import jax.numpy as jnp

from .bigfield import BigMontField

# ---- host-side python-int Fq2 helpers (constant precomputation only) ----

Q = 21888242871839275222246405745257275088696311157297823662689037894645226208583
XI = (9, 1)


def _h2_mul(a, b):
    return ((a[0] * b[0] - a[1] * b[1]) % Q,
            (a[0] * b[1] + a[1] * b[0]) % Q)


def _h2_conj(a):
    return (a[0], (-a[1]) % Q)


def _h2_pow(a, e):
    r = (1, 0)
    while e:
        if e & 1:
            r = _h2_mul(r, a)
        a = _h2_mul(a, a)
        e >>= 1
    return r


@functools.lru_cache(maxsize=None)
def _gamma_tables():
    """gamma1[i] = xi^(i(p-1)/6); gamma2/gamma3 for p^2 / p^3 Frobenius."""
    g1 = [_h2_pow(XI, i * (Q - 1) // 6) for i in range(6)]
    g2 = [_h2_mul(g, _h2_conj(g)) for g in g1]
    g3 = [_h2_mul(a, b) for a, b in zip(g1, g2)]
    return g1, g2, g3


# ---- Fq2 ----

class Fq2(NamedTuple):
    c0: jnp.ndarray
    c1: jnp.ndarray

    @staticmethod
    def zero(F: BigMontField, shape=()):
        return Fq2(F.zeros(shape), F.zeros(shape))

    @staticmethod
    def one(F: BigMontField, shape=()):
        return Fq2(F.ones(shape), F.zeros(shape))


def f2_const(F: BigMontField, v: tuple) -> Fq2:
    return Fq2(jnp.asarray(F.encode_host(np.array(v[0], dtype=object))),
               jnp.asarray(F.encode_host(np.array(v[1], dtype=object))))


def f2_add(F, a: Fq2, b: Fq2) -> Fq2:
    return Fq2(F.add(a.c0, b.c0), F.add(a.c1, b.c1))


def f2_sub(F, a: Fq2, b: Fq2) -> Fq2:
    return Fq2(F.sub(a.c0, b.c0), F.sub(a.c1, b.c1))


def f2_neg(F, a: Fq2) -> Fq2:
    return Fq2(F.neg(a.c0), F.neg(a.c1))


def f2_conj(F, a: Fq2) -> Fq2:
    return Fq2(a.c0, F.neg(a.c1))


def f2_dbl(F, a: Fq2) -> Fq2:
    return Fq2(F.add(a.c0, a.c0), F.add(a.c1, a.c1))


def _bstack(arrs):
    shp = jnp.broadcast_shapes(*[a.shape for a in arrs])
    return jnp.stack([jnp.broadcast_to(a, shp) for a in arrs])


# ---- row-stacked (SoA) Fq2 helpers ----
#
# The compile-time discipline (measured on the XLA CPU backend, see
# ops/bigfield.py module header): cost scales with the NUMBER of ops, and
# data-movement ops are ~50x dearer than elementwise ones — lane width is
# free. So composite tower ops keep MANY Fq2 values stacked on a leading
# row axis of one Fq2 (c0/c1 of shape (R, ..., limbs)) and combine them
# with BULK adds/subs plus a few static gathers, instead of slicing into
# per-value (limbs,) scraps. This is also the right TPU shape: wide
# contiguous lanes instead of hundreds of 16-element op chains.

def _rtake(r: Fq2, idx) -> Fq2:
    i = jnp.asarray(idx)
    return Fq2(r.c0[i], r.c1[i])


def _rcat(rs) -> Fq2:
    return Fq2(jnp.concatenate([r.c0 for r in rs]),
               jnp.concatenate([r.c1 for r in rs]))


def _rows6(a: Fq12) -> Fq2:
    """Fq12 -> 6-row stacked Fq2 [c0.c0, c0.c1, c0.c2, c1.c0, c1.c1,
    c1.c2] (the coefficient basis 1, v, v^2, w, vw, v^2w)."""
    rs = [a.c0.c0, a.c0.c1, a.c0.c2, a.c1.c0, a.c1.c1, a.c1.c2]
    return Fq2(_bstack([r.c0 for r in rs]), _bstack([r.c1 for r in rs]))


def _unrows6(r: Fq2) -> Fq12:
    f = lambda i: Fq2(r.c0[i], r.c1[i])
    return Fq12(Fq6(f(0), f(1), f(2)), Fq6(f(3), f(4), f(5)))


def f2_mul_rows(F, x: Fq2, y: Fq2) -> Fq2:
    """Row-wise Karatsuba product of stacked Fq2s (u^2 = -1): ONE
    base-field mont_mul on 3R rows, 2 bulk adds, 3 bulk subs."""
    lhs = jnp.concatenate([x.c0, x.c1, F.add(x.c0, x.c1)])
    rhs = jnp.concatenate([y.c0, y.c1, F.add(y.c0, y.c1)])
    V = F.mont_mul(lhs, rhs)
    R = x.c0.shape[0]
    v0, v1, s = V[:R], V[R:2 * R], V[2 * R:]
    return Fq2(F.sub(v0, v1), F.sub(F.sub(s, v0), v1))


def f2_mul_many(F, pairs) -> list:
    """Karatsuba-multiply a list of (Fq2, Fq2) pairs with ONE base-field
    mont_mul call. Convenience wrapper over f2_mul_rows for call sites
    with heterogeneous operands (the G2/line step formulas)."""
    x = Fq2(_bstack([a.c0 for a, _ in pairs]),
            _bstack([a.c1 for a, _ in pairs]))
    y = Fq2(_bstack([b.c0 for _, b in pairs]),
            _bstack([b.c1 for _, b in pairs]))
    out = f2_mul_rows(F, x, y)
    return [Fq2(out.c0[i], out.c1[i]) for i in range(len(pairs))]


def f2_mul(F, a: Fq2, b: Fq2) -> Fq2:
    """Karatsuba: 3 base muls (u^2 = -1)."""
    v0 = F.mont_mul(a.c0, b.c0)
    v1 = F.mont_mul(a.c1, b.c1)
    s = F.mont_mul(F.add(a.c0, a.c1), F.add(b.c0, b.c1))
    return Fq2(F.sub(v0, v1), F.sub(F.sub(s, v0), v1))


def f2_sq(F, a: Fq2) -> Fq2:
    """Complex squaring: 2 base muls."""
    t = F.mont_mul(F.add(a.c0, a.c1), F.sub(a.c0, a.c1))
    return Fq2(t, F.add(F.mont_mul(a.c0, a.c1), F.mont_mul(a.c0, a.c1)))


def f2_mul_fq(F, a: Fq2, s: jnp.ndarray) -> Fq2:
    """a * s with s a base-field element (..., limbs)."""
    return Fq2(F.mont_mul(a.c0, s), F.mont_mul(a.c1, s))


def _mul9(F, x):
    t = F.add(x, x)
    t = F.add(t, t)
    t = F.add(t, t)
    return F.add(t, x)


def f2_mul_xi(F, a: Fq2) -> Fq2:
    """a * (9 + u): (9c0 - c1, c0 + 9c1) — adds only."""
    return Fq2(F.sub(_mul9(F, a.c0), a.c1), F.add(a.c0, _mul9(F, a.c1)))


def f2_inv(F, a: Fq2) -> Fq2:
    """1/(c0 + c1 u) = (c0 - c1 u)/(c0^2 + c1^2); one Fermat base inverse.
    inv(0) = 0, matching the base-field convention."""
    n = F.add(F.square(a.c0), F.square(a.c1))
    ni = F.inv(n)
    return Fq2(F.mont_mul(a.c0, ni), F.neg(F.mont_mul(a.c1, ni)))


def f2_is_zero(F, a: Fq2) -> jnp.ndarray:
    return jnp.logical_and(F.is_zero(a.c0), F.is_zero(a.c1))


def f2_eq(F, a: Fq2, b: Fq2) -> jnp.ndarray:
    return jnp.logical_and(F.eq(a.c0, b.c0), F.eq(a.c1, b.c1))


# ---- Fq6 ----

class Fq6(NamedTuple):
    c0: Fq2
    c1: Fq2
    c2: Fq2

    @staticmethod
    def zero(F, shape=()):
        z = Fq2.zero(F, shape)
        return Fq6(z, z, z)

    @staticmethod
    def one(F, shape=()):
        return Fq6(Fq2.one(F, shape), Fq2.zero(F, shape), Fq2.zero(F, shape))


def f6_add(F, a: Fq6, b: Fq6) -> Fq6:
    return Fq6(f2_add(F, a.c0, b.c0), f2_add(F, a.c1, b.c1),
               f2_add(F, a.c2, b.c2))


def f6_sub(F, a: Fq6, b: Fq6) -> Fq6:
    return Fq6(f2_sub(F, a.c0, b.c0), f2_sub(F, a.c1, b.c1),
               f2_sub(F, a.c2, b.c2))


def f6_neg(F, a: Fq6) -> Fq6:
    return Fq6(f2_neg(F, a.c0), f2_neg(F, a.c1), f2_neg(F, a.c2))


def _f6_mul_terms(F, a: Fq6, b: Fq6) -> list:
    """The 6 Karatsuba Fq2 products of an Fq6 mul, as stackable pairs."""
    return [(a.c0, b.c0), (a.c1, b.c1), (a.c2, b.c2),
            (f2_add(F, a.c1, a.c2), f2_add(F, b.c1, b.c2)),
            (f2_add(F, a.c0, a.c1), f2_add(F, b.c0, b.c1)),
            (f2_add(F, a.c0, a.c2), f2_add(F, b.c0, b.c2))]


def _f6_from_products(F, v: list) -> Fq6:
    v0, v1, v2, t12, t01, t02 = v
    c0 = f2_add(F, v0, f2_mul_xi(F, f2_sub(F, f2_sub(F, t12, v1), v2)))
    c1 = f2_add(F, f2_sub(F, f2_sub(F, t01, v0), v1), f2_mul_xi(F, v2))
    c2 = f2_add(F, f2_sub(F, f2_sub(F, t02, v0), v2), v1)
    return Fq6(c0, c1, c2)


def f6_mul(F, a: Fq6, b: Fq6) -> Fq6:
    """Karatsuba (Toom-like, 6 Fq2 muls; one base-mul call site)."""
    return _f6_from_products(F, f2_mul_many(F, _f6_mul_terms(F, a, b)))


def f6_sq(F, a: Fq6) -> Fq6:
    return f6_mul(F, a, a)


def f6_mul_v(F, a: Fq6) -> Fq6:
    """v * a = xi*c2 + c0 v + c1 v^2."""
    return Fq6(f2_mul_xi(F, a.c2), a.c0, a.c1)


def f6_inv(F, a: Fq6) -> Fq6:
    sq0, m12, sq2, m01, sq1, m02 = f2_mul_many(
        F, [(a.c0, a.c0), (a.c1, a.c2), (a.c2, a.c2),
            (a.c0, a.c1), (a.c1, a.c1), (a.c0, a.c2)])
    t0 = f2_sub(F, sq0, f2_mul_xi(F, m12))
    t1 = f2_sub(F, f2_mul_xi(F, sq2), m01)
    t2 = f2_sub(F, sq1, m02)
    d0, d1, d2 = f2_mul_many(F, [(a.c0, t0), (a.c2, t1), (a.c1, t2)])
    d = f2_add(F, d0, f2_mul_xi(F, f2_add(F, d1, d2)))
    di = f2_inv(F, d)
    o0, o1, o2 = f2_mul_many(F, [(t0, di), (t1, di), (t2, di)])
    return Fq6(o0, o1, o2)


# ---- Fq12 ----

class Fq12(NamedTuple):
    c0: Fq6
    c1: Fq6

    @staticmethod
    def one(F, shape=()):
        return Fq12(Fq6.one(F, shape), Fq6.zero(F, shape))


def _rslice(r: Fq2, lo: int, hi: int) -> Fq2:
    return Fq2(r.c0[lo:hi], r.c1[lo:hi])


def _mul_v_rows(F, x: Fq2) -> Fq2:
    """v * (Fq6 as a 3-row stack): [xi*c2, c0, c1]."""
    return _rcat([f2_mul_xi(F, _rslice(x, 2, 3)), _rslice(x, 0, 2)])


def _f6_terms_rows(F, bank: Fq2, base, i1, i2):
    """Row-stacked f6-product term operands, ordered term-major so term t
    across all groups is the contiguous slice [Gt : Gt+G]. base picks
    [x0 per group, x1 per group, x2 per group]; (i1, i2) the pair-sum
    terms (x1+x2, x0+x1, x0+x2) per group."""
    return _rcat([_rtake(bank, base),
                  f2_add(F, _rtake(bank, i1), _rtake(bank, i2))])


def _f6_combine_rows(F, P: Fq2, G: int):
    """Karatsuba-combine term-major stacked products into the 3 Fq6
    coefficients, bulk over the G-group leading axis: returns (c0, c1,
    c2) each a G-row Fq2."""
    vt = lambda t: _rslice(P, G * t, G * (t + 1))
    v0, v1, v2, t12, t01, t02 = (vt(t) for t in range(6))
    c0 = f2_add(F, v0, f2_mul_xi(F, f2_sub(F, f2_sub(F, t12, v1), v2)))
    c1 = f2_add(F, f2_sub(F, f2_sub(F, t01, v0), v1), f2_mul_xi(F, v2))
    c2 = f2_add(F, f2_sub(F, f2_sub(F, t02, v0), v2), v1)
    return c0, c1, c2


def _regroup(c0: Fq2, c1: Fq2, c2: Fq2, g: int) -> Fq2:
    """Pick group g's Fq6 as a 3-row stack from bulk coefficients."""
    pick = lambda c: Fq2(c.c0[g:g + 1], c.c1[g:g + 1])
    return _rcat([pick(c0), pick(c1), pick(c2)])


def f12_mul(F, a: Fq12, b: Fq12) -> Fq12:
    """Karatsuba over w: 18 Fq2 products (3 Fq6 muls), all row-stacked —
    ONE base-field mul on 54 rows plus ~15 bulk combines."""
    def prep(r: Fq2) -> Fq2:
        x0, x1 = _rslice(r, 0, 3), _rslice(r, 3, 6)
        bank = _rcat([x0, x1, f2_add(F, x0, x1)])   # groups a0, a1, a0+a1
        return _f6_terms_rows(F, bank, [0, 3, 6, 1, 4, 7, 2, 5, 8],
                              [1, 4, 7, 0, 3, 6, 0, 3, 6],
                              [2, 5, 8, 1, 4, 7, 2, 5, 8])

    P = f2_mul_rows(F, prep(_rows6(a)), prep(_rows6(b)))
    c0, c1, c2 = _f6_combine_rows(F, P, 3)
    V0 = _regroup(c0, c1, c2, 0)
    V1 = _regroup(c0, c1, c2, 1)
    S = _regroup(c0, c1, c2, 2)
    out0 = f2_add(F, V0, _mul_v_rows(F, V1))
    out1 = f2_sub(F, f2_sub(F, S, V0), V1)
    return _unrows6(_rcat([out0, out1]))


def f12_sq(F, a: Fq12) -> Fq12:
    """(a0 + a1 w)^2 via 2 row-stacked Fq6 muls (12 Fq2 products, one
    base-mul call): c1 = 2 a0a1, c0 = (a0+a1)(a0+v a1) - (1+v) a0a1."""
    r = _rows6(a)
    x0, x1 = _rslice(r, 0, 3), _rslice(r, 3, 6)
    u = f2_add(F, x0, x1)
    w = f2_add(F, x0, _mul_v_rows(F, x1))
    bx = _rcat([x0, u])                              # x-operands g0, g1
    by = _rcat([x1, w])                              # y-operands g0, g1
    mk = lambda bank: _f6_terms_rows(F, bank, [0, 3, 1, 4, 2, 5],
                                     [1, 4, 0, 3, 0, 3],
                                     [2, 5, 1, 4, 2, 5])
    P = f2_mul_rows(F, mk(bx), mk(by))
    c0, c1, c2 = _f6_combine_rows(F, P, 2)
    V01 = _regroup(c0, c1, c2, 0)
    T = _regroup(c0, c1, c2, 1)
    out0 = f2_sub(F, f2_sub(F, T, V01), _mul_v_rows(F, V01))
    out1 = f2_add(F, V01, V01)
    return _unrows6(_rcat([out0, out1]))


def f12_conj(F, a: Fq12) -> Fq12:
    """a^(p^6): conjugation of the w-quadratic level — the inverse for
    cyclotomic-subgroup elements (final exponentiation)."""
    return Fq12(a.c0, f6_neg(F, a.c1))


def _f6_pair_mul_rows(F, bx: Fq2, by: Fq2):
    """Two INDEPENDENT Fq6 products as one row-stacked call: bx/by hold
    the two x-/y-operands as 6-row stacks [g0(3), g1(3)]. Returns bulk
    coefficients (c0, c1, c2), each a 2-row Fq2 (group-major)."""
    mk = lambda bank: _f6_terms_rows(F, bank, [0, 3, 1, 4, 2, 5],
                                     [1, 4, 0, 3, 0, 3],
                                     [2, 5, 1, 4, 2, 5])
    P = f2_mul_rows(F, mk(bx), mk(by))
    return _f6_combine_rows(F, P, 2)


def _f6_norm_inv(F, a0: Fq2, a1: Fq2) -> Fq2:
    """k = 1/(a0^2 - v a1^2) as a 3-row Fq6 stack (a0/a1 the 3-row halves
    of an Fq12): the shared core of f12_inv and the pairing's easy part.
    One base-field Fermat inversion total."""
    # stage 1: a0^2 and a1^2 together
    c0, c1, c2 = _f6_pair_mul_rows(F, _rcat([a0, a1]), _rcat([a0, a1]))
    t = f2_sub(F, _regroup(c0, c1, c2, 0),
               _mul_v_rows(F, _regroup(c0, c1, c2, 1)))   # 3 rows: Fq6
    # stage 2: Fq6 inverse of t via the norm map
    P = f2_mul_rows(F, _rtake(t, [0, 1, 2, 0, 1, 0]),
                    _rtake(t, [0, 2, 2, 1, 1, 2]))
    # rows: [t0^2, t1 t2, t2^2, t0 t1, t1^2, t0 t2]
    xiP = f2_mul_xi(F, _rtake(P, [1, 2]))
    bank = _rcat([P, xiP])                   # rows 6: xi(t1t2), 7: xi(t2^2)
    A = f2_sub(F, _rtake(bank, [0, 7, 4]), _rtake(bank, [6, 3, 5]))
    D = f2_mul_rows(F, _rtake(t, [0, 2, 1]), A)
    d = f2_add(F, Fq2(D.c0[0], D.c1[0]),
               f2_mul_xi(F, f2_add(F, Fq2(D.c0[1], D.c1[1]),
                                   Fq2(D.c0[2], D.c1[2]))))
    di = f2_inv(F, d)                        # one Fermat base inverse
    brd = lambda c: Fq2(jnp.broadcast_to(c.c0, A.c0.shape),
                        jnp.broadcast_to(c.c1, A.c1.shape))
    return f2_mul_rows(F, A, brd(di))        # 3 rows: 1/t


def f12_scale_f6_rows(F, a: Fq12, k: Fq2) -> Fq12:
    """a * k with k an Fq6 as a 3-row stack: both per-w-coefficient Fq6
    products ride one batched call."""
    r = _rows6(a)
    c0, c1, c2 = _f6_pair_mul_rows(F, r, _rcat([k, k]))
    return _unrows6(_rcat([_regroup(c0, c1, c2, 0),
                           _regroup(c0, c1, c2, 1)]))


def f12_inv(F, a: Fq12) -> Fq12:
    """1/(a0 + a1 w) = (a0 - a1 w) / (a0^2 - v a1^2), all stages as
    row-stacked batched products (shallow movement-op depth; see the
    f2_mul_rows rationale): 2 batched Fq6-product calls, one batched
    Fq6-inverse product ladder, ONE base-field Fermat inversion."""
    r = _rows6(a)
    a0, a1 = _rslice(r, 0, 3), _rslice(r, 3, 6)
    ti = _f6_norm_inv(F, a0, a1)
    # a0 * ti and -(a1 * ti) together
    c0, c1, c2 = _f6_pair_mul_rows(F, r, _rcat([ti, ti]))
    num = _regroup(c0, c1, c2, 0)
    den = f2_neg(F, _regroup(c0, c1, c2, 1))
    return _unrows6(_rcat([num, den]))


def f12_eq(F, a: Fq12, b: Fq12) -> jnp.ndarray:
    out = None
    for x, y in ((a.c0.c0, b.c0.c0), (a.c0.c1, b.c0.c1), (a.c0.c2, b.c0.c2),
                 (a.c1.c0, b.c1.c0), (a.c1.c1, b.c1.c1), (a.c1.c2, b.c1.c2)):
        e = f2_eq(F, x, y)
        out = e if out is None else jnp.logical_and(out, e)
    return out


@functools.lru_cache(maxsize=None)
def _gamma_mont(limbs: int):
    """Frobenius gamma constants as host Montgomery limb arrays, keyed by
    limb count (the tower is BN254-only)."""
    from ..utils.params import FieldParams
    Fh = BigMontField(FieldParams(p=Q, name="BN254-Fq", generator=3,
                                  two_adicity=1), limbs=limbs)
    g1, g2, g3 = _gamma_tables()

    def enc(tbl):
        return [(np.asarray(Fh.encode_host(np.array(c[0], dtype=object))),
                 np.asarray(Fh.encode_host(np.array(c[1], dtype=object))))
                for c in tbl]

    return enc(g1), enc(g2), enc(g3)


@functools.lru_cache(maxsize=None)
def _gamma_rows_host(limbs: int, power: int):
    """The 6 Frobenius gamma twists in basis order [c0.c0, c0.c1, c0.c2,
    c1.c0, c1.c1, c1.c2] (w-degrees 0,2,4,1,3,5) as (6, limbs) arrays."""
    g1, g2, g3 = _gamma_mont(limbs)
    gam = {1: g1, 2: g2, 3: g3}[power]
    order = [0, 2, 4, 1, 3, 5]
    return (np.stack([gam[i][0] for i in order]),
            np.stack([gam[i][1] for i in order]))


def f12_frobenius(F, a: Fq12, power: int = 1) -> Fq12:
    """a^(p^power), power in {1, 2, 3}: bulk per-Fq2-coefficient
    conjugation (odd powers) and one row-stacked mul by the 6 constant
    gamma twists."""
    r = _rows6(a)
    if power % 2 == 1:
        r = f2_conj(F, r)
    gc0, gc1 = _gamma_rows_host(F.limbs, power)
    shp = (6,) + (1,) * (r.c0.ndim - 2) + (gc0.shape[-1],)
    g = Fq2(jnp.asarray(gc0).reshape(shp), jnp.asarray(gc1).reshape(shp))
    return _unrows6(f2_mul_rows(F, r, g))


# ---- host<->device conversion (tests / serialization) ----

def f12_encode_host(F: BigMontField, coeffs) -> Fq12:
    """((c0,(a,b)),...) nested python-int tuples -> Fq12 arrays. Layout
    matches tests/bn254_oracle.py: ((Fq2, Fq2, Fq2), (Fq2, Fq2, Fq2))."""
    (a0, a1) = coeffs

    def enc6(t):
        return Fq6(*[Fq2(jnp.asarray(F.encode_host(np.array(c[0],
                                                            dtype=object))),
                         jnp.asarray(F.encode_host(np.array(c[1],
                                                            dtype=object))))
                     for c in t])

    return Fq12(enc6(a0), enc6(a1))


def f12_decode_host(F: BigMontField, a: Fq12):
    def dec2(c: Fq2):
        return (int(F.decode_host(np.asarray(c.c0))),
                int(F.decode_host(np.asarray(c.c1))))

    return ((dec2(a.c0.c0), dec2(a.c0.c1), dec2(a.c0.c2)),
            (dec2(a.c1.c0), dec2(a.c1.c1), dec2(a.c1.c2)))
