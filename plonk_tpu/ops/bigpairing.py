"""BN254 G2 and the optimal-ate pairing over the Fq12 tower (ops/tower.py).

TPU-shaped design:
- G2 points are Jacobian over Fq2 (affine steps would pay a ~254-mul
  Fermat inversion each; the reference's 8-bit G2 can afford affine,
  src/g2.h:32-66 — at 254 bits inversion-free formulas are mandatory).
- The Miller loop is ONE lax.scan over the 64 ate-loop bits: every step
  does the doubling half plus a lane-masked addition half (static digit
  table as scanned input), so the graph holds exactly one step body.
  This is the scaled-up sibling of ops/pairing.py's scan over the
  reference's recursion schedule (src/pairing.h:31-64).
- Lines are kept sparse (c0 + c1 w + c3 w^3, D-twist layout) and folded
  with a 15-Fq2-mul sparse multiply; line denominators are NOT cleared —
  they lie in Fq2, a proper subfield, so the final exponentiation's easy
  part (p^6-1)(p^2+1) annihilates them (z^(p^2) = z for z in Fq2 =>
  z^(p^6-1) = 1).
- Field multiplies inside the scan use the compact vectorized product
  (BigMontField.rolled -> mont_mul_vec): whole-limb-axis straight-line
  ops, no control flow — per-word slicing or per-mul fori_loops make XLA
  compile time explode on a body with hundreds of multiplies.
- final_exponentiation uses the standard BN hard-part addition chain
  (3 x-power exponentiations + Frobenius maps); final_exp_plain is the
  direct (p^4 - p^2 + 1)/r power kept as the correctness anchor (tests
  assert chain == plain == the python-int oracle).

Everything is elementwise over a batch prefix: a batch of pairings runs
as one scan with wider lanes (the batched-verifier shape, SURVEY §2.3).
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from .bigfield import BigMontField
from .bigcurve import BN254_FQ, BigG1J, big_to_affine
from .tower import (Fq2, Fq6, Fq12, f2_add, f2_sub, f2_neg, f2_conj, f2_dbl,
                    f2_mul, f2_sq, f2_mul_fq, f2_mul_xi, f2_inv, f2_is_zero,
                    f2_eq, f2_const, f2_mul_many, f6_add, f6_sub, f6_mul,
                    f6_mul_v, f12_mul, f12_sq, f12_conj, f12_inv,
                    f12_frobenius, f12_eq, _gamma_mont)

U32 = jnp.uint32

# BN254 constants
X_PARAM = 4965661367192848881
ATE_LOOP = 6 * X_PARAM + 2
R_ORDER = 21888242871839275222246405745257275088548364400416034343698204186575808495617

G2_GEN_X = (10857046999023057135944570762232829481370756359578518086990519993285655852781,
            11559732032986387107991004021392285783925812861821192530917403151452391805634)
G2_GEN_Y = (8495653923123431417604973247489272438418190587263600148770280649306958101930,
            4082367875863433681332203403145435568316851327593401208105741076214120093531)


def pairing_field(rolled: bool = True) -> BigMontField:
    """The Fq instance pairing kernels run on (rolled CIOS)."""
    return BigMontField(BN254_FQ, rolled=rolled)


class G2J(NamedTuple):
    """Jacobian G2 point batch over Fq2; Z == 0 encodes infinity."""
    X: Fq2
    Y: Fq2
    Z: Fq2

    @staticmethod
    def identity(F, shape=()):
        one = Fq2.one(F, shape)
        return G2J(one, one, Fq2.zero(F, shape))


def _sel_tree(mask, a, b):
    def sel(x, y):
        m = mask.reshape(mask.shape + (1,) * (x.ndim - mask.ndim))
        return jnp.where(m, x, y)

    return jax.tree_util.tree_map(sel, a, b)


def g2_generator(F, shape=()) -> G2J:
    gx, gy = f2_const(F, G2_GEN_X), f2_const(F, G2_GEN_Y)
    brd = lambda c: Fq2(jnp.broadcast_to(c.c0, tuple(shape) + (F.limbs,)),
                        jnp.broadcast_to(c.c1, tuple(shape) + (F.limbs,)))
    return G2J(brd(gx), brd(gy), brd(Fq2.one(F)))


def g2_neg(F, p: G2J) -> G2J:
    return G2J(p.X, f2_neg(F, p.Y), p.Z)


def g2_is_inf(F, p: G2J):
    return f2_is_zero(F, p.Z)


def g2_double(F, p: G2J) -> G2J:
    """dbl-2009-l over Fq2 (a = 0); 3 batched base-mul call sites."""
    A, B, YZ = f2_mul_many(F, [(p.X, p.X), (p.Y, p.Y), (p.Y, p.Z)])
    E = f2_add(F, f2_dbl(F, A), A)
    C, t, Fv = f2_mul_many(
        F, [(B, B), (f2_add(F, p.X, B), f2_add(F, p.X, B)), (E, E)])
    D = f2_dbl(F, f2_sub(F, t, f2_add(F, A, C)))
    X3 = f2_sub(F, Fv, f2_dbl(F, D))
    C8 = f2_dbl(F, f2_dbl(F, f2_dbl(F, C)))
    (EDX,) = f2_mul_many(F, [(E, f2_sub(F, D, X3))])
    Y3 = f2_sub(F, EDX, C8)
    Z3 = f2_dbl(F, YZ)
    return G2J(X3, Y3, Z3)


def g2_add(F, p: G2J, q: G2J) -> G2J:
    """Complete-ish Jacobian addition with masked special cases (the Fq2
    sibling of ops/bigcurve.big_jac_add); layered batched base muls."""
    Z1Z1, Z2Z2, Z12 = f2_mul_many(
        F, [(p.Z, p.Z), (q.Z, q.Z), (p.Z, q.Z)])
    U1, U2, Z2cu, Z1cu = f2_mul_many(
        F, [(p.X, Z2Z2), (q.X, Z1Z1), (q.Z, Z2Z2), (p.Z, Z1Z1)])
    S1, S2 = f2_mul_many(F, [(p.Y, Z2cu), (q.Y, Z1cu)])
    H = f2_sub(F, U2, U1)
    r = f2_sub(F, S2, S1)
    HH, rr, Z3 = f2_mul_many(F, [(H, H), (r, r), (Z12, H)])
    HHH, V = f2_mul_many(F, [(H, HH), (U1, HH)])
    X3 = f2_sub(F, f2_sub(F, rr, HHH), f2_dbl(F, V))
    rVX, SH = f2_mul_many(F, [(r, f2_sub(F, V, X3)), (S1, HHH)])
    Y3 = f2_sub(F, rVX, SH)
    gen = G2J(X3, Y3, Z3)

    dbl = g2_double(F, p)
    p_inf = g2_is_inf(F, p)
    q_inf = g2_is_inf(F, q)
    both = jnp.logical_and(~p_inf, ~q_inf)
    same_x = jnp.logical_and(f2_is_zero(F, H), both)
    same_pt = jnp.logical_and(same_x, f2_is_zero(F, r))
    inverse = jnp.logical_and(same_x, ~f2_is_zero(F, r))

    out = _sel_tree(same_pt, dbl, gen)
    zz = Fq2(jnp.zeros_like(out.Z.c0), jnp.zeros_like(out.Z.c1))
    out = G2J(out.X, out.Y, _sel_tree(inverse, zz, out.Z))
    out = _sel_tree(p_inf, q, out)
    out = _sel_tree(q_inf, p, out)
    return out


def g2_mul_bits(F, base: G2J, scalar_bits, nbits: int) -> G2J:
    """Masked double-and-add ladder; scalar_bits (..., nbits) LSB-first."""
    shape = base.X.c0.shape[:-1]
    acc = G2J.identity(F, shape)

    def body(i, carry):
        acc, cur = carry
        bit = scalar_bits[..., i] == 1
        acc = _sel_tree(bit, g2_add(F, acc, cur), acc)
        return acc, g2_double(F, cur)

    acc, _ = jax.lax.fori_loop(0, nbits, body, (acc, base))
    return acc


def g2_to_affine(F, p: G2J):
    """-> (x: Fq2, y: Fq2, inf) Montgomery-form affine."""
    zinv = f2_inv(F, p.Z)
    zi2 = f2_sq(F, zinv)
    x = f2_mul(F, p.X, zi2)
    y = f2_mul(F, p.Y, f2_mul(F, zi2, zinv))
    inf = g2_is_inf(F, p)
    zz = lambda c: _sel_tree(inf, Fq2(jnp.zeros_like(c.c0),
                                      jnp.zeros_like(c.c1)), c)
    return zz(x), zz(y), inf


def g2_on_curve(F, x: Fq2, y: Fq2):
    """y^2 == x^3 + b/xi (the D-twist curve constant)."""
    b2 = _twist_b(F)
    lhs = f2_sq(F, y)
    rhs = f2_add(F, f2_mul(F, f2_sq(F, x), x), b2)
    return f2_eq(F, lhs, rhs)


@functools.lru_cache(maxsize=None)
def _twist_b_host(limbs: int):
    p = BN254_FQ.p
    # b' = 3 / (9 + u) computed with python ints
    n = (9 * 9 + 1) % p
    ni = pow(n, p - 2, p)
    c0 = 3 * 9 * ni % p
    c1 = (-3) * ni % p
    return c0, c1


def _twist_b(F) -> Fq2:
    c0, c1 = _twist_b_host(F.limbs)
    return f2_const(F, (c0, c1))


# ---------------- Miller loop ----------------


class _Line(NamedTuple):
    """Sparse line c_y*yp + c_x*xp w + c_3 w^3 (c_y, c_x, c_3 in Fq2;
    yp/xp are the G1 evaluation point's base-field coordinates)."""
    cy: Fq2
    cx: Fq2
    c3: Fq2


def _dbl_step(F, T: G2J):
    """T <- 2T plus the tangent line at T (denominator 2*Y*Z^3 kept — it
    is an Fq2 factor, killed by the final exponentiation). Three layered
    batched base-mul call sites."""
    A, B, YZ, Zsq = f2_mul_many(
        F, [(T.X, T.X), (T.Y, T.Y), (T.Y, T.Z), (T.Z, T.Z)])
    E = f2_add(F, f2_dbl(F, A), A)          # 3 X^2
    Z3 = f2_dbl(F, YZ)
    XB = f2_add(F, T.X, B)
    C, t, Fv, cyv, ExZ, EX = f2_mul_many(
        F, [(B, B), (XB, XB), (E, E), (Z3, Zsq), (E, Zsq), (E, T.X)])
    D = f2_dbl(F, f2_sub(F, t, f2_add(F, A, C)))
    X3 = f2_sub(F, Fv, f2_dbl(F, D))
    C8 = f2_dbl(F, f2_dbl(F, f2_dbl(F, C)))
    (EDX,) = f2_mul_many(F, [(E, f2_sub(F, D, X3))])
    Y3 = f2_sub(F, EDX, C8)
    # line = (Z3*Zsq)*yp + (-E*Zsq)*xp w + (E*X - 2*Y^2) w^3
    return G2J(X3, Y3, Z3), _Line(cyv, f2_neg(F, ExZ),
                                  f2_sub(F, EX, f2_dbl(F, B)))


def _add_step(F, T: G2J, qx: Fq2, qy: Fq2):
    """T <- T + Q (Q affine) plus the chord line through T and Q
    (denominator (x_q Z^2 - X) Z kept — Fq2 factor). Layered batched
    base muls (6 call sites)."""
    (Zsq,) = f2_mul_many(F, [(T.Z, T.Z)])
    Zcu, xZ2 = f2_mul_many(F, [(T.Z, Zsq), (qx, Zsq)])
    (yZ3,) = f2_mul_many(F, [(qy, Zcu)])
    theta = f2_sub(F, yZ3, T.Y)
    eta = f2_sub(F, xZ2, T.X)
    HH, rr, Z3 = f2_mul_many(
        F, [(eta, eta), (theta, theta), (T.Z, eta)])
    HHH, V = f2_mul_many(F, [(eta, HH), (T.X, HH)])
    X3 = f2_sub(F, f2_sub(F, rr, HHH), f2_dbl(F, V))
    tVX, YH, txq, Zyq = f2_mul_many(
        F, [(theta, f2_sub(F, V, X3)), (T.Y, HHH), (theta, qx), (Z3, qy)])
    Y3 = f2_sub(F, tVX, YH)
    # line = Z3*yp + (-theta)*xp w + (theta x_q - Z3 y_q) w^3
    return G2J(X3, Y3, Z3), _Line(Z3, f2_neg(F, theta),
                                  f2_sub(F, txq, Zyq))


def _sparse_mul(F, f: Fq12, l0: Fq2, l1: Fq2, l3: Fq2) -> Fq12:
    """f * (l0 + l1 w + l3 w^3): 15 Fq2 muls (vs 18 for the full
    product), fully row-stacked — one base-mul call plus bulk combines
    (tower.f2_mul_rows rationale). The line as an Fq12: c0 = (l0, 0, 0),
    c1 = (l1, l3, 0)."""
    from .tower import (_rows6, _unrows6, _rtake, _rcat, _rslice,
                        _mul_v_rows, f2_mul_rows, _bstack)
    r = _rows6(f)
    a0, a1 = _rslice(r, 0, 3), _rslice(r, 3, 6)
    bank = _rcat([r, f2_add(F, a0, a1)])       # rows 6:9 = a0 + a1
    lhs = _rtake(bank, [0, 1, 2, 3, 5, 3, 4, 4, 5, 6, 8, 6, 7, 7, 8])
    lb = Fq2(_bstack([l0.c0, l1.c0, l3.c0]),
             _bstack([l0.c1, l1.c1, l3.c1]))
    lb = _rcat([lb, f2_add(F, _rslice(lb, 0, 1), _rslice(lb, 1, 2))])
    rhs = _rtake(lb, [0, 0, 0, 1, 2, 2, 1, 2, 1, 3, 2, 2, 3, 2, 3])
    P = f2_mul_rows(F, lhs, rhs)
    # rows 3..8 / 9..14: sparse Fq6 products d*(s0 + s1 v) in pair form
    # (e0 = x + xi y for pair 0; e1, e2 = x + y)
    X = _rtake(P, [3, 5, 7, 9, 11, 13])
    Y = _rtake(P, [4, 6, 8, 10, 12, 14])
    Z = _rtake(_rcat([Y, f2_mul_xi(F, Y)]), [6, 1, 2, 9, 4, 5])
    E = f2_add(F, X, Z)                        # [v1(3 rows), s(3 rows)]
    V0 = _rslice(P, 0, 3)
    V1 = _rslice(E, 0, 3)
    S = _rslice(E, 3, 6)
    out0 = f2_add(F, V0, _mul_v_rows(F, V1))
    out1 = f2_sub(F, f2_sub(F, S, V0), V1)
    return _unrows6(_rcat([out0, out1]))


def _frobenius_g2(F, qx: Fq2, qy: Fq2, power: int):
    """The untwist-Frobenius-twist endomorphism on affine twist
    coordinates: pi_p(x, y) = (conj(x) g1[2], conj(y) g1[3]);
    pi_{p^2}(x, y) = (x g2[2], -y g2[3])."""
    g1, g2, _ = _gamma_mont(F.limbs)
    mk = lambda t: Fq2(jnp.asarray(t[0]), jnp.asarray(t[1]))
    if power == 1:
        return (f2_mul(F, f2_conj(F, qx), mk(g1[2])),
                f2_mul(F, f2_conj(F, qy), mk(g1[3])))
    return (f2_mul(F, qx, mk(g2[2])),
            f2_neg(F, f2_mul(F, qy, mk(g2[3]))))


def miller_loop(F, px, py, qx: Fq2, qy: Fq2) -> Fq12:
    """f_{6x+2, Q}(P) with the two Frobenius correction lines. px/py are
    Montgomery-form base-field arrays (..., limbs); qx/qy Montgomery-form
    affine twist coordinates. One lax.scan over the static bit table."""
    bits = jnp.asarray([int(b) for b in bin(ATE_LOOP)[3:]], dtype=U32)
    shape = px.shape[:-1]
    T0 = G2J(qx, qy, Fq2.one(F, shape))
    f0 = Fq12.one(F, shape)

    def line_mul(f, ln: _Line):
        # the 4 Fq scalings of the line coefficients ride one call
        from .tower import _bstack
        V = F.mont_mul(_bstack([ln.cy.c0, ln.cy.c1, ln.cx.c0, ln.cx.c1]),
                       _bstack([py, py, px, px]))
        return _sparse_mul(F, f, Fq2(V[0], V[1]), Fq2(V[2], V[3]), ln.c3)

    def step(carry, bit):
        f, T = carry
        f = f12_sq(F, f)
        T, ln = _dbl_step(F, T)
        f = line_mul(f, ln)
        Ta, ln2 = _add_step(F, T, qx, qy)
        fa = line_mul(f, ln2)
        take = bit == 1
        f = _sel_tree(jnp.broadcast_to(take, shape), fa, f)
        T = _sel_tree(jnp.broadcast_to(take, shape), Ta, T)
        return (f, T), None

    (f, T), _ = jax.lax.scan(step, (f0, T0), bits)

    q1x, q1y = _frobenius_g2(F, qx, qy, 1)
    q2x, q2y = _frobenius_g2(F, qx, qy, 2)
    T, ln = _add_step(F, T, q1x, q1y)
    f = line_mul(f, ln)
    _, ln2 = _add_step(F, T, q2x, q2y)
    f = line_mul(f, ln2)
    return f


# ---------------- final exponentiation ----------------


def _easy_t(F, f: Fq12) -> Fq12:
    """t = f^(p^6 - 1) = conj(f)^2 * 1/(a0^2 - v a1^2): since
    inv(f) = conj(f) * k with k the Fq6 norm inverse, conj(f)*inv(f)
    fuses to one f12_sq + one Fq6-scalar product — shallower than
    mul(conj, inv) (XLA CPU compile is superlinear in movement-op
    depth)."""
    from .tower import (_rows6, _rslice, _f6_norm_inv, f12_scale_f6_rows)
    r = _rows6(f)
    a0, a1 = _rslice(r, 0, 3), _rslice(r, 3, 6)
    k = _f6_norm_inv(F, a0, a1)
    return f12_scale_f6_rows(F, f12_sq(F, f12_conj(F, f)), k)


def _easy_part(F, f: Fq12) -> Fq12:
    """f^((p^6 - 1)(p^2 + 1)); one algebraic Fq12 inversion."""
    t = _easy_t(F, f)
    return f12_mul(F, f12_frobenius(F, t, 2), t)


def _pow_x(F, a: Fq12) -> Fq12:
    """a^x (x = 4965661367192848881), rolled MSB-first ladder."""
    bits = jnp.asarray([int(b) for b in bin(X_PARAM)[3:]], dtype=U32)
    shape = a.c0.c0.c0.shape[:-1]

    def body(i, acc):
        acc = f12_sq(F, acc)
        withx = f12_mul(F, acc, a)
        return _sel_tree(jnp.broadcast_to(bits[i] == 1, shape), withx, acc)

    return jax.lax.fori_loop(0, bits.shape[0], body, a)


def _pow_bits_table(F, a: Fq12, e: int) -> Fq12:
    bits = jnp.asarray([int(b) for b in bin(e)[3:]], dtype=U32)
    shape = a.c0.c0.c0.shape[:-1]

    def body(i, acc):
        acc = f12_sq(F, acc)
        withx = f12_mul(F, acc, a)
        return _sel_tree(jnp.broadcast_to(bits[i] == 1, shape), withx, acc)

    return jax.lax.fori_loop(0, bits.shape[0], body, a)


def final_exp_plain(F, f: Fq12) -> Fq12:
    """Easy part then the DIRECT (p^4 - p^2 + 1)/r power (3046-bit rolled
    ladder). Correctness anchor for the chain version."""
    p = BN254_FQ.p
    d = (p ** 4 - p ** 2 + 1) // R_ORDER
    return _pow_bits_table(F, _easy_part(F, f), d)


# The hard part runs as a TAPE MACHINE: one lax.scan over a static
# instruction tape whose uniform step is
#     v   = f12_sq(regs[ia])            if f_sq else regs[ia]
#     z   = regs[ib], w-conjugated      if f_wconj
#     w   = gamma-twist(z, gi)          (gi = 0 -> identity twist)
#     out = f12_mul(v, w) | w | v       by f_mul / f_takew
#     out = w-conj(out)                 if f_cout
#     regs[dst] = out
# which expresses the 3 x-power ladders, the Frobenius maps, conjugations
# and the Devegili/Scott addition chain as ~200 steps of ONE compiled
# body. Rationale: XLA CPU compile time is superlinear in the sequential
# DEPTH of data-movement ops (measured in ops/bigfield.py terms: 48
# chained modular adds 45 s vs 48 independent ones 0.8 s), so the
# unrolled chain (3 ladders + ~25 muls inline) is minutes of compile
# while the tape body compiles once.

_REG_M, _REG_FX, _REG_FX2, _REG_FX3 = 0, 1, 2, 3
_REG_Y4, _REG_Y6, _REG_Y0, _REG_T0, _REG_T1 = 4, 5, 6, 7, 8
_NREG = 9


@functools.lru_cache(maxsize=None)
def _hard_part_tape(p2_first: bool = False):
    """(idx (S,3) int32, flags (S,5) int32 [sq, wconj, mul, takew, cout],
    gi (S,) int32) — the BN hard-part program. p2_first prepends
    m = t * frob2(t) (the (p^2 + 1) half of the easy part), letting
    final_exponentiation feed f^(p^6-1) straight into the ONE scan."""
    steps = []

    def step(ia=0, ib=0, dst=0, sq=0, wconj=0, mul=0, takew=0, cout=0,
             gi=0):
        steps.append(((ia, ib, dst), (sq, wconj, mul, takew, cout), gi))

    if p2_first:
        step(ia=_REG_M, ib=_REG_M, dst=_REG_M, mul=1, gi=2)

    def ladder(dst, src):
        step(ia=src, dst=dst)                        # copy src -> dst
        for b in bin(X_PARAM)[3:]:
            step(ia=dst, ib=src, dst=dst, sq=1, mul=int(b))

    ladder(_REG_FX, _REG_M)                          # fx  = m^x
    ladder(_REG_FX2, _REG_FX)                        # fx2 = fx^x
    ladder(_REG_FX3, _REG_FX2)                       # fx3 = fx2^x
    # y4 = conj(fx * frob1(fx2)); y6 = conj(fx3 * frob1(fx3))
    step(ia=_REG_FX, ib=_REG_FX2, dst=_REG_Y4, mul=1, cout=1, gi=1)
    step(ia=_REG_FX3, ib=_REG_FX3, dst=_REG_Y6, mul=1, cout=1, gi=1)
    # y0 = frob1(m) * frob2(m) * frob3(m)
    step(ib=_REG_M, dst=_REG_Y0, takew=1, gi=1)
    step(ia=_REG_Y0, ib=_REG_M, dst=_REG_Y0, mul=1, gi=2)
    step(ia=_REG_Y0, ib=_REG_M, dst=_REG_Y0, mul=1, gi=3)
    # t0 = y6^2 * y4 * y5        (y5 = conj(fx2), applied on the fly)
    step(ia=_REG_Y6, dst=_REG_T0, sq=1)
    step(ia=_REG_T0, ib=_REG_Y4, dst=_REG_T0, mul=1)
    step(ia=_REG_T0, ib=_REG_FX2, dst=_REG_T0, mul=1, wconj=1)
    # t1 = y3 * y5 * t0          (y3 = conj(frob1(fx)))
    step(ia=_REG_T0, ib=_REG_FX, dst=_REG_T1, mul=1, wconj=1, gi=1)
    step(ia=_REG_T1, ib=_REG_FX2, dst=_REG_T1, mul=1, wconj=1)
    # t0 = t0 * y2               (y2 = frob2(fx2))
    step(ia=_REG_T0, ib=_REG_FX2, dst=_REG_T0, mul=1, gi=2)
    # t1 = t1^2 * t0; t1 = t1^2
    step(ia=_REG_T1, ib=_REG_T0, dst=_REG_T1, sq=1, mul=1)
    step(ia=_REG_T1, dst=_REG_T1, sq=1)
    # t0 = t1 * y1 (y1 = conj(m)); t1 = t1 * y0
    step(ia=_REG_T1, ib=_REG_M, dst=_REG_T0, mul=1, wconj=1)
    step(ia=_REG_T1, ib=_REG_Y0, dst=_REG_T1, mul=1)
    # out = t0^2 * t1
    step(ia=_REG_T0, dst=_REG_T0, sq=1)
    step(ia=_REG_T0, ib=_REG_T1, dst=_REG_T0, mul=1)
    idx = np.asarray([s[0] for s in steps], np.int32)
    flags = np.asarray([s[1] for s in steps], np.int32)
    gi = np.asarray([s[2] for s in steps], np.int32)
    return idx, flags, gi


@functools.lru_cache(maxsize=None)
def _gamma_row_table(limbs: int):
    """(4, 6, limbs) x2: identity + the three Frobenius gamma-twist row
    sets (tower._gamma_rows_host order), plus the matching per-Fq2
    conjugation flag (odd powers conjugate)."""
    from .tower import _gamma_rows_host
    Fh = BigMontField(BN254_FQ)
    one = np.asarray(Fh.encode_host(np.array([1] * 6, dtype=object)))
    zero = np.zeros_like(one)
    c0s, c1s = [one], [zero]
    for pw in (1, 2, 3):
        g0, g1 = _gamma_rows_host(Fh.limbs, pw)
        c0s.append(g0)
        c1s.append(g1)
    qconj = np.asarray([0, 1, 0, 1], np.int32)       # odd powers conjugate
    return np.stack(c0s), np.stack(c1s), qconj


def _wconj_rows(F, r: Fq2, flag) -> Fq2:
    """Conditionally negate the w-part rows (3:6) — z^(p^6)."""
    half = jnp.concatenate([jnp.zeros((3,), jnp.bool_),
                            jnp.ones((3,), jnp.bool_)])
    m = (flag != 0) & half
    m = m.reshape((6,) + (1,) * (r.c0.ndim - 1))
    return Fq2(jnp.where(m, F.neg(r.c0), r.c0),
               jnp.where(m, F.neg(r.c1), r.c1))


def hard_part_tape(F, m: Fq12, p2_first: bool = False) -> Fq12:
    """m^((p^4 - p^2 + 1)/r) for m in the cyclotomic subgroup, as one
    scanned tape (see the program comment above). With p2_first, input
    is t = f^(p^6-1) and the (p^2+1) power rides the first step."""
    from .tower import _rows6, _unrows6, f2_mul_rows
    idx, flags, gi = _hard_part_tape(p2_first)
    gc0, gc1, qconj = _gamma_row_table(F.limbs)
    gt0, gt1 = jnp.asarray(gc0), jnp.asarray(gc1)
    qconj = jnp.asarray(qconj)

    r0 = _rows6(m)
    regs = Fq2(jnp.broadcast_to(r0.c0, (_NREG,) + r0.c0.shape),
               jnp.broadcast_to(r0.c1, (_NREG,) + r0.c1.shape))

    bshape = r0.c0.shape[:-1][1:]                    # batch dims after rows
    gshape = (6,) + (1,) * len(bshape) + (gt0.shape[-1],)

    def step(regs, xs):
        (ia, ib, dst), (f_sq, f_wconj, f_mul, f_takew, f_cout), g = xs
        a = _unrows6(Fq2(regs.c0[ia], regs.c1[ia]))
        sq = _rows6(f12_sq(F, a))
        v = _sel_tree(f_sq != 0, sq, Fq2(regs.c0[ia], regs.c1[ia]))
        z = _wconj_rows(F, Fq2(regs.c0[ib], regs.c1[ib]), f_wconj)
        z = _sel_tree(qconj[g] != 0, Fq2(z.c0, F.neg(z.c1)), z)
        gam = Fq2(gt0[g].reshape(gshape), gt1[g].reshape(gshape))
        w = f2_mul_rows(F, z, gam)
        r = _rows6(f12_mul(F, _unrows6(v), _unrows6(w)))
        out = _sel_tree(f_mul != 0, r,
                        _sel_tree(f_takew != 0, w, v))
        out = _wconj_rows(F, out, f_cout)
        regs = Fq2(regs.c0.at[dst].set(out.c0), regs.c1.at[dst].set(out.c1))
        return regs, None

    xs = ((jnp.asarray(idx[:, 0]), jnp.asarray(idx[:, 1]),
           jnp.asarray(idx[:, 2])),
          (jnp.asarray(flags[:, 0]), jnp.asarray(flags[:, 1]),
           jnp.asarray(flags[:, 2]), jnp.asarray(flags[:, 3]),
           jnp.asarray(flags[:, 4])),
          jnp.asarray(gi))
    regs, _ = jax.lax.scan(step, regs, xs)
    return _unrows6(Fq2(regs.c0[_REG_T0], regs.c1[_REG_T0]))


def final_exponentiation(F, f: Fq12) -> Fq12:
    """Easy part + the standard BN hard-part addition chain (Devegili et
    al. / Scott et al.) run as the scanned tape above — exactly
    m^((p^4 - p^2 + 1)/r). Asserted equal to final_exp_plain and the
    python-int oracle in tests."""
    return hard_part_tape(F, _easy_t(F, f), p2_first=True)


def final_exponentiation_unrolled(F, f: Fq12) -> Fq12:
    """The same chain inlined (3 ladders + ~25 muls) — correctness anchor
    for the tape; compile-hostile on the CPU backend, test-only."""
    m = _easy_part(F, f)
    fx = _pow_x(F, m)
    fx2 = _pow_x(F, fx)
    fx3 = _pow_x(F, fx2)
    y0 = f12_mul(F, f12_mul(F, f12_frobenius(F, m, 1),
                            f12_frobenius(F, m, 2)),
                 f12_frobenius(F, m, 3))
    y1 = f12_conj(F, m)
    y2 = f12_frobenius(F, fx2, 2)
    y3 = f12_conj(F, f12_frobenius(F, fx, 1))
    y4 = f12_conj(F, f12_mul(F, fx, f12_frobenius(F, fx2, 1)))
    y5 = f12_conj(F, fx2)
    y6 = f12_conj(F, f12_mul(F, fx3, f12_frobenius(F, fx3, 1)))
    t0 = f12_mul(F, f12_mul(F, f12_sq(F, y6), y4), y5)
    t1 = f12_mul(F, f12_mul(F, y3, y5), t0)
    t0 = f12_mul(F, t0, y2)
    t1 = f12_mul(F, f12_sq(F, t1), t0)
    t1 = f12_sq(F, t1)
    t0 = f12_mul(F, t1, y1)
    t1 = f12_mul(F, t1, y0)
    t0 = f12_sq(F, t0)
    return f12_mul(F, t0, t1)


def pairing(F, p: BigG1J, qx: Fq2, qy: Fq2, plain: bool = False) -> Fq12:
    """e(P, Q) with P a Jacobian G1 batch and Q affine twist coordinates.
    P at infinity maps to 1 (the masked extension ops/pairing.py also
    makes; the reference has no identity handling at all)."""
    px, py, pinf = big_to_affine(F, p)
    f = miller_loop(F, px, py, qx, qy)
    out = (final_exp_plain if plain else final_exponentiation)(F, f)
    one = Fq12.one(F, pinf.shape)
    return _sel_tree(pinf, one, out)
