"""Pure python-int BN254 oracle: Fq2/Fq6/Fq12 tower, G2, optimal-ate
pairing. Independent reference for tests/test_bigpairing.py — the JAX
implementation (plonk_tpu/ops/tower.py, bigpairing.py) is checked against
these values the way the reference's hand-computed vectors anchor the toy
curve (src/pairing-test.c), at 254-bit scale.

The final exponentiation here uses the PLAIN exponent (p^12 - 1) / r, so
an agreement with the chain-based device implementation is evidence the
addition chain computes exactly that exponent (no shared structure).
"""
from __future__ import annotations

# Curve parameter x, and the derived BN254 constants.
X_PARAM = 4965661367192848881
P = 21888242871839275222246405745257275088696311157297823662689037894645226208583
R = 21888242871839275222246405745257275088548364400416034343698204186575808495617
ATE_LOOP = 6 * X_PARAM + 2   # 29793968203157093288

G1_GEN = (1, 2)
B1 = 3

# G2 generator (arkworks/gnark standard), coordinates in Fq2 = Fq[u]/(u^2+1)
G2_GEN_X = (10857046999023057135944570762232829481370756359578518086990519993285655852781,
            11559732032986387107991004021392285783925812861821192530917403151452391805634)
G2_GEN_Y = (8495653923123431417604973247489272438418190587263600148770280649306958101930,
            4082367875863433681332203403145435568316851327593401208105741076214120093531)

# ---- Fq2: u^2 = -1 ----

def f2_add(a, b):
    return ((a[0] + b[0]) % P, (a[1] + b[1]) % P)

def f2_sub(a, b):
    return ((a[0] - b[0]) % P, (a[1] - b[1]) % P)

def f2_mul(a, b):
    return ((a[0] * b[0] - a[1] * b[1]) % P,
            (a[0] * b[1] + a[1] * b[0]) % P)

def f2_sq(a):
    return f2_mul(a, a)

def f2_neg(a):
    return ((-a[0]) % P, (-a[1]) % P)

def f2_conj(a):
    return (a[0], (-a[1]) % P)

def f2_scalar(a, k):
    return (a[0] * k % P, a[1] * k % P)

def f2_inv(a):
    n = (a[0] * a[0] + a[1] * a[1]) % P
    ni = pow(n, P - 2, P)
    return (a[0] * ni % P, (-a[1]) * ni % P)

def f2_pow(a, e):
    r = (1, 0)
    while e:
        if e & 1:
            r = f2_mul(r, a)
        a = f2_sq(a)
        e >>= 1
    return r

XI = (9, 1)   # the sextic non-residue xi = 9 + u

def f2_mul_xi(a):
    return f2_mul(a, XI)

# twist curve: y^2 = x^3 + b/xi (D-type twist)
B2 = f2_mul((B1, 0), f2_inv(XI))

# ---- Fq6 = Fq2[v]/(v^3 - xi): (c0, c1, c2) ----

def f6_add(a, b):
    return tuple(f2_add(x, y) for x, y in zip(a, b))

def f6_sub(a, b):
    return tuple(f2_sub(x, y) for x, y in zip(a, b))

def f6_neg(a):
    return tuple(f2_neg(x) for x in a)

def f6_mul(a, b):
    a0, a1, a2 = a
    b0, b1, b2 = b
    c0 = f2_add(f2_mul(a0, b0),
                f2_mul_xi(f2_add(f2_mul(a1, b2), f2_mul(a2, b1))))
    c1 = f2_add(f2_add(f2_mul(a0, b1), f2_mul(a1, b0)),
                f2_mul_xi(f2_mul(a2, b2)))
    c2 = f2_add(f2_add(f2_mul(a0, b2), f2_mul(a1, b1)), f2_mul(a2, b0))
    return (c0, c1, c2)

def f6_mul_v(a):
    """v * (c0 + c1 v + c2 v^2) = xi*c2 + c0 v + c1 v^2."""
    return (f2_mul_xi(a[2]), a[0], a[1])

def f6_inv(a):
    a0, a1, a2 = a
    t0 = f2_sub(f2_sq(a0), f2_mul_xi(f2_mul(a1, a2)))
    t1 = f2_sub(f2_mul_xi(f2_sq(a2)), f2_mul(a0, a1))
    t2 = f2_sub(f2_sq(a1), f2_mul(a0, a2))
    d = f2_add(f2_mul(a0, t0),
               f2_mul_xi(f2_add(f2_mul(a2, t1), f2_mul(a1, t2))))
    di = f2_inv(d)
    return (f2_mul(t0, di), f2_mul(t1, di), f2_mul(t2, di))

# ---- Fq12 = Fq6[w]/(w^2 - v): (c0, c1) ----

F12_ONE = (((1, 0), (0, 0), (0, 0)), ((0, 0), (0, 0), (0, 0)))

def f12_mul(a, b):
    a0, a1 = a
    b0, b1 = b
    v0 = f6_mul(a0, b0)
    v1 = f6_mul(a1, b1)
    c0 = f6_add(v0, f6_mul_v(v1))
    c1 = f6_sub(f6_sub(f6_mul(f6_add(a0, a1), f6_add(b0, b1)), v0), v1)
    return (c0, c1)

def f12_sq(a):
    return f12_mul(a, a)

def f12_conj(a):
    return (a[0], f6_neg(a[1]))

def f12_inv(a):
    a0, a1 = a
    t = f6_inv(f6_sub(f6_mul(a0, a0), f6_mul_v(f6_mul(a1, a1))))
    return (f6_mul(a0, t), f6_neg(f6_mul(a1, t)))

def f12_pow(a, e):
    if e < 0:
        return f12_pow(f12_inv(a), -e)
    r = F12_ONE
    while e:
        if e & 1:
            r = f12_mul(r, a)
        a = f12_sq(a)
        e >>= 1
    return r

# Frobenius constants: gamma1[i] = xi^(i*(p-1)/6) for i in 0..5
GAMMA1 = [f2_pow(XI, i * (P - 1) // 6) for i in range(6)]
GAMMA2 = [f2_mul(g, f2_conj(g)) for g in GAMMA1]   # norms -> in Fq
GAMMA3 = [f2_mul(g2, g1) for g1, g2 in zip(GAMMA1, GAMMA2)]

def f12_frobenius(a, power=1):
    """a^(p^power) for power in {1, 2, 3}. Coefficient layout: an element
    is sum_{i<6} c_i w^i with c_i in Fq2, where (c0..c5) map to
    ((a0.c0, a1.c0... )) — here we use the (Fq6, Fq6) representation and
    apply conj + gamma per Fq2 coefficient with its w-degree."""
    gam = {1: GAMMA1, 2: GAMMA2, 3: GAMMA3}[power]
    conj = power % 2 == 1
    (c0, c1) = a
    def tw(c, i):
        c = f2_conj(c) if conj else c
        return f2_mul(c, gam[i])
    a0 = (tw(c0[0], 0), tw(c0[1], 2), tw(c0[2], 4))
    a1 = (tw(c1[0], 1), tw(c1[1], 3), tw(c1[2], 5))
    return (a0, a1)

# ---- G1 / G2 affine (None = infinity) ----

def g1_add(p1, p2):
    if p1 is None:
        return p2
    if p2 is None:
        return p1
    x1, y1 = p1
    x2, y2 = p2
    if x1 == x2:
        if (y1 + y2) % P == 0:
            return None
        m = 3 * x1 * x1 * pow(2 * y1, P - 2, P) % P
    else:
        m = (y2 - y1) * pow(x2 - x1, P - 2, P) % P
    x3 = (m * m - x1 - x2) % P
    return (x3, (m * (x1 - x3) - y1) % P)

def g1_mul(p, k):
    acc = None
    while k:
        if k & 1:
            acc = g1_add(acc, p)
        p = g1_add(p, p)
        k >>= 1
    return acc

def g2_add(p1, p2):
    if p1 is None:
        return p2
    if p2 is None:
        return p1
    x1, y1 = p1
    x2, y2 = p2
    if x1 == x2:
        if f2_add(y1, y2) == (0, 0):
            return None
        m = f2_mul(f2_scalar(f2_sq(x1), 3), f2_inv(f2_scalar(y1, 2)))
    else:
        m = f2_mul(f2_sub(y2, y1), f2_inv(f2_sub(x2, x1)))
    x3 = f2_sub(f2_sub(f2_sq(m), x1), x2)
    return (x3, f2_sub(f2_mul(m, f2_sub(x1, x3)), y1))

def g2_mul(p, k):
    acc = None
    while k:
        if k & 1:
            acc = g2_add(acc, p)
        p = g2_add(p, p)
        k >>= 1
    return acc

def g2_neg(p):
    return None if p is None else (p[0], f2_neg(p[1]))

def g2_on_curve(p):
    x, y = p
    return f2_sq(y) == f2_add(f2_mul(f2_sq(x), x), B2)

# ---- optimal ate pairing ----

def _line(t, q, p):
    """The line through t and q (or the tangent at t if t == q), evaluated
    at the G1 point p = (xp, yp), as a sparse Fq12 element
    l = l0 + (l1 w + l2 w^3) with l0, l1, l2 in Fq2 — the D-twist layout:
    l(P) = (y_t-ish terms) ... Returns the full Fq12 element."""
    (xt, yt), (xq, yq) = t, q
    if t == q:
        lam = f2_mul(f2_scalar(f2_sq(xt), 3), f2_inv(f2_scalar(yt, 2)))
    else:
        lam = f2_mul(f2_sub(yq, yt), f2_inv(f2_sub(xq, xt)))
    # l(P) = yp - lam * xp * w? — with untwisting, the standard D-twist line
    # at P=(xp, yp): l = yp * 1 - lam * xp * w + (lam * xt - yt) * w^3
    xp, yp = p
    c0 = ((yp, 0), (0, 0), (0, 0))                      # Fq6 coefficient
    l1 = f2_scalar(f2_neg(lam), xp)                     # * w
    l3 = f2_sub(f2_mul(lam, xt), yt)                    # * w^3
    c1 = (l1, l3, (0, 0))
    return (c0, c1)

def miller_loop(p, q):
    """f_{6x+2, Q}(P) with the two frobenius correction lines."""
    t = q
    f = F12_ONE
    for bit in bin(ATE_LOOP)[3:]:
        f = f12_mul(f12_sq(f), _line(t, t, p))
        t = g2_add(t, t)
        if bit == "1":
            f = f12_mul(f, _line(t, q, p))
            t = g2_add(t, q)
    # frobenius endomorphism on the (untwisted) Q: on twist coordinates
    # pi(x, y) = (conj(x) * gamma1[2], conj(y) * gamma1[3])
    q1 = (f2_mul(f2_conj(q[0]), GAMMA1[2]),
          f2_mul(f2_conj(q[1]), GAMMA1[3]))
    q2 = (f2_mul(q[0], GAMMA2[2]), f2_neg(f2_mul(q[1], GAMMA2[3])))
    f = f12_mul(f, _line(t, q1, p))
    t = g2_add(t, q1)
    f = f12_mul(f, _line(t, q2, p))
    return f

def pairing(p, q):
    """Full pairing with the PLAIN final exponent (p^12-1)/r."""
    f = miller_loop(p, q)
    return f12_pow(f, (P ** 12 - 1) // R)


if __name__ == "__main__":
    # constant sanity
    g2 = (G2_GEN_X, G2_GEN_Y)
    print("g2 on curve:", g2_on_curve(g2))
    print("r*g2 == inf:", g2_mul(g2, R) is None)
    e1 = pairing(G1_GEN, g2)
    print("e(P,Q) != 1:", e1 != F12_ONE)
    print("e(P,Q)^r == 1:", f12_pow(e1, R) == F12_ONE)
    a, b = 12345, 67890
    lhs = pairing(g1_mul(G1_GEN, a), g2_mul(g2, b))
    rhs = f12_pow(e1, a * b)
    print("bilinear:", lhs == rhs)
