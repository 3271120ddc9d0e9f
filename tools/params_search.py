"""Derivation of the SCALED_CURVE constants in plonk_tpu/utils/params.py.

Construction mirrors the toy curve (SURVEY §0): pick a 2-adic scalar prime
r (NTT-friendly), then a base prime p = k*r - 1 with p = 2 mod 3 so that
y^2 = x^3 + b over F_p is supersingular with exactly p + 1 = k*r points and
embedding degree 2. Cofactor-clear small base points for the G1/G2
generators; the G2 twist uses the smallest quadratic non-residue.

Run: python tools/params_search.py   (requires sympy; host-side only)
"""
import sympy

R_TWO_ADICITY = 22


def find_params():
    for c in range(1, 64, 2):
        r = c * (1 << R_TWO_ADICITY) + 1
        if r >= (1 << 31) or not sympy.isprime(r):
            continue
        for k in range(2, 200, 2):
            p = k * r - 1
            if p >= (1 << 31):
                break
            if p % 3 == 2 and sympy.isprime(p):
                return r, k, p
    raise RuntimeError("no parameters found")


def ec_add(p, P, Q):
    if P is None:
        return Q
    if Q is None:
        return P
    x1, y1 = P
    x2, y2 = Q
    if x1 == x2:
        if (y1 + y2) % p == 0:
            return None
        m = (3 * x1 * x1) * pow(2 * y1, -1, p) % p
    else:
        m = (y2 - y1) * pow(x2 - x1, -1, p) % p
    x3 = (m * m - x1 - x2) % p
    return (x3, (m * (x1 - x3) - y1) % p)


def ec_mul(p, P, k):
    R, A = None, P
    while k:
        if k & 1:
            R = ec_add(p, R, A)
        A = ec_add(p, A, A)
        k >>= 1
    return R


def main():
    b = 3
    r, k, p = find_params()
    print(f"r = {r} (= {r - 1 >> R_TWO_ADICITY}*2^{R_TWO_ADICITY} + 1), "
          f"p = {p} = {k}*r - 1")
    print("F_r generator:", sympy.primitive_root(r))
    print("F_p generator:", sympy.primitive_root(p))

    for x in range(1, 100):
        rhs = (x ** 3 + b) % p
        if sympy.legendre_symbol(rhs, p) == 1:
            g1 = ec_mul(p, (x, sympy.sqrt_mod(rhs, p)), k)
            break
    assert ec_mul(p, g1, r) is None
    print("G1 generator:", g1)

    d = next(c for c in (2, 3, 5, 7, 11) if sympy.legendre_symbol(c, p) == -1)
    print("twist non-residue d:", d)

    # twist points (x, y*u): d*y^2 = x^3 + b; cofactor-clear via the
    # isomorphic short-Weierstrass model Y^2 = X^3 + b*d^3 ((X,Y)=(dx,d^2y))
    for x in range(1, 200):
        v = (x ** 3 + b) % p * pow(d, -1, p) % p
        if v and sympy.legendre_symbol(v, p) == 1:
            xt, yt = x, sympy.sqrt_mod(v, p)
            break
    X, Y = xt * d % p, yt * d * d % p
    G2m = ec_mul(p, (X, Y), k)  # on Y^2 = X^3 + b*d^3
    g2 = (G2m[0] * pow(d, -1, p) % p, G2m[1] * pow(d * d, -1, p) % p)
    print("G2 generator (twist coords):", g2)


if __name__ == "__main__":
    main()
