"""Polynomial layer parity tests (mirrors src/poly-test.c), with real asserts
everywhere the reference forgot them (src/poly-test.c:177), plus coverage of
the closed-form divisions the prover uses."""
import numpy as np
import jax.numpy as jnp

from plonk_tpu.utils.params import HF17, BABYBEAR
from plonk_tpu.ops.field import Field, MontField
from plonk_tpu.ops import poly as P

F = Field(HF17)


def arr(*vals):
    return F.array(list(vals))


def np_trim(c):
    c = list(np.asarray(c))
    while len(c) > 1 and c[-1] == 0:
        c.pop()
    return c


def test_poly_add():
    # src/poly-test.c:39-68
    a = arr(1, 2, 3)
    b = arr(1, 4)
    assert np_trim(P.padd(F, a, b)) == [2, 6, 3]
    c = arr(1, 2, 3, 4, 5)
    assert np_trim(P.padd(F, a, c)) == [2, 4, 6, 4, 5]
    d = arr(1, 2, 3, 4, 6)
    assert np_trim(P.padd(F, a, d)) == [2, 4, 6, 4, 6]


def test_poly_sub():
    a = arr(1, 2, 3)
    assert np_trim(P.psub(F, a, a)) == [0]
    b = arr(1, 2)
    assert np_trim(P.psub(F, a, b)) == [0, 0, 3]


def test_poly_add_const():
    p = arr(0)
    p = P.padd_const(F, p, F.const(3))
    assert np_trim(p) == [3]
    p = P.padd_const(F, p, F.neg(F.const(3)))
    assert np_trim(p) == [0]


def test_poly_mul():
    # src/poly-test.c:139-153
    a = arr(5, 0, 10, 6)
    b = arr(1, 2, 4)
    prod = P.pmul_school(F, a, b)
    expected = [x % 17 for x in [5, 10, 30, 26, 52, 24]]
    assert np_trim(prod) == expected


def test_poly_negate_scale_shift_slice():
    p = arr(3, 2, 1)
    assert np_trim(P.pneg(F, p)) == [14, 15, 16]
    assert np_trim(P.pscale(F, p, F.const(4))) == [12, 8, 4]
    assert list(np.asarray(P.pshift(F, p, 2))) == [0, 0, 3, 2, 1]
    assert list(np.asarray(p[1:3])) == [2, 1]  # poly_slice is just slicing


def test_poly_divide_generic():
    # (x-3)(x-5) / (x-3) == (x-5)  (src/poly-test.c:155-178)
    px = arr(15, -8, 1)
    div = arr(-3, 1)
    q, r = P.pdivide(F, px, div)
    assert np_trim(q) == np_trim(arr(-5, 1))
    assert np_trim(r) == [0]
    # non-exact division: x^3 + 1 by x^2: q = x, r = 1
    q, r = P.pdivide(F, arr(1, 0, 0, 1), arr(0, 0, 1))
    assert np_trim(q) == [0, 1]
    assert np_trim(r) == [1]


def test_poly_eval():
    p = arr(1, 2, 1)
    assert int(P.peval(F, p, F.const(2))) == 9
    many = P.peval_many(F, p, F.array([0, 1, 2, 3]))
    assert list(np.asarray(many)) == [1, 4, 9, 16]


def test_poly_z():
    # src/poly-test.c:180-189
    z = P.pz(F, F.array([1, 5]))
    assert np_trim(z) == np_trim(arr(5, -6, 1))
    # z_H over H = {1,4,16,13} is x^4 - 1 (src/plonk.h:116, SURVEY fixture)
    zh = P.pz(F, F.array([1, 4, 16, 13]))
    assert np_trim(zh) == [16, 0, 0, 0, 1]


def test_poly_lagrange():
    # src/poly-test.c:191-203 (round-trip) plus exact-coefficient uniqueness
    xs = F.array([1, 5, 7, 3])
    ys = F.array([2, 7, 9, 1])
    l = P.plagrange(F, xs, ys)
    evals = P.peval_many(F, l, xs)
    assert list(np.asarray(evals)) == [2, 7, 9, 1]
    # golden interpolation fixture: values [3,4,0,0] on H -> 6+x+4x^2+9x^3
    # (src/plonk-test.c:52-56); Lagrange through (H, values) must agree
    h = F.array([1, 4, 16, 13])
    l2 = P.plagrange(F, h, F.array([3, 4, 0, 0]))
    assert list(np.asarray(l2)) == [6, 1, 4, 9]


def test_divide_by_vanishing():
    rng = np.random.default_rng(0)
    n = 4
    for L in [18, 22, 9, 5]:
        q_true = F.array(rng.integers(0, 17, size=L - n))
        zh = P.pz(F, F.array([1, 4, 16, 13]))
        t = P.pmul_school(F, q_true, zh)  # exact multiple, len L+1... recompute
        t = P.pad_to(t, max(L, t.shape[-1]))
        q, rem = P.divide_by_vanishing(F, t, n)
        assert np.all(np.asarray(rem) == 0)
        assert np_trim(q) == np_trim(q_true)
    # non-exact: remainder detected
    t = F.array(rng.integers(1, 17, size=9))
    q, rem = P.divide_by_vanishing(F, t, n)
    qn, remn = P.pdivide(F, t, zh)
    assert np_trim(q) == np_trim(qn)
    assert np_trim(rem) == np_trim(remn)


def test_divide_by_linear():
    rng = np.random.default_rng(1)
    for L in [7, 12, 3]:
        t = F.array(rng.integers(0, 17, size=L))
        c = F.const(5)
        q, rem = P.divide_by_linear(F, t, c)
        qn, remn = P.pdivide(F, t, arr(-5, 1))
        assert np_trim(q) == np_trim(qn)
        assert int(rem) == int(np.asarray(remn)[0])
        assert int(rem) == int(P.peval(F, t, c))


def test_poly_montgomery_field():
    """Same poly ops over the Montgomery BabyBear field."""
    M = MontField(BABYBEAR)
    rng = np.random.default_rng(2)
    a_std = rng.integers(0, M.p, size=9, dtype=np.uint32)
    b_std = rng.integers(0, M.p, size=7, dtype=np.uint32)
    a, b = M.array(a_std), M.array(b_std)
    prod = np.asarray(M.decode(P.pmul_school(M, a, b)))
    expected = np.zeros(15, dtype=object)
    for i, x in enumerate(a_std):
        for j, y in enumerate(b_std):
            expected[i + j] = (expected[i + j] + int(x) * int(y)) % M.p
    np.testing.assert_array_equal(prod, expected.astype(np.uint32))
    # eval + vanishing division round trip
    zh = P.pz(M, M.array([1, BABYBEAR.root_of_unity(4),
                          pow(BABYBEAR.root_of_unity(4), 2, M.p),
                          pow(BABYBEAR.root_of_unity(4), 3, M.p)]))
    t = P.pmul_school(M, a, zh)
    q, rem = P.divide_by_vanishing(M, t, 4)
    assert np.all(np.asarray(rem) == 0)
    assert np_trim(M.decode(q)) == np_trim(M.decode(a))
