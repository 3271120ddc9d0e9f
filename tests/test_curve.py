"""Curve group parity tests: golden vectors from src/g1-test.c,
src/g2-test.c, src/gt-test.c plus full multiplication tables extracted from
the reference (tests/golden/plonk_golden.json)."""
import json
import os

import numpy as np
import jax.numpy as jnp

from plonk_tpu.utils.params import TOY_CURVE, GF101
from plonk_tpu.ops.field import Field
from plonk_tpu.ops import curve as C

F = Field(GF101)
D = TOY_CURVE.d
GOLDEN = json.load(open(os.path.join(os.path.dirname(__file__), "golden",
                                     "plonk_golden.json")))


def g1(x, y):
    return C.G1.of(F, x, y)


def assert_g1(p, x, y, inf=False):
    if inf:
        assert bool(p.inf)
    else:
        assert not bool(p.inf)
        assert int(p.x) == x and int(p.y) == y


def test_g1_vectors():
    # src/g1-test.c:11-42
    g = C.g1_generator(TOY_CURVE, F)
    two = C.g1_add(F, g, g)
    three = C.g1_add(F, two, g)
    four = C.g1_add(F, two, two)
    five = C.g1_add(F, four, g)
    six = C.g1_add(F, five, g)
    eight = C.g1_add(F, four, four)
    nine = C.g1_add(F, eight, g)
    sixteen = C.g1_add(F, eight, eight)
    assert_g1(C.g1_neg(F, g), 1, 99)
    assert_g1(two, 68, 74)
    assert_g1(C.g1_neg(F, two), 68, 27)
    assert_g1(three, 26, 45)
    assert_g1(four, 65, 98)
    assert_g1(C.g1_neg(F, four), 65, 3)
    assert_g1(five, 12, 32)
    assert_g1(eight, 18, 49)
    assert_g1(C.g1_neg(F, eight), 18, 52)
    assert_g1(nine, 18, 52)
    assert_g1(sixteen, 1, 99)
    assert_g1(C.g1_neg(F, sixteen), 1, 2)
    assert_g1(C.g1_mul(F, g, 1), 1, 2)
    assert_g1(C.g1_mul(F, g, 2), 68, 74)
    assert bool(C.g1_equal(C.g1_mul(F, g, 6), six))


def test_g1_multiples_golden():
    """Whole subgroup table 0..17 from the instrumented reference, computed
    as ONE batched ladder."""
    g = C.g1_generator(TOY_CURVE, F)
    scalars = jnp.arange(18, dtype=jnp.uint32)
    pts = C.g1_mul(F, g, scalars)
    for i, exp in enumerate(GOLDEN["g1_multiples"]):
        if exp["inf"]:
            assert bool(pts.inf[i]), i
        else:
            assert not bool(pts.inf[i]), i
            assert int(pts.x[i]) == exp["x"] and int(pts.y[i]) == exp["y"], i


def test_g1_on_curve_and_identity():
    g = C.g1_generator(TOY_CURVE, F)
    assert bool(C.g1_is_on_curve(F, 3, g))
    ident = C.G1.identity()
    assert bool(C.g1_is_on_curve(F, 3, ident))
    # P + inf == P, inf + P == P
    assert bool(C.g1_equal(C.g1_add(F, g, ident), g))
    assert bool(C.g1_equal(C.g1_add(F, ident, g), g))
    # P + (-P) == inf
    assert bool(C.g1_add(F, g, C.g1_neg(F, g)).inf)
    # double of y == 0 -> inf (no such point on this curve; synthetic check)
    p0 = C.G1(F.const(5), F.const(0), jnp.asarray(False))
    assert bool(C.g1_double(F, p0).inf)


def test_g2_vectors():
    # src/g2-test.c:10-20
    g = C.g2_generator(TOY_CURVE, F)
    two = C.g2_add(F, D, g, g)
    three = C.g2_add(F, D, two, g)
    four = C.g2_add(F, D, two, two)
    six = C.g2_add(F, D, four, two)
    assert int(two.x) == 90 and int(two.y) == 82
    four2 = C.g2_add(F, D, three, g)
    assert int(four.x) == int(four2.x) and int(four.y) == int(four2.y)
    m6 = C.g2_mul(F, D, g, 6)
    assert int(m6.x) == int(six.x) and int(m6.y) == int(six.y)


def test_g2_multiples_golden():
    g = C.g2_generator(TOY_CURVE, F)
    scalars = jnp.arange(1, 18, dtype=jnp.uint32)
    pts = C.g2_mul(F, D, g, scalars)
    for i, exp in enumerate(GOLDEN["g2_multiples"]):
        assert int(pts.x[i]) == exp["x"] and int(pts.y[i]) == exp["y"], i


def test_gt_vectors():
    # src/gt-test.c:11-27
    a = C.GT(F.const(26), F.const(97))
    b = C.GT(F.const(93), F.const(76))
    r = C.gt_mul(F, D, a, b)
    assert int(r.a) == 97 and int(r.b) == 89
    p6 = C.gt_pow_static(F, D, C.GT(F.const(42), F.const(49)), 6)
    assert int(p6.a) == 97 and int(p6.b) == 89
    base = C.GT(F.const(93), F.const(76))
    neg = C.gt_conj(F, base)
    p101 = C.gt_pow_static(F, D, base, 101)
    p102 = C.gt_pow_static(F, D, base, 102)
    nb = C.gt_mul(F, D, neg, base)
    assert int(p101.a) == int(neg.a) and int(p101.b) == int(neg.b)
    assert int(p102.a) == int(nb.a) and int(p102.b) == int(nb.b)
    p600 = C.gt_pow_static(F, D, C.GT(F.const(68), F.const(47)), 600)
    assert int(p600.a) == 97 and int(p600.b) == 89
    # traced-exponent path agrees
    p6t = C.gt_pow(F, D, C.GT(F.const(42), F.const(49)), jnp.uint32(6))
    assert int(p6t.a) == 97 and int(p6t.b) == 89


def test_g1_mul_batched_vs_scan():
    """Batched ladder == repeated addition for the whole subgroup."""
    g = C.g1_generator(TOY_CURVE, F)
    acc = C.G1.identity()
    for k in range(1, 18):
        acc = C.g1_add(F, acc, g)
        m = C.g1_mul(F, g, k)
        assert bool(C.g1_equal(acc, m)), k
