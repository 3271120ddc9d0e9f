"""Pairing parity: bilinearity vectors of src/pairing-test.c plus the
golden Miller-loop / pairing values extracted from the reference."""
import json
import os

import jax.numpy as jnp

from plonk_tpu.utils.params import TOY_CURVE, GF101
from plonk_tpu.ops.field import Field
from plonk_tpu.ops import curve as C
from plonk_tpu.ops import pairing as PR

F = Field(GF101)
CV = TOY_CURVE
GOLDEN = json.load(open(os.path.join(os.path.dirname(__file__), "golden",
                                     "plonk_golden.json")))


def test_miller_and_pairing_golden():
    g1 = C.g1_generator(CV, F)
    g2 = C.g2_generator(CV, F)
    ml = PR.miller_loop(F, CV, g1, g2)
    assert [int(ml.a), int(ml.b)] == GOLDEN["miller_g1_g2"]
    e = PR.pairing(F, CV, g1, g2)
    assert [int(e.a), int(e.b)] == GOLDEN["pairing_g1_g2"]
    p2 = C.g1_mul(F, g1, 2)
    e2 = PR.pairing(F, CV, p2, g2)
    assert [int(e2.a), int(e2.b)] == GOLDEN["pairing_2g1_g2"]
    q2 = C.g2_mul(F, CV.d, g2, 2)
    e3 = PR.pairing(F, CV, g1, q2)
    assert [int(e3.a), int(e3.b)] == GOLDEN["pairing_g1_2g2"]


def test_bilinearity():
    # src/pairing-test.c:4-28
    g1 = C.g1_generator(CV, F)
    g2 = C.g2_generator(CV, F)
    p = g1
    r = C.g1_mul(F, g1, 4)
    q = C.g2_mul(F, CV.d, g2, 3)
    a = 5

    p_mul_a = C.g1_mul(F, p, a)
    left = PR.pairing(F, CV, p_mul_a, q)
    q_mul_a = C.g2_mul(F, CV.d, q, a)
    right = PR.pairing(F, CV, p, q_mul_a)
    assert bool(C.gt_equal(left, right))

    p_q = PR.pairing(F, CV, p, q)
    right2 = C.gt_pow_static(F, CV.d, p_q, a)
    assert bool(C.gt_equal(left, right2))

    tmp = C.g1_add(F, p, r)
    p_plus_r = PR.pairing(F, CV, tmp, q)
    r_q = PR.pairing(F, CV, r, q)
    prod = C.gt_mul(F, CV.d, p_q, r_q)
    assert bool(C.gt_equal(p_plus_r, prod))


def test_pairing_batched():
    """vmap-style batching: pair multiple G1 points against G2 at once."""
    g1 = C.g1_generator(CV, F)
    g2 = C.g2_generator(CV, F)
    scalars = jnp.arange(1, 6, dtype=jnp.uint32)
    pts = C.g1_mul(F, g1, scalars)
    es = PR.pairing(F, CV, pts, g2)
    base = PR.pairing(F, CV, g1, g2)
    for i, k in enumerate(range(1, 6)):
        single = C.gt_pow_static(F, CV.d, base, k)
        assert int(es.a[i]) == int(single.a) and int(es.b[i]) == int(single.b)


def test_pairing_with_infinity():
    """Capability extension: e(inf, Q) == 1 (needed by the verifier)."""
    g2 = C.g2_generator(CV, F)
    e = PR.pairing(F, CV, C.G1.identity(), g2)
    assert int(e.a) == 1 and int(e.b) == 0
