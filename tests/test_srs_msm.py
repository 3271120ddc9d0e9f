"""SRS (both modes) and MSM tests.

- degenerate "reference" mode reproduces src/srs-test.c and the golden dump
  (all G1 powers at infinity — the enshrined bug, SURVEY §2.2.1);
- "fixed" mode matches the intended PLONK-by-hand SRS;
- Pippenger MSM == naive fold on random instances.
"""
import json
import os

import numpy as np
import jax.numpy as jnp

from plonk_tpu.utils.params import TOY_CURVE, GF101, HF17
from plonk_tpu.ops.field import Field
from plonk_tpu.ops import curve as C
from plonk_tpu.ops import msm as MSM
from plonk_tpu.models import srs as S

Fq = Field(GF101)
Fr = Field(HF17)
CV = TOY_CURVE
GOLDEN = json.load(open(os.path.join(os.path.dirname(__file__), "golden",
                                     "plonk_golden.json")))


def test_srs_reference_mode_degenerate():
    srs = S.srs_create(Fq, CV, secret=2, n=6, mode="reference")
    assert srs.length == 7
    # every G1 power is the point at infinity (src/srs.h:27-36)
    assert bool(jnp.all(srs.g1s.inf))
    for i, exp in enumerate(GOLDEN["srs_g1s"]):
        assert exp["inf"] and bool(srs.g1s.inf[i])
    assert int(srs.g2_1.x) == GOLDEN["srs_g2_1"]["x"]
    assert int(srs.g2_1.y) == GOLDEN["srs_g2_1"]["y"]
    assert int(srs.g2_s.x) == GOLDEN["srs_g2_s"]["x"]
    assert int(srs.g2_s.y) == GOLDEN["srs_g2_s"]["y"]


def test_srs_eval_degenerate_golden():
    # src/srs-test.c scenario: secret=5, n=5, poly [1,2,3] -> infinity
    srs = S.srs_create(Fq, CV, secret=5, n=5, mode="reference")
    ev = S.srs_commit_naive(Fq, srs.g1s, Fr.array([1, 2, 3]))
    assert GOLDEN["srs5_eval"]["inf"] and bool(ev.inf)


def test_srs_fixed_mode():
    """Intended SRS for secret=2, n=6 (SURVEY §2.2.1):
    [(1,2), (68,74), (65,98), (18,49), (1,99), (68,27), (65,3)]."""
    srs = S.srs_create(Fq, CV, secret=2, n=6, mode="fixed")
    expected = [(1, 2), (68, 74), (65, 98), (18, 49), (1, 99), (68, 27),
                (65, 3)]
    for i, (x, y) in enumerate(expected):
        assert not bool(srs.g1s.inf[i]), i
        assert int(srs.g1s.x[i]) == x and int(srs.g1s.y[i]) == y, i


def test_commit_matches_manual():
    """Fixed-mode commitment equals coefficient-weighted sum computed by
    hand (the analog of src/srs-test.c:19-37 with a real generator)."""
    srs = S.srs_create(Fq, CV, secret=2, n=6, mode="fixed")
    coeffs = Fr.array([1, 2, 3])
    ev = S.srs_commit_naive(Fq, srs.g1s, coeffs)
    g = C.g1_generator(CV, Fq)
    # s^i powers in GF(101): 1, 2, 4 -> scalars 1*1, 2*2, 3*4 on G
    expected = C.G1.identity()
    for c, s_pow in [(1, 1), (2, 2), (3, 4)]:
        pt = C.g1_mul(F=Fq, p=C.g1_mul(Fq, g, s_pow), scalar=c)
        expected = C.g1_add(Fq, expected, pt)
    assert bool(C.g1_equal(ev, expected))


def test_pippenger_matches_naive():
    rng = np.random.default_rng(0)
    g = C.g1_generator(CV, Fq)
    for n in [1, 7, 32, 100]:
        base_scalars = rng.integers(1, 17, size=n, dtype=np.uint32)
        pts = C.g1_mul(Fq, g, jnp.asarray(base_scalars))
        scalars = jnp.asarray(rng.integers(0, 17, size=n, dtype=np.uint32))
        fast = MSM.msm_pippenger(Fq, pts, scalars, window_bits=5,
                                 scalar_bits=5)
        naive = S.srs_commit_naive(Fq, pts, scalars)
        assert bool(C.g1_equal(fast, naive)), n


def test_pippenger_multiwindow():
    """Scalars wider than one window (exercises the doubling combine)."""
    rng = np.random.default_rng(1)
    g = C.g1_generator(CV, Fq)
    n = 50
    base_scalars = rng.integers(1, 17, size=n, dtype=np.uint32)
    pts = C.g1_mul(Fq, g, jnp.asarray(base_scalars))
    scalars = jnp.asarray(rng.integers(0, 1 << 16, size=n, dtype=np.uint32))
    fast = MSM.msm_pippenger(Fq, pts, scalars, window_bits=4, scalar_bits=16)
    naive = S.srs_commit_naive(Fq, pts, scalars)
    assert bool(C.g1_equal(fast, naive))


def test_pippenger_with_infinity_points():
    """Infinity inputs contribute nothing (degenerate-SRS compatibility)."""
    g = C.g1_generator(CV, Fq)
    pts = C.g1_mul(Fq, g, jnp.asarray([1, 0, 3, 0], dtype=jnp.uint32))
    scalars = jnp.asarray([5, 9, 2, 7], dtype=jnp.uint32)
    fast = MSM.msm_pippenger(Fq, pts, scalars, window_bits=5, scalar_bits=5)
    naive = S.srs_commit_naive(Fq, pts, scalars)
    assert bool(C.g1_equal(fast, naive))


def test_pippenger_jacobian_matches_affine():
    """Jacobian-coordinate MSM (no per-add inversions) == affine MSM, toy
    curve and scaled curve."""
    from plonk_tpu.ops.msm import msm_pippenger_jac
    from plonk_tpu.ops.field import MontField
    from plonk_tpu.utils.params import SCALED_CURVE, SCALED_FQ
    rng = np.random.default_rng(5)
    # toy curve
    g = C.g1_generator(CV, Fq)
    n = 64
    pts = C.g1_mul(Fq, g, jnp.asarray(rng.integers(1, 17, size=n,
                                                   dtype=np.uint32)))
    scalars = jnp.asarray(rng.integers(0, 17, size=n, dtype=np.uint32))
    aff = MSM.msm_pippenger(Fq, pts, scalars, window_bits=5, scalar_bits=5)
    jac = msm_pippenger_jac(Fq, pts, scalars, window_bits=5, scalar_bits=5)
    assert bool(C.g1_equal(aff, jac))
    # scaled curve (Montgomery base field)
    Ms = MontField(SCALED_FQ)
    gs = C.g1_generator(SCALED_CURVE, Ms)
    pts_s = C.g1_mul(Ms, gs, jnp.asarray(
        rng.integers(1, 1 << 27, size=32, dtype=np.uint32)), nbits=27)
    sc_s = jnp.asarray(rng.integers(0, SCALED_CURVE.r, size=32,
                                    dtype=np.uint32))
    aff_s = MSM.msm_pippenger(Ms, pts_s, sc_s, window_bits=7, scalar_bits=27)
    jac_s = msm_pippenger_jac(Ms, pts_s, sc_s, window_bits=7, scalar_bits=27)
    assert bool(C.g1_equal(aff_s, jac_s))


def test_fixed_base_matches_naive_toy():
    """Gather-MSM against a precomputed window table == naive fold,
    including multi-window scalars whose table entries wrap the order-17
    subgroup back to the identity (d * 2^shift = 0 mod 17)."""
    from plonk_tpu.ops import fixed_base as FB
    rng = np.random.default_rng(7)
    g = C.g1_generator(CV, Fq)
    for n, wb, sb in [(1, 5, 5), (7, 5, 5), (33, 4, 16), (100, 3, 16)]:
        base_scalars = rng.integers(1, 17, size=n, dtype=np.uint32)
        pts = C.g1_mul(Fq, g, jnp.asarray(base_scalars))
        tbl = FB.build_fixed_base_table(Fq, pts, wb, sb)
        scalars = jnp.asarray(rng.integers(0, 1 << sb, size=n,
                                           dtype=np.uint32))
        fast = FB.msm_fixed_base(Fq, tbl, scalars)
        naive = S.srs_commit_naive(Fq, pts, scalars, scalar_bits=sb)
        assert bool(C.g1_equal(fast, naive)), (n, wb, sb)


def test_fixed_base_with_infinity_points():
    from plonk_tpu.ops import fixed_base as FB
    g = C.g1_generator(CV, Fq)
    pts = C.g1_mul(Fq, g, jnp.asarray([1, 0, 3, 0], dtype=jnp.uint32))
    tbl = FB.build_fixed_base_table(Fq, pts, 5, 5)
    scalars = jnp.asarray([5, 9, 2, 7], dtype=jnp.uint32)
    fast = FB.msm_fixed_base(Fq, tbl, scalars)
    naive = S.srs_commit_naive(Fq, pts, scalars)
    assert bool(C.g1_equal(fast, naive))


def test_fixed_base_scaled_curve_batched():
    """Fixed-base == Jacobian Pippenger on the scaled pairing curve with
    full-width 27-bit scalars; batched variant covers the vmapped path
    the prover's 9 commitments use."""
    from plonk_tpu.ops import fixed_base as FB
    from plonk_tpu.ops.msm import msm_pippenger_jac
    from plonk_tpu.ops.field import MontField
    from plonk_tpu.utils.params import SCALED_CURVE, SCALED_FQ
    rng = np.random.default_rng(11)
    Ms = MontField(SCALED_FQ)
    gs = C.g1_generator(SCALED_CURVE, Ms)
    n = 40
    pts = C.g1_mul(Ms, gs, jnp.asarray(
        rng.integers(1, SCALED_CURVE.r, size=n, dtype=np.uint32)), nbits=27)
    bits = SCALED_CURVE.r.bit_length()
    tbl = FB.build_fixed_base_table(Ms, pts, 7, bits)
    sc = np.asarray(rng.integers(0, SCALED_CURVE.r, size=(3, n),
                                 dtype=np.uint32))
    sc[0, 0] = 0
    sc = jnp.asarray(sc)
    batch = FB.msm_fixed_base_many(Ms, tbl, sc)
    for i in range(3):
        ref = msm_pippenger_jac(Ms, pts, sc[i], window_bits=9,
                                scalar_bits=bits)
        got = C.G1(batch.x[i], batch.y[i], batch.inf[i])
        assert bool(C.g1_equal(got, ref)), i


def test_chunked_segmented_scan_matches_associative():
    """The chunked rolled segmented EC-scan (O(1) graph size) must equal
    the associative_scan path element-for-element, across segment layouts
    incl. segments spanning many chunk boundaries."""
    from plonk_tpu.ops.msm import (_seg_scan_add_jac,
                                   _seg_scan_add_jac_chunked)
    from plonk_tpu.ops.curve import jac_from_affine
    rng = np.random.default_rng(21)
    g = C.g1_generator(CV, Fq)
    n = 256
    pts = C.g1_mul(Fq, g, jnp.asarray(rng.integers(1, 17, size=n,
                                                   dtype=np.uint32)))
    jp = jac_from_affine(Fq, pts)
    for seed, p_start in [(0, 0.5), (1, 0.02), (2, 0.9)]:
        r2 = np.random.default_rng(seed)
        starts = r2.random(n) < p_start
        starts[0] = True
        sj = jnp.asarray(starts)
        ref = _seg_scan_add_jac(Fq, jp, sj)
        got = _seg_scan_add_jac_chunked(Fq, jp, sj, n_chunks=16)
        # compare as affine points (Jacobian coords are not unique)
        from plonk_tpu.ops.curve import jac_to_affine
        ra, ga = jac_to_affine(Fq, ref), jac_to_affine(Fq, got)
        assert bool(jnp.all(C.g1_equal(ra, ga))), (seed, p_start)
