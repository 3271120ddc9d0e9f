"""Parity of the fused Pallas fixed-base commit kernel (ops/pallas_msm.py)
against the XLA fixed-base path, interpret mode on CPU (the same strategy
as tests/test_pallas_ntt.py; on-device parity is asserted in bench.py)."""
import numpy as np
import jax.numpy as jnp

from plonk_tpu.ops import curve as C
from plonk_tpu.ops import fixed_base as FB
from plonk_tpu.ops import pallas_msm as PM
from plonk_tpu.ops.field import MontField
from plonk_tpu.utils.params import SCALED_CURVE, SCALED_FQ

Ms = MontField(SCALED_FQ)
BITS = SCALED_CURVE.r.bit_length()


def _points(rng, n):
    gs = C.g1_generator(SCALED_CURVE, Ms)
    return C.g1_mul(Ms, gs, jnp.asarray(
        rng.integers(1, SCALED_CURVE.r, size=n, dtype=np.uint32)),
        nbits=BITS)


def test_commit_pallas_matches_xla_fixed_base():
    rng = np.random.default_rng(23)
    n = 40
    pts = _points(rng, n)
    tbl = PM.build_commit_table(Ms, pts, BITS, window_bits=4)
    assert tbl.x.shape[0] == 8          # 27-bit scalars -> 7 windows -> 8
    sc = np.asarray(rng.integers(0, SCALED_CURVE.r, size=(3, n),
                                 dtype=np.uint32))
    sc[0, 0] = 0
    sc[1, :] = 0                        # all-zero commitment -> infinity
    got = PM.msm_fixed_base_many_pallas(Ms, tbl, jnp.asarray(sc),
                                        tile=16, interpret=True)
    ref_tbl = FB.build_fixed_base_table(Ms, pts, 7, BITS)
    ref = FB.msm_fixed_base_many(Ms, ref_tbl, jnp.asarray(sc),
                                 mode="gather")
    for i in range(3):
        assert bool(C.g1_equal(
            C.G1(got.x[i], got.y[i], got.inf[i]),
            C.G1(ref.x[i], ref.y[i], ref.inf[i]))), i
    assert bool(got.inf[1])


def test_commit_pallas_infinity_base_points():
    """Table entries at infinity (identity base points) select cleanly."""
    rng = np.random.default_rng(29)
    gs = C.g1_generator(SCALED_CURVE, Ms)
    ks = np.array([5, 0, 9, 0, 1, 2, 3, 4], dtype=np.uint32)
    pts = C.g1_mul(Ms, gs, jnp.asarray(ks), nbits=4)
    tbl = PM.build_commit_table(Ms, pts, BITS, window_bits=4)
    sc = jnp.asarray(rng.integers(0, SCALED_CURVE.r, size=(2, 8),
                                  dtype=np.uint32))
    got = PM.msm_fixed_base_many_pallas(Ms, tbl, sc, tile=8,
                                        interpret=True)
    ref_tbl = FB.build_fixed_base_table(Ms, pts, 7, BITS)
    ref = FB.msm_fixed_base_many(Ms, ref_tbl, sc, mode="gather")
    for i in range(2):
        assert bool(C.g1_equal(
            C.G1(got.x[i], got.y[i], got.inf[i]),
            C.G1(ref.x[i], ref.y[i], ref.inf[i]))), i


def test_commit_pallas_wide_tile_slice_path():
    """tile > 128 exercises the aligned lane-halving levels of the
    in-kernel tree (narrow tiles go straight to the roll levels)."""
    rng = np.random.default_rng(31)
    n = 300
    pts = _points(rng, n)
    tbl = PM.build_commit_table(Ms, pts, BITS, window_bits=4)
    sc = jnp.asarray(rng.integers(0, SCALED_CURVE.r, size=(2, n),
                                  dtype=np.uint32))
    got = PM.msm_fixed_base_many_pallas(Ms, tbl, sc, tile=256,
                                        interpret=True)
    ref_tbl = FB.build_fixed_base_table(Ms, pts, 7, BITS)
    ref = FB.msm_fixed_base_many(Ms, ref_tbl, sc, mode="gather")
    for i in range(2):
        assert bool(C.g1_equal(
            C.G1(got.x[i], got.y[i], got.inf[i]),
            C.G1(ref.x[i], ref.y[i], ref.inf[i]))), i
