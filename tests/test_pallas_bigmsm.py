"""Fused Pallas 16-limb commit kernel (ops/pallas_bigmsm.py) vs the XLA
fixed-base select sweep (ops/bigcurve.big_msm_fixed_base_many), interpret
mode on CPU. Interpret implies nothing about the Mosaic device compile
(CLAUDE.md gotchas) — the on-device parity lane is
tools/bench_micro.py bigmsm / bench.check_bn254_pallas_commit_parity.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from plonk_tpu.ops.bigfield import BigMontField
from plonk_tpu.ops import bigcurve as BC
from plonk_tpu.ops.pallas_bigmsm import big_commit_many_pallas
from plonk_tpu.utils.params import BN254_FR

F = BigMontField(BC.BN254_FQ, rolled=True)
R_ORDER = BN254_FR.p


def _setup(L, B, sbits, wb, seed=0):
    rng = np.random.default_rng(seed)
    # distinct small multiples of G as base points (all real points)
    ks = [int(rng.integers(1, 1 << 40)) for _ in range(L)]
    g = BC.bn254_generator(F, shape=(1,))
    bits = jnp.asarray(np.stack(
        [BC.scalar_to_bits(k, 40) for k in ks]))
    pts = BC.big_jac_mul(F, BC.BigG1J(
        jnp.broadcast_to(g.X, (L, F.limbs)),
        jnp.broadcast_to(g.Y, (L, F.limbs)),
        jnp.broadcast_to(g.Z, (L, F.limbs))), bits, 40)
    x, y, inf = BC.big_to_affine(F, pts)
    pts_aff = BC.BigG1J(x, y, jnp.where(
        inf[..., None], jnp.zeros((L, F.limbs), jnp.uint32),
        jnp.broadcast_to(F.const(1), (L, F.limbs))))
    tbl = jax.jit(lambda p: BC.build_big_table(F, p, wb, sbits))(pts_aff)
    tbl = BC.BigFixedBaseTable(tbl.x, tbl.y, tbl.inf, wb)
    n_words = -(-sbits // 16)
    sc = np.zeros((B, L, n_words), dtype=np.uint32)
    vals = rng.integers(0, 1 << 16, size=(B, L, n_words), dtype=np.uint64)
    sc[:] = vals.astype(np.uint32)
    mask_top = (1 << (sbits - 16 * (n_words - 1))) - 1
    sc[..., n_words - 1] &= mask_top
    sc[0, 0] = 0                       # zero scalar lane
    return tbl, jnp.asarray(sc)


@pytest.mark.parametrize("wb,sbits,L,B,tile,wg,ver", [
    (4, 32, 5, 3, 128, 2, "v1"),   # W=8 windows, L pads 5 -> 128
    (4, 32, 5, 3, 128, 2, "v2"),   # stacked+lazy (opt-in variant)
    (4, 32, 5, 3, 128, 2, "v3"),   # affine level-0 + lazy
    (5, 33, 3, 2, 128, 4, "v3"),   # W=7 pads to 8: padded-window guard
])
def test_kernel_matches_select_sweep(wb, sbits, L, B, tile, wg, ver):
    tbl, sc = _setup(L, B, sbits, wb, seed=wb)
    ref = jax.jit(lambda t, s: BC.big_msm_fixed_base_many(F, t, s))(
        tbl, sc)
    got = jax.jit(lambda t, s: big_commit_many_pallas(
        F, t, s, tile=tile, wg=wg, interpret=True, version=ver))(tbl, sc)
    rx, ry, rinf = BC.big_to_affine(F, ref)
    gx, gy, ginf = BC.big_to_affine(F, got)
    assert np.array_equal(np.asarray(ginf), np.asarray(rinf))
    assert np.array_equal(np.asarray(gx), np.asarray(rx))
    assert np.array_equal(np.asarray(gy), np.asarray(ry))


def test_kernel_multi_tile_grid():
    """Point axis spanning several tiles (T > 1) and window groups
    (G > 1): exercises the in-kernel tile accumulation across both grid
    axes. Sized small (8-bit scalars -> W=2) — the interpret machine
    executes the full kernel body per grid step on CPU and a 10-step
    grid ran past an hour (round 4)."""
    tbl, sc = _setup(L=130, B=2, sbits=8, wb=4, seed=9)
    ref = jax.jit(lambda t, s: BC.big_msm_fixed_base_many(F, t, s))(
        tbl, sc)
    got = jax.jit(lambda t, s: big_commit_many_pallas(
        F, t, s, tile=128, wg=1, interpret=True, version="v3"))(tbl, sc)
    rx, ry, rinf = BC.big_to_affine(F, ref)
    gx, gy, ginf = BC.big_to_affine(F, got)
    assert np.array_equal(np.asarray(ginf), np.asarray(rinf))
    assert np.array_equal(np.asarray(gx), np.asarray(rx))
    assert np.array_equal(np.asarray(gy), np.asarray(ry))
