"""Fused four-step NTT (ops/fused_ntt.py) parity tests, interpret mode.

The fused path = DIF row transforms + twiddles + DIT inverse with NO
bit-reversal permutations; parity against the reference ops/ntt.py
transform through the scrambled-layout permutation.
"""
import numpy as np
import jax.numpy as jnp
import pytest

from plonk_tpu.utils.params import BABYBEAR, SCALED_FR
from plonk_tpu.ops.field import MontField
from plonk_tpu.ops import ntt as N
from plonk_tpu.ops import fused_ntt as FN

M = MontField(BABYBEAR)


@pytest.mark.parametrize("log_n", [10, 12])
def test_fused_matches_reference_through_perm(log_n):
    n = 1 << log_n
    w = BABYBEAR.root_of_unity(n)
    rng = np.random.default_rng(log_n)
    x = M.encode(jnp.asarray(rng.integers(0, M.p, size=n, dtype=np.uint32)))
    ref = N.ntt(M, x, w, layout="simple")
    got = FN.fused_ntt(M, x, w, interpret=True)
    perm = FN.scrambled_perm(n)
    assert np.array_equal(np.asarray(got), np.asarray(ref)[perm])
    nat = FN.fused_ntt_natural(M, x, w, interpret=True)
    assert np.array_equal(np.asarray(nat), np.asarray(ref))


def test_fused_roundtrip_and_batch():
    n = 1 << 10
    w = SCALED_FR.root_of_unity(n)
    F = MontField(SCALED_FR)
    rng = np.random.default_rng(0)
    x = F.encode(jnp.asarray(
        rng.integers(0, F.p, size=(3, n), dtype=np.uint32)))
    y = FN.fused_ntt(F, x, w, interpret=True)
    ref = N.ntt(F, x, w, layout="simple")
    perm = FN.scrambled_perm(n)
    assert np.array_equal(np.asarray(y), np.asarray(ref)[..., perm])
    back = FN.fused_intt(F, y, w, interpret=True)
    assert np.array_equal(np.asarray(back), np.asarray(x))


def test_fused_pointwise_convolution():
    """Scrambled-layout convolution: ntt -> pointwise -> intt never needs
    an unscramble (the prover's quotient path)."""
    n = 1 << 10
    w = SCALED_FR.root_of_unity(n)
    F = MontField(SCALED_FR)
    rng = np.random.default_rng(1)
    a = F.encode(jnp.asarray(rng.integers(0, F.p, size=n, dtype=np.uint32)))
    b = F.encode(jnp.asarray(rng.integers(0, F.p, size=n, dtype=np.uint32)))
    fa = FN.fused_ntt(F, a, w, interpret=True)
    fb = FN.fused_ntt(F, b, w, interpret=True)
    got = FN.fused_intt(F, F.mul(fa, fb), w, interpret=True)
    ref = N.intt(F, F.mul(N.ntt(F, a, w, layout="simple"),
                          N.ntt(F, b, w, layout="simple")),
                 w, layout="simple")
    assert np.array_equal(np.asarray(got), np.asarray(ref))


def test_fused_inverse_root_matches_intt():
    """fused_ntt(inverse=True) + unscale == reference INTT (used by the
    scrambled interpolation path)."""
    n = 1 << 10
    F = MontField(SCALED_FR)
    w = SCALED_FR.root_of_unity(n)
    rng = np.random.default_rng(2)
    x = F.encode(jnp.asarray(rng.integers(0, F.p, size=n, dtype=np.uint32)))
    y = FN.fused_ntt(M if False else F, x, w, inverse=True, interpret=True)
    perm = FN.scrambled_perm(n)
    ref = N.ntt(F, x, pow(w, -1, F.p), layout="simple")
    assert np.array_equal(np.asarray(y), np.asarray(ref)[perm])


@pytest.mark.parametrize("log_n", [10, 12])
def test_onepass_matches_fused(log_n):
    """The single-kernel whole transform must be bit-identical to the
    five-step fused path in both directions, incl. batches."""
    n = 1 << log_n
    w = BABYBEAR.root_of_unity(n)
    rng = np.random.default_rng(100 + log_n)
    x = M.encode(jnp.asarray(rng.integers(0, M.p, size=(3, n),
                                          dtype=np.uint32)))
    ref = FN.fused_ntt(M, x, w, interpret=True)
    got = FN.fused_ntt_1k(M, x, w, interpret=True)
    assert np.array_equal(np.asarray(got), np.asarray(ref))
    back_ref = FN.fused_intt(M, ref, w, interpret=True)
    back_got = FN.fused_intt_1k(M, got, w, interpret=True)
    assert np.array_equal(np.asarray(back_got), np.asarray(back_ref))
    assert np.array_equal(np.asarray(back_got), np.asarray(x))
    inv = FN.fused_ntt_1k(M, x, w, inverse=True, interpret=True)
    inv_ref = FN.fused_ntt(M, x, w, inverse=True, interpret=True)
    assert np.array_equal(np.asarray(inv), np.asarray(inv_ref))
