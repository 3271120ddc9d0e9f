"""MXU matmul-NTT (ops/mxu_ntt.py) parity tests.

The int8 limb-matmul transform must agree bit-for-bit with the butterfly
NTT (ops/ntt.py) through the transposed-layout permutation, across fields
and batch shapes. Runs on CPU (dot_general int8 is exact everywhere).
"""
import numpy as np
import jax.numpy as jnp
import pytest

from plonk_tpu.utils.params import BABYBEAR, SCALED_FR
from plonk_tpu.ops.field import MontField
from plonk_tpu.ops import ntt as N
from plonk_tpu.ops import mxu_ntt as MX


@pytest.mark.parametrize("params,log_n", [(BABYBEAR, 10), (BABYBEAR, 12),
                                          (SCALED_FR, 10)],
                         ids=["bb10", "bb12", "fr10"])
def test_mxu_matches_reference(params, log_n):
    F = MontField(params)
    n = 1 << log_n
    w = params.root_of_unity(n)
    rng = np.random.default_rng(log_n)
    x = F.encode(jnp.asarray(rng.integers(0, F.p, size=n, dtype=np.uint32)))
    got = MX.mxu_ntt(F, x, w)
    ref = N.ntt(F, x, w, layout="simple")
    perm = MX.mxu_perm(n)
    assert np.array_equal(np.asarray(got), np.asarray(ref)[perm])
    nat = MX.mxu_ntt_natural(F, x, w)
    assert np.array_equal(np.asarray(nat), np.asarray(ref))


def test_mxu_roundtrip_batched_and_convolution():
    F = MontField(SCALED_FR)
    n = 1 << 10
    w = SCALED_FR.root_of_unity(n)
    rng = np.random.default_rng(3)
    x = F.encode(jnp.asarray(
        rng.integers(0, F.p, size=(3, n), dtype=np.uint32)))
    y = MX.mxu_ntt(F, x, w)
    back = MX.mxu_intt(F, y, w)
    assert np.array_equal(np.asarray(back), np.asarray(x))
    # transposed-layout pointwise convolution == reference
    a, b = x[0], x[1]
    got = MX.mxu_intt(F, F.mul(MX.mxu_ntt(F, a, w), MX.mxu_ntt(F, b, w)), w)
    ref = N.intt(F, F.mul(N.ntt(F, a, w, layout="simple"),
                          N.ntt(F, b, w, layout="simple")),
                 w, layout="simple")
    assert np.array_equal(np.asarray(got), np.asarray(ref))


def test_mxu_inverse_root_matches():
    F = MontField(SCALED_FR)
    n = 1 << 8
    w = SCALED_FR.root_of_unity(n)
    rng = np.random.default_rng(4)
    x = F.encode(jnp.asarray(rng.integers(0, F.p, size=n, dtype=np.uint32)))
    y = MX.mxu_ntt(F, x, w, inverse=True)
    ref = N.ntt(F, x, pow(w, -1, F.p), layout="simple")
    assert np.array_equal(np.asarray(y), np.asarray(ref)[MX.mxu_perm(n)])
