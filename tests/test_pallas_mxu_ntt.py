"""Fused-VMEM MXU NTT (ops/pallas_mxu_ntt.py) parity tests.

The Pallas kernel must agree bit-for-bit with the plain-XLA MXU matmul
NTT (ops/mxu_ntt.py — itself asserted against the butterfly NTT in
tests/test_mxu_ntt.py) in the same mxu_perm layout. Runs in interpret
mode on CPU; real-chip parity is asserted by tools/bench_micro.py mxu2
before the kernel may become a prover default (CLAUDE.md rule).
"""
import numpy as np
import jax.numpy as jnp
import pytest

from plonk_tpu.utils.params import BABYBEAR, SCALED_FR
from plonk_tpu.ops.field import MontField
from plonk_tpu.ops import mxu_ntt as MX
from plonk_tpu.ops import pallas_mxu_ntt as PMX


@pytest.mark.parametrize("params,log_n", [(BABYBEAR, 10), (BABYBEAR, 12),
                                          (SCALED_FR, 10)],
                         ids=["bb10", "bb12", "fr10"])
def test_pallas_mxu_matches_xla_mxu(params, log_n):
    F = MontField(params)
    n = 1 << log_n
    w = params.root_of_unity(n)
    rng = np.random.default_rng(log_n)
    x = F.encode(jnp.asarray(rng.integers(0, F.p, size=n, dtype=np.uint32)))
    got = PMX.mxu_ntt_pallas(F, x, w, interpret=True)
    ref = MX.mxu_ntt(F, x, w)
    assert np.array_equal(np.asarray(got), np.asarray(ref))


def test_pallas_mxu_roundtrip_batched():
    F = MontField(SCALED_FR)
    n = 1 << 10
    w = SCALED_FR.root_of_unity(n)
    rng = np.random.default_rng(7)
    x = F.encode(jnp.asarray(
        rng.integers(0, F.p, size=(3, n), dtype=np.uint32)))
    y = PMX.mxu_ntt_pallas(F, x, w, interpret=True)
    assert np.array_equal(np.asarray(y),
                          np.asarray(MX.mxu_ntt(F, x, w)))
    back = PMX.mxu_intt_pallas(F, y, w, interpret=True)
    assert np.array_equal(np.asarray(back), np.asarray(x))
    iref = MX.mxu_intt(F, y, w)
    assert np.array_equal(np.asarray(back), np.asarray(iref))


def test_pallas_mxu_inverse_root():
    F = MontField(BABYBEAR)
    n = 1 << 8
    w = BABYBEAR.root_of_unity(n)
    rng = np.random.default_rng(9)
    x = F.encode(jnp.asarray(rng.integers(0, F.p, size=n, dtype=np.uint32)))
    got = PMX.mxu_ntt_pallas(F, x, w, inverse=True, interpret=True)
    ref = MX.mxu_ntt(F, x, w, inverse=True)
    assert np.array_equal(np.asarray(got), np.asarray(ref))
