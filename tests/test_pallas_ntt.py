"""Pallas fused-NTT kernel parity (interpret mode on CPU)."""
import numpy as np
import jax.numpy as jnp
import pytest

from plonk_tpu.utils.params import BABYBEAR
from plonk_tpu.ops.field import MontField
from plonk_tpu.ops import ntt as N


def test_row_stages_matches_xla():
    from plonk_tpu.ops.pallas_ntt import row_stages
    M = MontField(BABYBEAR)
    n = 1 << 12
    C = 256
    R = n // C
    w = BABYBEAR.root_of_unity(n)
    tables = N._stage_tables(M.p, w, n, C)
    n_intra = C.bit_length() - 1
    tw_stack = M.array(np.stack(tables[:n_intra]))
    rng = np.random.default_rng(0)
    y = M.array(rng.integers(0, M.p, size=(R, C), dtype=np.uint32))

    got = np.asarray(row_stages(M.p, M.n_prime, y, tw_stack,
                                block_rows=8, interpret=True))

    # XLA reference: same stages, roll-based
    ref = y
    pos = jnp.arange(C)
    half = 1
    for s in range(n_intra):
        tv = M.array(tables[s])
        in_low = (pos % (2 * half)) < half
        down = jnp.roll(ref, -half, axis=-1)
        up = jnp.roll(ref, half, axis=-1)
        ref = jnp.where(in_low, M.add(ref, M.mul(down, tv)),
                        M.sub(up, M.mul(ref, tv)))
        half *= 2
    np.testing.assert_array_equal(got, np.asarray(ref))
