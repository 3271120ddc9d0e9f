"""Poseidon permutation/sponge (ops/poseidon.py): device vs python-int
oracle parity. The FS transcript's soundness rests on the two sides
staying in lockstep."""
import numpy as np
import jax.numpy as jnp
import pytest

from plonk_tpu.ops import poseidon as P
from plonk_tpu.ops.field import MontField
from plonk_tpu.utils.params import BABYBEAR, SCALED_FR


@pytest.mark.parametrize("fp", [BABYBEAR, SCALED_FR])
def test_permutation_matches_oracle(fp):
    F = MontField(fp)
    pp = P.make_params(fp.p)
    rng = np.random.default_rng(0)
    state_ints = [int(v) for v in rng.integers(0, fp.p, size=pp.t)]
    ref = P.PoseidonHost(pp).permute(state_ints)
    got = P.permute(F, pp, F.encode(jnp.asarray(state_ints, jnp.uint32)))
    assert [int(v) for v in F.decode(got)] == ref


def test_alpha_coprime():
    for fp in (BABYBEAR, SCALED_FR):
        pp = P.make_params(fp.p)
        import math
        assert math.gcd(pp.alpha, fp.p - 1) == 1
        # BabyBear: p - 1 = 2^27 * 3 * 5 -> alpha must skip 3 and 5
        if fp.p == 0x78000001:
            assert pp.alpha == 7


def test_batched_permute():
    F = MontField(SCALED_FR)
    pp = P.make_params(SCALED_FR.p)
    rng = np.random.default_rng(1)
    states = rng.integers(0, F.p, size=(3, pp.t), dtype=np.uint32)
    got = F.decode(P.permute(F, pp, F.encode(jnp.asarray(states))))
    host = P.PoseidonHost(pp)
    for i in range(3):
        assert [int(v) for v in got[i]] == host.permute(
            [int(v) for v in states[i]])


def test_sponge_matches_host():
    F = MontField(SCALED_FR)
    pp = P.make_params(SCALED_FR.p)
    rng = np.random.default_rng(2)
    elems = [int(v) for v in rng.integers(0, F.p, size=11)]

    state = F.zeros((pp.t,))
    state = P.absorb_elements(F, pp, state,
                              [F.const(e) for e in elems])
    v1, state = P.squeeze(F, pp, state)
    v2, state = P.squeeze(F, pp, state)
    v3, state = P.squeeze(F, pp, state, pow_n_not_one=1 << 4)

    hs = P.HostSponge(pp)
    hs.absorb_elements(elems)
    assert int(v1) == hs.squeeze()
    assert int(v2) == hs.squeeze()
    assert int(v3) == hs.squeeze(pow_n_not_one=1 << 4)
    # the domain rejection actually holds
    assert pow(int(v3), 1 << 4, F.p) != 1 and int(v3) != 0


def test_absorb_order_sensitivity():
    """Different absorb orders / values must diverge (sanity against
    accidental state aliasing)."""
    F = MontField(SCALED_FR)
    pp = P.make_params(SCALED_FR.p)
    s0 = F.zeros((pp.t,))
    a = P.absorb_elements(F, pp, s0, [F.const(1), F.const(2)])
    b = P.absorb_elements(F, pp, s0, [F.const(2), F.const(1)])
    va, _ = P.squeeze(F, pp, a)
    vb, _ = P.squeeze(F, pp, b)
    assert int(va) != int(vb)
