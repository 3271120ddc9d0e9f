"""Fused Pallas 16-limb NTT (ops/pallas_bigntt.py) vs the XLA big_ntt,
interpret mode on CPU at tiny sizes (interpret implies nothing about the
Mosaic device compile — the on-device parity lane is
tools/bench_micro.py bigntt)."""
import numpy as np
import jax
import jax.numpy as jnp

from plonk_tpu.ops.bigfield import BigMontField, big_ntt, big_intt
from plonk_tpu.ops.fused_ntt import scrambled_perm
from plonk_tpu.ops.pallas_bigntt import big_fused_ntt, big_fused_intt
from plonk_tpu.utils.params import BN254_FR

F = BigMontField(BN254_FR, rolled=True)
N = 64
W = BN254_FR.root_of_unity(N)


def _rand(shape, seed=0):
    rng = np.random.default_rng(seed)
    vals = [int.from_bytes(rng.bytes(40), "little") % F.p
            for _ in range(int(np.prod(shape)))]
    return F.array(vals).reshape(tuple(shape) + (F.limbs,))


def test_forward_matches_big_ntt_scrambled():
    x = _rand((2, N), seed=1)
    ref = jax.jit(lambda v: big_ntt(F, v, W))(x)
    got = jax.jit(lambda v: big_fused_ntt(F, v, W, interpret=True))(x)
    perm = np.asarray(scrambled_perm(N))
    assert np.array_equal(np.asarray(got), np.asarray(ref)[:, perm])


def test_roundtrip_and_intt_scale():
    x = _rand((N,), seed=2)
    y = jax.jit(lambda v: big_fused_ntt(F, v, W, interpret=True))(x)
    back = jax.jit(lambda v: big_fused_intt(F, v, W, interpret=True))(y)
    assert np.array_equal(np.asarray(back), np.asarray(x))
    # and the inverse matches big_intt given the same (natural) input
    ref = jax.jit(lambda v: big_intt(F, v, W))(x)
    perm = np.asarray(scrambled_perm(N))
    xs = jnp.asarray(np.asarray(x)[perm])
    got = jax.jit(lambda v: big_fused_intt(F, v, W, interpret=True))(xs)
    assert np.array_equal(np.asarray(got), np.asarray(ref))
