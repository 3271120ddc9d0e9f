"""GLV endomorphism decomposition + MSM (ops/glv.py) vs python-int
oracles and the plain Pippenger path."""
import numpy as np
import jax.numpy as jnp

from plonk_tpu.ops import glv as G
from plonk_tpu.ops import bigcurve as BC
from plonk_tpu.ops.bigfield import BigMontField
from plonk_tpu.utils.params import BN254_FR

R = BN254_FR.p
Q = BC.BN254_FQ.p


def words(v, n=16):
    return np.array([(int(v) >> (16 * k)) & 0xFFFF for k in range(n)],
                    dtype=np.uint32)


def from_words(ws):
    return sum(int(w) << (16 * k) for k, w in enumerate(np.asarray(ws)))


def test_constants():
    beta, lam, ((a1, b1), (a2, b2)) = G.glv_constants()
    assert pow(beta, 3, Q) == 1 and beta != 1
    assert pow(lam, 3, R) == 1 and lam != 1
    # lattice membership + shortness
    for (x, y) in ((a1, b1), (a2, b2)):
        assert (x + y * lam) % R == 0
        assert abs(x) < 1 << 129 and abs(y) < 1 << 129
    # phi(G) == lam * G on the affine oracle
    curve = G._HostG1(Q)
    assert curve.mul(BC.BN254_G1_GEN, lam) == \
        ((beta * BC.BN254_G1_GEN[0]) % Q, BC.BN254_G1_GEN[1])


def test_decompose_host():
    _, lam, _ = G.glv_constants()
    rng = np.random.default_rng(0)
    for _ in range(50):
        k = int.from_bytes(rng.bytes(31), "little") % R
        k1, k2 = G.glv_decompose_host(k)
        assert (k1 + k2 * lam - k) % R == 0
        assert abs(k1) < 1 << 131 and abs(k2) < 1 << 131


def test_decompose_device_matches_host():
    rng = np.random.default_rng(1)
    ks = [int.from_bytes(rng.bytes(31), "little") % R for _ in range(8)]
    sw = jnp.asarray(np.stack([words(k) for k in ks]))
    k1m, k1n, k2m, k2n = G.glv_decompose(sw)
    for i, k in enumerate(ks):
        h1, h2 = G.glv_decompose_host(k)
        d1 = from_words(k1m[i]) * (-1 if bool(k1n[i]) else 1)
        d2 = from_words(k2m[i]) * (-1 if bool(k2n[i]) else 1)
        assert d1 == h1, i
        assert d2 == h2, i


def test_msm_glv_matches_pippenger():
    F = BigMontField(BN254_FR, rolled=True)
    Fq = BigMontField(BC.BN254_FQ, rolled=True)
    L = 16
    rng = np.random.default_rng(2)
    base = BC.bn254_generator(Fq, (L,))
    mults = rng.integers(1, 1 << 16, size=L)
    bits = jnp.asarray(np.stack(
        [BC.scalar_to_bits(int(m), 16) for m in mults]))
    pts = BC.big_jac_mul(Fq, base, bits, nbits=16)
    ks = [int.from_bytes(rng.bytes(31), "little") % R for _ in range(L)]
    sw = jnp.asarray(np.stack([words(k) for k in ks]))

    ref = BC.big_to_affine(Fq, BC.big_msm_pippenger(Fq, pts, sw))
    got = BC.big_to_affine(Fq, G.big_msm_glv(Fq, pts, sw))
    assert np.array_equal(np.asarray(got[0]), np.asarray(ref[0]))
    assert np.array_equal(np.asarray(got[1]), np.asarray(ref[1]))
