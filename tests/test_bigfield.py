"""Multi-limb Montgomery field (ops/bigfield.py) parity tests.

Every kernel is checked against python-int ground truth (the same oracle
style as the reference's exhaustive F17 sweeps, src/hf-test.c:48-77, which
don't scale to 254 bits — randomized sweeps with fixed seeds instead).
"""
import numpy as np
import jax.numpy as jnp
import pytest

from plonk_tpu.ops.bigfield import BigMontField, big_ntt, big_intt
from plonk_tpu.utils.params import BN254_FR, BLS12_381_FR, BABYBEAR

FIELDS = [BN254_FR, BLS12_381_FR, BABYBEAR]


def _rand_ints(rng, p, n):
    ints = [int.from_bytes(rng.bytes(40), "little") % p for _ in range(n)]
    ints[:4] = [0, 1, p - 1, p // 2]
    return ints


@pytest.mark.parametrize("params", FIELDS, ids=lambda f: f.name)
def test_roundtrip_and_addsub(params):
    F = BigMontField(params)
    rng = np.random.default_rng(0)
    p = F.p
    xs = _rand_ints(rng, p, 64)
    ys = _rand_ints(rng, p, 64)[::-1]
    a, b = F.array(xs), F.array(ys)
    assert list(F.decode_host(a)) == xs
    got = F.decode_host(F.add(a, b))
    assert list(got) == [(x + y) % p for x, y in zip(xs, ys)]
    got = F.decode_host(F.sub(a, b))
    assert list(got) == [(x - y) % p for x, y in zip(xs, ys)]
    got = F.decode_host(F.neg(a))
    assert list(got) == [(-x) % p for x in xs]


@pytest.mark.parametrize("params", FIELDS, ids=lambda f: f.name)
def test_mont_mul(params):
    F = BigMontField(params)
    rng = np.random.default_rng(1)
    p = F.p
    xs = _rand_ints(rng, p, 64)
    ys = _rand_ints(rng, p, 64)[::-1]
    a, b = F.array(xs), F.array(ys)
    got = F.decode_host(F.mont_mul(a, b))
    assert list(got) == [(x * y) % p for x, y in zip(xs, ys)]
    got = F.decode_host(F.square(a))
    assert list(got) == [x * x % p for x in xs]


def test_encode_decode_device():
    F = BigMontField(BN254_FR)
    rng = np.random.default_rng(2)
    xs = _rand_ints(rng, F.p, 16)
    std_words = np.stack([
        np.array([(v >> (16 * k)) & 0xFFFF for k in range(F.limbs)],
                 dtype=np.uint32) for v in xs])
    enc = F.encode(jnp.asarray(std_words))
    assert list(F.decode_host(enc)) == xs
    dec = np.asarray(F.decode(enc))
    assert np.array_equal(dec, std_words)


def test_pow_and_inv():
    F = BigMontField(BN254_FR)
    rng = np.random.default_rng(3)
    p = F.p
    xs = _rand_ints(rng, p, 12)
    a = F.array(xs)
    for e in [0, 1, 2, 5, 1 << 20]:
        got = F.decode_host(F.pow_static(a, e))
        assert list(got) == [pow(x, e, p) for x in xs]
    got = F.decode_host(F.pow_static_rolled(a, 12345678901234567890))
    assert list(got) == [pow(x, 12345678901234567890, p) for x in xs]
    # Fermat inverse; inv(0) = 0 convention
    got = F.decode_host(F.inv(a))
    assert list(got) == [pow(x, p - 2, p) for x in xs]
    assert got[0] == 0


@pytest.mark.parametrize("params", [BN254_FR, BLS12_381_FR],
                         ids=lambda f: f.name)
def test_big_ntt_roundtrip_and_matrix(params):
    F = BigMontField(params)
    rng = np.random.default_rng(4)
    p = F.p
    n = 16
    w = params.root_of_unity(n)
    xs = _rand_ints(rng, p, n)
    a = F.array(xs)
    y = big_ntt(F, a, w)
    # against the DFT definition with python ints
    expect = [sum(x * pow(w, i * k, p) for i, x in enumerate(xs)) % p
              for k in range(n)]
    assert list(F.decode_host(y)) == expect
    back = big_intt(F, y, w)
    assert list(F.decode_host(back)) == xs


def test_big_ntt_convolution_bn254():
    """NTT-domain product == schoolbook polynomial product mod x^n - 1."""
    F = BigMontField(BN254_FR)
    rng = np.random.default_rng(5)
    p = F.p
    n = 32
    w = BN254_FR.root_of_unity(n)
    xs = _rand_ints(rng, p, n)
    ys = _rand_ints(rng, p, n)
    fa, fb = big_ntt(F, F.array(xs), w), big_ntt(F, F.array(ys), w)
    prod = big_intt(F, F.mont_mul(fa, fb), w)
    expect = [0] * n
    for i, x in enumerate(xs):
        for j, y in enumerate(ys):
            k = (i + j) % n
            expect[k] = (expect[k] + x * y) % p
    assert list(F.decode_host(prod)) == expect
