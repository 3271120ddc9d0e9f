"""NTT/INTT correctness and equivalence with the reference's
Vandermonde-inverse interpolation (src/plonk.h:106-113, 162-195)."""
import json
import os

import numpy as np
import jax.numpy as jnp

from plonk_tpu.utils.params import HF17, BABYBEAR
from plonk_tpu.ops.field import Field, MontField
from plonk_tpu.ops import ntt as N
from plonk_tpu.ops import poly as P
from plonk_tpu.ops import matrix as M

F = Field(HF17)
GOLDEN = json.load(open(os.path.join(os.path.dirname(__file__), "golden",
                                     "plonk_golden.json")))


def test_ntt_matches_vandermonde_f17():
    """Forward NTT == V @ coeffs; INTT == V^{-1} @ values, where V is the
    reference's h_pows matrix over H = {1,4,16,13} with omega=4."""
    w, n, p = 4, 4, 17
    V = M.vandermonde_host(p, [pow(w, i, p) for i in range(n)])
    Vinv = M.mat_inv_host(p, V)
    rng = np.random.default_rng(0)
    for _ in range(20):
        v = rng.integers(0, p, size=n)
        coeffs = np.asarray(N.intt(F, F.array(v), w))
        np.testing.assert_array_equal(coeffs, (Vinv @ v) % p)
        evals = np.asarray(N.ntt(F, F.array(coeffs), w))
        np.testing.assert_array_equal(evals, v)


def test_h_pows_inv_fixture():
    """The INTT matrix equals the golden h_pows_inv (src/plonk-test.c:38)."""
    V = M.vandermonde_host(17, [1, 4, 16, 13])
    Vinv = M.mat_inv_host(17, V)
    np.testing.assert_array_equal(Vinv, np.array(GOLDEN["h_pows_inv"]))


def test_interpolate_golden():
    """interpolate_at_h([3,4,0,0]) == 6+x+4x^2+9x^3 (src/plonk-test.c:52-56)."""
    coeffs = np.asarray(N.interpolate(F, F.array([3, 4, 0, 0]), 4))
    np.testing.assert_array_equal(coeffs, [6, 1, 4, 9])


def test_ntt_mul_matches_schoolbook():
    rng = np.random.default_rng(1)
    for la, lb in [(4, 4), (7, 3), (8, 8), (5, 9)]:
        a = F.array(rng.integers(0, 17, size=la))
        b = F.array(rng.integers(0, 17, size=lb))
        school = np.asarray(P.pmul_school(F, a, b))
        fast = np.asarray(N.ntt_mul(F, a, b))
        np.testing.assert_array_equal(fast, school)


def test_ntt_batched():
    rng = np.random.default_rng(2)
    v = rng.integers(0, 17, size=(11, 4))
    batched = np.asarray(N.intt(F, F.array(v), 4))
    for i in range(11):
        single = np.asarray(N.intt(F, F.array(v[i]), 4))
        np.testing.assert_array_equal(batched[i], single)


class TestBabyBear:
    M = MontField(BABYBEAR)

    def test_roundtrip_large(self):
        n = 1 << 12
        w = BABYBEAR.root_of_unity(n)
        rng = np.random.default_rng(3)
        v = rng.integers(0, self.M.p, size=n, dtype=np.uint32)
        x = self.M.array(v)
        back = np.asarray(self.M.decode(N.intt(self.M, N.ntt(self.M, x, w), w)))
        np.testing.assert_array_equal(back, v)

    def test_matches_dft_small(self):
        n = 8
        w = BABYBEAR.root_of_unity(n)
        rng = np.random.default_rng(4)
        v = rng.integers(0, self.M.p, size=n, dtype=np.uint64)
        x = self.M.array(v.astype(np.uint32))
        y = np.asarray(self.M.decode(N.ntt(self.M, x, w)))
        # direct DFT with python ints
        expected = [sum(int(v[i]) * pow(w, i * k, self.M.p)
                        for i in range(n)) % self.M.p for k in range(n)]
        np.testing.assert_array_equal(y, expected)

    def test_ntt_mul(self):
        rng = np.random.default_rng(5)
        a_std = rng.integers(0, self.M.p, size=120, dtype=np.uint32)
        b_std = rng.integers(0, self.M.p, size=77, dtype=np.uint32)
        fast = np.asarray(self.M.decode(
            N.ntt_mul(self.M, self.M.array(a_std), self.M.array(b_std))))
        L = 120 + 77 - 1
        expected = np.zeros(L, dtype=object)
        for i, x in enumerate(a_std):
            for j, y in enumerate(b_std):
                expected[i + j] = (expected[i + j] + int(x) * int(y)) % self.M.p
        np.testing.assert_array_equal(fast, expected.astype(np.uint32))
