"""Multi-limb polynomial kernels (ops/bigpoly.py) vs python-int oracles.

Same lineage as ops/poly.py (reference src/poly.h); these are the
(n, limbs) lifts consumed by the BN254 prover (models/plonk_bn254.py),
checked here directly against arbitrary-precision integer arithmetic so
failures localize to the kernel, not the heavy prover lane.
"""
import numpy as np
import jax.numpy as jnp

from plonk_tpu.ops.bigfield import BigMontField
from plonk_tpu.ops import bigpoly as BP
from plonk_tpu.utils.params import BN254_FR

F = BigMontField(BN254_FR)
R = BN254_FR.p


def enc(vals):
    return jnp.asarray(F.encode_host(np.asarray(list(vals), dtype=object)))


def dec(words):
    out = F.decode_host(np.asarray(words))
    return [int(v) for v in np.atleast_1d(out)]


class TestBigPoly:
    rng = np.random.default_rng(0)
    coeffs = [int(x) for x in rng.integers(1, 2**63, size=16)]
    x_int = 0x1234_5678_9ABC_DEF0

    def test_peval_matches_horner(self):
        got = dec(BP.peval(F, enc(self.coeffs), enc([self.x_int])[0]))[0]
        exp = sum(v * pow(self.x_int, i, R)
                  for i, v in enumerate(self.coeffs)) % R
        assert got == exp

    def test_divide_by_linear_reconstructs(self):
        c = enc(self.coeffs)
        x = enc([self.x_int])[0]
        q, rem = BP.divide_by_linear(F, c, x)
        rem_i = dec(rem)[0]
        assert rem_i == sum(v * pow(self.x_int, i, R)
                            for i, v in enumerate(self.coeffs)) % R
        # q * (X - x) + rem == c
        q_i = dec(q)
        recon = [0] * len(self.coeffs)
        for i, v in enumerate(q_i):
            recon[i + 1] = (recon[i + 1] + v) % R
            recon[i] = (recon[i] - v * self.x_int) % R
        recon[0] = (recon[0] + rem_i) % R
        assert recon == [v % R for v in self.coeffs]

    def test_prefix_prod_chunked(self):
        xs = [int(v) for v in self.rng.integers(1, 2**63, size=64)]
        got = dec(BP.prefix_prod_chunked(F, enc(xs), n_chunks=8))
        acc, exp = 1, []
        for v in xs:
            acc = acc * v % R
            exp.append(acc)
        assert got == exp

    def test_add_sub_scale_const(self):
        a, b = enc([3, 5]), enc([7, 11, 13])
        s = enc([2])[0]
        assert dec(BP.padd(F, a, b)) == [10, 16, 13]
        assert dec(BP.psub(F, b, a)) == [4, 6, 13]
        assert dec(BP.pscale(F, b, s)) == [14, 22, 26]
        assert dec(BP.padd_const(F, b, s)) == [9, 11, 13]

    def test_pow_vector(self):
        x = enc([self.x_int])[0]
        got = dec(BP.pow_vector(F, x, 9))
        assert got == [pow(self.x_int, i, R) for i in range(9)]

    def test_batch_inv(self):
        """Montgomery-trick batched inverse == per-element Fermat, bit
        for bit, including the inv(0) = 0 convention
        (src/hf.h:201-203) — the BN254 grand product's hot path."""
        xs = [int.from_bytes(self.rng.bytes(31), "little") % R
              for _ in range(37)]
        xs[3] = 0
        xs[20] = 0
        a = enc(xs)
        got = BP.batch_inv(F, a)
        assert jnp.array_equal(got, F.inv(a))
        exp = [0 if v == 0 else pow(v, -1, R) for v in xs]
        assert dec(got) == exp
