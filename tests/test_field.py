"""Field arithmetic parity tests.

Mirrors the reference's exhaustive small-field sweeps and axiom checks
(src/hf-test.c, src/gf-test.c), run as single vmapped kernels, plus
Montgomery-field correctness for the scaled BabyBear preset.
"""
import numpy as np
import jax.numpy as jnp
import pytest

from plonk_tpu.utils.params import HF17, GF101, BABYBEAR
from plonk_tpu.ops.field import Field, MontField, make_field

F17 = Field(HF17)
F101 = Field(GF101)


def grid(p):
    a = np.repeat(np.arange(p, dtype=np.uint32), p)
    b = np.tile(np.arange(p, dtype=np.uint32), p)
    return jnp.asarray(a), jnp.asarray(b)


@pytest.mark.parametrize("F", [F17, F101], ids=["F17", "F101"])
class TestExhaustive:
    """All p^2 input pairs at once (src/hf-test.c:48-77 style)."""

    def test_add_sub_mul(self, F):
        p = F.p
        a, b = grid(p)
        an, bn = np.asarray(a, np.int64), np.asarray(b, np.int64)
        np.testing.assert_array_equal(np.asarray(F.add(a, b)), (an + bn) % p)
        np.testing.assert_array_equal(np.asarray(F.sub(a, b)), (an - bn) % p)
        np.testing.assert_array_equal(np.asarray(F.mul(a, b)), (an * bn) % p)

    def test_div(self, F):
        # a / b == a * b^(p-2); div by zero == 0 (src/hf-test.c:155-175)
        p = F.p
        a, b = grid(p)
        an, bn = np.asarray(a, np.int64), np.asarray(b, np.int64)
        expected = np.where(
            bn == 0, 0, (an * np.array([pow(int(x), p - 2, p) for x in bn])) % p)
        np.testing.assert_array_equal(np.asarray(F.div(a, b)), expected)

    def test_neg(self, F):
        p = F.p
        a = jnp.arange(p, dtype=jnp.uint32)
        r = np.asarray(F.neg(a))
        np.testing.assert_array_equal(r, (-np.arange(p)) % p)
        # a + (-a) == 0
        np.testing.assert_array_equal(np.asarray(F.add(a, F.neg(a))), 0)

    def test_inv(self, F):
        p = F.p
        a = jnp.arange(p, dtype=jnp.uint32)
        inv = np.asarray(F.inv(a))
        assert inv[0] == 0  # inv(0) = 0 convention
        prod = np.asarray(F.mul(a, jnp.asarray(inv)))
        np.testing.assert_array_equal(prod[1:], 1)

    def test_field_axioms(self, F):
        # associativity / commutativity / distributivity over all pairs,
        # with a fixed third operand sweep (src/hf-test.c:177-198)
        p = F.p
        a, b = grid(p)
        for cval in [0, 1, 2, p - 1, p // 2]:
            c = jnp.full_like(a, cval)
            np.testing.assert_array_equal(
                np.asarray(F.add(F.add(a, b), c)),
                np.asarray(F.add(a, F.add(b, c))))
            np.testing.assert_array_equal(
                np.asarray(F.mul(F.mul(a, b), c)),
                np.asarray(F.mul(a, F.mul(b, c))))
            np.testing.assert_array_equal(
                np.asarray(F.mul(a, F.add(b, c))),
                np.asarray(F.add(F.mul(a, b), F.mul(a, c))))
        np.testing.assert_array_equal(np.asarray(F.add(a, b)),
                                      np.asarray(F.add(b, a)))
        np.testing.assert_array_equal(np.asarray(F.mul(a, b)),
                                      np.asarray(F.mul(b, a)))

    def test_pow(self, F):
        p = F.p
        base = jnp.arange(p, dtype=jnp.uint32)
        for e in [0, 1, 2, 5, 15, 16, 17, 30, 65]:
            expected = np.array([pow(int(x), e, p) for x in range(p)])
            np.testing.assert_array_equal(np.asarray(F.pow_static(base, e)),
                                          expected, err_msg=f"e={e}")
            # traced-exponent path
            np.testing.assert_array_equal(
                np.asarray(F.pow(base, jnp.full((p,), e, dtype=jnp.uint32))),
                expected, err_msg=f"traced e={e}")
        # 0^0 = 1 (src/hf-test.c:113)
        assert int(F.pow_static(jnp.uint32(0), 0)) == 1


def test_hf17_inverse_lut_parity():
    """Fermat inverse reproduces the reference's 17-entry lookup table
    (src/hf.h:145-180)."""
    lut = [0, 1, 9, 6, 13, 7, 3, 5, 15, 2, 12, 14, 10, 4, 11, 8, 16]
    inv = np.asarray(F17.inv(jnp.arange(17, dtype=jnp.uint32)))
    np.testing.assert_array_equal(inv, lut)


def test_from_signed_matches_c_semantics():
    """hf_new negative handling (src/hf.h:25-34, src/hf-test.c:243-258)."""
    vals = jnp.asarray([17, -1, 34, 51, 18, -17, -18, -35, 0, 16],
                       dtype=jnp.int32)
    expected = [0, 16, 0, 0, 1, 0, 16, 16, 0, 16]
    np.testing.assert_array_equal(np.asarray(F17.from_signed(vals)), expected)
    vals101 = jnp.asarray([101, 102, -1, -101, 1015, -1015], dtype=jnp.int32)
    expected101 = [0, 1, 100, 0, 5, 96]
    np.testing.assert_array_equal(np.asarray(F101.from_signed(vals101)),
                                  expected101)


def test_gf_vectors():
    """Hand vectors from src/gf-test.c."""
    assert int(F101.add(F101.const(100), F101.const(100))) == 200 % 101
    assert int(F101.sub(F101.const(0), F101.const(1))) == 100
    assert int(F101.div(F101.const(1), F101.const(0))) == 0
    assert int(F101.neg(F101.div(F101.const(1), F101.const(2)))) == 50
    assert int(F101.neg(F101.div(F101.const(1), F101.const(5)))) == 20


class TestMontgomery:
    F = MontField(BABYBEAR)

    def test_roundtrip(self):
        rng = np.random.default_rng(0)
        a = rng.integers(0, self.F.p, size=4096, dtype=np.uint32)
        enc = self.F.encode(jnp.asarray(a))
        dec = np.asarray(self.F.decode(enc))
        np.testing.assert_array_equal(dec, a)

    def test_mul_random(self):
        rng = np.random.default_rng(1)
        a = rng.integers(0, self.F.p, size=4096, dtype=np.uint32)
        b = rng.integers(0, self.F.p, size=4096, dtype=np.uint32)
        am, bm = self.F.encode(jnp.asarray(a)), self.F.encode(jnp.asarray(b))
        r = np.asarray(self.F.decode(self.F.mul(am, bm)))
        expected = (a.astype(np.uint64) * b.astype(np.uint64)) % self.F.p
        np.testing.assert_array_equal(r, expected.astype(np.uint32))

    def test_mul_edges(self):
        p = self.F.p
        edge = np.array([0, 1, 2, p - 1, p - 2, (1 << 30), p // 2],
                        dtype=np.uint32)
        a = np.repeat(edge, len(edge))
        b = np.tile(edge, len(edge))
        am, bm = self.F.encode(jnp.asarray(a)), self.F.encode(jnp.asarray(b))
        r = np.asarray(self.F.decode(self.F.mul(am, bm)))
        expected = (a.astype(np.uint64) * b.astype(np.uint64)) % p
        np.testing.assert_array_equal(r, expected.astype(np.uint32))

    def test_add_sub_neg(self):
        rng = np.random.default_rng(2)
        p = self.F.p
        a = rng.integers(0, p, size=1024, dtype=np.uint32)
        b = rng.integers(0, p, size=1024, dtype=np.uint32)
        ja, jb = jnp.asarray(a), jnp.asarray(b)
        np.testing.assert_array_equal(
            np.asarray(self.F.add(ja, jb)),
            ((a.astype(np.uint64) + b) % p).astype(np.uint32))
        np.testing.assert_array_equal(
            np.asarray(self.F.sub(ja, jb)),
            ((a.astype(np.int64) - b) % p).astype(np.uint32))
        np.testing.assert_array_equal(
            np.asarray(self.F.neg(ja)),
            ((-a.astype(np.int64)) % p).astype(np.uint32))

    def test_inv_pow(self):
        rng = np.random.default_rng(3)
        a = rng.integers(1, self.F.p, size=512, dtype=np.uint32)
        am = self.F.encode(jnp.asarray(a))
        prod = np.asarray(self.F.decode(self.F.mul(am, self.F.inv(am))))
        np.testing.assert_array_equal(prod, 1)
        # inv(0) = 0
        assert int(self.F.decode(self.F.inv(self.F.encode(jnp.uint32(0))))) == 0
        # traced pow
        e = rng.integers(0, 1 << 31, size=512, dtype=np.uint32)
        r = np.asarray(self.F.decode(self.F.pow(am, jnp.asarray(e))))
        expected = np.array([pow(int(x), int(k), self.F.p)
                             for x, k in zip(a, e)], dtype=np.uint32)
        np.testing.assert_array_equal(r, expected)


def test_make_field_dispatch():
    assert isinstance(make_field(HF17), Field)
    assert isinstance(make_field(BABYBEAR), MontField)


def test_root_of_unity():
    # omega = 4 has order 4 in F17 (src/plonk.h:12, H = {1,4,16,13})
    w = HF17.root_of_unity(4)
    assert pow(w, 4, 17) == 1 and pow(w, 2, 17) != 1
    wb = BABYBEAR.root_of_unity(1 << 20)
    assert pow(wb, 1 << 20, BABYBEAR.p) == 1
    assert pow(wb, 1 << 19, BABYBEAR.p) != 1
