"""BN254 tower / G2 / optimal-ate pairing parity against the python-int
oracle (tests/bn254_oracle.py) — the 254-bit analog of the reference's
pairing vectors (src/pairing-test.c: bilinearity + golden values).
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

import os

import bn254_oracle as O
from plonk_tpu.ops.bigfield import BigMontField
from plonk_tpu.ops.bigcurve import (BN254_FQ, BigG1J, bn254_generator,
                                    big_jac_mul, scalar_to_bits)
from plonk_tpu.ops import tower as T
from plonk_tpu.ops import bigpairing as BP

F = BP.pairing_field(rolled=True)
Fu = BigMontField(BN254_FQ)   # unrolled (plain elementwise work)
RNG = np.random.default_rng(42)


def rand_fq():
    return int.from_bytes(RNG.bytes(31), "little") % O.P


def rand_f2():
    return (rand_fq(), rand_fq())


def enc2(field, c):
    return T.Fq2(jnp.asarray(field.encode_host(np.array(c[0], dtype=object))),
                 jnp.asarray(field.encode_host(np.array(c[1], dtype=object))))


def dec2(field, c: T.Fq2):
    return (int(field.decode_host(np.asarray(c.c0))),
            int(field.decode_host(np.asarray(c.c1))))


def rand_f12():
    return (tuple(rand_f2() for _ in range(3)),
            tuple(rand_f2() for _ in range(3)))


class TestTower:
    def test_fq2_mul_sq_inv(self):
        a, b = rand_f2(), rand_f2()
        da, db = enc2(Fu, a), enc2(Fu, b)
        assert dec2(Fu, T.f2_mul(Fu, da, db)) == O.f2_mul(a, b)
        assert dec2(Fu, T.f2_sq(Fu, da)) == O.f2_sq(a)
        assert dec2(Fu, T.f2_inv(Fu, da)) == O.f2_inv(a)
        assert dec2(Fu, T.f2_mul_xi(Fu, da)) == O.f2_mul_xi(a)

    def test_fq12_mul_sq_inv_frob(self):
        a, b = rand_f12(), rand_f12()
        da = T.f12_encode_host(Fu, a)
        db = T.f12_encode_host(Fu, b)
        assert T.f12_decode_host(Fu, T.f12_mul(Fu, da, db)) == O.f12_mul(a, b)
        assert T.f12_decode_host(Fu, T.f12_sq(Fu, da)) == O.f12_sq(a)
        assert T.f12_decode_host(Fu, T.f12_inv(Fu, da)) == O.f12_inv(a)
        for pw in (1, 2, 3):
            assert (T.f12_decode_host(Fu, T.f12_frobenius(Fu, da, pw))
                    == O.f12_frobenius(a, pw))

    def test_oracle_frobenius_is_p_power(self):
        # anchors the oracle's own frobenius (shared-constant check)
        a = rand_f12()
        assert O.f12_frobenius(a, 1) == O.f12_pow(a, O.P)


class TestG2:
    def test_generator_on_curve_and_order(self):
        g = BP.g2_generator(F)
        x, y, inf = BP.g2_to_affine(F, g)
        assert not bool(np.asarray(inf))
        assert bool(np.asarray(BP.g2_on_curve(F, x, y)))
        bits = jnp.asarray(scalar_to_bits(O.R, 256))
        rq = BP.g2_mul_bits(F, g, bits, 256)
        assert bool(np.asarray(BP.g2_is_inf(F, rq)))

    def test_double_add_vs_oracle(self):
        g2 = (O.G2_GEN_X, O.G2_GEN_Y)
        dg = BP.g2_generator(F)
        d2 = BP.g2_double(F, dg)
        d3 = BP.g2_add(F, d2, dg)
        for dev, ref in ((d2, O.g2_mul(g2, 2)), (d3, O.g2_mul(g2, 3))):
            x, y, inf = BP.g2_to_affine(F, dev)
            assert not bool(np.asarray(inf))
            assert dec2(F, x) == ref[0] and dec2(F, y) == ref[1]


class TestPairing:
    @pytest.fixture(scope="class")
    def batched(self):
        """ONE batched 4-lane pairing (the pairing graph takes minutes to
        compile on the CPU backend, so every case rides a lane of a
        single compile): lane 0: e(P, Q); lane 1: e(aP, bQ);
        lane 2: e(2P, Q); lane 3: e(O, Q) (infinity)."""
        a, b = 12345, 67890
        g1 = bn254_generator(F)
        stack = lambda pts: BigG1J(
            jnp.stack([p.X for p in pts]), jnp.stack([p.Y for p in pts]),
            jnp.stack([p.Z for p in pts]))
        p_a = big_jac_mul(F, g1, jnp.asarray(scalar_to_bits(a, 16)), 16)
        p_2 = big_jac_mul(F, g1, jnp.asarray(scalar_to_bits(2, 3)), 3)
        ps = stack([g1, p_a, p_2, BigG1J.identity(F)])

        g2 = BP.g2_generator(F)
        q_b = BP.g2_mul_bits(F, g2, jnp.asarray(scalar_to_bits(b, 18)), 18)
        q2x, q2y, _ = BP.g2_to_affine(F, q_b)
        gx, gy, _ = BP.g2_to_affine(F, g2)
        st2 = lambda cs: T.Fq2(jnp.stack([c.c0 for c in cs]),
                               jnp.stack([c.c1 for c in cs]))
        qx = st2([gx, q2x, gx, gx])
        qy = st2([gy, q2y, gy, gy])

        fn = jax.jit(lambda p, x, y: BP.pairing(F, p, x, y))
        out = fn(ps, qx, qy)
        lanes = [T.f12_decode_host(
            F, jax.tree_util.tree_map(lambda t: t[i], out)) for i in range(4)]
        return (a, b), lanes

    def test_matches_oracle(self, batched):
        _, lanes = batched
        e1 = O.pairing(O.G1_GEN, (O.G2_GEN_X, O.G2_GEN_Y))
        assert lanes[0] == e1

    def test_bilinear(self, batched):
        (a, b), lanes = batched
        e1 = lanes[0]
        assert lanes[1] == O.f12_pow(e1, a * b)
        assert lanes[2] == O.f12_mul(e1, e1)

    def test_nondegenerate_order_r(self, batched):
        _, lanes = batched
        assert lanes[0] != O.F12_ONE
        assert O.f12_pow(lanes[0], O.R) == O.F12_ONE

    @pytest.mark.skipif(not os.environ.get("PLONK_TPU_HEAVY_TESTS"),
                        reason="compiles a second full-pairing graph "
                               "(final_exp_plain 3046-bit ladder), minutes "
                               "of XLA CPU compile; set "
                               "PLONK_TPU_HEAVY_TESTS=1")
    def test_chain_equals_plain_final_exp(self):
        g1 = bn254_generator(F)
        gx, gy, _ = BP.g2_to_affine(F, BP.g2_generator(F))
        fn = jax.jit(lambda p, x, y: BP.pairing(F, p, x, y, plain=True))
        out = fn(g1, gx, gy)
        e1 = O.pairing(O.G1_GEN, (O.G2_GEN_X, O.G2_GEN_Y))
        assert T.f12_decode_host(F, out) == e1

    def test_infinity_maps_to_one(self, batched):
        _, lanes = batched
        assert lanes[3] == O.F12_ONE
