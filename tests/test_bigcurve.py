"""BN254 G1 over the multi-limb field (ops/bigcurve.py) — parity against
a self-contained python-int affine implementation (the oracle style of
the reference's hand-computed vectors, src/g1-test.c, at 254-bit scale).
"""
import numpy as np
import jax.numpy as jnp
import pytest

from plonk_tpu.ops.bigfield import BigMontField
from plonk_tpu.ops import bigcurve as BC
from plonk_tpu.utils.params import BN254_FR

Q = BC.BN254_FQ.p
R_ORDER = BN254_FR.p
# rolled=True (mont_mul_vec, bit-identical to the unrolled CIOS): the
# 256-step jitted ladder with the UNROLLED field is a known XLA-CPU
# compile bomb (~50+ min for one fori body — the superlinear-depth
# pathology in CLAUDE.md); unrolled parity is covered by test_bigfield's
# eager sweeps.
F = BigMontField(BC.BN254_FQ, rolled=True)


# ---- python-int affine oracle ----

def _inv(a):
    return pow(a, Q - 2, Q)


def _add(p1, p2):
    if p1 is None:
        return p2
    if p2 is None:
        return p1
    x1, y1 = p1
    x2, y2 = p2
    if x1 == x2:
        if (y1 + y2) % Q == 0:
            return None
        m = (3 * x1 * x1) * _inv(2 * y1) % Q
    else:
        m = (y2 - y1) * _inv(x2 - x1) % Q
    x3 = (m * m - x1 - x2) % Q
    y3 = (m * (x1 - x3) - y1) % Q
    return (x3, y3)


def _mul(p, k):
    acc = None
    cur = p
    while k:
        if k & 1:
            acc = _add(acc, cur)
        cur = _add(cur, cur)
        k >>= 1
    return acc


G = BC.BN254_G1_GEN


def _affine_of(pt):
    x, y, inf = BC.big_to_affine(F, pt)
    if bool(np.asarray(inf)):
        return None
    return (int(F.decode_host(x)), int(F.decode_host(y)))


def test_generator_and_double():
    g = BC.bn254_generator(F)
    x, y, _ = BC.big_to_affine(F, g)
    assert BC.big_on_curve(F, x, y)
    assert _affine_of(BC.big_jac_double(F, g)) == _mul(G, 2)
    g2 = BC.big_jac_add(F, g, g)          # add dispatches to double
    assert _affine_of(g2) == _mul(G, 2)
    g3 = BC.big_jac_add(F, g2, g)
    assert _affine_of(g3) == _mul(G, 3)


def test_identity_and_inverse_cases():
    g = BC.bn254_generator(F)
    ident = BC.BigG1J.identity(F)
    assert _affine_of(BC.big_jac_add(F, g, ident)) == G
    assert _affine_of(BC.big_jac_add(F, ident, g)) == G
    # P + (-P) = infinity
    neg = BC.BigG1J(g.X, F.neg(g.Y), g.Z)
    assert _affine_of(BC.big_jac_add(F, g, neg)) is None


import jax as _jax

# jit once at module scope: an eagerly-called fori_loop re-traces its
# fresh closures EVERY call -> a full recompile of the 254-bit ladder
# per test parameter (~20 min each on CPU)
_ladder = _jax.jit(lambda g, bits: BC.big_jac_mul(F, g, bits, 256))


@pytest.mark.parametrize("k", [5, 123456789, R_ORDER - 1, R_ORDER])
def test_scalar_mul(k):
    g = BC.bn254_generator(F)
    bits = jnp.asarray(BC.scalar_to_bits(k, 256))
    got = _affine_of(_ladder(g, bits))
    assert got == _mul(G, k)


def test_fixed_base_msm():
    rng = np.random.default_rng(0)
    L = 6
    base_scalars = [int(rng.integers(1, 1 << 60)) for _ in range(L)]
    pts_aff = [_mul(G, s) for s in base_scalars]
    xs = F.array([p[0] for p in pts_aff])
    ys = F.array([p[1] for p in pts_aff])
    ones = jnp.broadcast_to(F.const(1), (L, F.limbs))
    pts = BC.BigG1J(xs, ys, ones)
    wb = 6   # 64 buckets; off%16 in {12, 14} exercises the cross-word
    # digit extraction. 48-bit scalars keep the CPU test tractable; full
    # 254-bit scalars only add windows (same code path — see
    # test_scalar_mul for full-width ladder coverage).
    sbits = 48
    scalars = [int.from_bytes(rng.bytes(6), "little") for _ in range(L)]
    scalars[0] = 0
    tbl = BC.build_big_table(F, pts, wb, sbits)
    words = np.zeros((L, 3), dtype=np.uint32)
    for i, s in enumerate(scalars):
        for w in range(3):
            words[i, w] = (s >> (16 * w)) & 0xFFFF
    got = _jax.jit(lambda t, w: BC.big_msm_fixed_base(F, t, w))(
        tbl, jnp.asarray(words))
    expect = None
    for p, s in zip(pts_aff, scalars):
        expect = _add(expect, _mul(p, s))
    assert _affine_of(got) == expect


def test_big_pippenger_msm():
    """Arbitrary-base BN254 MSM (sort + chunked segmented scan): equals
    the python-int oracle with full-width 254-bit scalars."""
    rng = np.random.default_rng(7)
    L = 8
    base_scalars = [int(rng.integers(1, 1 << 60)) for _ in range(L)]
    pts_aff = [_mul(G, s) for s in base_scalars]
    xs = F.array([p[0] for p in pts_aff])
    ys = F.array([p[1] for p in pts_aff])
    ones = jnp.broadcast_to(F.const(1), (L, F.limbs))
    pts = BC.BigG1J(xs, ys, ones)
    scalars = [int.from_bytes(rng.bytes(32), "little") % R_ORDER
               for _ in range(L)]
    scalars[0] = 0
    scalars[1] = scalars[2]  # duplicate digits exercise segment merging
    words = np.zeros((L, 16), dtype=np.uint32)
    for i, s in enumerate(scalars):
        for w in range(16):
            words[i, w] = (s >> (16 * w)) & 0xFFFF
    got = _jax.jit(lambda p_, w_: BC.big_msm_pippenger(
        F, p_, w_, window_bits=8, scalar_bits=254))(pts, jnp.asarray(words))
    expect = None
    for p, s in zip(pts_aff, scalars):
        expect = _add(expect, _mul(p, s))
    assert _affine_of(got) == expect


def test_fixed_base_msm_many():
    """Batched fixed-base MSMs (ONE table stream for all B commitments —
    the BN254 prover's commit path, plonk_bn254.bn254_table_commit):
    every lane equals the python-int oracle; B includes a zero-scalar
    lane (all-identity) and a single-point hit."""
    rng = np.random.default_rng(5)
    L, B = 5, 3
    base_scalars = [int(rng.integers(1, 1 << 60)) for _ in range(L)]
    pts_aff = [_mul(G, s) for s in base_scalars]
    xs = F.array([p[0] for p in pts_aff])
    ys = F.array([p[1] for p in pts_aff])
    ones = jnp.broadcast_to(F.const(1), (L, F.limbs))
    pts = BC.BigG1J(xs, ys, ones)
    sbits = 48
    sc = [[int.from_bytes(rng.bytes(6), "little") for _ in range(L)]
          for _ in range(B)]
    sc[1] = [0] * L                      # all-identity lane
    sc[2] = [0] * (L - 1) + [sc[2][-1]]  # single live point
    tbl = BC.build_big_table(F, pts, 5, sbits)
    words = np.zeros((B, L, 3), dtype=np.uint32)
    for b in range(B):
        for i, s in enumerate(sc[b]):
            for w in range(3):
                words[b, i, w] = (s >> (16 * w)) & 0xFFFF
    got = _jax.jit(lambda t, w: BC.big_msm_fixed_base_many(F, t, w))(
        tbl, jnp.asarray(words))
    for b in range(B):
        expect = None
        for p, s in zip(pts_aff, sc[b]):
            expect = _add(expect, _mul(p, s))
        lane = BC.BigG1J(got.X[b], got.Y[b], got.Z[b])
        assert _affine_of(lane) == expect, b
