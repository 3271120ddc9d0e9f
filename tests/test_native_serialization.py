"""Native host engine (C++ via ctypes) and canonical serialization tests."""
import numpy as np
import pytest

from plonk_tpu.utils.params import (HF17, GF101, BABYBEAR, SCALED_FR,
                                    SCALED_FQ, SCALED_CURVE, TOY_CURVE)

native = pytest.importorskip("plonk_tpu.utils.native")


def _have_toolchain():
    try:
        native._build_and_load()
        return True
    except Exception:
        return False


pytestmark = pytest.mark.skipif(not _have_toolchain(),
                                reason="no g++ toolchain")


def test_native_ntt_roundtrip_and_parity():
    import jax.numpy as jnp
    from plonk_tpu.ops.field import MontField
    from plonk_tpu.ops import ntt as N

    p = BABYBEAR.p
    n = 1 << 12
    w = BABYBEAR.root_of_unity(n)
    rng = np.random.default_rng(0)
    v = rng.integers(0, p, size=n, dtype=np.uint32)
    f = native.ntt(v, p, w)
    back = native.ntt(f, p, w, inverse=True)
    np.testing.assert_array_equal(back, v)
    # parity with the JAX kernel
    M = MontField(BABYBEAR)
    jax_f = np.asarray(M.decode(N.ntt(M, M.array(v), w)))
    np.testing.assert_array_equal(f, jax_f)


def test_native_poly_mul_parity():
    from plonk_tpu.ops.field import Field
    from plonk_tpu.ops import poly as P
    import jax.numpy as jnp

    rng = np.random.default_rng(1)
    a = rng.integers(0, 17, size=9, dtype=np.uint32)
    b = rng.integers(0, 17, size=5, dtype=np.uint32)
    nat = native.poly_mul(a, b, 17)
    F = Field(HF17)
    jx = np.asarray(P.pmul_school(F, jnp.asarray(a), jnp.asarray(b)))
    np.testing.assert_array_equal(nat, jx)


def test_native_msm_matches_tpu_pippenger():
    import jax.numpy as jnp
    from plonk_tpu.ops.field import Field
    from plonk_tpu.ops import curve as C
    from plonk_tpu.ops.msm import msm_pippenger

    p = GF101.p
    rng = np.random.default_rng(2)
    n = 200
    xs, ys, infs = native.ec_mul_table(1, 2, 18, p)
    idx = rng.integers(1, 17, size=n)
    px, py, pinf = xs[idx], ys[idx], infs[idx]
    scalars = rng.integers(0, 17, size=n, dtype=np.uint32)
    gold = native.ec_msm_naive(px, py, pinf, scalars, p)
    Fq = Field(GF101)
    fast = msm_pippenger(Fq, C.G1(jnp.asarray(px), jnp.asarray(py),
                                  jnp.asarray(pinf.astype(bool))),
                         jnp.asarray(scalars), window_bits=5, scalar_bits=5)
    if gold[2]:
        assert bool(fast.inf)
    else:
        assert (int(fast.x), int(fast.y)) == (gold[0], gold[1])


def test_native_mul_table_matches_golden():
    import json, os
    golden = json.load(open(os.path.join(os.path.dirname(__file__),
                                         "golden", "plonk_golden.json")))
    xs, ys, infs = native.ec_mul_table(1, 2, 18, 101)
    for i, exp in enumerate(golden["g1_multiples"]):
        if exp["inf"]:
            assert infs[i]
        else:
            assert (int(xs[i]), int(ys[i])) == (exp["x"], exp["y"])


def test_native_square_chain_witness():
    from plonk_tpu.models.synthetic import square_chain_circuit
    p = SCALED_FR.p
    _, _, a, b, c = square_chain_circuit(p, 64, x0=5)
    na, nb, nc = native.square_chain_witness(5, 64, p)
    np.testing.assert_array_equal(na, a)
    np.testing.assert_array_equal(nb, b)
    np.testing.assert_array_equal(nc, c)


def test_proof_serialization_roundtrip():
    from plonk_tpu.models import plonk as PL
    from plonk_tpu.models.presets import (canonical_constraints,
                                          canonical_assignments,
                                          canonical_context,
                                          CANONICAL_CHALLENGE,
                                          CANONICAL_RAND)
    from plonk_tpu.utils import serialization as S

    ctx = canonical_context(srs_mode="fixed")
    proof, _ = PL.prove(ctx, canonical_constraints(),
                        canonical_assignments(), CANONICAL_CHALLENGE,
                        CANONICAL_RAND)
    blob = S.proof_to_bytes(proof, q=GF101.p, r=HF17.p)
    back = S.proof_from_bytes(blob)
    for name in S._POINTS:
        a, b = getattr(proof, name), getattr(back, name)
        assert bool(a.inf) == bool(b.inf)
        if not bool(a.inf):
            assert int(a.x) == int(b.x) and int(a.y) == int(b.y)
    for name in S._SCALARS:
        assert int(getattr(proof, name)) == int(getattr(back, name))
    # deterministic bytes
    assert blob == S.proof_to_bytes(back, q=GF101.p, r=HF17.p)


def test_srs_serialization_roundtrip():
    from plonk_tpu.ops.field import Field
    from plonk_tpu.models.srs import srs_create
    from plonk_tpu.utils import serialization as S

    Fq = Field(GF101)
    srs = srs_create(Fq, TOY_CURVE, secret=2, n=6, mode="fixed")
    blob = S.srs_to_bytes(srs, q=GF101.p)
    back = S.srs_from_bytes(blob, mode="fixed")
    np.testing.assert_array_equal(np.asarray(back.g1s.x),
                                  np.asarray(srs.g1s.x))
    np.testing.assert_array_equal(np.asarray(back.g1s.y),
                                  np.asarray(srs.g1s.y))
    np.testing.assert_array_equal(np.asarray(back.g1s.inf),
                                  np.asarray(srs.g1s.inf))
    assert int(back.g2_s.x) == int(srs.g2_s.x)


def test_fiat_shamir_transcript_deterministic():
    """Transcript determinism + sensitivity (the round-phased FS protocol
    itself is covered in tests/test_fiat_shamir.py)."""
    from plonk_tpu.models.fiat_shamir import Transcript

    def derive(vals):
        t = Transcript(b"det-test", 17)
        t.absorb_scalars(b"vals", np.asarray(vals))
        return [t.squeeze() for _ in range(5)]

    vals = np.arange(12) % 17
    c1, c2 = derive(vals), derive(vals)
    assert c1 == c2
    assert all(0 < c < 17 for c in c1)
    c3 = derive(vals + 1)
    assert c1 != c3


def test_bn254_proof_roundtrip():
    """BN254 (multi-limb) proof byte format: canonical integers from the
    16-word coordinate arrays, exact roundtrip incl. infinity flags."""
    import numpy as np
    import jax.numpy as jnp
    from plonk_tpu.utils import serialization as S
    from plonk_tpu.models.plonk_bn254 import BN254Proof, BigG1Affine

    rng = np.random.default_rng(5)
    w = lambda: jnp.asarray(rng.integers(0, 1 << 16, size=16,
                                         dtype=np.uint32))
    pt = lambda inf=False: BigG1Affine(w(), w(), jnp.asarray(bool(inf)))
    proof = BN254Proof(pt(), pt(True), pt(), pt(), pt(), pt(), pt(),
                       pt(), pt(), w(), w(), w(), w(), w(), w(), w())
    back = S.bn254_proof_from_bytes(S.bn254_proof_to_bytes(proof))
    for n in S._POINTS:
        a, b = getattr(proof, n), getattr(back, n)
        assert np.array_equal(np.asarray(a.x), np.asarray(b.x))
        assert np.array_equal(np.asarray(a.y), np.asarray(b.y))
        assert bool(a.inf) == bool(b.inf)
    for n in S._SCALARS:
        assert np.array_equal(np.asarray(getattr(proof, n)),
                              np.asarray(getattr(back, n)))
