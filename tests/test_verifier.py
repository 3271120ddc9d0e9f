"""Prove/verify round trip — the verifier capability the reference lacks
(its test discards the proof, src/plonk-test.c:270). Uses the fixed
(non-degenerate) SRS and the standard linearization dialect."""
import numpy as np
import jax.numpy as jnp
import pytest

from plonk_tpu.models import plonk as PL
from plonk_tpu.models import verifier as V
from plonk_tpu.ops.curve import G1
from plonk_tpu.models.presets import (canonical_constraints,
                                      canonical_assignments,
                                      canonical_context,
                                      CANONICAL_CHALLENGE, CANONICAL_RAND)


@pytest.fixture(scope="module")
def setup():
    ctx = canonical_context(srs_mode="fixed")
    cons = canonical_constraints()
    asg = canonical_assignments()
    vk = V.make_verification_key(ctx, cons)
    proof = PL.prove_checked(ctx, cons, asg, CANONICAL_CHALLENGE,
                             CANONICAL_RAND, dialect="standard")
    return ctx, cons, asg, vk, proof


def test_verify_accepts_valid_proof(setup):
    ctx, cons, asg, vk, proof = setup
    assert V.verify(ctx, vk, proof, CANONICAL_CHALLENGE)


def test_verify_other_challenges(setup):
    ctx, cons, asg, vk, _ = setup
    # (challenges picked so no permutation denominator vanishes mod 17 —
    # with an unlucky beta/gamma the reference prover itself aborts on a
    # nonzero t(x) remainder)
    for ch in ([3, 7, 11, 2, 6], [1, 2, 3, 6, 7], [2, 3, 5, 7, 11]):
        ch = np.array(ch, dtype=np.uint32)
        proof = PL.prove_checked(ctx, cons, asg, ch, CANONICAL_RAND,
                                 dialect="standard")
        assert V.verify(ctx, vk, proof, ch), ch


def test_verify_other_blinding(setup):
    """Blinding must not affect validity (zero-knowledge property)."""
    ctx, cons, asg, vk, _ = setup
    rnd = np.array([1, 2, 3, 4, 5, 6, 7, 8, 9], dtype=np.uint32)
    proof = PL.prove_checked(ctx, cons, asg, CANONICAL_CHALLENGE, rnd,
                             dialect="standard")
    assert V.verify(ctx, vk, proof, CANONICAL_CHALLENGE)


def test_verify_rejects_tampered_eval(setup):
    ctx, cons, asg, vk, proof = setup
    bad = proof._replace(a_z=jnp.uint32((int(proof.a_z) + 1) % 17))
    assert not V.verify(ctx, vk, bad, CANONICAL_CHALLENGE)
    bad2 = proof._replace(r_z=jnp.uint32((int(proof.r_z) + 5) % 17))
    assert not V.verify(ctx, vk, bad2, CANONICAL_CHALLENGE)


def test_verify_rejects_tampered_commitment(setup):
    ctx, cons, asg, vk, proof = setup
    from plonk_tpu.ops.curve import g1_double
    bad_pt = g1_double(ctx.Fq, proof.a_s)
    bad = proof._replace(a_s=bad_pt)
    assert not V.verify(ctx, vk, bad, CANONICAL_CHALLENGE)


def test_verify_rejects_wrong_challenge(setup):
    ctx, cons, asg, vk, proof = setup
    ch = np.array([3, 7, 11, 2, 6], dtype=np.uint32)
    assert not V.verify(ctx, vk, proof, ch)


def test_verify_rejects_reference_dialect(setup):
    """Reference-dialect r(x) is quadratic in commitments; its proofs must
    NOT pass the standard verifier (documents the dialect difference).

    Note: with the CANONICAL challenge the dialects coincide (bs2z == 0
    kills the r3 term for this circuit), so use a challenge where the
    quadratic term is live."""
    ctx, cons, asg, vk, _ = setup
    ch = np.array([3, 7, 11, 2, 6], dtype=np.uint32)
    p_ref = PL.prove_checked(ctx, cons, asg, ch, CANONICAL_RAND,
                             dialect="reference")
    p_std = PL.prove_checked(ctx, cons, asg, ch, CANONICAL_RAND,
                             dialect="standard")
    assert int(p_ref.r_z) != int(p_std.r_z)  # dialects actually diverge here
    assert not V.verify(ctx, vk, p_ref, ch)
    assert V.verify(ctx, vk, p_std, ch)


def test_standard_dialect_same_commitments(setup):
    """Dialects differ only in r_z (and hence W_z): wire/permutation
    commitments and the other evals are identical."""
    ctx, cons, asg, vk, p_std = setup
    p_ref, _ = PL.prove(ctx, cons, asg, CANONICAL_CHALLENGE, CANONICAL_RAND,
                        dialect="reference")
    for name in ["a_s", "b_s", "c_s", "z_s", "t_lo_s", "t_mid_s", "t_hi_s"]:
        a, b = getattr(p_std, name), getattr(p_ref, name)
        assert int(a.x) == int(b.x) and int(a.y) == int(b.y), name
    for name in ["a_z", "b_z", "c_z", "s_sigma_1_z", "s_sigma_2_z",
                 "z_omega_z"]:
        assert int(getattr(p_std, name)) == int(getattr(p_ref, name)), name
