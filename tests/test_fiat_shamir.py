"""Round-phased Fiat-Shamir tests (models/fiat_shamir.py).

The reference has no FS (challenges are caller inputs, src/plonk.h:223-229);
these tests cover the non-interactive extension: round-trip acceptance,
tamper rejection through challenge re-derivation, transcript phase order,
and the admissibility predicates.
"""
import numpy as np
import jax.numpy as jnp
import pytest

from plonk_tpu.utils.params import SCALED_FR
from plonk_tpu.models import fiat_shamir as FS
from plonk_tpu.models import plonk_scaled as PS
from plonk_tpu.models.synthetic import square_chain_circuit

R = SCALED_FR.p
RND = np.array([11, 22, 33, 44, 55, 66, 77, 88, 99], dtype=np.uint32)


@pytest.fixture(scope="module")
def fs_setup():
    n = 8
    ctx = PS.scaled_new(n, secret=555666777)
    selectors, copies, a, b, c = square_chain_circuit(R, n, x0=5)
    prover = FS.ScaledFsProver(ctx, selectors, copies)
    out, diags = prover.prove(a, b, c, RND)
    return ctx, prover, (a, b, c), out, diags


def test_scaled_fs_roundtrip(fs_setup):
    ctx, prover, _, out, diags = fs_setup
    assert bool(diags.all_ok())
    assert FS.verify_scaled_fs(ctx, prover.vk, out)


def test_scaled_fs_challenges_are_admissible(fs_setup):
    ctx, _, _, out, _ = fs_setup
    alpha, beta, gamma, z, v = (int(x) for x in out.challenge)
    for val in (alpha, beta, gamma, z, v):
        assert val != 0
    assert pow(z, ctx.n, R) != 1  # z not in H


def test_scaled_fs_matches_interactive_prover(fs_setup):
    """The staged FS pipeline must produce the same proof the one-shot
    interactive prover produces for the derived challenges."""
    ctx, prover, wit, out, _ = fs_setup
    a, b, c = wit
    selectors, copies, *_ = square_chain_circuit(R, ctx.n, x0=5)
    proof2, diags2 = PS.prove_scaled(ctx, jnp.asarray(selectors),
                                     jnp.asarray(copies), a, b, c,
                                     out.challenge, RND)
    assert bool(diags2.all_ok())
    p1, p2 = out.proof, proof2
    for f in ("a_z", "b_z", "c_z", "s_sigma_1_z", "s_sigma_2_z", "r_z",
              "z_omega_z"):
        assert int(getattr(p1, f)) == int(getattr(p2, f)), f
    for f in ("a_s", "b_s", "c_s", "z_s", "t_lo_s", "t_mid_s", "t_hi_s",
              "w_z_s", "w_z_omega_s"):
        q1, q2 = getattr(p1, f), getattr(p2, f)
        assert int(q1.x) == int(q2.x) and int(q1.y) == int(q2.y), f


def test_scaled_fs_tamper_rejection(fs_setup):
    ctx, prover, _, out, _ = fs_setup
    # tamper an evaluation -> verify must fail (challenge re-derivation
    # changes v AND the pairing identity breaks)
    bad = out.proof._replace(a_z=jnp.uint32((int(out.proof.a_z) + 1) % R))
    assert not FS.verify_scaled_fs(ctx, prover.vk,
                                   FS.FsProof(bad, out.nonce, out.challenge))
    # tamper a commitment
    zs = out.proof.z_s
    bad_pt = zs._replace(x=jnp.uint32((int(zs.x) + 1)))
    bad = out.proof._replace(z_s=bad_pt)
    assert not FS.verify_scaled_fs(ctx, prover.vk,
                                   FS.FsProof(bad, out.nonce, out.challenge))
    # wrong nonce -> different challenges -> reject
    assert not FS.verify_scaled_fs(ctx, prover.vk,
                                   FS.FsProof(out.proof, out.nonce + 1,
                                              out.challenge))


def test_point_bytes_batched_points_differ():
    """Round-1 regression (ADVICE fiat_shamir.py:26): batched points must
    hash their real coordinates, not silently absorb zeros."""
    from plonk_tpu.ops.curve import G1
    a = G1(jnp.asarray([1, 2], jnp.uint32), jnp.asarray([3, 4], jnp.uint32),
           jnp.asarray([False, False]))
    b = G1(jnp.asarray([5, 6], jnp.uint32), jnp.asarray([7, 8], jnp.uint32),
           jnp.asarray([False, False]))
    assert FS.point_bytes(a) != FS.point_bytes(b)
    scalar = G1(jnp.uint32(1), jnp.uint32(3), jnp.asarray(False))
    assert FS.point_bytes(a) != FS.point_bytes(scalar)


def test_transcript_phase_order():
    """beta/gamma must depend on round-1 commitments but NOT on round-3
    commitments; z must depend on the t commitments."""
    from plonk_tpu.ops.curve import G1

    def mkpt(x):
        return G1(jnp.uint32(x), jnp.uint32(x + 1), jnp.asarray(False))

    def derive(r1, r3):
        t = FS.Transcript(b"phase-test", R)
        for pt in r1:
            t.absorb_point(b"r1", pt)
        beta = t.squeeze()
        gamma = t.squeeze()
        t.absorb_point(b"z", mkpt(99))
        alpha = t.squeeze()
        for pt in r3:
            t.absorb_point(b"r3", pt)
        z = t.squeeze()
        return beta, gamma, alpha, z

    base = derive([mkpt(1), mkpt(2)], [mkpt(10)])
    diff_r1 = derive([mkpt(3), mkpt(2)], [mkpt(10)])
    diff_r3 = derive([mkpt(1), mkpt(2)], [mkpt(11)])
    assert base[0] != diff_r1[0] or base[1] != diff_r1[1]
    assert base[:2] == diff_r3[:2]      # phase order: r3 after beta/gamma
    assert base[3] != diff_r3[3]


def test_toy_fs_roundtrip_and_tamper():
    from plonk_tpu.models.presets import (canonical_constraints,
                                          canonical_assignments,
                                          canonical_context)
    ctx = canonical_context(srs_mode="fixed")
    cons = canonical_constraints()
    asg = canonical_assignments()
    rnd = np.array([7, 4, 11, 12, 16, 2, 14, 11, 7], dtype=np.uint32)
    out, diags = FS.prove_fs(ctx, cons, asg, rnd)
    assert bool(diags.all_ok())
    assert FS.verify_fs(ctx, cons, out)
    p = int(out.proof.a_z)
    bad = out.proof._replace(a_z=jnp.uint32((p + 1) % 17))
    assert not FS.verify_fs(ctx, cons,
                            FS.FsProof(bad, out.nonce, out.challenge))
