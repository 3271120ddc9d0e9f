"""Single-dispatch Poseidon Fiat-Shamir prover (models/fs_poseidon.py).

Covers: prove -> verify round trip, device-transcript == host-oracle
challenge lockstep, consistency with the interactive prover on the
derived challenges, tamper rejection, and public-input binding.
"""
import dataclasses

import numpy as np
import jax.numpy as jnp
import pytest

from plonk_tpu.utils.params import SCALED_FR
from plonk_tpu.models import fs_poseidon as FSP
from plonk_tpu.models import plonk_scaled as PS
from plonk_tpu.models.synthetic import square_chain_circuit

R = SCALED_FR.p
RND = np.array([12, 23, 34, 45, 56, 67, 78, 89, 91], dtype=np.uint32)


@pytest.fixture(scope="module")
def setup():
    n = 8
    ctx = PS.scaled_new(n, secret=987654321)
    selectors, copies, a, b, c = square_chain_circuit(R, n, x0=7)
    prover = FSP.PoseidonFsProver(ctx, selectors, copies)
    out, diags = prover.prove(a, b, c, RND)
    return ctx, prover, (selectors, copies, a, b, c), out, diags


def test_roundtrip(setup):
    ctx, prover, _, out, diags = setup
    assert bool(diags.all_ok())
    assert FSP.verify_scaled_fs_poseidon(ctx, prover.vk, out)


def test_device_challenges_match_host_replay(setup):
    """The on-device sponge and the python-int oracle must derive the
    SAME challenges from the same proof — this is the lockstep the whole
    scheme rests on."""
    ctx, prover, _, out, _ = setup
    ch = FSP.derive_challenges_host(ctx, list(prover.vk), out.proof,
                                    out.nonce)
    assert [int(v) for v in ch] == [int(v) for v in out.challenge]


def test_challenges_admissible(setup):
    ctx, _, _, out, _ = setup
    alpha, beta, gamma, z, v = (int(x) for x in out.challenge)
    for val in (alpha, beta, gamma, z, v):
        assert val != 0
    assert pow(z, ctx.n, R) != 1


def test_matches_interactive_prover(setup):
    """Replaying the interactive prover on the derived challenges must
    reproduce the single-dispatch proof exactly."""
    ctx, prover, circ, out, _ = setup
    selectors, copies, a, b, c = circ
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
        assert bool(q1.inf) == bool(q2.inf), f


def test_tamper_rejected(setup):
    ctx, prover, _, out, _ = setup
    bad_eval = dataclasses.replace(
        out.proof, a_z=jnp.uint32((int(out.proof.a_z) + 1) % R)) \
        if dataclasses.is_dataclass(out.proof) else \
        out.proof._replace(a_z=jnp.uint32((int(out.proof.a_z) + 1) % R))
    bad = FSP.PoseidonFsProof(proof=bad_eval, nonce=out.nonce,
                              challenge=out.challenge)
    assert not FSP.verify_scaled_fs_poseidon(ctx, prover.vk, bad)
    wrong_nonce = FSP.PoseidonFsProof(proof=out.proof,
                                      nonce=out.nonce + 1,
                                      challenge=out.challenge)
    assert not FSP.verify_scaled_fs_poseidon(ctx, prover.vk, wrong_nonce)


def test_public_inputs_bound(setup):
    """A proof made for one PI vector must not verify under another."""
    ctx, _, circ, _, _ = setup
    selectors, copies, a, b, c = circ
    n = ctx.n
    sel = np.array(selectors).copy()
    # rebind gate 0: q_l=1, others 0 -> a[0] + PI[0] = 0 (PI = -a[0])
    sel[:, 0] = 0
    sel[0, 0] = 1
    pi = np.zeros(n, dtype=np.uint32)
    pi[0] = (R - int(a[0])) % R
    prover = FSP.PoseidonFsProver(ctx, sel, copies)
    out, diags = prover.prove(a, b, c, RND, public_inputs=pi)
    assert bool(diags.all_ok())
    assert FSP.verify_scaled_fs_poseidon(ctx, prover.vk, out,
                                         public_inputs=pi)
    pi2 = pi.copy()
    pi2[0] = (int(pi2[0]) + 1) % R
    assert not FSP.verify_scaled_fs_poseidon(ctx, prover.vk, out,
                                             public_inputs=pi2)


def test_prove_many_matches_single(setup):
    """The one-dispatch batched lane must produce exactly the proofs the
    single-witness path produces (vmapped retry loop included), and every
    lane must verify independently."""
    ctx, prover, circ, _, _ = setup
    selectors, copies, *_ = circ
    B = 3
    wits = [square_chain_circuit(R, ctx.n, x0=7 + i)[2:] for i in range(B)]
    a = np.stack([np.asarray(w[0]) for w in wits])
    b = np.stack([np.asarray(w[1]) for w in wits])
    c = np.stack([np.asarray(w[2]) for w in wits])
    rnds = np.stack([RND + i for i in range(B)])
    outs = prover.prove_many(a, b, c, rnds)
    assert len(outs) == B
    for i, (out, diags) in enumerate(outs):
        assert bool(diags.all_ok())
        assert FSP.verify_scaled_fs_poseidon(ctx, prover.vk, out)
        single, sd = prover.prove(a[i], b[i], c[i], rnds[i])
        assert bool(sd.all_ok())
        assert out.nonce == single.nonce
        assert [int(v) for v in out.challenge] == \
            [int(v) for v in single.challenge]
        assert int(out.proof.r_z) == int(single.proof.r_z)
        assert int(out.proof.a_s.x) == int(single.proof.a_s.x)
