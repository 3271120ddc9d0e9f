"""PLONK verifier — a capability the reference lacks entirely.

The reference implements only plonk_prove; its test generates a proof and
discards it (src/plonk-test.c:270, SURVEY §2.2.2). This module adds the
missing half using the pairing component (src/pairing.h's capability), for
proofs produced with the "standard" linearization dialect over a fixed
(non-degenerate) SRS.

Protocol identity (derived from the prover's exact quotient construction,
t*z_H = t1 + t2 - t3 + t4 with PI = 0):

    t(z) * z_H(z) = r(z) - r_0,
    r_0 = alpha * (a_z + beta*s1_z + gamma)(b_z + beta*s2_z + gamma)
                * (c_z + gamma) * z_omega_z
        + alpha^2 * L1(z)

Checks (two KZG openings; the reference proof has no multipoint-combination
challenge, so they stay separate):

    e(W_z,  [s]_2) == e(z * W_z  + [F] - [E], [1]_2)
    e(W_zw, [s]_2) == e(z*omega * W_zw + [z_x] - z_omega_z * G, [1]_2)

with [F] the v-powered combination of the proof commitments and the
linearization commitment [D] rebuilt from the verification key, and
[E] = (t_z + v r_z + v^2 a_z + ... + v^6 s2_z) * G.
"""
from __future__ import annotations

import dataclasses

import jax.numpy as jnp

from ..ops import ntt as N
from ..ops.curve import (G1, G2, g1_add, g1_mul, g1_neg, g1_generator,
                         gt_equal)
from ..ops.pairing import pairing
from .plonk import PlonkContext, Proof, sigma_to_roots
from .constraints import Constraints

U32 = jnp.uint32


@dataclasses.dataclass(frozen=True)
class VerificationKey:
    """Commitments to the circuit polynomials (preprocessed once per
    circuit) + the G2 side of the SRS."""
    q_m_s: G1
    q_l_s: G1
    q_r_s: G1
    q_o_s: G1
    q_c_s: G1
    s_sigma_1_s: G1
    s_sigma_2_s: G1
    s_sigma_3_s: G1
    g2_1: G2
    g2_s: G2
    n: int


def make_verification_key(ctx: PlonkContext, cons: Constraints
                          ) -> VerificationKey:
    """Commit the 5 selector and 3 permutation polynomials (the verifier
    half of the preprocessing the reference's plonk_new never does)."""
    from .plonk import _commit
    Fr = ctx.Fr
    sel = cons.selectors_device()
    sigmas = [sigma_to_roots(ctx, jnp.asarray(c))
              for c in (cons.c_a, cons.c_b, cons.c_c)]
    stacked = jnp.stack([sel["q_m"], sel["q_l"], sel["q_r"], sel["q_o"],
                         sel["q_c"]] + sigmas)
    polys = N.interpolate(Fr, stacked, ctx.params.omega)
    cms = [_commit(ctx, polys[i]) for i in range(8)]
    return VerificationKey(
        q_m_s=cms[0], q_l_s=cms[1], q_r_s=cms[2], q_o_s=cms[3], q_c_s=cms[4],
        s_sigma_1_s=cms[5], s_sigma_2_s=cms[6], s_sigma_3_s=cms[7],
        g2_1=ctx.srs.g2_1, g2_s=ctx.srs.g2_s, n=ctx.h_len)


def _kzg_check(Fq, curve, w_cm: G1, point, combined: G1, eval_neg: G1,
               g2_1: G2, g2_s: G2) -> jnp.ndarray:
    """e(W, [s]_2) == e(point * W + combined - [eval], [1]_2)."""
    rhs_pt = g1_add(Fq, g1_mul(Fq, w_cm, point), g1_add(Fq, combined,
                                                        eval_neg))
    lhs = pairing(Fq, curve, w_cm, g2_s)
    rhs = pairing(Fq, curve, rhs_pt, g2_1)
    return gt_equal(lhs, rhs)


def verify(ctx: PlonkContext, vk: VerificationKey, proof: Proof,
           challenge) -> bool:
    """Verify a standard-dialect proof. Challenges must match the prover's
    (deterministic-challenge protocol, like the reference's CHALLENGE
    struct; fiat_shamir.py derives them from a transcript hash)."""
    ok1, ok2 = verify_flags(ctx, vk, proof, challenge)
    return bool(ok1) and bool(ok2)


def verify_flags(ctx: PlonkContext, vk: VerificationKey, proof: Proof,
                 challenge):
    """Jittable core: returns the two pairing-check booleans."""
    Fr, Fq = ctx.Fr, ctx.Fq
    pp = ctx.params
    curve = pp.curve
    r = pp.field.p
    n = vk.n
    challenge = jnp.asarray(challenge, dtype=U32)
    alpha, beta, gamma, z, v = (challenge[i] for i in range(5))
    k1c, k2c = Fr.const(pp.k1), Fr.const(pp.k2)
    g = g1_generator(curve, Fq)

    # domain evaluations
    z_h_z = Fr.sub(Fr.pow_static(z, n), Fr.ones())           # z^n - 1
    # L1(z) = (z^n - 1) / (n (z - 1))
    n_inv = Fr.const(pow(n, -1, r))
    l_1_z = Fr.mul(Fr.mul(z_h_z, n_inv), Fr.inv(Fr.sub(z, Fr.ones())))

    a_z, b_z, c_z = proof.a_z, proof.b_z, proof.c_z
    s1_z, s2_z = proof.s_sigma_1_z, proof.s_sigma_2_z
    r_z, zw_z = proof.r_z, proof.z_omega_z
    alpha_sq = Fr.mul(alpha, alpha)

    as1z = Fr.add(a_z, Fr.add(Fr.mul(beta, s1_z), gamma))
    bs2z = Fr.add(b_z, Fr.add(Fr.mul(beta, s2_z), gamma))

    # r_0 and the quotient evaluation t_z
    r0 = Fr.add(
        Fr.mul(Fr.mul(Fr.mul(alpha, Fr.mul(as1z, bs2z)),
                      Fr.add(c_z, gamma)), zw_z),
        Fr.mul(alpha_sq, l_1_z))
    t_z = Fr.mul(Fr.sub(r_z, r0), Fr.inv(z_h_z))

    # [D] = linearization commitment from the VK
    azg = Fr.add(Fr.add(a_z, Fr.mul(beta, z)), gamma)
    bzg = Fr.add(Fr.add(b_z, Fr.mul(Fr.mul(beta, k1c), z)), gamma)
    czg = Fr.add(Fr.add(c_z, Fr.mul(Fr.mul(beta, k2c), z)), gamma)
    z_coef = Fr.add(Fr.mul(Fr.mul(Fr.mul(azg, bzg), czg), alpha),
                    Fr.mul(alpha_sq, l_1_z))
    s3_coef = Fr.mul(Fr.mul(Fr.mul(as1z, bs2z), alpha), Fr.mul(beta, zw_z))
    d_cm = g1_mul(Fq, vk.q_m_s, Fr.mul(a_z, b_z))
    d_cm = g1_add(Fq, d_cm, g1_mul(Fq, vk.q_l_s, a_z))
    d_cm = g1_add(Fq, d_cm, g1_mul(Fq, vk.q_r_s, b_z))
    d_cm = g1_add(Fq, d_cm, g1_mul(Fq, vk.q_o_s, c_z))
    d_cm = g1_add(Fq, d_cm, vk.q_c_s)
    d_cm = g1_add(Fq, d_cm, g1_mul(Fq, proof.z_s, z_coef))
    d_cm = g1_add(Fq, d_cm, g1_neg(Fq, g1_mul(Fq, vk.s_sigma_3_s, s3_coef)))

    # [F] = v-powered combination
    vp = [Fr.pow_static(v, k) for k in range(7)]
    f_cm = proof.t_lo_s
    f_cm = g1_add(Fq, f_cm, g1_mul(Fq, proof.t_mid_s,
                                   Fr.pow_static(z, n + 2)))
    f_cm = g1_add(Fq, f_cm, g1_mul(Fq, proof.t_hi_s,
                                   Fr.pow_static(z, 2 * n + 4)))
    f_cm = g1_add(Fq, f_cm, g1_mul(Fq, d_cm, vp[1]))
    f_cm = g1_add(Fq, f_cm, g1_mul(Fq, proof.a_s, vp[2]))
    f_cm = g1_add(Fq, f_cm, g1_mul(Fq, proof.b_s, vp[3]))
    f_cm = g1_add(Fq, f_cm, g1_mul(Fq, proof.c_s, vp[4]))
    f_cm = g1_add(Fq, f_cm, g1_mul(Fq, vk.s_sigma_1_s, vp[5]))
    f_cm = g1_add(Fq, f_cm, g1_mul(Fq, vk.s_sigma_2_s, vp[6]))

    # [E] = batched claimed evaluation * G
    e_scalar = t_z
    for coef, val in ((vp[1], r_z), (vp[2], a_z), (vp[3], b_z),
                      (vp[4], c_z), (vp[5], s1_z), (vp[6], s2_z)):
        e_scalar = Fr.add(e_scalar, Fr.mul(coef, val))
    e_neg = g1_neg(Fq, g1_mul(Fq, g, e_scalar))

    ok1 = _kzg_check(Fq, curve, proof.w_z_s, z, f_cm, e_neg, vk.g2_1,
                     vk.g2_s)

    # second opening: z_x at z*omega
    zw_pt = Fr.mul(z, Fr.const(pp.omega))
    e2_neg = g1_neg(Fq, g1_mul(Fq, g, zw_z))
    ok2 = _kzg_check(Fq, curve, proof.w_z_omega_s, zw_pt, proof.z_s, e2_neg,
                     vk.g2_1, vk.g2_s)

    return ok1, ok2
