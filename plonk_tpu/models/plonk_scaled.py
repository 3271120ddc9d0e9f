"""Production-scale PLONK prover (2^10 .. 2^19 gates) over the scaled
pairing curve (utils/params.py SCALED_CURVE).

Same 5-round protocol as models/plonk.py, restructured for scale:

- Montgomery fields on both sides (scalar r = 27*2^22+1, base p = 18r-1);
  witnesses/challenges enter in standard form and the Proof leaves in
  standard form — everything between stays in Montgomery representation.
- ALL polynomial products go through the evaluation domain: the round-3
  quotient is computed on a multiplicative coset of the 8n domain
  (deg t_numer = 4n+5 < 8n), divided pointwise by z_H there, and
  INTT'd back — no O(n^2) coefficient products, no long division, exactly
  the structure the reference's poly_mul/poly_divide chain
  (src/plonk.h:402-510) prevents from scaling.
- Blinding multiplications by z_H = x^n - 1 are written in closed form
  ((b1 x + b2)(x^n - 1) has 4 terms).
- Evaluations at the challenge point use log-depth power series + tree
  reduction (peval would be a 3n-step sequential Horner scan).
- Commitments are Pippenger MSMs over the scaled curve with 27-bit scalars.
- Only the "standard" (verifiable) linearization dialect: the reference
  dialect's quadratic z_x*sigma_3 term (src/plonk.h:563) would both exceed
  the SRS degree and defeat verification.

The degree-bound check `t_tail_zero` replaces the reference's
remainder-is-zero assert (src/plonk.h:506-510): on the 8n-point coset both
sides of t * z_H = t_numer are determined, so t's coefficients above
3n+5 vanish iff the division was exact.
"""
from __future__ import annotations

import dataclasses
from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from ..utils.params import PlonkParams, SCALED_FR, scaled_plonk_params
from ..ops.field import MontField, make_field
from ..ops import poly as P
from ..ops import ntt as N
from ..ops.curve import G1
from ..ops.msm import msm_pippenger
from .srs import SRS, srs_create
from .plonk import Proof

U32 = jnp.uint32


class ScaledDiagnostics(NamedTuple):
    satisfied: jnp.ndarray
    t_tail_zero: jnp.ndarray    # quotient degree bound (exact division)
    w_z_rem_zero: jnp.ndarray
    w_zw_rem_zero: jnp.ndarray

    def all_ok(self):
        return jnp.all(jnp.stack([self.satisfied, self.t_tail_zero,
                                  self.w_z_rem_zero, self.w_zw_rem_zero]))


@dataclasses.dataclass(frozen=True)
class ScaledContext:
    params: PlonkParams
    srs: SRS
    n: int                       # gates == domain size (power of two)
    coset_shift: int = 7         # generator of F_r^* -> never in any H

    @property
    def Fr(self) -> MontField:
        return make_field(self.params.field)

    @property
    def Fq(self) -> MontField:
        return make_field(self.params.curve.base)

    @property
    def domain8(self) -> int:
        return 8 * self.n

    def omega(self) -> int:
        return self.params.omega

    def omega8(self) -> int:
        return self.params.field.root_of_unity(self.domain8)


def scaled_new(n: int, secret: int = 123456789, srs_mode: str = "fixed",
               params: PlonkParams | None = None) -> ScaledContext:
    """Trusted setup + context for an n-gate scaled circuit."""
    pp = params if params is not None else scaled_plonk_params(n)
    Fq = make_field(pp.curve.base)
    srs = srs_create(Fq, pp.curve, secret, n + 5, mode=srs_mode)
    return ScaledContext(params=pp, srs=srs, n=n)


# ---------- host-side cached tables ----------

def _pow_table(p: int, g: int, length: int) -> np.ndarray:
    out = np.empty(length, dtype=np.uint32)
    cur = 1
    for i in range(length):
        out[i] = cur
        cur = (cur * g) % p
    return out


# ---------- coset-evaluation helpers ----------

def _coset_eval(F, coeffs: jnp.ndarray, shift_pows: jnp.ndarray, w8: int,
                m: int) -> jnp.ndarray:
    """Evaluate polynomials (last axis = coefficients, len <= m) on the
    coset g*H8: NTT of g^i-scaled coefficients."""
    L = coeffs.shape[-1]
    scaled = F.mul(coeffs, shift_pows[:L])
    return N.ntt(F, P.pad_to(scaled, m), w8)


def _coset_interp(F, evals: jnp.ndarray, inv_shift_pows: jnp.ndarray,
                  w8: int) -> jnp.ndarray:
    """Inverse of _coset_eval: INTT then unscale by g^{-i}."""
    coeffs = N.intt(F, evals, w8)
    return F.mul(coeffs, inv_shift_pows[:coeffs.shape[-1]])


def _peval_fast(F, coeffs: jnp.ndarray, x) -> jnp.ndarray:
    """Evaluate at a scalar point in O(log n) depth: power series by
    associative scan, modular tree reduction."""
    L = coeffs.shape[-1]
    xvec = jnp.concatenate([F.ones((1,)).astype(U32),
                            jnp.broadcast_to(jnp.asarray(x, U32), (L - 1,))])
    pows = jax.lax.associative_scan(F.mul, xvec)
    t = F.mul(coeffs, pows)
    while t.shape[-1] > 1:
        if t.shape[-1] % 2:
            t = jnp.concatenate(
                [t, jnp.zeros(t.shape[:-1] + (1,), U32)], axis=-1)
        t = F.add(t[..., 0::2], t[..., 1::2])
    return t[..., 0]


def _commit_many(ctx: ScaledContext, coeff_list) -> G1:
    """Commit a list of Montgomery-form coefficient vectors with ONE
    vmapped Pippenger graph (separate calls would replicate the
    segmented-scan graph per commitment — a compile-size problem)."""
    # Backend-dependent bucket arithmetic (identical group outputs,
    # asserted in tests/test_srs_msm.py): Jacobian on TPU (measured 1.6x
    # faster at 2^16 points, 25ms vs 40ms), affine+rolled-inversion on the
    # CPU backend (the CPU XLA pipeline compiles the Jacobian scan body
    # pathologically slowly). Override with PLONK_TPU_JAC_MSM=0/1.
    import os
    from ..ops.msm import msm_pippenger_many, msm_pippenger_jac_many
    if os.environ.get("PLONK_TPU_PROFILE_SKIP_COMMITS") == "1":
        # profiling-only: measure the field-side pipeline without MSMs
        B = len(coeff_list)
        return G1(jnp.zeros((B,), U32), jnp.zeros((B,), U32),
                  jnp.ones((B,), jnp.bool_))
    flag = os.environ.get("PLONK_TPU_JAC_MSM")
    if flag is None:
        use_jac = jax.default_backend() != "cpu"
    else:
        use_jac = flag == "1"
    Fr, Fq = ctx.Fr, ctx.Fq
    L = ctx.srs.length
    g1s = ctx.srs.g1s
    pts = G1(g1s.x[:L], g1s.y[:L], g1s.inf[:L])
    padded = jnp.stack([P.pad_to(c, L)[..., :L] for c in coeff_list])
    scalars = Fr.decode(padded)
    bits = ctx.params.field.p.bit_length()
    fn = msm_pippenger_jac_many if use_jac else msm_pippenger_many
    # window width swept on TPU at 2^16 points: w=9 (3 windows of the
    # 27-bit scalars) beats 7/11/14; argsort is ~45% of the MSM time
    return fn(Fq, pts, scalars, window_bits=9, scalar_bits=bits)


def prove_scaled(ctx: ScaledContext, selectors: jnp.ndarray,
                 copies: jnp.ndarray, a_w: jnp.ndarray, b_w: jnp.ndarray,
                 c_w: jnp.ndarray, challenge, rand9
                 ) -> tuple[Proof, ScaledDiagnostics]:
    """Scaled 5-round prover. All inputs in STANDARD form:
    selectors (5, n) uint32, copies (3, n, 2), witness columns (n,),
    challenge (5,) [alpha beta gamma z v], rand9 (9,). Jittable."""
    Fr = ctx.Fr
    pp = ctx.params
    r = pp.field.p
    n = ctx.n
    m = ctx.domain8
    omega = ctx.omega()
    w8 = ctx.omega8()
    shift = ctx.coset_shift

    # host tables (become jit constants)
    h_std = _pow_table(r, omega, n)
    k1h_std = (h_std.astype(np.uint64) * pp.k1 % r).astype(np.uint32)
    k2h_std = (h_std.astype(np.uint64) * pp.k2 % r).astype(np.uint32)
    shift_pows = Fr.array(_pow_table(r, shift, m))
    inv_shift_pows = Fr.array(_pow_table(r, pow(shift, -1, r), m))
    omega_pows_z = Fr.array(_pow_table(r, omega, n + 3))
    h_mont = Fr.array(h_std)

    ch = Fr.encode(jnp.asarray(challenge, U32))
    alpha, beta, gamma, z, v = (ch[i] for i in range(5))
    rnd = Fr.encode(jnp.asarray(rand9, U32))
    sel = Fr.encode(jnp.asarray(selectors, U32))
    q_l_v, q_r_v, q_o_v, q_m_v, q_c_v = (sel[i] for i in range(5))
    a_v = Fr.encode(jnp.asarray(a_w, U32))
    b_v = Fr.encode(jnp.asarray(b_w, U32))
    c_v = Fr.encode(jnp.asarray(c_w, U32))

    # step 1: witness check (vectorized gate equation)
    lhs = Fr.add(
        Fr.add(Fr.mul(q_l_v, a_v), Fr.mul(q_r_v, b_v)),
        Fr.add(Fr.mul(q_o_v, c_v),
               Fr.add(Fr.mul(q_m_v, Fr.mul(a_v, b_v)), q_c_v)))
    satisfied = jnp.all(lhs == 0)

    # step 2: sigma gathers
    table = Fr.array(np.stack([h_std, k1h_std, k2h_std]))
    copies = jnp.asarray(copies)
    sig = [table[copies[i, :, 0], copies[i, :, 1] - 1] for i in range(3)]
    sigma_1, sigma_2, sigma_3 = sig

    # step 3: the 11 interpolations as one batched INTT
    stacked = jnp.stack([a_v, b_v, c_v, q_o_v, q_m_v, q_l_v, q_r_v, q_c_v,
                         sigma_1, sigma_2, sigma_3])
    polys = N.intt(Fr, stacked, omega)
    (f_a_x, f_b_x, f_c_x, q_o_x, q_m_x, q_l_x, q_r_x, q_c_x,
     s_sigma_1, s_sigma_2, s_sigma_3) = (polys[i] for i in range(11))

    # round 1: blinding via the closed form (b_hi x + b_lo)(x^n - 1)
    def blind2(b_hi, b_lo, f):
        out = jnp.zeros((n + 2,), U32)
        out = out.at[0].set(Fr.neg(b_lo)).at[1].set(Fr.neg(b_hi))
        out = out.at[n].set(b_lo).at[n + 1].set(b_hi)
        return P.padd(Fr, out, f)

    a_x = blind2(rnd[0], rnd[1], f_a_x)
    b_x = blind2(rnd[2], rnd[3], f_b_x)
    c_x = blind2(rnd[4], rnd[5], f_c_x)
    # (commitments are deferred and batched into one MSM at the end —
    # with caller-supplied challenges nothing downstream consumes them)

    # round 2: grand product (vectorized fractions + prefix scan)
    w_i = h_mont[:n - 1]
    k1c, k2c = Fr.const(pp.k1), Fr.const(pp.k2)
    aa, bb, cc = a_v[:n - 1], b_v[:n - 1], c_v[:n - 1]
    denom = Fr.mul(
        Fr.mul(Fr.add(aa, Fr.add(Fr.mul(beta, w_i), gamma)),
               Fr.add(bb, Fr.add(Fr.mul(beta, Fr.mul(k1c, w_i)), gamma))),
        Fr.add(cc, Fr.add(Fr.mul(beta, Fr.mul(k2c, w_i)), gamma)))
    numer = Fr.mul(
        Fr.mul(Fr.add(aa, Fr.add(Fr.mul(beta, sigma_1[:n - 1]), gamma)),
               Fr.add(bb, Fr.add(Fr.mul(beta, sigma_2[:n - 1]), gamma))),
        Fr.add(cc, Fr.add(Fr.mul(beta, sigma_3[:n - 1]), gamma)))
    fractions = Fr.mul(denom, Fr.inv(numer))
    acc = jnp.concatenate([Fr.ones((1,)).astype(U32),
                           jax.lax.associative_scan(Fr.mul, fractions)])
    acc_x = N.intt(Fr, acc, omega)

    def blind3(b2c, b1c, b0c, f):
        out = jnp.zeros((n + 3,), U32)
        out = out.at[0].set(Fr.neg(b0c)).at[1].set(Fr.neg(b1c))
        out = out.at[2].set(Fr.neg(b2c))
        out = out.at[n].set(b0c).at[n + 1].set(b1c).at[n + 2].set(b2c)
        return P.padd(Fr, out, f)

    z_x = blind3(rnd[6], rnd[7], rnd[8], acc_x)

    # round 3: quotient on the coset of the 8n domain.
    # ALL 15 forward coset evaluations ride ONE stacked NTT (batched along
    # the leading axis) — separate transforms underutilize the chip and
    # multiply the graph.
    z_omega_x = Fr.mul(z_x, omega_pows_z)
    e0 = jnp.zeros((n,), U32).at[0].set(Fr.ones())
    l_1_x = N.intt(Fr, e0, omega)
    zh_coeffs = jnp.zeros((n + 1,), U32).at[0].set(
        Fr.neg(Fr.ones())).at[n].set(Fr.ones())
    stack15 = jnp.stack([P.pad_to(c, m) for c in
                         (a_x, b_x, c_x, z_x, z_omega_x, q_l_x, q_r_x,
                          q_o_x, q_m_x, q_c_x, s_sigma_1, s_sigma_2,
                          s_sigma_3, l_1_x, zh_coeffs)])
    evs = N.ntt(Fr, Fr.mul(stack15, shift_pows), w8)
    (a_e, b_e, c_e, z_e, zw_e, ql_e, qr_e, qo_e, qm_e, qc_e,
     s1_e, s2_e, s3_e, l1_e, zh_e) = (evs[i] for i in range(15))

    # the coset points themselves: g * w8^i (host table)
    pts = Fr.mul(Fr.const(shift), Fr.array(_pow_table(r, w8, m)))
    t1 = Fr.add(
        Fr.add(Fr.mul(Fr.mul(a_e, b_e), qm_e), Fr.mul(a_e, ql_e)),
        Fr.add(Fr.mul(b_e, qr_e), Fr.add(Fr.mul(c_e, qo_e), qc_e)))
    t2 = Fr.mul(Fr.mul(Fr.mul(
        Fr.add(a_e, Fr.add(Fr.mul(beta, pts), gamma)),
        Fr.add(b_e, Fr.add(Fr.mul(beta, Fr.mul(k1c, pts)), gamma))),
        Fr.add(c_e, Fr.add(Fr.mul(beta, Fr.mul(k2c, pts)), gamma))),
        Fr.mul(alpha, z_e))
    t3 = Fr.mul(Fr.mul(Fr.mul(
        Fr.add(a_e, Fr.add(Fr.mul(beta, s1_e), gamma)),
        Fr.add(b_e, Fr.add(Fr.mul(beta, s2_e), gamma))),
        Fr.add(c_e, Fr.add(Fr.mul(beta, s3_e), gamma))),
        Fr.mul(alpha, zw_e))
    alpha_sq = Fr.mul(alpha, alpha)
    t4 = Fr.mul(Fr.mul(Fr.sub(z_e, Fr.ones()), alpha_sq), l1_e)
    t_num_e = Fr.add(Fr.sub(Fr.add(t1, t2), t3), t4)
    t_e = Fr.mul(t_num_e, Fr.inv(zh_e))
    t_full = _coset_interp(Fr, t_e, inv_shift_pows, w8)
    t_len = 3 * n + 6
    t_x = t_full[..., :t_len]
    t_tail_zero = jnp.all(t_full[..., t_len:] == 0)

    part = n + 2
    t_lo_x = t_x[..., :part]
    t_mid_x = t_x[..., part:2 * part]
    t_hi_x = t_x[..., 2 * part:]

    # round 4: evaluations at z (log-depth)
    a_z = _peval_fast(Fr, a_x, z)
    b_z = _peval_fast(Fr, b_x, z)
    c_z = _peval_fast(Fr, c_x, z)
    s_sigma_1_z = _peval_fast(Fr, s_sigma_1, z)
    s_sigma_2_z = _peval_fast(Fr, s_sigma_2, z)
    t_z = _peval_fast(Fr, t_x, z)
    z_omega_z = _peval_fast(Fr, z_omega_x, z)

    # standard linearization (degree-1 in committed polys)
    r_x = P.pscale(Fr, q_m_x, Fr.mul(a_z, b_z))
    r_x = P.padd(Fr, r_x, P.pscale(Fr, q_l_x, a_z))
    r_x = P.padd(Fr, r_x, P.pscale(Fr, q_r_x, b_z))
    r_x = P.padd(Fr, r_x, P.pscale(Fr, q_o_x, c_z))
    r_x = P.padd(Fr, r_x, q_c_x)
    azg = Fr.add(Fr.add(a_z, Fr.mul(beta, z)), gamma)
    bzg = Fr.add(Fr.add(b_z, Fr.mul(Fr.mul(beta, k1c), z)), gamma)
    czg = Fr.add(Fr.add(c_z, Fr.mul(Fr.mul(beta, k2c), z)), gamma)
    r_x = P.padd(Fr, r_x, P.pscale(
        Fr, z_x, Fr.mul(Fr.mul(Fr.mul(azg, bzg), czg), alpha)))
    as1z = Fr.add(a_z, Fr.add(Fr.mul(beta, s_sigma_1_z), gamma))
    bs2z = Fr.add(b_z, Fr.add(Fr.mul(beta, s_sigma_2_z), gamma))
    r_x = P.psub(Fr, r_x, P.pscale(
        Fr, s_sigma_3,
        Fr.mul(Fr.mul(Fr.mul(as1z, bs2z), alpha), Fr.mul(beta, z_omega_z))))
    l_1_z = _peval_fast(Fr, l_1_x, z)
    r_x = P.padd(Fr, r_x, P.pscale(Fr, z_x, Fr.mul(l_1_z, alpha_sq)))
    r_z = _peval_fast(Fr, r_x, z)

    # round 5: opening quotients (closed-form synthetic division)
    z_pow_part = Fr.pow_static(z, n + 2)
    z_pow_2part = Fr.pow_static(z, 2 * n + 4)
    w = P.padd(Fr, t_lo_x, P.pscale(Fr, t_mid_x, z_pow_part))
    w = P.padd(Fr, w, P.pscale(Fr, t_hi_x, z_pow_2part))
    w = P.padd_const(Fr, w, Fr.neg(t_z))

    def open_term(poly, eval_at_z, v_pow):
        shifted = P.padd_const(Fr, poly, Fr.neg(eval_at_z))
        return P.pscale(Fr, shifted, Fr.pow_static(v, v_pow))

    w = P.padd(Fr, w, open_term(r_x, r_z, 1))
    w = P.padd(Fr, w, open_term(a_x, a_z, 2))
    w = P.padd(Fr, w, open_term(b_x, b_z, 3))
    w = P.padd(Fr, w, open_term(c_x, c_z, 4))
    w = P.padd(Fr, w, open_term(s_sigma_1, s_sigma_1_z, 5))
    w = P.padd(Fr, w, open_term(s_sigma_2, s_sigma_2_z, 6))

    w_z_x_quo, rem1 = P.divide_by_linear(Fr, w, z)
    z_shift = P.padd_const(Fr, z_x, Fr.neg(z_omega_z))
    zw = Fr.mul(z, Fr.const(omega))
    w_z_omega_x, rem2 = P.divide_by_linear(Fr, z_shift, zw)

    cms = _commit_many(ctx, [a_x, b_x, c_x, z_x, t_lo_x, t_mid_x, t_hi_x,
                             w_z_x_quo, w_z_omega_x])
    pick = lambda i: G1(cms.x[i], cms.y[i], cms.inf[i])
    a_s, b_s, c_s, z_s = pick(0), pick(1), pick(2), pick(3)
    t_lo_s, t_mid_s, t_hi_s = pick(4), pick(5), pick(6)
    w_z_s, w_z_omega_s = pick(7), pick(8)

    dec = Fr.decode
    proof = Proof(a_s=a_s, b_s=b_s, c_s=c_s, z_s=z_s, t_lo_s=t_lo_s,
                  t_mid_s=t_mid_s, t_hi_s=t_hi_s, w_z_s=w_z_s,
                  w_z_omega_s=w_z_omega_s,
                  a_z=dec(a_z), b_z=dec(b_z), c_z=dec(c_z),
                  s_sigma_1_z=dec(s_sigma_1_z), s_sigma_2_z=dec(s_sigma_2_z),
                  r_z=dec(r_z), z_omega_z=dec(z_omega_z))
    diags = ScaledDiagnostics(satisfied=satisfied, t_tail_zero=t_tail_zero,
                              w_z_rem_zero=rem1 == 0,
                              w_zw_rem_zero=rem2 == 0)
    return proof, diags


# ---------------- scaled verifier ----------------

class ScaledVK(NamedTuple):
    """Selector/permutation commitments + G2 SRS for the scaled circuit."""
    q_m_s: G1
    q_l_s: G1
    q_r_s: G1
    q_o_s: G1
    q_c_s: G1
    s1_s: G1
    s2_s: G1
    s3_s: G1


def make_vk_scaled(ctx: ScaledContext, selectors, copies) -> ScaledVK:
    return jax.jit(lambda s, c: _make_vk_scaled(ctx, s, c))(
        jnp.asarray(selectors, U32), jnp.asarray(copies))


def _make_vk_scaled(ctx: ScaledContext, selectors, copies) -> ScaledVK:
    Fr = ctx.Fr
    r = ctx.params.field.p
    n = ctx.n
    omega = ctx.omega()
    h_std = _pow_table(r, omega, n)
    k1h = (h_std.astype(np.uint64) * ctx.params.k1 % r).astype(np.uint32)
    k2h = (h_std.astype(np.uint64) * ctx.params.k2 % r).astype(np.uint32)
    table = Fr.array(np.stack([h_std, k1h, k2h]))
    copies = jnp.asarray(copies)
    sig = [table[copies[i, :, 0], copies[i, :, 1] - 1] for i in range(3)]
    sel = Fr.encode(jnp.asarray(selectors, U32))
    stacked = jnp.stack([sel[3], sel[0], sel[1], sel[2], sel[4]] + sig)
    # rows: q_m, q_l, q_r, q_o, q_c, s1, s2, s3
    polys = N.intt(Fr, stacked, omega)
    cms = _commit_many(ctx, [polys[i] for i in range(8)])
    return ScaledVK(*[G1(cms.x[i], cms.y[i], cms.inf[i]) for i in range(8)])


_VERIFY_JIT_CACHE: dict = {}


def verify_scaled(ctx: ScaledContext, vk: ScaledVK, proof: Proof,
                  challenge) -> bool:
    """Two-pairing KZG verification of a scaled proof (same identity as
    models/verifier.py, Montgomery-aware: field math in Montgomery form,
    scalar multiplications with decoded standard scalars). The heavy body
    is jitted once per context (eager pairings are ~10^5 dispatches)."""
    key = id(ctx)
    fn = _VERIFY_JIT_CACHE.get(key)
    if fn is None:
        fn = jax.jit(lambda v, p, c: _verify_scaled_flags(ctx, v, p, c))
        _VERIFY_JIT_CACHE[key] = fn
    ok1, ok2 = fn(vk, proof, jnp.asarray(challenge, U32))
    return bool(ok1) and bool(ok2)


def _verify_scaled_flags(ctx: ScaledContext, vk: ScaledVK, proof: Proof,
                         challenge):
    from ..ops.curve import g1_add, g1_mul, g1_neg, g1_generator, gt_equal
    from ..ops.pairing import pairing

    Fr, Fq = ctx.Fr, ctx.Fq
    pp = ctx.params
    curve = pp.curve
    r = pp.field.p
    n = ctx.n
    nbits = r.bit_length()

    ch_std = jnp.asarray(challenge, U32)
    ch = Fr.encode(ch_std)
    alpha, beta, gamma, z, v = (ch[i] for i in range(5))
    k1c, k2c = Fr.const(pp.k1), Fr.const(pp.k2)
    g = g1_generator(curve, Fq)
    enc = Fr.encode
    dec = Fr.decode

    a_z, b_z, c_z = enc(proof.a_z), enc(proof.b_z), enc(proof.c_z)
    s1_z, s2_z = enc(proof.s_sigma_1_z), enc(proof.s_sigma_2_z)
    r_z, zw_z = enc(proof.r_z), enc(proof.z_omega_z)
    alpha_sq = Fr.mul(alpha, alpha)

    z_h_z = Fr.sub(Fr.pow_static(z, n), Fr.ones())
    l_1_z = Fr.mul(Fr.mul(z_h_z, Fr.const(pow(n, -1, r))),
                   Fr.inv(Fr.sub(z, Fr.ones())))

    as1z = Fr.add(a_z, Fr.add(Fr.mul(beta, s1_z), gamma))
    bs2z = Fr.add(b_z, Fr.add(Fr.mul(beta, s2_z), gamma))
    r0 = Fr.add(
        Fr.mul(Fr.mul(Fr.mul(alpha, Fr.mul(as1z, bs2z)),
                      Fr.add(c_z, gamma)), zw_z),
        Fr.mul(alpha_sq, l_1_z))
    t_z = Fr.mul(Fr.sub(r_z, r0), Fr.inv(z_h_z))

    mulp = lambda pt, s_mont: g1_mul(Fq, pt, dec(s_mont), nbits=nbits)
    azg = Fr.add(Fr.add(a_z, Fr.mul(beta, z)), gamma)
    bzg = Fr.add(Fr.add(b_z, Fr.mul(Fr.mul(beta, k1c), z)), gamma)
    czg = Fr.add(Fr.add(c_z, Fr.mul(Fr.mul(beta, k2c), z)), gamma)
    z_coef = Fr.add(Fr.mul(Fr.mul(Fr.mul(azg, bzg), czg), alpha),
                    Fr.mul(alpha_sq, l_1_z))
    s3_coef = Fr.mul(Fr.mul(Fr.mul(as1z, bs2z), alpha), Fr.mul(beta, zw_z))
    d_cm = mulp(vk.q_m_s, Fr.mul(a_z, b_z))
    d_cm = g1_add(Fq, d_cm, mulp(vk.q_l_s, a_z))
    d_cm = g1_add(Fq, d_cm, mulp(vk.q_r_s, b_z))
    d_cm = g1_add(Fq, d_cm, mulp(vk.q_o_s, c_z))
    d_cm = g1_add(Fq, d_cm, vk.q_c_s)
    d_cm = g1_add(Fq, d_cm, mulp(proof.z_s, z_coef))
    d_cm = g1_add(Fq, d_cm, g1_neg(Fq, mulp(vk.s3_s, s3_coef)))

    vp = [Fr.pow_static(v, k) for k in range(7)]
    f_cm = proof.t_lo_s
    f_cm = g1_add(Fq, f_cm, mulp(proof.t_mid_s, Fr.pow_static(z, n + 2)))
    f_cm = g1_add(Fq, f_cm, mulp(proof.t_hi_s, Fr.pow_static(z, 2 * n + 4)))
    f_cm = g1_add(Fq, f_cm, mulp(d_cm, vp[1]))
    f_cm = g1_add(Fq, f_cm, mulp(proof.a_s, vp[2]))
    f_cm = g1_add(Fq, f_cm, mulp(proof.b_s, vp[3]))
    f_cm = g1_add(Fq, f_cm, mulp(proof.c_s, vp[4]))
    f_cm = g1_add(Fq, f_cm, mulp(vk.s1_s, vp[5]))
    f_cm = g1_add(Fq, f_cm, mulp(vk.s2_s, vp[6]))

    e_scalar = t_z
    for coef, val in ((vp[1], r_z), (vp[2], a_z), (vp[3], b_z),
                      (vp[4], c_z), (vp[5], s1_z), (vp[6], s2_z)):
        e_scalar = Fr.add(e_scalar, Fr.mul(coef, val))
    e_neg = g1_neg(Fq, mulp(g, e_scalar))

    def kzg(w_cm, point_std, combined, eval_neg):
        rhs_pt = g1_add(Fq, g1_mul(Fq, w_cm, point_std, nbits=nbits),
                        g1_add(Fq, combined, eval_neg))
        lhs = pairing(Fq, curve, w_cm, ctx.srs.g2_s)
        rhs = pairing(Fq, curve, rhs_pt, ctx.srs.g2_1)
        return gt_equal(lhs, rhs)

    ok1 = kzg(proof.w_z_s, ch_std[3], f_cm, e_neg)
    zw_std = dec(Fr.mul(z, Fr.const(ctx.omega())))
    e2_neg = g1_neg(Fq, mulp(g, zw_z))
    ok2 = kzg(proof.w_z_omega_s, zw_std, proof.z_s, e2_neg)
    return ok1, ok2
