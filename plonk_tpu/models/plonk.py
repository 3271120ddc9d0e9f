"""The PLONK prover — TPU-staged pipeline (replaces src/plonk.h).

The reference implements the whole 5-round protocol as one 430-line
sequential C function (src/plonk.h:223-656). Here it is a staged dataflow of
vectorized kernels over fixed-shape tensors, fully jittable:

- step 2 sigma mapping: one masked gather over (H | k1*H | k2*H)
  (src/plonk.h:142-160 loops per element);
- step 3: the 11 interpolations are ONE batched INTT
  (src/plonk.h:265-275 does 11 O(n^2) matvecs against a Gauss-Jordan
  inverse, src/plonk.h:106-113);
- round 2 grand product: vectorized fraction kernel + associative prefix
  scan (src/plonk.h:320-359 is a sequential loop whose every step does 3
  full Horner evals — O(n^2));
- round 3 quotient: polynomial products with static max degrees, divided by
  the vanishing polynomial in closed form (strided suffix sums) instead of
  sequential long division (src/plonk.h:495-510);
- round 5 opening quotients: closed-form synthetic division by (x - z)
  (src/plonk.h:601-617);
- commitments: naive SRS fold for reference-parity or Pippenger MSM
  (ops/msm.py) — identical group outputs, asserted in tests.

Protocol invariants the reference enforces with assert/exit (witness check
src/plonk.h:231, acc(omega^n)==1 src/plonk.h:365-368, zero remainders
src/plonk.h:506-510,610,617, SRS degree guard src/srs.h:54-56) are returned
as a diagnostics pytree; the non-jit wrapper raises on failure.

Static-shape notes: polynomials carry max-degree zero padding; all the
reference's trailing-zero trimming (src/poly.h:22-24) is value-neutral for
the proof. Challenges (alpha, beta, gamma, z, v) and blinding scalars b1..b9
are caller-supplied exactly like the reference (no Fiat-Shamir there either:
src/plonk.h:16-22, 223-229); fiat_shamir.py layers hashing on top.
"""
from __future__ import annotations

import dataclasses
from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from ..utils.params import PlonkParams, TOY_PLONK
from ..ops.field import Field, make_field
from ..ops import poly as P
from ..ops import ntt as N
from ..ops.curve import G1
from ..ops.msm import msm_pippenger
from .srs import SRS, srs_create, srs_commit_naive
from .constraints import Constraints, Assignments

U32 = jnp.uint32


class Proof(NamedTuple):
    """9 G1 commitments + 7 scalar-field evaluations (src/plonk.h:24-41)."""
    a_s: G1
    b_s: G1
    c_s: G1
    z_s: G1
    t_lo_s: G1
    t_mid_s: G1
    t_hi_s: G1
    w_z_s: G1
    w_z_omega_s: G1
    a_z: jnp.ndarray
    b_z: jnp.ndarray
    c_z: jnp.ndarray
    s_sigma_1_z: jnp.ndarray
    s_sigma_2_z: jnp.ndarray
    r_z: jnp.ndarray
    z_omega_z: jnp.ndarray


class Diagnostics(NamedTuple):
    satisfied: jnp.ndarray      # witness check (src/plonk.h:231)
    acc_ok: jnp.ndarray         # acc_x(omega^n) == 1 (src/plonk.h:365-368)
    t_rem_zero: jnp.ndarray     # t division exact (src/plonk.h:506-510)
    w_z_rem_zero: jnp.ndarray   # (src/plonk.h:610)
    w_zw_rem_zero: jnp.ndarray  # (src/plonk.h:617)
    srs_fit: jnp.ndarray        # committed degrees fit the SRS (src/srs.h:54)

    def all_ok(self):
        return jnp.all(jnp.stack([self.satisfied, self.acc_ok,
                                  self.t_rem_zero, self.w_z_rem_zero,
                                  self.w_zw_rem_zero, self.srs_fit]))


@dataclasses.dataclass(frozen=True)
class PlonkContext:
    """Prover preprocessing (replaces plonk_new, src/plonk.h:53-119).

    The reference's O(n^3) Vandermonde inversion is gone: INTT twiddles are
    the only 'precomputation', handled inside ops/ntt.py caches."""
    params: PlonkParams
    srs: SRS
    h_len: int
    use_pippenger: bool = False
    commit_mode: str = "naive"   # "naive" | "table" (fixed-base precompute)

    def __post_init__(self):
        pp = self.params
        r = pp.field.p
        h = [pow(pp.omega, i, r) for i in range(self.h_len)]
        # domain sanity checks (src/plonk.h:74-99)
        if len(set(h)) != self.h_len or pow(pp.omega, self.h_len, r) != 1:
            raise ValueError("omega does not generate a domain of size h_len")
        if pp.k1 % r in h or pp.k2 % r in h:
            raise ValueError("K1 or K2 is in H, which is not allowed")
        if pp.k2 % r in [(x * pp.k1) % r for x in h]:
            raise ValueError("K2 is in k1*H, which is not allowed")

    @property
    def Fr(self):
        return make_field(self.params.field)

    @property
    def Fq(self):
        return make_field(self.params.curve.base)

    def domains_host(self):
        pp, r, n = self.params, self.params.field.p, self.h_len
        h = np.array([pow(pp.omega, i, r) for i in range(n)], dtype=np.uint32)
        k1_h = (h.astype(np.uint64) * pp.k1 % r).astype(np.uint32)
        k2_h = (h.astype(np.uint64) * pp.k2 % r).astype(np.uint32)
        return h, k1_h, k2_h

    def z_h_coeffs(self) -> np.ndarray:
        """z_H = x^n - 1 (H is the full order-n domain; the reference's
        poly_z(h) product, src/plonk.h:116, is exactly this — asserted in
        tests)."""
        r, n = self.params.field.p, self.h_len
        c = np.zeros(n + 1, dtype=np.uint32)
        c[0] = r - 1
        c[n] = 1
        return c


def plonk_new(params: PlonkParams = TOY_PLONK, *, secret: int, n_srs: int,
              h_len: int, srs_mode: str = "reference",
              use_pippenger: bool = False,
              commit_mode: str = "naive") -> PlonkContext:
    Fq = make_field(params.curve.base)
    srs = srs_create(Fq, params.curve, secret, n_srs, mode=srs_mode)
    return PlonkContext(params=params, srs=srs, h_len=h_len,
                        use_pippenger=use_pippenger, commit_mode=commit_mode)


def sigma_to_roots(ctx: PlonkContext, copy: jnp.ndarray) -> jnp.ndarray:
    """copy_constraints_to_roots (src/plonk.h:142-160): (n, 2) array of
    (COPYOF tag, 1-based index) -> sigma values, as one gather."""
    h, k1_h, k2_h = ctx.domains_host()
    table = jnp.asarray(np.stack([h, k1_h, k2_h]))   # (3, n)
    tag = copy[:, 0]
    idx = copy[:, 1] - 1
    return table[tag, idx]


def _commit(ctx: PlonkContext, coeffs: jnp.ndarray) -> G1:
    Fq = ctx.Fq
    if ctx.commit_mode == "table":
        from .srs import srs_multiple_table, srs_commit_table
        # cached ON the context (id()-keyed dicts alias after GC and would
        # serve a table built from a different SRS; ADVICE round 1)
        tbl = getattr(ctx, "_multiple_table", None)
        if tbl is None:
            tbl = srs_multiple_table(Fq, ctx.srs.g1s, ctx.params.field.p)
            object.__setattr__(ctx, "_multiple_table", tbl)
        return srs_commit_table(Fq, tbl, coeffs)
    if ctx.use_pippenger:
        L = min(coeffs.shape[-1], ctx.srs.length)
        g1s = ctx.srs.g1s
        pts = G1(g1s.x[:L], g1s.y[:L], g1s.inf[:L])
        nb = max(ctx.params.field.p.bit_length(), 2)
        return msm_pippenger(Fq, pts, coeffs[:L], window_bits=min(nb, 8),
                             scalar_bits=nb)
    return srs_commit_naive(Fq, ctx.srs.g1s, coeffs,
                            scalar_bits=ctx.params.field.p.bit_length())


def _srs_fit(coeffs: jnp.ndarray, srs_len: int) -> jnp.ndarray:
    """True iff every coefficient beyond the SRS length is zero (the
    reference exits when the effective degree exceeds the SRS,
    src/srs.h:54-56)."""
    if coeffs.shape[-1] <= srs_len:
        return jnp.asarray(True)
    return jnp.all(coeffs[..., srs_len:] == 0)


def prove(ctx: PlonkContext, cons: Constraints, asg: Assignments,
          challenge, rand9, dialect: str = "reference"
          ) -> tuple[Proof, Diagnostics]:
    """The full 5-round prover on host-side circuit objects. `challenge` =
    [alpha, beta, gamma, z, v] (src/plonk.h:16-22), `rand9` = blinding
    scalars b1..b9."""
    sel = cons.selectors_device()
    selectors = jnp.stack([sel["q_l"], sel["q_r"], sel["q_o"], sel["q_m"],
                           sel["q_c"]])
    copies = jnp.stack([jnp.asarray(cons.c_a), jnp.asarray(cons.c_b),
                        jnp.asarray(cons.c_c)])
    a_w, b_w, c_w = asg.device()
    return prove_core(ctx, selectors, copies, a_w, b_w, c_w, challenge,
                      rand9, dialect=dialect)


def prove_core(ctx: PlonkContext, selectors: jnp.ndarray,
               copies: jnp.ndarray, a_w: jnp.ndarray, b_w: jnp.ndarray,
               c_w: jnp.ndarray, challenge, rand9, dialect: str = "reference"
               ) -> tuple[Proof, Diagnostics]:
    """Pure-tensor prover core (jit/vmap/pjit-friendly).

    selectors: (5, n) uint32 rows [q_l, q_r, q_o, q_m, q_c];
    copies: (3, n, 2) int (COPYOF tag, 1-based index) rows [c_a, c_b, c_c];
    a_w/b_w/c_w: (n,) uint32 wire values.

    dialect: "reference" replicates the reference's linearization r(x)
    bit-exactly — including its nonstandard quadratic r3 term z_x * sigma_3
    (src/plonk.h:563-570) and missing q_c/constant terms, which make the
    proof UNVERIFIABLE from commitments (consistent with the reference
    shipping no verifier, SURVEY §2.2.2). "standard" computes the PLONK
    paper's degree-1 linearization so models/verifier.py can check the
    proof with two pairings; the proof layout is identical."""
    Fr = ctx.Fr
    pp = ctx.params
    r = pp.field.p
    n = a_w.shape[-1]
    h_len = ctx.h_len
    assert n == h_len, "reference prover assumes num_constraints == h_len"
    omega, k1, k2 = pp.omega, pp.k1, pp.k2

    challenge = jnp.asarray(challenge, dtype=U32)
    rand9 = jnp.asarray(rand9, dtype=U32)
    alpha, beta, gamma, z, v = (challenge[i] for i in range(5))

    sel = {"q_l": selectors[0], "q_r": selectors[1], "q_o": selectors[2],
           "q_m": selectors[3], "q_c": selectors[4]}

    # step 1: witness check (src/plonk.h:231)
    lhs = Fr.add(
        Fr.add(Fr.mul(sel["q_l"], a_w), Fr.mul(sel["q_r"], b_w)),
        Fr.add(Fr.mul(sel["q_o"], c_w),
               Fr.add(Fr.mul(sel["q_m"], Fr.mul(a_w, b_w)), sel["q_c"])))
    satisfied = jnp.all(lhs == 0)

    # step 2: sigma mappings (src/plonk.h:254-256)
    sigma_1 = sigma_to_roots(ctx, copies[0])
    sigma_2 = sigma_to_roots(ctx, copies[1])
    sigma_3 = sigma_to_roots(ctx, copies[2])

    # step 3: 11 interpolations as one batched INTT (src/plonk.h:265-275)
    stacked = jnp.stack([a_w, b_w, c_w, sel["q_o"], sel["q_m"], sel["q_l"],
                         sel["q_r"], sel["q_c"], sigma_1, sigma_2, sigma_3])
    polys = N.interpolate(Fr, stacked, omega)
    (f_a_x, f_b_x, f_c_x, q_o_x, q_m_x, q_l_x, q_r_x, q_c_x,
     s_sigma_1, s_sigma_2, s_sigma_3) = (polys[i] for i in range(11))

    z_h_x = jnp.asarray(ctx.z_h_coeffs())

    # round 1: blinded wire polynomials + commitments (src/plonk.h:279-301)
    def blind2(b_hi, b_lo, f):
        blind = jnp.stack([b_lo, b_hi])
        return P.padd(Fr, P.pmul_school(Fr, blind, z_h_x), f)

    a_x = blind2(rand9[0], rand9[1], f_a_x)   # len n+2
    b_x = blind2(rand9[2], rand9[3], f_b_x)
    c_x = blind2(rand9[4], rand9[5], f_c_x)
    a_s = _commit(ctx, a_x)
    b_s = _commit(ctx, b_x)
    c_s = _commit(ctx, c_x)

    # round 2: permutation grand product (src/plonk.h:320-379)
    h_np, _, _ = ctx.domains_host()
    omega_pows_n = jnp.asarray(h_np)                     # omega^0..omega^{n-1}
    w_i = omega_pows_n[:n - 1]                           # omega^{i-1}, i=1..n-1
    aa, bb, cc = a_w[:n - 1], b_w[:n - 1], c_w[:n - 1]
    k1c, k2c = Fr.const(k1), Fr.const(k2)

    def lin(wv, shift):
        return Fr.add(Fr.mul(beta, Fr.mul(shift, wv)), gamma)

    denom = Fr.mul(
        Fr.mul(Fr.add(aa, lin(w_i, Fr.ones())),
               Fr.add(bb, lin(w_i, k1c))),
        Fr.add(cc, lin(w_i, k2c)))
    # sigma polys interpolate the sigma vectors on H, so their evals at
    # omega^{i-1} are just the vectors (the reference re-evaluates them by
    # Horner every step, src/plonk.h:345-347)
    numer = Fr.mul(
        Fr.mul(Fr.add(aa, Fr.add(Fr.mul(beta, sigma_1[:n - 1]), gamma)),
               Fr.add(bb, Fr.add(Fr.mul(beta, sigma_2[:n - 1]), gamma))),
        Fr.add(cc, Fr.add(Fr.mul(beta, sigma_3[:n - 1]), gamma)))
    fractions = Fr.div(denom, numer)
    acc = jnp.concatenate([Fr.ones((1,)).astype(U32),
                           jax.lax.associative_scan(Fr.mul, fractions)])
    acc_x = N.interpolate(Fr, acc, omega)
    omega_n = Fr.const(pow(omega, n, r))
    acc_ok = P.peval(Fr, acc_x, omega_n) == Fr.ones()

    z_blind = jnp.stack([rand9[8], rand9[7], rand9[6]])
    z_x = P.padd(Fr, P.pmul_school(Fr, z_blind, z_h_x), acc_x)  # len n+3
    z_s = _commit(ctx, z_x)

    # round 3: quotient t(x) (src/plonk.h:385-524)
    e0 = jnp.zeros((h_len,), U32).at[0].set(1)
    l_1_x = N.interpolate(Fr, e0, omega)
    # public inputs: PI(x) = 0 (src/plonk.h:396-398)

    T = 4 * n + 6
    t1 = P.padd(Fr, P.pmul_school(Fr, P.pmul_school(Fr, a_x, b_x), q_m_x),
                P.pmul_school(Fr, a_x, q_l_x))
    t1 = P.padd(Fr, t1, P.pmul_school(Fr, b_x, q_r_x))
    t1 = P.padd(Fr, t1, P.pmul_school(Fr, c_x, q_o_x))
    t1 = P.padd(Fr, t1, q_c_x)
    t1 = P.pad_to(t1, T)

    bxg = jnp.stack([gamma, beta])
    bk1g = jnp.stack([gamma, Fr.mul(beta, k1c)])
    bk2g = jnp.stack([gamma, Fr.mul(beta, k2c)])
    t2 = P.pmul_school(Fr, P.pscale(Fr, P.padd(Fr, a_x, bxg), alpha),
                       P.padd(Fr, b_x, bk1g))
    t2 = P.pmul_school(Fr, t2, P.padd(Fr, c_x, bk2g))
    t2 = P.pad_to(P.pmul_school(Fr, t2, z_x), T)

    omega_pows_z = jnp.asarray(
        np.array([pow(omega, i, r) for i in range(n + 3)], dtype=np.uint32))
    z_omega_x = Fr.mul(z_x, omega_pows_z)          # z(omega x): coeff twist
    as1 = P.padd_const(Fr, P.padd(Fr, a_x, P.pscale(Fr, s_sigma_1, beta)),
                       gamma)
    bs2 = P.padd_const(Fr, P.padd(Fr, b_x, P.pscale(Fr, s_sigma_2, beta)),
                       gamma)
    cs3 = P.padd_const(Fr, P.padd(Fr, c_x, P.pscale(Fr, s_sigma_3, beta)),
                       gamma)
    t3 = P.pmul_school(Fr, P.pscale(Fr, as1, alpha), bs2)
    t3 = P.pmul_school(Fr, t3, cs3)
    t3 = P.pad_to(P.pmul_school(Fr, t3, z_omega_x), T)

    z_minus_1 = P.padd_const(Fr, z_x, Fr.neg(Fr.ones()))
    alpha_sq = Fr.mul(alpha, alpha)
    t4 = P.pad_to(P.pmul_school(Fr, P.pscale(Fr, z_minus_1, alpha_sq),
                                l_1_x), T)

    t_numer = P.padd(Fr, P.psub(Fr, P.padd(Fr, t1, t2), t3), t4)
    t_x, t_rem = P.divide_by_vanishing(Fr, t_numer, n)   # len 3n+6
    t_rem_zero = jnp.all(t_rem == 0)

    # round 3 split + commitments (src/plonk.h:513-524)
    part = n + 2
    t_lo_x = t_x[..., :part]
    t_mid_x = t_x[..., part:2 * part]
    t_hi_x = t_x[..., 2 * part:]
    t_lo_s = _commit(ctx, t_lo_x)
    t_mid_s = _commit(ctx, t_mid_x)
    t_hi_s = _commit(ctx, t_hi_x)

    # round 4: evaluations at z + linearization (src/plonk.h:527-574)
    a_z = P.peval(Fr, a_x, z)
    b_z = P.peval(Fr, b_x, z)
    c_z = P.peval(Fr, c_x, z)
    s_sigma_1_z = P.peval(Fr, s_sigma_1, z)
    s_sigma_2_z = P.peval(Fr, s_sigma_2, z)
    t_z = P.peval(Fr, t_x, z)
    z_omega_z = P.peval(Fr, z_omega_x, z)

    r_1_x = P.pscale(Fr, q_m_x, Fr.mul(a_z, b_z))
    r_1_x = P.padd(Fr, r_1_x, P.pscale(Fr, q_l_x, a_z))
    r_1_x = P.padd(Fr, r_1_x, P.pscale(Fr, q_r_x, b_z))
    r_1_x = P.padd(Fr, r_1_x, P.pscale(Fr, q_o_x, c_z))

    azg = Fr.add(Fr.add(a_z, Fr.mul(beta, z)), gamma)
    bzg = Fr.add(Fr.add(b_z, Fr.mul(Fr.mul(beta, k1c), z)), gamma)
    czg = Fr.add(Fr.add(c_z, Fr.mul(Fr.mul(beta, k2c), z)), gamma)
    r_2_x = P.pscale(Fr, z_x, Fr.mul(Fr.mul(Fr.mul(azg, bzg), czg), alpha))

    as1z = Fr.add(a_z, Fr.add(Fr.mul(beta, s_sigma_1_z), gamma))
    bs2z = Fr.add(b_z, Fr.add(Fr.mul(beta, s_sigma_2_z), gamma))
    l_1_z = P.peval(Fr, l_1_x, z)
    r_4_x = P.pscale(Fr, z_x, Fr.mul(l_1_z, alpha_sq))

    if dialect == "reference":
        # nonstandard quadratic term z_x * sigma_3 (src/plonk.h:558-570)
        s3bz = P.pscale(Fr, s_sigma_3, Fr.mul(beta, z_omega_z))
        r_3_x = P.pscale(Fr, P.pmul_school(Fr, z_x, s3bz),
                         Fr.mul(Fr.mul(as1z, bs2z), alpha))   # len 2n+2
        r_x = P.padd(Fr, P.padd(Fr, P.padd(Fr, r_1_x, r_2_x), r_3_x), r_4_x)
    elif dialect == "standard":
        # PLONK-paper linearization: degree-1 in committed polynomials, so
        # the verifier can rebuild [r] from the verification key.
        # r = r1 + q_c + r2 - alpha*as1z*bs2z*beta*z_omega_z * sigma_3 + r4
        r_1_x = P.padd(Fr, r_1_x, q_c_x)
        r_3_x = P.pscale(Fr, s_sigma_3,
                         Fr.mul(Fr.mul(Fr.mul(as1z, bs2z), alpha),
                                Fr.mul(beta, z_omega_z)))
        r_x = P.padd(Fr, P.psub(Fr, P.padd(Fr, r_1_x, r_2_x), r_3_x), r_4_x)
    else:
        raise ValueError(f"unknown dialect {dialect!r}")
    r_z = P.peval(Fr, r_x, z)

    # round 5: opening proofs (src/plonk.h:576-621)
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
    w_z_rem_zero = rem1 == 0

    z_shift = P.padd_const(Fr, z_x, Fr.neg(z_omega_z))
    zw = Fr.mul(z, Fr.const(omega))
    w_z_omega_x, rem2 = P.divide_by_linear(Fr, z_shift, zw)
    w_zw_rem_zero = rem2 == 0

    w_z_s = _commit(ctx, w_z_x_quo)
    w_z_omega_s = _commit(ctx, w_z_omega_x)

    srs_fit = jnp.stack([
        _srs_fit(c, ctx.srs.length) for c in
        (a_x, b_x, c_x, z_x, t_lo_x, t_mid_x, t_hi_x, w_z_x_quo,
         w_z_omega_x)]).all()

    proof = Proof(a_s=a_s, b_s=b_s, c_s=c_s, z_s=z_s, t_lo_s=t_lo_s,
                  t_mid_s=t_mid_s, t_hi_s=t_hi_s, w_z_s=w_z_s,
                  w_z_omega_s=w_z_omega_s, a_z=a_z, b_z=b_z, c_z=c_z,
                  s_sigma_1_z=s_sigma_1_z, s_sigma_2_z=s_sigma_2_z, r_z=r_z,
                  z_omega_z=z_omega_z)
    diags = Diagnostics(satisfied=satisfied, acc_ok=acc_ok,
                        t_rem_zero=t_rem_zero, w_z_rem_zero=w_z_rem_zero,
                        w_zw_rem_zero=w_zw_rem_zero, srs_fit=srs_fit)
    return proof, diags


def prove_checked(ctx, cons, asg, challenge, rand9,
                  dialect: str = "reference") -> Proof:
    """Non-jit wrapper that raises on any invariant failure, mirroring the
    reference's assert/exit behavior."""
    proof, d = prove(ctx, cons, asg, challenge, rand9, dialect=dialect)
    if not bool(d.satisfied):
        raise AssertionError("constraints not satisfied by assignments")
    if not bool(d.acc_ok):
        raise AssertionError("grand-product accumulator check failed")
    if not bool(d.t_rem_zero):
        raise AssertionError("non-zero remainder in t(x) division")
    if not (bool(d.w_z_rem_zero) and bool(d.w_zw_rem_zero)):
        raise AssertionError("non-zero remainder in opening division")
    if not bool(d.srs_fit):
        raise AssertionError("polynomial degree exceeds SRS size")
    return proof
