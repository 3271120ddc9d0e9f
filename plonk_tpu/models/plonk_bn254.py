"""PLONK over BN254 — the production-curve instantiation, end-to-end.

Same 5-round protocol as models/plonk_scaled.py (coset-evaluation
quotient, closed-form blinding/divisions, batched commitments), lifted to
254-bit multi-limb fields: scalars are BN254-Fr limb arrays
(ops/bigfield.py), commitments are BN254 G1 Pippenger MSMs
(ops/bigcurve.py), and verification runs REAL optimal-ate pairing checks
over the Fq12 tower (ops/bigpairing.py) — the production analog of the
reference's toy KZG pipeline (src/srs.h, src/plonk.h over F101/F17).

Shapes: a field element is a (limbs,) uint32 array of 16-bit words; a
polynomial is (n, limbs) with the coefficient axis at -2 (ops/bigpoly.py).
Witness/challenge inputs arrive as STANDARD-form word arrays; everything
internal is Montgomery form; the proof leaves standard-form.
"""
from __future__ import annotations

import dataclasses
import functools
import os
from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from ..utils.params import BN254_FR
from ..ops.bigfield import BigMontField, big_ntt, big_intt
from ..ops import bigpoly as BPol
from ..ops.bigcurve import (BN254_FQ, BigG1J, bn254_generator, big_jac_add,
                            big_jac_mul, big_jac_double, big_to_affine,
                            build_big_table, big_fixed_base_mul_many,
                            big_msm_pippenger_many, scalar_to_bits)
from ..ops import bigpairing as BPair
from ..ops.tower import (Fq2, Fq12, f12_mul, f12_conj, f12_eq,
                         f2_const)

U32 = jnp.uint32
FR_BITS = 254
FR_WORDS = 16


class BigG1Affine(NamedTuple):
    """Affine G1 batch, Montgomery-form coordinates + infinity mask."""
    x: jnp.ndarray
    y: jnp.ndarray
    inf: jnp.ndarray


class BN254SRS(NamedTuple):
    """KZG setup: g1s[i] = tau^i * G (Jacobian batch), g2_1 = H,
    g2_s = tau * H (affine twist coordinates). Reference: src/srs.h:11-16
    (with the intended — non-degenerate — base point)."""
    g1s: BigG1Affine
    g2_1x: Fq2
    g2_1y: Fq2
    g2_sx: Fq2
    g2_sy: Fq2
    length: int


class BN254Proof(NamedTuple):
    """9 G1 commitments (standard-form affine words) + 7 Fr evaluations
    (standard-form words) — the Proof struct of src/plonk.h:24-41 at
    254-bit scale."""
    a_s: BigG1Affine
    b_s: BigG1Affine
    c_s: BigG1Affine
    z_s: BigG1Affine
    t_lo_s: BigG1Affine
    t_mid_s: BigG1Affine
    t_hi_s: BigG1Affine
    w_z_s: BigG1Affine
    w_z_omega_s: BigG1Affine
    a_z: jnp.ndarray
    b_z: jnp.ndarray
    c_z: jnp.ndarray
    s_sigma_1_z: jnp.ndarray
    s_sigma_2_z: jnp.ndarray
    r_z: jnp.ndarray
    z_omega_z: jnp.ndarray


class BN254Diagnostics(NamedTuple):
    satisfied: jnp.ndarray
    t_tail_zero: jnp.ndarray
    w_z_rem_zero: jnp.ndarray
    w_zw_rem_zero: jnp.ndarray

    def all_ok(self):
        return jnp.all(jnp.stack([self.satisfied, self.t_tail_zero,
                                  self.w_z_rem_zero, self.w_zw_rem_zero]))


class BN254Prims(NamedTuple):
    """Pluggable heavy kernels of the BN254 prover — the production-curve
    sibling of plonk_scaled.ProverPrims. parallel/dist_bn254.py swaps in
    mesh-sharded implementations without touching protocol code.

    intt_n / ntt4n / intt4n: transforms over batch + (n or 4n, limbs),
    natural-order in/out for the intt_n pair; ntt4n may leave ANY fixed
    evaluation layout as long as intt4n consumes it and perm4n aligns
    position-indexed tables (the coset points) to it.
    grand_product: (F, fractions (n-1, limbs)) -> accumulator (n, limbs)
    = [1, prefix products...].
    commit_many: coefficient list -> BigG1Affine batch."""
    intt_n: object
    ntt4n: object
    intt4n: object
    grand_product: object
    commit_many: object
    perm4n: object


def use_bn254_pallas_ntt() -> bool:
    """Fused Pallas 16-limb coset transforms (ops/pallas_bigntt.py) for
    the BN254 4n domain instead of stage-at-a-time XLA butterflies.
    PLONK_TPU_BN254_NTT=pallas|xla overrides; default pallas on
    accelerators since the round-5 device run (parity green; fwd 12.1 ms
    vs XLA 22.1 ms at 2^14 x batch 10 — tools/bench_micro.py bigntt),
    XLA on CPU (the interpret-mode kernel is slower than the
    compile-small XLA butterflies there)."""
    flag = os.environ.get("PLONK_TPU_BN254_NTT")
    if flag is not None:
        return flag == "pallas"
    return jax.default_backend() != "cpu"


def _local_prims(ctx) -> BN254Prims:
    base = BN254Prims(
        intt_n=lambda F, x: big_intt(F, x, ctx.omega),
        ntt4n=lambda F, x: big_ntt(F, x, ctx.omega4),
        intt4n=lambda F, x: big_intt(F, x, ctx.omega4),
        grand_product=lambda F, fr: jnp.concatenate(
            [F.ones((1,)), BPol.prefix_prod_chunked(F, fr)]),
        commit_many=lambda coeffs: _commit_many(ctx, coeffs),
        perm4n=lambda tbl: tbl)
    if not use_bn254_pallas_ntt():
        return base
    from ..ops.pallas_bigntt import big_fused_ntt, big_fused_intt
    from ..ops.fused_ntt import scrambled_perm
    interp = jax.default_backend() == "cpu"
    return base._replace(
        ntt4n=lambda F, x: big_fused_ntt(F, x, ctx.omega4,
                                         interpret=interp),
        intt4n=lambda F, x: big_fused_intt(F, x, ctx.omega4,
                                           interpret=interp),
        perm4n=lambda tbl: tbl[np.asarray(scrambled_perm(len(tbl)))])


@dataclasses.dataclass(frozen=True)
class BN254Context:
    srs: BN254SRS
    n: int
    k1: int = 5           # generator of F_r^*: k1^n != 1 for any 2-power n
    k2: int = 25          # k2 = k1^2; k2/k1 = k1 not in H
    coset_shift: int = 5
    rolled: bool = False  # rolled CIOS in the prover (small-graph mode)

    def __post_init__(self):
        r = BN254_FR.p
        n = self.n
        if n & (n - 1) or n < 2:
            raise ValueError("n must be a power of two >= 2")
        if 4 * n > 1 << BN254_FR.two_adicity:
            raise ValueError("4n exceeds BN254-Fr's 2-adic domain")
        in_h = lambda x: pow(x % r, n, r) == 1
        if in_h(self.k1) or in_h(self.k2):
            raise ValueError("K1 or K2 is in H")
        if in_h(self.k2 * pow(self.k1, -1, r)):
            raise ValueError("K2 is in K1*H")
        if pow(self.coset_shift % r, 4 * n, r) == 1:
            raise ValueError("coset_shift is in the 4n domain")

    @property
    def Fr(self) -> BigMontField:
        return BigMontField(BN254_FR, rolled=self.rolled)

    @property
    def Fq(self) -> BigMontField:
        return BigMontField(BN254_FQ, rolled=self.rolled)

    @property
    def omega(self) -> int:
        return BN254_FR.root_of_unity(self.n)

    @property
    def omega4(self) -> int:
        # quotient coset domain 4n: t_numer (deg <= 4n+5) wraps, but the
        # pointwise division still yields t's exact evaluations and
        # deg t = 3n+5 < 4n, so the INTT recovers t exactly — half the
        # field-side traffic of an 8n domain (see plonk_scaled)
        return BN254_FR.root_of_unity(4 * self.n)


def _words_std(v: int, n_words: int = FR_WORDS) -> np.ndarray:
    return np.array([(v >> (16 * k)) & 0xFFFF for k in range(n_words)],
                    dtype=np.uint32)


def bn254_setup(n: int, secret: int = 20260817, rolled: bool = False,
                cache: bool = True) -> BN254Context:
    """Trusted setup: tau-power SRS over BN254 (the intended construction
    — the reference's degenerate-SRS bug, src/srs.h:27, is preserved only
    in the toy dialect; a production curve gets the real thing).

    The SRS is deterministic in (n, secret) and costs minutes of
    fixed-base EC work through the TPU tunnel, so the affine point table
    is disk-cached host-side (~/.cache/plonk_tpu) — the same pattern as
    the scaled prover's fixed-base table cache."""
    if cache:
        cdir = os.path.expanduser("~/.cache/plonk_tpu")
        os.makedirs(cdir, exist_ok=True)
        cpath = os.path.join(cdir, f"bn254_srs_n{n}_s{secret}.npz")
        if os.path.exists(cpath):
            z = np.load(cpath)
            # np.savez stacked each Fq2(c0, c1) namedtuple into a
            # (2, ...) array — rebuild the Fq2 wrappers on load (the raw
            # arrays crashed verify_bn254 on every cache-loaded SRS;
            # caught by tests/test_bn254_smoke.py round 5)
            fq2 = lambda a: Fq2(jnp.asarray(a[0]), jnp.asarray(a[1]))
            srs = BN254SRS(
                g1s=BigG1Affine(jnp.asarray(z["x"]), jnp.asarray(z["y"]),
                                jnp.asarray(z["inf"])),
                g2_1x=fq2(z["g2_1x"]), g2_1y=fq2(z["g2_1y"]),
                g2_sx=fq2(z["g2_sx"]), g2_sy=fq2(z["g2_sy"]),
                length=int(z["length"]))
            return BN254Context(srs=srs, n=n, rolled=rolled)
    r = BN254_FR.p
    # rolled field: the unrolled-CIOS scan bodies here are the XLA:CPU
    # superlinear-depth compile bomb (a >90 min jit_scan compile killed
    # two round-4 dryruns); rolled is bit-identical and compiles in
    # minutes on both backends
    Fq = BigMontField(BN254_FQ, rolled=True)
    tau = secret % r
    length = n + 5
    # scalar table tau^i mod r, host side
    pows = np.empty((length, FR_WORDS), dtype=np.uint32)
    cur = 1
    for i in range(length):
        pows[i] = _words_std(cur)
        cur = cur * tau % r
    gen = bn254_generator(Fq, shape=(1,))
    tbl = build_big_table(Fq, gen, window_bits=8, scalar_bits=FR_BITS)
    g1s_jac = jax.jit(lambda sw: big_fixed_base_mul_many(Fq, tbl, sw)
                      )(jnp.asarray(pows))
    x, y, inf = big_to_affine(Fq, g1s_jac)
    g1s = BigG1Affine(x=x, y=y, inf=inf)

    Fqp = BPair.pairing_field(rolled=True)
    g2 = BPair.g2_generator(Fqp)
    bits = jnp.asarray(scalar_to_bits(tau, FR_BITS))
    g2s = BPair.g2_mul_bits(Fqp, g2, bits, FR_BITS)
    g2_1x, g2_1y, _ = BPair.g2_to_affine(Fqp, g2)
    g2_sx, g2_sy, _ = BPair.g2_to_affine(Fqp, g2s)
    srs = BN254SRS(g1s=g1s, g2_1x=g2_1x, g2_1y=g2_1y, g2_sx=g2_sx,
                   g2_sy=g2_sy, length=length)
    if cache:
        tmp = cpath + ".tmp.npz"
        np.savez(tmp[:-4], x=np.asarray(x), y=np.asarray(y),
                 inf=np.asarray(inf), g2_1x=np.asarray(g2_1x),
                 g2_1y=np.asarray(g2_1y), g2_sx=np.asarray(g2_sx),
                 g2_sy=np.asarray(g2_sy), length=length)
        os.replace(tmp, cpath)
    return BN254Context(srs=srs, n=n, rolled=rolled)


# ---------- host tables ----------

def _pow_table_words(p: int, g: int, length: int) -> np.ndarray:
    out = np.empty((length, FR_WORDS), dtype=np.uint32)
    cur = 1
    for i in range(length):
        out[i] = _words_std(cur)
        cur = (cur * g) % p
    return out


@functools.lru_cache(maxsize=None)
def _host_tables(n: int, k1: int, k2: int, shift: int):
    """Montgomery-encoded domain tables, cached per (n, cosets)."""
    r = BN254_FR.p
    F = BigMontField(BN254_FR)
    omega = BN254_FR.root_of_unity(n)
    w8 = BN254_FR.root_of_unity(4 * n)
    m = 4 * n
    h_std = [pow(omega, i, r) for i in range(n)]
    enc = lambda xs: np.asarray(F.encode_host(np.array(xs, dtype=object)))
    tabs = dict(
        h=enc(h_std),
        k1h=enc([x * k1 % r for x in h_std]),
        k2h=enc([x * k2 % r for x in h_std]),
        shift_pows=enc([pow(shift, i, r) for i in range(m)]),
        inv_shift_pows=enc([pow(pow(shift, -1, r), i, r) for i in range(m)]),
        omega_pows=enc([pow(omega, i, r) for i in range(n + 3)]),
        coset_pts=enc([shift * pow(w8, i, r) % r for i in range(m)]),
        n_inv=enc([pow(n, -1, r)])[0],
    )
    return tabs


# ---------- the staged pipeline ----------


def precompute_bn254(ctx: BN254Context, selectors, copies,
                     prims: BN254Prims | None = None) -> dict:
    """Witness- and challenge-independent circuit tables: selector/sigma
    values, their 9 coefficient polynomials (q_o q_m q_l q_r q_c s1 s2 s3
    L1) and their 4n-coset evaluations, plus the INVERSE z_H coset row (a
    254-bit Fermat chain is ~380 CIOS multiplies per element — circuit-
    fixed, so it is paid once). A fixed circuit pays all of this ONCE:
    make_prover_bn254 computes it eagerly and threads it through as
    runtime arguments, cutting the per-proof transform stack from 12+16+1
    rows to 4+6 (the "preprocessed polynomials" of standard PLONK; the
    reference recomputes everything per proof, src/plonk.h:265-275).
    The sibling of plonk_scaled.precompute_circuit at 254-bit scale."""
    Fr = ctx.Fr
    n = ctx.n
    m = 4 * n
    tabs = _host_tables(n, ctx.k1, ctx.k2, ctx.coset_shift)
    prims = prims or _local_prims(ctx)

    sel = Fr.encode(jnp.asarray(selectors, U32))    # (5, n, limbs)
    table = jnp.stack([jnp.asarray(tabs["h"]), jnp.asarray(tabs["k1h"]),
                       jnp.asarray(tabs["k2h"])])
    copies = jnp.asarray(copies)
    sig = [table[copies[i, :, 0], copies[i, :, 1] - 1] for i in range(3)]
    sigma_v = jnp.stack(sig)

    # 9 interpolations: q_o q_m q_l q_r q_c s1 s2 s3 L1
    # (selector row order is q_l q_r q_o q_m q_c, src/constraints.h:35-47)
    e0 = jnp.zeros((n, Fr.limbs), U32).at[0].set(Fr.const(1))
    circ = jnp.stack([sel[2], sel[3], sel[0], sel[1], sel[4],
                      sigma_v[0], sigma_v[1], sigma_v[2], e0])
    polys = prims.intt_n(Fr, circ)

    shift_pows = jnp.asarray(tabs["shift_pows"])
    zh_coeffs = jnp.zeros((n + 1, Fr.limbs), U32)
    zh_coeffs = zh_coeffs.at[0].set(Fr.neg(Fr.const(1))).at[n].set(
        Fr.const(1))
    stack10 = jnp.stack([BPol.pad_to(polys[i], m) for i in range(9)]
                        + [BPol.pad_to(zh_coeffs, m)])
    evs = prims.ntt4n(Fr, Fr.mont_mul(stack10, shift_pows))
    # row 9 is stored INVERTED: t_e = t_num_e * zh_inv_e per proof
    circ_e = evs.at[9].set(Fr.inv(evs[9]))

    return dict(sel_v=sel, sigma_v=sigma_v,
                circ_x=polys,        # (9, n, limbs) coefficient polys
                circ_e=circ_e,       # (10, m, limbs): ..., l1, 1/zh
                h_mont=jnp.asarray(tabs["h"]))


def _stage_prep(ctx: BN254Context, a_w, b_w, c_w, rand9,
                prims: BN254Prims, pre: dict, public_inputs=None):
    """Encode, witness check, the 4 witness interpolations, round-1
    blinding (src/plonk.h:231-301 structure); circuit-fixed tables come
    from precompute_bn254."""
    Fr = ctx.Fr
    n = ctx.n

    rnd = Fr.encode(rand9)
    sel = pre["sel_v"]
    q_l_v, q_r_v, q_o_v, q_m_v, q_c_v = (sel[i] for i in range(5))
    a_v, b_v, c_v = Fr.encode(a_w), Fr.encode(b_w), Fr.encode(c_w)
    pi_v = (jnp.zeros((n, Fr.limbs), U32) if public_inputs is None
            else Fr.encode(public_inputs))

    lhs = Fr.add(
        Fr.add(Fr.add(Fr.mont_mul(q_l_v, a_v), Fr.mont_mul(q_r_v, b_v)),
               pi_v),
        Fr.add(Fr.mont_mul(q_o_v, c_v),
               Fr.add(Fr.mont_mul(q_m_v, Fr.mont_mul(a_v, b_v)), q_c_v)))
    satisfied = jnp.all(lhs == 0)

    stacked = jnp.stack([a_v, b_v, c_v, pi_v])
    polys = prims.intt_n(Fr, stacked)
    f_a_x, f_b_x, f_c_x, pi_x = (polys[i] for i in range(4))

    def blind2(b_hi, b_lo, f):
        out = jnp.zeros((n + 2, Fr.limbs), U32)
        out = out.at[0].set(Fr.neg(b_lo)).at[1].set(Fr.neg(b_hi))
        out = out.at[n].set(b_lo).at[n + 1].set(b_hi)
        return BPol.padd(Fr, out, f)

    cx = pre["circ_x"]
    return dict(
        rnd=rnd, a_v=a_v, b_v=b_v, c_v=c_v, satisfied=satisfied,
        sigma_1=pre["sigma_v"][0], sigma_2=pre["sigma_v"][1],
        sigma_3=pre["sigma_v"][2],
        q_o_x=cx[0], q_m_x=cx[1], q_l_x=cx[2], q_r_x=cx[3], q_c_x=cx[4],
        s_sigma_1=cx[5], s_sigma_2=cx[6], s_sigma_3=cx[7],
        l_1_x=cx[8], circ_e=pre["circ_e"],
        a_x=blind2(rnd[0], rnd[1], f_a_x),
        b_x=blind2(rnd[2], rnd[3], f_b_x),
        c_x=blind2(rnd[4], rnd[5], f_c_x),
        pi_x=pi_x, h_mont=pre["h_mont"])


def _stage_grand_product(ctx: BN254Context, st, beta, gamma,
                         prims: BN254Prims | None = None):
    Fr = ctx.Fr
    n = ctx.n
    tabs = _host_tables(n, ctx.k1, ctx.k2, ctx.coset_shift)
    w_i = st["h_mont"][:n - 1]
    k1c = Fr.const(ctx.k1)
    k2c = Fr.const(ctx.k2)
    aa, bb, cc = st["a_v"][:n - 1], st["b_v"][:n - 1], st["c_v"][:n - 1]
    bw = Fr.mont_mul(beta, w_i)
    denom = Fr.mont_mul(
        Fr.mont_mul(Fr.add(aa, Fr.add(bw, gamma)),
                    Fr.add(bb, Fr.add(Fr.mont_mul(k1c, bw), gamma))),
        Fr.add(cc, Fr.add(Fr.mont_mul(k2c, bw), gamma)))
    numer = Fr.mont_mul(
        Fr.mont_mul(
            Fr.add(aa, Fr.add(Fr.mont_mul(beta, st["sigma_1"][:n - 1]),
                              gamma)),
            Fr.add(bb, Fr.add(Fr.mont_mul(beta, st["sigma_2"][:n - 1]),
                              gamma))),
        Fr.add(cc, Fr.add(Fr.mont_mul(beta, st["sigma_3"][:n - 1]),
                          gamma)))
    # vanishing factors make the later t-division fail exactly like the
    # reference's remainder assert (src/plonk.h:506-510); the FS prover
    # retries on a fresh nonce (same contract as plonk_scaled)
    denominator_ok = jnp.logical_and(
        jnp.all(jnp.any(numer != 0, axis=-1)),
        jnp.all(jnp.any(denom != 0, axis=-1)))
    prims = prims or _local_prims(ctx)
    # batched Montgomery-trick inversion: one Fermat chain for the whole
    # column instead of n-1 (~380 CIOS muls each) — bit-identical values
    fractions = Fr.mont_mul(denom, BPol.batch_inv(Fr, numer))
    acc = prims.grand_product(Fr, fractions)
    acc_x = prims.intt_n(Fr, acc)

    rnd = st["rnd"]
    out = jnp.zeros((n + 3, Fr.limbs), U32)
    out = out.at[0].set(Fr.neg(rnd[8])).at[1].set(Fr.neg(rnd[7]))
    out = out.at[2].set(Fr.neg(rnd[6]))
    out = out.at[n].set(rnd[8]).at[n + 1].set(rnd[7])
    out = out.at[n + 2].set(rnd[6])
    return BPol.padd(Fr, out, acc_x), denominator_ok


def _stage_quotient(ctx: BN254Context, st, z_x, alpha, beta, gamma,
                    prims: BN254Prims | None = None):
    Fr = ctx.Fr
    n = ctx.n
    m = 4 * n
    tabs = _host_tables(n, ctx.k1, ctx.k2, ctx.coset_shift)
    shift_pows = jnp.asarray(tabs["shift_pows"])
    inv_shift_pows = jnp.asarray(tabs["inv_shift_pows"])
    omega_pows_z = jnp.asarray(tabs["omega_pows"])
    k1c, k2c = Fr.const(ctx.k1), Fr.const(ctx.k2)
    w8 = ctx.omega4

    z_omega_x = Fr.mont_mul(z_x, omega_pows_z[:z_x.shape[-2]])
    prims = prims or _local_prims(ctx)
    l_1_x = st["l_1_x"]
    # only the PER-PROOF rows ride the forward coset transform; the 10
    # circuit-fixed rows (selectors, sigmas, L1, 1/z_H) come precomputed
    stack6 = jnp.stack([BPol.pad_to(c, m) for c in
                        (st["a_x"], st["b_x"], st["c_x"], z_x, z_omega_x,
                         st["pi_x"])])
    evs = prims.ntt4n(Fr, Fr.mont_mul(stack6, shift_pows))
    a_e, b_e, c_e, z_e, zw_e, pi_e = (evs[i] for i in range(6))
    ce = st["circ_e"]
    (qo_e, qm_e, ql_e, qr_e, qc_e, s1_e, s2_e, s3_e, l1_e, zh_inv_e) = (
        ce[i] for i in range(10))

    pts = prims.perm4n(jnp.asarray(tabs["coset_pts"]))
    t1 = Fr.add(
        Fr.add(Fr.mont_mul(Fr.mont_mul(a_e, b_e), qm_e),
               Fr.add(Fr.mont_mul(a_e, ql_e), pi_e)),
        Fr.add(Fr.mont_mul(b_e, qr_e),
               Fr.add(Fr.mont_mul(c_e, qo_e), qc_e)))
    bpts = Fr.mont_mul(beta, pts)
    t2 = Fr.mont_mul(Fr.mont_mul(Fr.mont_mul(
        Fr.add(a_e, Fr.add(bpts, gamma)),
        Fr.add(b_e, Fr.add(Fr.mont_mul(k1c, bpts), gamma))),
        Fr.add(c_e, Fr.add(Fr.mont_mul(k2c, bpts), gamma))),
        Fr.mont_mul(alpha, z_e))
    t3 = Fr.mont_mul(Fr.mont_mul(Fr.mont_mul(
        Fr.add(a_e, Fr.add(Fr.mont_mul(beta, s1_e), gamma)),
        Fr.add(b_e, Fr.add(Fr.mont_mul(beta, s2_e), gamma))),
        Fr.add(c_e, Fr.add(Fr.mont_mul(beta, s3_e), gamma))),
        Fr.mont_mul(alpha, zw_e))
    alpha_sq = Fr.mont_mul(alpha, alpha)
    t4 = Fr.mont_mul(Fr.mont_mul(Fr.sub(z_e, Fr.const(1)), alpha_sq), l1_e)
    t_num_e = Fr.add(Fr.sub(Fr.add(t1, t2), t3), t4)
    t_e = Fr.mont_mul(t_num_e, zh_inv_e)
    t_full = Fr.mont_mul(prims.intt4n(Fr, t_e), inv_shift_pows)
    t_len = 3 * n + 6
    t_x = t_full[..., :t_len, :]
    t_tail_zero = jnp.all(t_full[..., t_len:, :] == 0)

    part = n + 2
    return dict(z_omega_x=z_omega_x, l_1_x=l_1_x, t_x=t_x,
                t_tail_zero=t_tail_zero,
                t_lo_x=t_x[..., :part, :],
                t_mid_x=t_x[..., part:2 * part, :],
                t_hi_x=t_x[..., 2 * part:, :])


def _stage_openings(ctx: BN254Context, st, q3, z_x, alpha, beta, gamma,
                    z, v):
    Fr = ctx.Fr
    n = ctx.n
    k1c, k2c = Fr.const(ctx.k1), Fr.const(ctx.k2)
    alpha_sq = Fr.mont_mul(alpha, alpha)
    s_sigma_1, s_sigma_2, s_sigma_3 = (st["s_sigma_1"], st["s_sigma_2"],
                                       st["s_sigma_3"])
    a_x, b_x, c_x = st["a_x"], st["b_x"], st["c_x"]

    peval = lambda c: BPol.peval(Fr, c, z)
    a_z, b_z, c_z = peval(a_x), peval(b_x), peval(c_x)
    s_sigma_1_z = peval(s_sigma_1)
    s_sigma_2_z = peval(s_sigma_2)
    t_z = peval(q3["t_x"])
    z_omega_z = peval(q3["z_omega_x"])

    r_x = BPol.pscale(Fr, st["q_m_x"], Fr.mont_mul(a_z, b_z))
    r_x = BPol.padd(Fr, r_x, BPol.pscale(Fr, st["q_l_x"], a_z))
    r_x = BPol.padd(Fr, r_x, BPol.pscale(Fr, st["q_r_x"], b_z))
    r_x = BPol.padd(Fr, r_x, BPol.pscale(Fr, st["q_o_x"], c_z))
    r_x = BPol.padd(Fr, r_x, st["q_c_x"])
    bz = Fr.mont_mul(beta, z)
    azg = Fr.add(Fr.add(a_z, bz), gamma)
    bzg = Fr.add(Fr.add(b_z, Fr.mont_mul(k1c, bz)), gamma)
    czg = Fr.add(Fr.add(c_z, Fr.mont_mul(k2c, bz)), gamma)
    r_x = BPol.padd(Fr, r_x, BPol.pscale(
        Fr, z_x, Fr.mont_mul(Fr.mont_mul(Fr.mont_mul(azg, bzg), czg),
                             alpha)))
    as1z = Fr.add(a_z, Fr.add(Fr.mont_mul(beta, s_sigma_1_z), gamma))
    bs2z = Fr.add(b_z, Fr.add(Fr.mont_mul(beta, s_sigma_2_z), gamma))
    r_x = BPol.psub(Fr, r_x, BPol.pscale(
        Fr, s_sigma_3,
        Fr.mont_mul(Fr.mont_mul(Fr.mont_mul(as1z, bs2z), alpha),
                    Fr.mont_mul(beta, z_omega_z))))
    l_1_z = peval(q3["l_1_x"])
    r_x = BPol.padd(Fr, r_x, BPol.pscale(
        Fr, z_x, Fr.mont_mul(l_1_z, alpha_sq)))
    r_z = BPol.peval(Fr, r_x, z)

    z_pow_part = Fr.pow_static_rolled(z, n + 2)
    z_pow_2part = Fr.mont_mul(z_pow_part, z_pow_part)
    w = BPol.padd(Fr, q3["t_lo_x"],
                  BPol.pscale(Fr, q3["t_mid_x"], z_pow_part))
    w = BPol.padd(Fr, w, BPol.pscale(Fr, q3["t_hi_x"], z_pow_2part))
    w = BPol.padd_const(Fr, w, Fr.neg(t_z))

    vpow = [Fr.const(1), v]
    for _ in range(5):
        vpow.append(Fr.mont_mul(vpow[-1], v))

    def open_term(poly, eval_at_z, k):
        shifted = BPol.padd_const(Fr, poly.astype(U32),
                                  Fr.neg(eval_at_z))
        return BPol.pscale(Fr, shifted, vpow[k])

    w = BPol.padd(Fr, w, open_term(r_x, r_z, 1))
    w = BPol.padd(Fr, w, open_term(a_x, a_z, 2))
    w = BPol.padd(Fr, w, open_term(b_x, b_z, 3))
    w = BPol.padd(Fr, w, open_term(c_x, c_z, 4))
    w = BPol.padd(Fr, w, open_term(s_sigma_1, s_sigma_1_z, 5))
    w = BPol.padd(Fr, w, open_term(s_sigma_2, s_sigma_2_z, 6))

    w_z_x_quo, rem1 = BPol.divide_by_linear(Fr, w, z)
    z_shift = BPol.padd_const(Fr, z_x, Fr.neg(z_omega_z))
    zw = Fr.mont_mul(z, Fr.const(ctx.omega))
    w_z_omega_x, rem2 = BPol.divide_by_linear(Fr, z_shift, zw)
    return dict(a_z=a_z, b_z=b_z, c_z=c_z, s_sigma_1_z=s_sigma_1_z,
                s_sigma_2_z=s_sigma_2_z, r_z=r_z, z_omega_z=z_omega_z,
                w_z_x_quo=w_z_x_quo, w_z_omega_x=w_z_omega_x,
                rem1=jnp.all(rem1 == 0), rem2=jnp.all(rem2 == 0))


def use_bn254_fixed_base() -> bool:
    """Fixed-base window-table commitments for the BN254 prover: default
    ON for accelerators (the per-proof Pippenger path re-pays an argsort
    + a sequential 255-step bucket reduction per window, while the SRS is
    fixed across proofs — the same economics that took the scaled prover
    156 -> 7.7 ms). PLONK_TPU_BN254_FB=0/1 overrides; CPU keeps Pippenger
    (the table build would dominate the test-suite compile budget)."""
    flag = os.environ.get("PLONK_TPU_BN254_FB")
    if flag is not None:
        return flag == "1"
    return jax.default_backend() != "cpu"


def use_bn254_pallas_commit() -> bool:
    """Fused Pallas sweep+tree kernel over the 16-limb field
    (ops/pallas_bigmsm.py) instead of the XLA select sweep. Default ON on
    accelerators (device sweep, BENCH_NOTES round 4); PLONK_TPU_BN254_
    PALLAS_MSM=0/1 overrides. CPU: interpret mode exists but the XLA
    paths stay the default."""
    flag = os.environ.get("PLONK_TPU_BN254_PALLAS_MSM")
    if flag is not None:
        return flag == "1"
    return jax.default_backend() != "cpu"


def bn254_fb_window_bits() -> int:
    return int(os.environ.get("PLONK_TPU_BN254_FB_WB", "4"))


def bn254_fixed_base_table(ctx: BN254Context):
    """SRS window-multiple table for fixed-base BN254 commitments, built
    once per (SRS, window_bits) and cached on the ctx + on disk (the
    build is ~4M Jacobian adds + a batched affine conversion — minutes
    through the tunnel; the npz is ~570 MB at 2^12). Returned canonical
    layout: (n_windows, n_buckets, L, limbs) Montgomery affine words."""
    from ..ops.bigcurve import BigFixedBaseTable, build_big_table
    wb = bn254_fb_window_bits()
    tables = getattr(ctx, "_bn254_fb_tables", None)
    if tables is None:
        tables = {}
        object.__setattr__(ctx, "_bn254_fb_tables", tables)
    tbl = tables.get(wb)
    if tbl is not None:
        return tbl
    Fq = ctx.Fq
    g1s = ctx.srs.g1s
    import hashlib
    h = hashlib.blake2b(digest_size=16)
    h.update(np.asarray(g1s.x).tobytes())
    h.update(str((ctx.srs.length, wb)).encode())
    root = os.environ.get("PLONK_TPU_CACHE",
                          os.path.expanduser("~/.cache/plonk_tpu"))
    path = os.path.join(root, f"bn254_fbtbl_{h.hexdigest()}.npz")
    if os.path.exists(path):
        try:
            z = np.load(path)
            tbl = BigFixedBaseTable(x=jnp.asarray(z["x"]),
                                    y=jnp.asarray(z["y"]),
                                    inf=jnp.asarray(z["inf"]),
                                    window_bits=wb)
            tables[wb] = tbl
            return tbl
        except Exception:
            pass
    # Build with the UNROLLED CIOS field in point-axis chunks: the
    # rolled mont_mul_vec materializes a (lanes, 16, 16) partial-product
    # tensor per multiply — ~4 GB per mul during the batched affine
    # conversion at 2^12, which faults the TPU (measured round 4). A
    # fixed chunk shape also means ONE compiled graph reused across
    # chunks; the result is host-assembled and disk-cached.
    Fb = BigMontField(BN254_FQ)
    chunk = min(1024, g1s.x.shape[0])
    L_all = g1s.x.shape[0]
    n_chunks = -(-L_all // chunk)
    build = jax.jit(lambda p: build_big_table(
        Fb, p, window_bits=wb, scalar_bits=FR_BITS))
    xs, ys, infs = [], [], []
    one = jnp.broadcast_to(Fb.const(1), (chunk, Fb.limbs))
    for ci in range(n_chunks):
        lo = ci * chunk
        sl = lambda a: a[lo:lo + chunk]
        cx, cy, cinf = sl(g1s.x), sl(g1s.y), sl(g1s.inf)
        if cx.shape[0] < chunk:      # pad the tail chunk (same graph)
            pad = [(0, chunk - cx.shape[0]), (0, 0)]
            cx = jnp.pad(cx, pad)
            cy = jnp.pad(cy, pad)
            cinf = jnp.pad(cinf, [(0, chunk - cinf.shape[0])],
                           constant_values=True)
        Z = jnp.where(cinf[..., None], jnp.zeros_like(one), one)
        pts = BigG1J(jnp.where(cinf[..., None], one, cx),
                     jnp.where(cinf[..., None], one, cy), Z)
        part = build(pts)
        xs.append(np.asarray(part.x))
        ys.append(np.asarray(part.y))
        infs.append(np.asarray(part.inf))
    cat = lambda ps: np.concatenate(ps, axis=2)[:, :, :L_all]
    tbl = BigFixedBaseTable(x=jnp.asarray(cat(xs)), y=jnp.asarray(cat(ys)),
                            inf=jnp.asarray(cat(infs)), window_bits=wb)
    try:
        os.makedirs(root, exist_ok=True)
        tmp = path + ".tmp.npz"
        np.savez(tmp[:-4], x=np.asarray(tbl.x), y=np.asarray(tbl.y),
                 inf=np.asarray(tbl.inf))
        os.replace(tmp, path)
    except Exception:
        pass
    tables[wb] = tbl
    return tbl


def bn254_table_commit(ctx: BN254Context, table):
    """commit_many bound to an EXPLICIT table pytree (possibly a tracer):
    make_prover_bn254 threads the ~570 MB table as a RUNTIME argument —
    a closure constant would be baked into the compiled payload and the
    remote-compile tunnel rejects ~GB programs with HTTP 413 (the
    plonk_scaled.table_commit rule at 254-bit scale)."""
    from ..ops.bigcurve import big_msm_fixed_base_many
    Fr = ctx.Fr
    # rolled field for the commit trees regardless of ctx mode: 18
    # unrolled tree levels are a ~400k-HLO compile bomb (round 4)
    Fq = BigMontField(BN254_FQ, rolled=True)
    L = ctx.srs.length
    pallas = use_bn254_pallas_commit()

    # The XLA select sweep materializes ~2 GB of (B, W, L, limbs)
    # accumulators at 2^12 and crashes the remote-compile helper
    # (HTTP 500, BENCH_NOTES round 4) — on accelerators at production
    # sizes it is NOT a viable fallback, so route around it (VERDICT r4
    # item 8: no crashing path reachable from default switches). The
    # fallback order on device is: Pallas kernel, else GLV Pippenger.
    fb_select_viable = (jax.default_backend() == "cpu" or L < 2048)

    def commit(coeff_list) -> BigG1Affine:
        padded = jnp.stack([BPol.pad_to(c, L)[..., :L, :]
                            for c in coeff_list])
        scalars = Fr.decode(padded)              # (B, L, words) standard
        if pallas:
            from ..ops.pallas_bigmsm import big_commit_many_pallas
            out = big_commit_many_pallas(
                Fq, table, scalars,
                interpret=jax.default_backend() == "cpu")
        elif fb_select_viable:
            out = big_msm_fixed_base_many(Fq, table, scalars)
        else:
            return _commit_many(ctx, coeff_list)
        x, y, inf = big_to_affine(Fq, out)
        return BigG1Affine(x=x, y=y, inf=inf)

    return commit


def _commit_many(ctx: BN254Context, coeff_list) -> BigG1Affine:
    """One batched MSM for all commitments. Default path: GLV
    endomorphism split (ops/glv.py) — half the Pippenger windows for the
    same bucket work, ~1.9x less EC work, group-identical points
    (PLONK_TPU_BN254_GLV=0 falls back to the plain 254-bit walk)."""
    Fr, Fq = ctx.Fr, ctx.Fq
    L = ctx.srs.length
    padded = jnp.stack([BPol.pad_to(c, L)[..., :L, :] for c in coeff_list])
    scalars = Fr.decode(padded)                   # standard-form words
    g1s = ctx.srs.g1s
    one = jnp.broadcast_to(Fq.const(1), g1s.x.shape)
    Z = jnp.where(g1s.inf[..., None], jnp.zeros_like(one), one)
    pts = BigG1J(jnp.where(g1s.inf[..., None], one, g1s.x),
                 jnp.where(g1s.inf[..., None], one, g1s.y), Z)
    if os.environ.get("PLONK_TPU_BN254_GLV", "1") != "0":
        from ..ops.glv import big_msm_glv_many
        out = big_msm_glv_many(Fq, pts, scalars, window_bits=8)
    else:
        out = big_msm_pippenger_many(Fq, pts, scalars, window_bits=8,
                                     scalar_bits=FR_BITS)
    x, y, inf = big_to_affine(Fq, out)
    return BigG1Affine(x=x, y=y, inf=inf)


def prove_bn254(ctx: BN254Context, selectors, copies, a_w, b_w, c_w,
                challenge, rand9, public_inputs=None,
                prims: BN254Prims | None = None, pre: dict | None = None
                ) -> tuple[BN254Proof, BN254Diagnostics]:
    """BN254 5-round prover. Inputs in STANDARD form as 16-bit-word
    arrays: selectors (5, n, 16), copies (3, n, 2) int32, witness columns
    (n, 16), challenge (5, 16) [alpha beta gamma z v], rand9 (9, 16).
    Jittable; wrap in jax.jit with ctx closed over.

    `pre` takes precompute_bn254's output to skip the circuit-fixed
    transforms (make_prover_bn254 threads it as runtime arguments); when
    None the same tables are computed inline — identical Proof either
    way."""
    Fr = ctx.Fr
    ch = Fr.encode(jnp.asarray(challenge, U32))
    alpha, beta, gamma, z, v = (ch[i] for i in range(5))

    prims = prims or _local_prims(ctx)
    if pre is None:
        pre = precompute_bn254(ctx, selectors, copies, prims)
    st = _stage_prep(ctx, jnp.asarray(a_w, U32),
                     jnp.asarray(b_w, U32), jnp.asarray(c_w, U32),
                     jnp.asarray(rand9, U32), prims, pre,
                     None if public_inputs is None
                     else jnp.asarray(public_inputs, U32))
    z_x, _den_ok = _stage_grand_product(ctx, st, beta, gamma, prims)
    q3 = _stage_quotient(ctx, st, z_x, alpha, beta, gamma, prims)
    q5 = _stage_openings(ctx, st, q3, z_x, alpha, beta, gamma, z, v)

    cms = prims.commit_many([st["a_x"], st["b_x"], st["c_x"], z_x,
                             q3["t_lo_x"], q3["t_mid_x"], q3["t_hi_x"],
                             q5["w_z_x_quo"], q5["w_z_omega_x"]])
    Fq = ctx.Fq
    pick = lambda i: BigG1Affine(Fq.decode(cms.x[i]), Fq.decode(cms.y[i]),
                                 cms.inf[i])
    dec = Fr.decode
    proof = BN254Proof(
        a_s=pick(0), b_s=pick(1), c_s=pick(2), z_s=pick(3),
        t_lo_s=pick(4), t_mid_s=pick(5), t_hi_s=pick(6),
        w_z_s=pick(7), w_z_omega_s=pick(8),
        a_z=dec(q5["a_z"]), b_z=dec(q5["b_z"]), c_z=dec(q5["c_z"]),
        s_sigma_1_z=dec(q5["s_sigma_1_z"]),
        s_sigma_2_z=dec(q5["s_sigma_2_z"]),
        r_z=dec(q5["r_z"]), z_omega_z=dec(q5["z_omega_z"]))
    diags = BN254Diagnostics(satisfied=st["satisfied"],
                             t_tail_zero=q3["t_tail_zero"],
                             w_z_rem_zero=q5["rem1"],
                             w_zw_rem_zero=q5["rem2"])
    return proof, diags


def make_prover_bn254(ctx: BN254Context, selectors, copies,
                      prims: BN254Prims | None = None):
    """Compile-once BN254 prover for a fixed circuit: returns
    fn(a_w, b_w, c_w, challenge, rand9, public_inputs=None) ->
    (BN254Proof, BN254Diagnostics). The circuit tables
    (precompute_bn254) are computed eagerly once and threaded through as
    RUNTIME arguments — closure constants would be baked into the
    compiled payload (the scaled prover's make_prover pattern; the
    remote-compile tunnel rejects ~GB programs with HTTP 413)."""
    from ..ops.bigcurve import BigFixedBaseTable
    base = prims if prims is not None else _local_prims(ctx)
    fb = prims is None and use_bn254_fixed_base()
    tbl = bn254_fixed_base_table(ctx) if fb else None
    sel = jnp.asarray(selectors, U32)
    cps = jnp.asarray(copies)
    pre = jax.jit(lambda s, c: precompute_bn254(ctx, s, c, base))(sel, cps)
    pre = jax.tree_util.tree_map(jax.block_until_ready, pre)
    n = ctx.n

    def run(tx, ty, tinf, pre_, a_w, b_w, c_w, ch, rnd, pi):
        pr = base
        if fb:
            pr = base._replace(commit_many=bn254_table_commit(
                ctx, BigFixedBaseTable(tx, ty, tinf, tbl.window_bits)))
        return prove_bn254(ctx, sel, cps, a_w, b_w, c_w, ch, rnd,
                           public_inputs=pi, prims=pr, pre=pre_)

    jf = jax.jit(run)
    z0 = jnp.zeros((0,), U32)
    targs = (tbl.x, tbl.y, tbl.inf) if fb else (z0, z0, z0)

    def fn(a_w, b_w, c_w, ch, rnd, public_inputs=None):
        pi = (jnp.zeros((n, FR_WORDS), U32) if public_inputs is None
              else jnp.asarray(public_inputs, U32))
        return jf(*targs, pre, jnp.asarray(a_w, U32),
                  jnp.asarray(b_w, U32), jnp.asarray(c_w, U32),
                  jnp.asarray(ch, U32), jnp.asarray(rnd, U32), pi)

    return fn


# ---------------- verifier ----------------


class BN254VK(NamedTuple):
    q_m_s: BigG1Affine
    q_l_s: BigG1Affine
    q_r_s: BigG1Affine
    q_o_s: BigG1Affine
    q_c_s: BigG1Affine
    s1_s: BigG1Affine
    s2_s: BigG1Affine
    s3_s: BigG1Affine


def make_vk_bn254(ctx: BN254Context, selectors, copies,
                  prims: "BN254Prims | None" = None) -> BN254VK:
    Fr = ctx.Fr
    tabs = _host_tables(ctx.n, ctx.k1, ctx.k2, ctx.coset_shift)
    table = jnp.stack([jnp.asarray(tabs["h"]), jnp.asarray(tabs["k1h"]),
                       jnp.asarray(tabs["k2h"])])
    copies = jnp.asarray(copies)
    sig = [table[copies[i, :, 0], copies[i, :, 1] - 1] for i in range(3)]
    sel = Fr.encode(jnp.asarray(selectors, U32))
    stacked = jnp.stack([sel[3], sel[0], sel[1], sel[2], sel[4]] + sig)
    prims = prims or _local_prims(ctx)
    polys = prims.intt_n(Fr, stacked)
    cms = _commit_many(ctx, [polys[i] for i in range(8)])
    Fq = ctx.Fq
    pick = lambda i: BigG1Affine(Fq.decode(cms.x[i]), Fq.decode(cms.y[i]),
                                 cms.inf[i])
    return BN254VK(*[pick(i) for i in range(8)])


def _aff_to_jac(Fq, p: BigG1Affine, mont: bool = False) -> BigG1J:
    """Standard-form affine (or Montgomery if mont=True) -> Jacobian."""
    x = p.x if mont else Fq.encode(p.x)
    y = p.y if mont else Fq.encode(p.y)
    one = jnp.broadcast_to(Fq.const(1), x.shape)
    Z = jnp.where(p.inf[..., None], jnp.zeros_like(one), one)
    return BigG1J(jnp.where(p.inf[..., None], one, x),
                  jnp.where(p.inf[..., None], one, y), Z)


def _std_bits(words: jnp.ndarray, nbits: int = FR_BITS) -> jnp.ndarray:
    """(.., n_words) standard 16-bit words -> (..., nbits) bit array."""
    idx = jnp.arange(nbits)
    w = words[..., idx // 16]
    return (w >> (idx % 16).astype(U32)) & 1


def _g1_mul_std(Fq, p: BigG1J, scalar_words) -> BigG1J:
    return big_jac_mul(Fq, p, _std_bits(scalar_words), FR_BITS)


def _pairing_ratio_flags(ctx: BN254Context, w1, nr1, w2, nr2):
    """Second verify stage: 4-lane Miller ratio + one batched final
    exponentiation over the reduced points -> (ok1, ok2)."""
    Fp = BPair.pairing_field(rolled=True)
    srs = ctx.srs
    st = lambda xs: jnp.stack(xs)
    lanes = BigG1J(st([w1.X, nr1.X, w2.X, nr2.X]),
                   st([w1.Y, nr1.Y, w2.Y, nr2.Y]),
                   st([w1.Z, nr1.Z, w2.Z, nr2.Z]))
    st2 = lambda cs: Fq2(st([c.c0 for c in cs]), st([c.c1 for c in cs]))
    g2sx, g2sy = Fq2(srs.g2_sx.c0, srs.g2_sx.c1), Fq2(srs.g2_sy.c0,
                                                      srs.g2_sy.c1)
    g21x, g21y = Fq2(srs.g2_1x.c0, srs.g2_1x.c1), Fq2(srs.g2_1y.c0,
                                                      srs.g2_1y.c1)
    qx = st2([g2sx, g21x, g2sx, g21x])
    qy = st2([g2sy, g21y, g2sy, g21y])
    px, py, pinf = big_to_affine(Fp, lanes)
    ml = BPair.miller_loop(Fp, px, py, qx, qy)
    ml = BPair._sel_tree(pinf, Fq12.one(Fp, (4,)), ml)
    lane = lambda i: jax.tree_util.tree_map(lambda t: t[i], ml)
    ratios = jax.tree_util.tree_map(
        lambda a, b: jnp.stack([a, b]),
        f12_mul(Fp, lane(0), lane(1)), f12_mul(Fp, lane(2), lane(3)))
    outs = BPair.final_exponentiation(Fp, ratios)
    ok = f12_eq(Fp, outs, Fq12.one(Fp, (2,)))
    return ok[0], ok[1]


def verify_bn254(ctx: BN254Context, vk: BN254VK, proof: BN254Proof,
                 challenge, public_inputs=None) -> bool:
    """KZG verification with REAL BN254 pairings: the two checks
    e(W, [tau]_2) == e(R, [1]_2) run as ONE batched Miller ratio + ONE
    shared final exponentiation (models/plonk_scaled.py:965 structure,
    production curve). Compiled as TWO staged jits cached ON the context
    — point reduction, then pairing ratio. One module was a >90 min
    XLA:CPU compile (its data-movement cost is superlinear in module
    size, CLAUDE.md); staged it is ~1600 s + ~400 s cold and each stage
    caches independently. The host hop between stages moves 4 Jacobian
    points (~0.8 KB)."""
    fns = getattr(ctx, "_verify_staged_jit", None)
    if fns is None:
        fns = (jax.jit(lambda v, p, c, pi: _verify_points(
                   ctx, v, p, c, pi)),
               jax.jit(lambda a, b, c_, d: _pairing_ratio_flags(
                   ctx, a, b, c_, d)))
        object.__setattr__(ctx, "_verify_staged_jit", fns)
    pi = (jnp.zeros((ctx.n, FR_WORDS), U32) if public_inputs is None
          else jnp.asarray(public_inputs, U32))
    pts = fns[0](vk, proof, jnp.asarray(challenge, U32), pi)
    ok1, ok2 = fns[1](*pts)
    return bool(ok1) and bool(ok2)


def verify_bn254_many(ctx: BN254Context, vk: BN254VK, proofs: BN254Proof,
                      challenges, public_inputs=None) -> jnp.ndarray:
    """Batched verification: every BN254Proof leaf carries a leading
    batch axis, challenges is (B, 5, 16). The scalar/G1 algebra is
    vmapped; ALL 4B Miller loops ride one scan and the 2B pairing ratios
    share ONE batched final exponentiation (the production sibling of
    plonk_scaled.verify_scaled_many; generalizes the reference primitive
    src/pairing.h:66-83). Returns a (B,) bool array. The compiled
    callable caches ON the context keyed by batch shape."""
    import jax

    B = int(jnp.asarray(challenges).shape[0])
    cache = getattr(ctx, "_verify_many_jit", None)
    if cache is None:
        cache = {}
        object.__setattr__(ctx, "_verify_many_jit", cache)
    fn = cache.get(B)
    if fn is None:
        def run(v, ps, cs, pi):
            w1, nr1, w2, nr2 = jax.vmap(
                lambda p, c: _verify_points(ctx, v, p, c, pi))(ps, cs)
            # lane layout: [w1_0..w1_{B-1}, nr1_*, w2_*, nr2_*]
            cat = lambda f: jnp.concatenate(
                [f(w1), f(nr1), f(w2), f(nr2)])
            lanes = BigG1J(cat(lambda q: q.X), cat(lambda q: q.Y),
                           cat(lambda q: q.Z))
            Fp = BPair.pairing_field(rolled=True)
            srs = ctx.srs
            rep = lambda c: Fq2(
                jnp.broadcast_to(c.c0, (B,) + c.c0.shape),
                jnp.broadcast_to(c.c1, (B,) + c.c1.shape))
            g2sx = rep(Fq2(srs.g2_sx.c0, srs.g2_sx.c1))
            g2sy = rep(Fq2(srs.g2_sy.c0, srs.g2_sy.c1))
            g21x = rep(Fq2(srs.g2_1x.c0, srs.g2_1x.c1))
            g21y = rep(Fq2(srs.g2_1y.c0, srs.g2_1y.c1))
            cat2 = lambda a, b, c, d: Fq2(
                jnp.concatenate([a.c0, b.c0, c.c0, d.c0]),
                jnp.concatenate([a.c1, b.c1, c.c1, d.c1]))
            qx = cat2(g2sx, g21x, g2sx, g21x)
            qy = cat2(g2sy, g21y, g2sy, g21y)
            px, py, pinf = big_to_affine(Fp, lanes)
            ml = BPair.miller_loop(Fp, px, py, qx, qy)
            ml = BPair._sel_tree(pinf, Fq12.one(Fp, (4 * B,)), ml)
            seg = lambda i: jax.tree_util.tree_map(
                lambda t: t[i * B:(i + 1) * B], ml)
            ratios = jax.tree_util.tree_map(
                lambda a, b: jnp.concatenate([a, b]),
                f12_mul(Fp, seg(0), seg(1)), f12_mul(Fp, seg(2), seg(3)))
            outs = BPair.final_exponentiation(Fp, ratios)
            ok = f12_eq(Fp, outs, Fq12.one(Fp, (2 * B,)))
            return jnp.logical_and(ok[:B], ok[B:])

        fn = jax.jit(run)
        cache[B] = fn
    pi = (jnp.zeros((ctx.n, FR_WORDS), U32) if public_inputs is None
          else jnp.asarray(public_inputs, U32))
    return fn(vk, proofs, jnp.asarray(challenges, U32), pi)


def _verify_points(ctx: BN254Context, vk: BN254VK, proof: BN254Proof,
                   challenge, public_inputs):
    """Scalar + G1 reduction of the two KZG checks -> the four pairing
    lane points (W_z, -R_1, W_zw, -R_2), all Jacobian. vmappable over a
    proof batch (verify_bn254_many)."""
    Fr, Fq = ctx.Fr, ctx.Fq
    n = ctx.n
    tabs = _host_tables(n, ctx.k1, ctx.k2, ctx.coset_shift)
    ch_std = jnp.asarray(challenge, U32)
    ch = Fr.encode(ch_std)
    alpha, beta, gamma, z, v = (ch[i] for i in range(5))
    k1c, k2c = Fr.const(ctx.k1), Fr.const(ctx.k2)
    enc, dec = Fr.encode, Fr.decode

    a_z, b_z, c_z = enc(proof.a_z), enc(proof.b_z), enc(proof.c_z)
    s1_z, s2_z = enc(proof.s_sigma_1_z), enc(proof.s_sigma_2_z)
    r_z, zw_z = enc(proof.r_z), enc(proof.z_omega_z)
    alpha_sq = Fr.mont_mul(alpha, alpha)

    z_h_z = Fr.sub(Fr.pow_static_rolled(z, n), Fr.const(1))
    n_inv = jnp.asarray(tabs["n_inv"])
    l_1_z = Fr.mont_mul(Fr.mont_mul(z_h_z, n_inv),
                        Fr.inv(Fr.sub(z, Fr.const(1))))

    as1z = Fr.add(a_z, Fr.add(Fr.mont_mul(beta, s1_z), gamma))
    bs2z = Fr.add(b_z, Fr.add(Fr.mont_mul(beta, s2_z), gamma))
    r0 = Fr.add(
        Fr.mont_mul(Fr.mont_mul(Fr.mont_mul(alpha,
                                            Fr.mont_mul(as1z, bs2z)),
                    Fr.add(c_z, gamma)), zw_z),
        Fr.mont_mul(alpha_sq, l_1_z))
    t_z_num = Fr.sub(r_z, r0)
    if public_inputs is not None:
        pi_v = Fr.encode(public_inputs)
        h_mont = jnp.asarray(tabs["h"])
        terms = Fr.mont_mul(Fr.mont_mul(pi_v, h_mont),
                            Fr.inv(Fr.sub(z, h_mont)))
        pi_z = Fr.mont_mul(Fr.mont_mul(z_h_z, n_inv),
                           BPol.tree_sum(Fr, terms))
        t_z_num = Fr.add(t_z_num, pi_z)
    t_z = Fr.mont_mul(t_z_num, Fr.inv(z_h_z))

    jac = lambda a: _aff_to_jac(Fq, a)
    add = lambda a, b: big_jac_add(Fq, a, b)
    neg = lambda p: BigG1J(p.X, Fq.neg(p.Y), p.Z)

    bz = Fr.mont_mul(beta, z)
    azg = Fr.add(Fr.add(a_z, bz), gamma)
    bzg = Fr.add(Fr.add(b_z, Fr.mont_mul(k1c, bz)), gamma)
    czg = Fr.add(Fr.add(c_z, Fr.mont_mul(k2c, bz)), gamma)
    z_coef = Fr.add(
        Fr.mont_mul(Fr.mont_mul(Fr.mont_mul(azg, bzg), czg), alpha),
        Fr.mont_mul(alpha_sq, l_1_z))
    s3_coef = Fr.mont_mul(Fr.mont_mul(Fr.mont_mul(as1z, bs2z), alpha),
                          Fr.mont_mul(beta, zw_z))

    vp = [Fr.const(1), v]
    for _ in range(5):
        vp.append(Fr.mont_mul(vp[-1], v))
    zpp = Fr.pow_static_rolled(z, n + 2)

    e_scalar = t_z
    for coef, val in ((vp[1], r_z), (vp[2], a_z), (vp[3], b_z),
                      (vp[4], c_z), (vp[5], s1_z), (vp[6], s2_z)):
        e_scalar = Fr.add(e_scalar, Fr.mont_mul(coef, val))
    g = bn254_generator(Fq)
    zw_mont = Fr.mont_mul(z, Fr.const(ctx.omega))

    # ONE batched double-and-add ladder for all 18 scalar multiplies
    # (d_cm's terms folded into f_cm with a v factor; point negations
    # become scalar negations mod r). The previous per-term ladders were
    # 19 separate 254-step scan graphs — an ~80 min XLA:CPU verify
    # compile (round-5 smoke-test finding) and 19x the dispatch work.
    mv = lambda s_: Fr.mont_mul(vp[1], s_)
    pairs = [
        (jac(proof.t_mid_s), zpp),
        (jac(proof.t_hi_s), Fr.mont_mul(zpp, zpp)),
        (jac(vk.q_m_s), mv(Fr.mont_mul(a_z, b_z))),
        (jac(vk.q_l_s), mv(a_z)),
        (jac(vk.q_r_s), mv(b_z)),
        (jac(vk.q_o_s), mv(c_z)),
        (jac(vk.q_c_s), vp[1]),
        (jac(proof.z_s), mv(z_coef)),
        (jac(vk.s3_s), Fr.neg(mv(s3_coef))),
        (jac(proof.a_s), vp[2]),
        (jac(proof.b_s), vp[3]),
        (jac(proof.c_s), vp[4]),
        (jac(vk.s1_s), vp[5]),
        (jac(vk.s2_s), vp[6]),
        (g, Fr.neg(e_scalar)),
        (jac(proof.w_z_s), z),
        (jac(proof.w_z_omega_s), zw_mont),
        (g, Fr.neg(zw_z)),
    ]
    pts = BigG1J(jnp.stack([p.X for p, _ in pairs]),
                 jnp.stack([p.Y for p, _ in pairs]),
                 jnp.stack([p.Z for p, _ in pairs]))
    scalars_std = dec(jnp.stack([s for _, s in pairs]))
    out = big_jac_mul(Fq, pts, _std_bits(scalars_std), FR_BITS)
    lane = lambda i: jax.tree_util.tree_map(lambda t: t[i], out)

    # fold lanes 0..15 with ONE rolled jadd body: 16 inline jadd blocks
    # were a major share of this module's superlinear XLA:CPU compile
    # (round-5 breakdown probe: 1610 s for the point stage alone)
    r1 = jax.lax.fori_loop(
        0, 16, lambda i, acc: big_jac_add(Fq, acc, lane(i)),
        jac(proof.t_lo_s))
    r2 = add(jac(proof.z_s), add(lane(16), lane(17)))
    return (_aff_to_jac(Fq, proof.w_z_s), neg(r1),
            _aff_to_jac(Fq, proof.w_z_omega_s), neg(r2))
