"""Round-phased Fiat–Shamir transform (capability extension).

The reference has NO Fiat–Shamir: challenges alpha/beta/gamma/z/v and the
blinding scalars are plain function arguments fixed by the test
(src/plonk.h:223-229, src/plonk-test.c:249-267 — SURVEY §2.2.3). This
module makes both provers non-interactive with the standard transform,
phase-correct:

    preamble:  label, protocol params, verification key, public nonce
    round 1:   absorb [a]_1 [b]_1 [c]_1            -> beta, gamma
    round 2:   absorb [z]_1                        -> alpha
    round 3:   absorb [t_lo]_1 [t_mid]_1 [t_hi]_1  -> z
    round 4:   absorb the 7 evaluations            -> v

Only PUBLIC data enters the transcript (the witness is bound through the
commitments); the verifier re-derives every challenge from the proof alone.

Challenge admissibility:
- beta/gamma making a permutation denominator vanish abort the reference
  at its zero-remainder assert (src/plonk.h:506-510). The predicate is
  witness-dependent, so the verifier cannot re-sample it — instead the
  prover bumps a PUBLIC retry nonce (absorbed in the preamble) and
  re-proves; the nonce ships with the proof and the verifier absorbs it,
  so derived challenges agree. Honest failure probability per attempt is
  ~6n/r (non-negligible for the 27-bit scaled field, ~2^-11 at 2^16 gates).
- z with z^n == 1 (z in H, incl. z == 1) breaks the verifier's L_1(z)
  formula and the opening division; the predicate is public, so both
  sides re-sample deterministically inside the squeeze loop. Same for the
  zero rejections on beta/gamma/alpha/v.
"""
from __future__ import annotations

from typing import NamedTuple

import hashlib

import numpy as np
import jax
import jax.numpy as jnp

U32 = jnp.uint32


def _array_bytes(a) -> bytes:
    """Canonical serialization of an integer array: shape header + LE u32
    payload. Works for scalars and any batch shape (a silent 0-substitute
    for non-scalars was the round-1 bug — ADVICE fiat_shamir.py:26)."""
    arr = np.asarray(a)
    if arr.dtype == np.bool_:
        arr = arr.astype(np.uint64)
    if not np.issubdtype(arr.dtype, np.integer):
        raise TypeError(f"transcript absorbs integers, got {arr.dtype}")
    # canonical: value-preserving for field elements (< 2^64); a wrap of
    # negative inputs would still be deterministic
    arr = arr.astype("<u8", casting="unsafe")
    header = np.asarray([arr.ndim] + list(arr.shape), dtype="<u4").tobytes()
    return header + arr.tobytes()


def point_bytes(pt) -> bytes:
    """Canonical G1/G2 serialization (full coordinate arrays, so batched
    commitments hash their real coordinates)."""
    out = _array_bytes(pt.x) + _array_bytes(pt.y)
    if hasattr(pt, "inf"):
        out += _array_bytes(pt.inf)
    return out


class Transcript:
    """Append-only BLAKE2b transcript; squeeze field elements on demand
    with deterministic rejection predicates."""

    def __init__(self, label: bytes, p: int):
        self.h = hashlib.blake2b(label, digest_size=32)
        self.p = p
        self.counter = 0

    def absorb_bytes(self, tag: bytes, data: bytes):
        self.h.update(len(tag).to_bytes(2, "little") + tag)
        self.h.update(len(data).to_bytes(8, "little") + data)

    def absorb_scalars(self, tag: bytes, xs):
        self.absorb_bytes(tag, _array_bytes(xs))

    def absorb_point(self, tag: bytes, pt):
        self.absorb_bytes(tag, point_bytes(pt))

    def squeeze(self, predicate=None) -> int:
        """One field element; re-sample (deterministically, counter-keyed)
        until `predicate(v)` holds. Default predicate: v != 0."""
        if predicate is None:
            predicate = lambda v: v != 0
        while True:
            st = self.h.copy()
            st.update(b"squeeze" + self.counter.to_bytes(4, "little"))
            self.counter += 1
            v = int.from_bytes(st.digest(), "little") % self.p
            if predicate(v):
                return v


def _preamble(label: bytes, pp, n: int, vk_points, nonce: int,
              public_inputs=None) -> Transcript:
    r = pp.field.p
    t = Transcript(label, r)
    t.absorb_scalars(b"params", np.asarray(
        [r % (1 << 32), r >> 32, n, pp.k1, pp.k2, pp.omega % r],
        dtype=np.uint64))
    for i, pt in enumerate(vk_points):
        t.absorb_point(b"vk%d" % i, pt)
    if public_inputs is not None:
        t.absorb_scalars(b"pi", np.asarray(public_inputs))
    t.absorb_scalars(b"nonce", np.asarray([nonce], dtype=np.uint32))
    return t


def _not_in_domain(p: int, n: int):
    """z must satisfy z != 0 and z^n != 1 (z not in H)."""
    return lambda v: v != 0 and pow(v, n, p) != 1


def _derive_from_proof(label: bytes, pp, n: int, vk_points, proof,
                       nonce: int, public_inputs=None) -> np.ndarray:
    """The verifier side: replay the transcript from the proof's points
    and evaluations. Returns [alpha beta gamma z v] (standard form)."""
    t = _preamble(label, pp, n, vk_points, nonce, public_inputs)
    t.absorb_point(b"a", proof.a_s)
    t.absorb_point(b"b", proof.b_s)
    t.absorb_point(b"c", proof.c_s)
    beta = t.squeeze()
    gamma = t.squeeze()
    t.absorb_point(b"z", proof.z_s)
    alpha = t.squeeze()
    t.absorb_point(b"t_lo", proof.t_lo_s)
    t.absorb_point(b"t_mid", proof.t_mid_s)
    t.absorb_point(b"t_hi", proof.t_hi_s)
    z = t.squeeze(_not_in_domain(t.p, n))
    t.absorb_scalars(b"evals", np.stack([
        np.asarray(proof.a_z), np.asarray(proof.b_z), np.asarray(proof.c_z),
        np.asarray(proof.s_sigma_1_z), np.asarray(proof.s_sigma_2_z),
        np.asarray(proof.r_z), np.asarray(proof.z_omega_z)]))
    v = t.squeeze()
    return np.array([alpha, beta, gamma, z, v], dtype=np.uint32)


# ---------------- scaled prover (staged; one compile per stage) ----------


class FsProof(NamedTuple):
    proof: object          # models.plonk.Proof
    nonce: int             # public retry counter (absorbed in preamble)
    challenge: np.ndarray  # [alpha beta gamma z v], derived — for debugging


class ScaledFsProver:
    """Non-interactive scaled prover: compiles the four round stages once,
    then proves any witness for the fixed circuit with transcript-derived
    challenges. Usage:

        fs = ScaledFsProver(ctx, selectors, copies)
        out = fs.prove(a_w, b_w, c_w, rand9)
        assert verify_scaled_fs(ctx, fs.vk, out)
    """

    def __init__(self, ctx, selectors, copies,
                 label: bytes = b"tpu-plonk-fs-v2", prims=None):
        from . import plonk_scaled as PS
        self.ctx = ctx
        self.label = label
        selectors = jnp.asarray(selectors, U32)
        copies = jnp.asarray(copies)
        self.vk = PS.make_vk_scaled(ctx, selectors, copies)
        self._vk_points = list(self.vk)
        base_prims = prims if prims is not None else PS._auto_prims(ctx)
        # the fixed-base table travels as a runtime argument so it is not
        # baked into the compiled modules (see plonk_scaled.table_commit)
        from ..ops.fixed_base import FixedBaseTable
        tbl = PS.fixed_base_table(ctx)
        self._tbl = tbl

        Fr = ctx.Fr

        def enc(ch_std):
            return Fr.encode(jnp.asarray(ch_std, U32))

        def with_table(tx, ty, tinf):
            return base_prims._replace(commit_many=PS.table_commit(
                ctx, FixedBaseTable(tx, ty, tinf, tbl.window_bits)))

        # circuit-fixed tables once (runtime argument, not a baked const)
        pre = jax.jit(lambda s, c: PS.precompute_circuit(
            ctx, s, c, base_prims))(selectors, copies)
        pre = jax.tree_util.tree_map(jax.block_until_ready, pre)

        def s1(tx, ty, tinf, pre_, a_w, b_w, c_w, rand9, pi):
            prims = with_table(tx, ty, tinf)
            st = PS._stage_prep(ctx, a_w, b_w, c_w, rand9, prims, pre_,
                                public_inputs=pi)
            cms = prims.commit_many(ctx, [st["a_x"], st["b_x"], st["c_x"]])
            return st, cms

        def s2(tx, ty, tinf, st, beta, gamma):
            prims = with_table(tx, ty, tinf)
            z_x, den_ok = PS._stage_grand_product(ctx, st, enc(beta),
                                                  enc(gamma), prims)
            cms = prims.commit_many(ctx, [z_x])
            return z_x, den_ok, cms

        def s3(tx, ty, tinf, st, z_x, alpha, beta, gamma):
            prims = with_table(tx, ty, tinf)
            q3 = PS._stage_quotient(ctx, st, z_x, enc(alpha), enc(beta),
                                    enc(gamma), prims)
            cms = prims.commit_many(ctx, [q3["t_lo_x"], q3["t_mid_x"],
                                          q3["t_hi_x"]])
            return q3, cms

        def s4(tx, ty, tinf, st, q3, z_x, ch_std):
            prims = with_table(tx, ty, tinf)
            ech = enc(ch_std)
            alpha, beta, gamma, z, v = (ech[i] for i in range(5))
            q5 = PS._stage_openings(ctx, st, q3, z_x, alpha, beta, gamma,
                                    z, v)
            cms = prims.commit_many(ctx, [q5["w_z_x_quo"],
                                          q5["w_z_omega_x"]])
            dec = Fr.decode
            evals = {k: dec(q5[k]) for k in
                     ("a_z", "b_z", "c_z", "s_sigma_1_z", "s_sigma_2_z",
                      "r_z", "z_omega_z")}
            return evals, cms, q5["rem1"] == 0, q5["rem2"] == 0

        targs = (tbl.x, tbl.y, tbl.inf)
        js1, js2, js3, js4 = (jax.jit(s) for s in (s1, s2, s3, s4))
        self._s1 = lambda *a: js1(*targs, pre, *a)
        self._s2 = lambda *a: js2(*targs, *a)
        self._s3 = lambda *a: js3(*targs, *a)
        self._s4 = lambda *a: js4(*targs, *a)

    def prove(self, a_w, b_w, c_w, rand9, public_inputs=None,
              max_retries: int = 32):
        from ..ops.curve import G1
        from .plonk import Proof
        from . import plonk_scaled as PS
        ctx = self.ctx
        pp = ctx.params
        n = ctx.n
        a_w, b_w, c_w = (jnp.asarray(x, U32) for x in (a_w, b_w, c_w))
        rand9 = jnp.asarray(rand9, U32)
        pi = (jnp.zeros((n,), U32) if public_inputs is None
              else jnp.asarray(public_inputs, U32))

        st, c1 = self._s1(a_w, b_w, c_w, rand9, pi)
        pt1 = [G1(c1.x[i], c1.y[i], c1.inf[i]) for i in range(3)]

        for nonce in range(max_retries):
            t = _preamble(self.label, pp, n, self._vk_points, nonce,
                          public_inputs)
            for tag, pt in zip((b"a", b"b", b"c"), pt1):
                t.absorb_point(tag, pt)
            beta = t.squeeze()
            gamma = t.squeeze()
            z_x, den_ok, c2 = self._s2(st, np.uint32(beta),
                                       np.uint32(gamma))
            if bool(den_ok):
                break
        else:
            raise RuntimeError(
                "no admissible beta/gamma in %d retries" % max_retries)

        z_pt = G1(c2.x[0], c2.y[0], c2.inf[0])
        t.absorb_point(b"z", z_pt)
        alpha = t.squeeze()
        q3, c3 = self._s3(st, z_x, np.uint32(alpha), np.uint32(beta),
                          np.uint32(gamma))
        pt3 = [G1(c3.x[i], c3.y[i], c3.inf[i]) for i in range(3)]
        for tag, pt in zip((b"t_lo", b"t_mid", b"t_hi"), pt3):
            t.absorb_point(tag, pt)
        zch = t.squeeze(_not_in_domain(t.p, n))
        ch = np.array([alpha, beta, gamma, zch, 1], dtype=np.uint32)
        # v depends on the round-4 evaluations; evaluate first with a
        # placeholder v, then recompute the openings with the real v. The
        # evaluations do not depend on v, so one extra s4 call suffices.
        evals, _, _, _ = self._s4(st, q3, z_x, jnp.asarray(ch))
        t.absorb_scalars(b"evals", np.stack(
            [np.asarray(evals[k]) for k in
             ("a_z", "b_z", "c_z", "s_sigma_1_z", "s_sigma_2_z", "r_z",
              "z_omega_z")]))
        v = t.squeeze()
        ch[4] = v
        evals, c4, rem1_ok, rem2_ok = self._s4(st, q3, z_x,
                                               jnp.asarray(ch))

        pick4 = lambda i: G1(c4.x[i], c4.y[i], c4.inf[i])
        proof = Proof(
            a_s=pt1[0], b_s=pt1[1], c_s=pt1[2], z_s=z_pt,
            t_lo_s=pt3[0], t_mid_s=pt3[1], t_hi_s=pt3[2],
            w_z_s=pick4(0), w_z_omega_s=pick4(1), **evals)
        diags = PS.ScaledDiagnostics(
            satisfied=st["satisfied"], t_tail_zero=q3["t_tail_zero"],
            w_z_rem_zero=rem1_ok, w_zw_rem_zero=rem2_ok)
        ch_full = np.array([alpha, beta, gamma, zch, v], dtype=np.uint32)
        return FsProof(proof=proof, nonce=nonce, challenge=ch_full), diags


def verify_scaled_fs(ctx, vk, fs_proof: FsProof,
                     label: bytes = b"tpu-plonk-fs-v2",
                     public_inputs=None) -> bool:
    """Re-derive the challenges from the transcript and run the two-pairing
    check. Any tampered commitment/evaluation changes the derived
    challenges AND the pairing identity."""
    from . import plonk_scaled as PS
    ch = _derive_from_proof(label, ctx.params, ctx.n, list(vk),
                            fs_proof.proof, fs_proof.nonce, public_inputs)
    return PS.verify_scaled(ctx, vk, fs_proof.proof, ch,
                            public_inputs=public_inputs)


# ---------------- toy prover (whole-prover replay) ----------------------
#
# The toy prover is ~microseconds per run, so instead of staging it we
# replay the FULL prover as each challenge arrives: round-k outputs only
# depend on challenges derived before round k, so the final run's proof is
# transcript-consistent. One jit compile total.


def prove_fs(ctx, cons, asg, rand9, label: bytes = b"tpu-plonk-fs-v2",
             max_retries: int = 32):
    """Non-interactive toy prover (fixed-SRS, standard dialect). Returns
    (FsProof, Diagnostics)."""
    from .plonk import prove
    from .verifier import make_verification_key
    pp = ctx.params
    r = pp.field.p
    n = len(cons.c_a)
    vk = make_verification_key(ctx, cons)
    vk_points = [vk.q_m_s, vk.q_l_s, vk.q_r_s, vk.q_o_s, vk.q_c_s,
                 vk.s_sigma_1_s, vk.s_sigma_2_s, vk.s_sigma_3_s]

    def run(ch):
        return prove(ctx, cons, asg, jnp.asarray(ch, U32),
                     jnp.asarray(rand9, U32), dialect="standard")

    for nonce in range(max_retries):
        ch = np.array([1, 1, 1, 1, 1], dtype=np.uint32)
        proof, diags = run(ch)                      # round 1 commitments
        t = _preamble(label, pp, n, vk_points, nonce)
        t.absorb_point(b"a", proof.a_s)
        t.absorb_point(b"b", proof.b_s)
        t.absorb_point(b"c", proof.c_s)
        ch[1] = t.squeeze()                         # beta
        ch[2] = t.squeeze()                         # gamma
        proof, diags = run(ch)                      # round 2 commitment
        if not bool(diags.t_rem_zero):
            continue                                # vanishing denominator
        t.absorb_point(b"z", proof.z_s)
        ch[0] = t.squeeze()                         # alpha
        proof, diags = run(ch)                      # round 3 commitments
        t.absorb_point(b"t_lo", proof.t_lo_s)
        t.absorb_point(b"t_mid", proof.t_mid_s)
        t.absorb_point(b"t_hi", proof.t_hi_s)
        ch[3] = t.squeeze(_not_in_domain(r, n))     # z
        proof, diags = run(ch)                      # round 4 evaluations
        t.absorb_scalars(b"evals", np.stack([
            np.asarray(proof.a_z), np.asarray(proof.b_z),
            np.asarray(proof.c_z), np.asarray(proof.s_sigma_1_z),
            np.asarray(proof.s_sigma_2_z), np.asarray(proof.r_z),
            np.asarray(proof.z_omega_z)]))
        ch[4] = t.squeeze()                         # v
        proof, diags = run(ch)                      # final proof
        if bool(diags.all_ok()):
            return FsProof(proof=proof, nonce=nonce, challenge=ch), diags
    raise RuntimeError("no admissible challenges in %d retries"
                       % max_retries)


def verify_fs(ctx, cons, fs_proof: FsProof,
              label: bytes = b"tpu-plonk-fs-v2") -> bool:
    from .verifier import make_verification_key, verify
    vk = make_verification_key(ctx, cons)
    vk_points = [vk.q_m_s, vk.q_l_s, vk.q_r_s, vk.q_o_s, vk.q_c_s,
                 vk.s_sigma_1_s, vk.s_sigma_2_s, vk.s_sigma_3_s]
    n = len(cons.c_a)
    ch = _derive_from_proof(label, ctx.params, n, vk_points,
                            fs_proof.proof, fs_proof.nonce)
    return verify(ctx, vk, fs_proof.proof, ch)


# ---------------- BN254 prover (production curve) --------------------
#
# Same round-phased transcript as the scaled prover, over 254-bit
# challenges carried as (16,) 16-bit-word arrays. The stage split mirrors
# ScaledFsProver; circuit tables and SRS are closed over (fine for the
# 2^10-2^12 bench sizes — at 2^16+ they should be threaded as runtime
# arguments like plonk_scaled.make_prover to stay under the remote
# compile payload limit).


def _bn254_r() -> int:
    from ..utils.params import BN254_FR
    return BN254_FR.p


def _bn254_words(v: int) -> np.ndarray:
    return np.array([(int(v) >> (16 * k)) & 0xFFFF for k in range(16)],
                    dtype=np.uint32)


def _bn254_preamble(label: bytes, ctx, vk_points, nonce: int,
                    public_inputs=None) -> Transcript:
    r = _bn254_r()
    t = Transcript(label, r)
    t.absorb_scalars(b"params", np.concatenate(
        [_bn254_words(r), _bn254_words(ctx.n), _bn254_words(ctx.k1),
         _bn254_words(ctx.k2), _bn254_words(ctx.omega)]))
    for i, pt in enumerate(vk_points):
        t.absorb_point(b"vk%d" % i, pt)
    if public_inputs is not None:
        t.absorb_scalars(b"pi", np.asarray(public_inputs))
    t.absorb_scalars(b"nonce", np.asarray([nonce], dtype=np.uint32))
    return t


def _bn254_derive_from_proof(label: bytes, ctx, vk_points, proof,
                             nonce: int, public_inputs=None) -> np.ndarray:
    """Verifier-side replay -> (5, 16) standard-form challenge words
    [alpha beta gamma z v]."""
    t = _bn254_preamble(label, ctx, vk_points, nonce, public_inputs)
    t.absorb_point(b"a", proof.a_s)
    t.absorb_point(b"b", proof.b_s)
    t.absorb_point(b"c", proof.c_s)
    beta = t.squeeze()
    gamma = t.squeeze()
    t.absorb_point(b"z", proof.z_s)
    alpha = t.squeeze()
    t.absorb_point(b"t_lo", proof.t_lo_s)
    t.absorb_point(b"t_mid", proof.t_mid_s)
    t.absorb_point(b"t_hi", proof.t_hi_s)
    z = t.squeeze(_not_in_domain(t.p, ctx.n))
    t.absorb_scalars(b"evals", np.stack([
        np.asarray(proof.a_z), np.asarray(proof.b_z), np.asarray(proof.c_z),
        np.asarray(proof.s_sigma_1_z), np.asarray(proof.s_sigma_2_z),
        np.asarray(proof.r_z), np.asarray(proof.z_omega_z)]))
    v = t.squeeze()
    return np.stack([_bn254_words(c) for c in (alpha, beta, gamma, z, v)])


class BN254FsProver:
    """Non-interactive BN254 prover: four compiled round stages, then any
    witness proves with transcript-derived challenges.

        fs = BN254FsProver(ctx, selectors, copies)
        out, diags = fs.prove(a_w, b_w, c_w, rand9)
        assert verify_bn254_fs(ctx, fs.vk, out)
    """

    def __init__(self, ctx, selectors, copies,
                 label: bytes = b"tpu-plonk-bn254-fs-v1", prims=None):
        """prims: optional plonk_bn254.BN254Prims — pass
        parallel.dist_bn254.make_dist_bn254_prims(ctx, mesh) to run
        every round stage mesh-sharded (bit-identical transcript)."""
        from . import plonk_bn254 as PB
        self.ctx = ctx
        self.label = label
        prims = prims or PB._local_prims(ctx)
        sel = jnp.asarray(selectors, U32)
        cps = jnp.asarray(copies)
        self.vk = PB.make_vk_bn254(ctx, sel, cps)
        self._vk_points = list(self.vk)
        Fr, Fq = ctx.Fr, ctx.Fq

        def dec_pts(cms):
            return PB.BigG1Affine(Fq.decode(cms.x), Fq.decode(cms.y),
                                  cms.inf)

        # circuit-fixed tables once (runtime argument, not a baked const)
        pre = jax.jit(lambda s, c: PB.precompute_bn254(
            ctx, s, c, prims))(sel, cps)
        pre = jax.tree_util.tree_map(jax.block_until_ready, pre)

        def s1(pre_, a, b, c, rnd, pi):
            st = PB._stage_prep(ctx, a, b, c, rnd, prims, pre_, pi)
            cms = prims.commit_many([st["a_x"], st["b_x"], st["c_x"]])
            return st, dec_pts(cms)

        def s2(st, beta_w, gamma_w):
            z_x, den_ok = PB._stage_grand_product(
                ctx, st, Fr.encode(beta_w), Fr.encode(gamma_w), prims)
            cms = prims.commit_many([z_x])
            return z_x, den_ok, dec_pts(cms)

        def s3(st, z_x, alpha_w, beta_w, gamma_w):
            q3 = PB._stage_quotient(ctx, st, z_x, Fr.encode(alpha_w),
                                    Fr.encode(beta_w), Fr.encode(gamma_w),
                                    prims)
            cms = prims.commit_many([q3["t_lo_x"], q3["t_mid_x"],
                                     q3["t_hi_x"]])
            return q3, dec_pts(cms)

        def s4(st, q3, z_x, ch_w):
            ch = Fr.encode(ch_w)
            alpha, beta, gamma, z, v = (ch[i] for i in range(5))
            q5 = PB._stage_openings(ctx, st, q3, z_x, alpha, beta, gamma,
                                    z, v)
            cms = prims.commit_many([q5["w_z_x_quo"],
                                     q5["w_z_omega_x"]])
            evals = {k: Fr.decode(q5[k]) for k in
                     ("a_z", "b_z", "c_z", "s_sigma_1_z", "s_sigma_2_z",
                      "r_z", "z_omega_z")}
            return evals, dec_pts(cms), q5["rem1"], q5["rem2"]

        js1, js2, js3, js4 = (jax.jit(s) for s in (s1, s2, s3, s4))
        self._s1 = lambda *a: js1(pre, *a)
        self._s2, self._s3, self._s4 = js2, js3, js4

    def prove(self, a_w, b_w, c_w, rand9, public_inputs=None,
              max_retries: int = 32):
        from . import plonk_bn254 as PB
        ctx = self.ctx
        n = ctx.n
        a_w, b_w, c_w = (jnp.asarray(x, U32) for x in (a_w, b_w, c_w))
        rand9 = jnp.asarray(rand9, U32)
        pi = (jnp.zeros((n, 16), U32) if public_inputs is None
              else jnp.asarray(public_inputs, U32))

        st, c1 = self._s1(a_w, b_w, c_w, rand9, pi)
        pick = lambda cms, i: PB.BigG1Affine(cms.x[i], cms.y[i],
                                             cms.inf[i])
        pt1 = [pick(c1, i) for i in range(3)]

        for nonce in range(max_retries):
            t = _bn254_preamble(self.label, ctx, self._vk_points, nonce,
                                public_inputs)
            for tag, pt in zip((b"a", b"b", b"c"), pt1):
                t.absorb_point(tag, pt)
            beta = t.squeeze()
            gamma = t.squeeze()
            z_x, den_ok, c2 = self._s2(st, _bn254_words(beta),
                                       _bn254_words(gamma))
            if bool(den_ok):
                break
        else:
            raise RuntimeError(
                "no admissible beta/gamma in %d retries" % max_retries)

        z_pt = pick(c2, 0)
        t.absorb_point(b"z", z_pt)
        alpha = t.squeeze()
        q3, c3 = self._s3(st, z_x, _bn254_words(alpha),
                          _bn254_words(beta), _bn254_words(gamma))
        pt3 = [pick(c3, i) for i in range(3)]
        for tag, pt in zip((b"t_lo", b"t_mid", b"t_hi"), pt3):
            t.absorb_point(tag, pt)
        zch = t.squeeze(_not_in_domain(t.p, n))
        ch = np.stack([_bn254_words(c) for c in
                       (alpha, beta, gamma, zch, 1)])
        # evaluations are v-independent: derive v from them, then rerun
        # the openings with the real v (same trick as the scaled prover)
        evals, _, _, _ = self._s4(st, q3, z_x, jnp.asarray(ch))
        t.absorb_scalars(b"evals", np.stack(
            [np.asarray(evals[k]) for k in
             ("a_z", "b_z", "c_z", "s_sigma_1_z", "s_sigma_2_z", "r_z",
              "z_omega_z")]))
        v = t.squeeze()
        ch[4] = _bn254_words(v)
        evals, c4, rem1, rem2 = self._s4(st, q3, z_x, jnp.asarray(ch))

        proof = PB.BN254Proof(
            a_s=pt1[0], b_s=pt1[1], c_s=pt1[2], z_s=z_pt,
            t_lo_s=pt3[0], t_mid_s=pt3[1], t_hi_s=pt3[2],
            w_z_s=pick(c4, 0), w_z_omega_s=pick(c4, 1), **evals)
        diags = PB.BN254Diagnostics(
            satisfied=st["satisfied"], t_tail_zero=q3["t_tail_zero"],
            w_z_rem_zero=rem1, w_zw_rem_zero=rem2)
        return FsProof(proof=proof, nonce=nonce, challenge=ch), diags


def verify_bn254_fs(ctx, vk, fs_proof: FsProof,
                    label: bytes = b"tpu-plonk-bn254-fs-v1",
                    public_inputs=None) -> bool:
    """Replay the transcript from the proof and run the two real-pairing
    checks; any tampered commitment/evaluation shifts the derived
    challenges AND breaks the pairing identity."""
    from . import plonk_bn254 as PB
    ch = _bn254_derive_from_proof(label, ctx, list(vk), fs_proof.proof,
                                  fs_proof.nonce, public_inputs)
    return PB.verify_bn254(ctx, vk, fs_proof.proof, ch,
                           public_inputs=public_inputs)
