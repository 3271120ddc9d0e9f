"""Single-dispatch non-interactive scaled prover with an ON-DEVICE
Poseidon transcript.

The BLAKE2b FS prover (fiat_shamir.ScaledFsProver) is staged: every
protocol round returns its commitments to the host, hashes them, and
dispatches the next stage — 6+ tunnel round trips at a ~2.9 ms fixed
dispatch floor each (tools/tpu_calibrate.py), plus the host hashing
itself. With an algebraic sponge (ops/poseidon.py) the challenges are
field arithmetic, so the ENTIRE Fiat-Shamir prove — all five protocol
rounds, the beta/gamma retry loop, and every challenge derivation —
compiles into ONE jit call. The verifier replays the transcript with the
python-int oracle (PoseidonHost) off-device; device/host lockstep is
asserted in tests/test_poseidon.py and tests/test_fs_poseidon.py.

Transcript layout (poseidon-v1; each bullet is one `absorb_elements`
call, i.e. independently 10*-padded):

    preamble  label (16-bit chunks), r/n/k1/k2/omega, the 8 vk points
    per-try   [tree_digest(PI), nonce]
    round 1   [a]_1 [b]_1 [c]_1 (point chunks)      -> beta, gamma
    round 2   [z]_1                                 -> alpha
    round 3   [t_lo] [t_mid] [t_hi]                 -> z  (z^n != 1)
    round 4   the 7 evaluations                     -> v

Points absorb as 16-bit limbs of their standard-form coordinates plus
the infinity flag (16-bit limbs are always < r, keeping the encoding
injective for any field >= 2^17). The public-input vector enters as a
Poseidon TREE digest (log2(n) batched permutations — device-friendly),
not a sequential sponge walk.

Like the reference's prover, an inadmissible beta/gamma (vanishing
permutation denominator, src/plonk.h:506-510) triggers a retry; here the
retry loop runs on device as a lax.while_loop over a public nonce.
"""
from __future__ import annotations

from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from ..ops import poseidon as PO

U32 = jnp.uint32

LABEL = b"tpu-plonk-fs-poseidon-v1"
MAX_NONCE = 32


def _label_elements(label: bytes) -> list:
    """bytes -> 16-bit-chunk field elements (length-prefixed)."""
    out = [len(label)]
    padded = label + b"\x00" * (len(label) % 2)
    for i in range(0, len(padded), 2):
        out.append(int.from_bytes(padded[i:i + 2], "little"))
    return out


def _int_chunks(v: int, n_chunks: int) -> list:
    return [(int(v) >> (16 * k)) & 0xFFFF for k in range(n_chunks)]


def _host_point_elements(pt) -> list:
    """Standard-form G1 -> [x_lo, x_hi, y_lo, y_hi, inf] ints."""
    return (_int_chunks(int(np.asarray(pt.x)), 2)
            + _int_chunks(int(np.asarray(pt.y)), 2)
            + [int(bool(np.asarray(pt.inf)))])


def _preamble_elements(ctx, vk_points) -> list:
    pp = ctx.params
    r = pp.field.p
    elems = _label_elements(LABEL)
    elems += _int_chunks(r, 4) + [ctx.n, pp.k1, pp.k2, pp.omega % r]
    for pt in vk_points:
        elems += _host_point_elements(pt)
    return elems


def _device_point_elements(F, cms, count: int) -> list:
    """G1 batch (count,) standard-form -> Montgomery 0-d absorb list,
    chunked identically to _host_point_elements."""
    mask = jnp.uint32(0xFFFF)
    out = []
    for i in range(count):
        x, y = cms.x[i], cms.y[i]
        inf = cms.inf[i].astype(U32)
        for c in (x & mask, x >> 16, y & mask, y >> 16, inf):
            out.append(F.encode(c.astype(U32)))
    return out


class PoseidonFsProof(NamedTuple):
    proof: object           # models.plonk.Proof (scaled points + evals)
    nonce: int
    challenge: np.ndarray   # [alpha beta gamma z v] standard form


class PoseidonFsProver:
    """One-jit-call non-interactive prover for a fixed scaled circuit.

        fs = PoseidonFsProver(ctx, selectors, copies)
        out, diags = fs.prove(a_w, b_w, c_w, rand9)
        assert verify_scaled_fs_poseidon(ctx, fs.vk, out)
    """

    def __init__(self, ctx, selectors, copies, prims=None,
                 capacity: int = 4):
        from . import plonk_scaled as PS
        from ..ops.fixed_base import FixedBaseTable
        self.ctx = ctx
        self.capacity = capacity
        Fr = ctx.Fr
        r = ctx.params.field.p
        self.pos = PO.make_params(r)
        sel = jnp.asarray(selectors, U32)
        cps = jnp.asarray(copies)
        self.vk = PS.make_vk_scaled(ctx, sel, cps)
        self._vk_points = list(self.vk)

        # transcript preamble is proof-independent: run it ONCE on the
        # host and ship the post-preamble sponge state as an input
        hs = PO.HostSponge(self.pos, capacity)
        hs.absorb_elements(_preamble_elements(ctx, self._vk_points))
        self._state0 = np.asarray(hs.state, dtype=np.uint32)

        base = prims if prims is not None else PS._auto_prims(ctx)
        tbl = PS.fixed_base_table(ctx)
        self._tbl = tbl
        pre = jax.jit(lambda s, c: PS.precompute_circuit(
            ctx, s, c, base))(sel, cps)
        pre = jax.tree_util.tree_map(jax.block_until_ready, pre)
        self._pre = pre
        pos, cap = self.pos, capacity
        n = ctx.n

        def run(tx, ty, tinf, pre_, state0_std, a_w, b_w, c_w, rnd9, pi):
            prims_ = base._replace(commit_many=PS.table_commit(
                ctx, FixedBaseTable(tx, ty, tinf, tbl.window_bits)))
            absorb = lambda s, es: PO.absorb_elements(Fr, pos, s, es, cap)
            st = PS._stage_prep(ctx, a_w, b_w, c_w, rnd9, prims_, pre_,
                                public_inputs=pi)
            c1 = prims_.commit_many(ctx, [st["a_x"], st["b_x"],
                                          st["c_x"]])
            c1_elems = _device_point_elements(Fr, c1, 3)
            pid = PO.tree_digest(Fr, pos, pi)
            state0 = Fr.encode(state0_std)

            def attempt(nonce):
                s = absorb(state0, [pid, Fr.encode(nonce)])
                s = absorb(s, c1_elems)
                beta_std, s = PO.squeeze(Fr, pos, s)
                gamma_std, s = PO.squeeze(Fr, pos, s)
                beta, gamma = Fr.encode(beta_std), Fr.encode(gamma_std)
                z_x, den_ok = PS._stage_grand_product(ctx, st, beta,
                                                      gamma, prims_)
                return s, beta, gamma, z_x, den_ok

            def cond(carry):
                nonce, _, _, _, _, den_ok = carry
                return jnp.logical_and(~den_ok, nonce < MAX_NONCE)

            def body(carry):
                nonce = carry[0] + 1
                s, beta, gamma, z_x, den_ok = attempt(nonce)
                return (nonce, s, beta, gamma, z_x, den_ok)

            nonce0 = jnp.uint32(0)
            s, beta, gamma, z_x, den_ok = attempt(nonce0)
            nonce, s, beta, gamma, z_x, den_ok = jax.lax.while_loop(
                cond, body, (nonce0, s, beta, gamma, z_x, den_ok))

            c2 = prims_.commit_many(ctx, [z_x])
            s = absorb(s, _device_point_elements(Fr, c2, 1))
            alpha_std, s = PO.squeeze(Fr, pos, s)
            alpha = Fr.encode(alpha_std)
            q3 = PS._stage_quotient(ctx, st, z_x, alpha, beta, gamma,
                                    prims_)
            c3 = prims_.commit_many(ctx, [q3["t_lo_x"], q3["t_mid_x"],
                                          q3["t_hi_x"]])
            s = absorb(s, _device_point_elements(Fr, c3, 3))
            z_std, s = PO.squeeze(Fr, pos, s, pow_n_not_one=n)
            zc = Fr.encode(z_std)

            # evaluations are v-independent: compute them with v = 1,
            # absorb, squeeze the real v, then redo the openings (XLA
            # CSEs the shared v-independent subgraph)
            keys = ("a_z", "b_z", "c_z", "s_sigma_1_z", "s_sigma_2_z",
                    "r_z", "z_omega_z")
            q5a = PS._stage_openings(ctx, st, q3, z_x, alpha, beta,
                                     gamma, zc, Fr.const(1))
            s = absorb(s, [q5a[k] for k in keys])
            v_std, s = PO.squeeze(Fr, pos, s)
            q5 = PS._stage_openings(ctx, st, q3, z_x, alpha, beta,
                                    gamma, zc, Fr.encode(v_std))
            c4 = prims_.commit_many(ctx, [q5["w_z_x_quo"],
                                          q5["w_z_omega_x"]])
            evals = {k: Fr.decode(q5[k]) for k in keys}
            ch = jnp.stack([alpha_std, Fr.decode(beta), Fr.decode(gamma),
                            z_std, v_std]).astype(U32)
            diag_bits = jnp.stack([
                st["satisfied"], q3["t_tail_zero"],
                q5["rem1"] == 0, q5["rem2"] == 0, den_ok])
            return c1, c2, c3, c4, evals, ch, nonce, diag_bits

        self._run = jax.jit(run)
        # whole-FS-proof batching: one dispatch proves B witnesses
        # (impossible with host hashing — the sponge lives on device).
        # The beta/gamma retry while_loop vmaps fine: lanes that found an
        # admissible pair early are masked while stragglers retry.
        self._run_many = jax.jit(jax.vmap(
            run, in_axes=(None, None, None, None, None, 0, 0, 0, 0, 0)))

    def _assemble(self, c1, c2, c3, c4, evals, ch, nonce, bits):
        from ..ops.curve import G1
        from .plonk import Proof
        from . import plonk_scaled as PS
        if not bool(bits[4]):
            raise RuntimeError(
                "no admissible beta/gamma in %d retries" % MAX_NONCE)
        pick = lambda cms, i: G1(cms.x[i], cms.y[i], cms.inf[i])
        proof = Proof(
            a_s=pick(c1, 0), b_s=pick(c1, 1), c_s=pick(c1, 2),
            z_s=pick(c2, 0), t_lo_s=pick(c3, 0), t_mid_s=pick(c3, 1),
            t_hi_s=pick(c3, 2), w_z_s=pick(c4, 0),
            w_z_omega_s=pick(c4, 1),
            **{k: v for k, v in evals.items()})
        diags = PS.ScaledDiagnostics(
            satisfied=bits[0], t_tail_zero=bits[1],
            w_z_rem_zero=bits[2], w_zw_rem_zero=bits[3])
        return (PoseidonFsProof(proof=proof, nonce=int(nonce),
                                challenge=np.asarray(ch)), diags)

    def _common_args(self):
        tbl = self._tbl
        return (tbl.x, tbl.y, tbl.inf, self._pre,
                jnp.asarray(self._state0))

    def prove_many(self, a_w, b_w, c_w, rand9, public_inputs=None):
        """B complete Fiat-Shamir proofs in ONE dispatch: inputs carry a
        leading batch axis; returns a list of (PoseidonFsProof, diags)."""
        ctx = self.ctx
        B = np.asarray(a_w).shape[0]
        pi = (jnp.zeros((B, ctx.n), U32) if public_inputs is None
              else jnp.asarray(public_inputs, U32))
        out = self._run_many(
            *self._common_args(), jnp.asarray(a_w, U32),
            jnp.asarray(b_w, U32), jnp.asarray(c_w, U32),
            jnp.asarray(rand9, U32), pi)
        # ONE bulk device->host fetch: per-field np.asarray would pay a
        # tunnel round trip per proof field per lane (~20*B transfers)
        c1, c2, c3, c4, evals, ch, nonce, bits = jax.device_get(out)
        import jax.tree_util as jtu
        lane = lambda t, i: jtu.tree_map(lambda x: x[i], t)
        return [self._assemble(lane(c1, i), lane(c2, i), lane(c3, i),
                               lane(c4, i),
                               {k: v[i] for k, v in evals.items()},
                               ch[i], nonce[i], bits[i])
                for i in range(B)]

    def prove(self, a_w, b_w, c_w, rand9, public_inputs=None):
        ctx = self.ctx
        pi = (jnp.zeros((ctx.n,), U32) if public_inputs is None
              else jnp.asarray(public_inputs, U32))
        out = self._run(
            *self._common_args(), jnp.asarray(a_w, U32),
            jnp.asarray(b_w, U32), jnp.asarray(c_w, U32),
            jnp.asarray(rand9, U32), pi)
        return self._assemble(*jax.device_get(out))


# ---------------- BN254 (production curve, 16-limb) ----------------
#
# The same single-dispatch design over BigMontField: Poseidon with t = 3,
# capacity = 1 (rate 2) at 254 bits — ~127-bit collision resistance from
# one capacity element. G1 coordinates live in Fq (a DIFFERENT modulus
# than the sponge's Fr), so each standard-form coordinate absorbs as two
# 128-bit halves (always < r, injective); evaluations are Fr elements and
# absorb directly. Host replay: the python-int HostSponge, which is
# already arbitrary-precision.

BN254_LABEL = b"tpu-plonk-bn254-fs-poseidon-v1"
_M128 = (1 << 128) - 1


def _bn254_from_words(w) -> int:
    w = np.asarray(w, dtype=np.uint64)
    v = 0
    for k in range(w.shape[-1] - 1, -1, -1):
        v = (v << 16) | int(w[k])
    return v


def _bn254_host_point_elements(pt) -> list:
    """Standard-form BigG1Affine -> [x_lo, x_hi, y_lo, y_hi, inf] ints
    (128-bit halves)."""
    x = _bn254_from_words(np.asarray(pt.x))
    y = _bn254_from_words(np.asarray(pt.y))
    return [x & _M128, x >> 128, y & _M128, y >> 128,
            int(bool(np.asarray(pt.inf)))]


def _bn254_preamble_elements(ctx, vk_points) -> list:
    from ..utils.params import BN254_FR
    r = BN254_FR.p
    elems = _label_elements(BN254_LABEL)
    elems += [r & _M128, r >> 128, ctx.n, ctx.k1, ctx.k2, ctx.omega % r]
    for pt in vk_points:
        elems += _bn254_host_point_elements(pt)
    return elems


def _bn254_device_point_elements(F, cms, count: int) -> list:
    """Standard-form word batch (count, 16) -> Montgomery absorb list,
    chunked identically to _bn254_host_point_elements."""
    zeros8 = jnp.zeros((8,), U32)
    out = []
    for i in range(count):
        for w in (cms.x[i], cms.y[i]):
            out.append(F.encode(jnp.concatenate([w[:8], zeros8])))
            out.append(F.encode(jnp.concatenate([w[8:], zeros8])))
        inf_w = jnp.zeros((16,), U32).at[0].set(cms.inf[i].astype(U32))
        out.append(F.encode(inf_w))
    return out


class BN254PoseidonFsProver:
    """One-jit-call non-interactive BN254 prover: all five protocol
    rounds, the on-device 254-bit Poseidon transcript, challenge
    derivation, and the beta/gamma retry loop in ONE dispatch — the
    production-curve sibling of PoseidonFsProver (the staged BLAKE2b
    BN254FsProver pays 6+ tunnel round trips per proof). `prove_many`
    batches B complete FS proofs per dispatch.

        fs = BN254PoseidonFsProver(ctx, selectors, copies)
        out, diags = fs.prove(a_w, b_w, c_w, rand9)
        assert verify_bn254_fs_poseidon(ctx, fs.vk, out)
    """

    def __init__(self, ctx, selectors, copies, prims=None,
                 capacity: int = 1):
        from . import plonk_bn254 as PB
        from ..utils.params import BN254_FR
        self.ctx = ctx
        self.capacity = capacity
        Fr, Fq = ctx.Fr, ctx.Fq
        r = BN254_FR.p
        self.pos = PO.make_params(r, t=3)
        sel = jnp.asarray(selectors, U32)
        cps = jnp.asarray(copies)
        prims_ = prims if prims is not None else PB._local_prims(ctx)
        self.vk = PB.make_vk_bn254(ctx, sel, cps, prims=prims_)
        self._vk_points = list(self.vk)

        hs = PO.HostSponge(self.pos, capacity)
        hs.absorb_elements(_bn254_preamble_elements(ctx, self._vk_points))
        self._state0 = np.stack([
            np.array([(int(v) >> (16 * k)) & 0xFFFF for k in range(16)],
                     dtype=np.uint32) for v in hs.state])

        pre = jax.jit(lambda s, c: PB.precompute_bn254(
            ctx, s, c, prims_))(sel, cps)
        pre = jax.tree_util.tree_map(jax.block_until_ready, pre)
        self._pre = pre
        pos, cap = self.pos, capacity
        n = ctx.n

        def dec_pts(cms):
            return PB.BigG1Affine(Fq.decode(cms.x), Fq.decode(cms.y),
                                  cms.inf)

        def run(pre_, state0_std, a_w, b_w, c_w, rnd9, pi):
            absorb = lambda s, es: PO.big_absorb_elements(Fr, pos, s, es,
                                                          cap)
            st = PB._stage_prep(ctx, a_w, b_w, c_w, rnd9, prims_, pre_,
                                pi)
            c1 = dec_pts(prims_.commit_many([st["a_x"], st["b_x"],
                                             st["c_x"]]))
            c1_elems = _bn254_device_point_elements(Fr, c1, 3)
            pid = PO.big_tree_digest(Fr, pos, pi)
            state0 = Fr.encode(state0_std)

            def attempt(nonce):
                nonce_w = jnp.zeros((16,), U32).at[0].set(nonce)
                s = absorb(state0, [pid, Fr.encode(nonce_w)])
                s = absorb(s, c1_elems)
                beta_std, s = PO.big_squeeze(Fr, pos, s)
                gamma_std, s = PO.big_squeeze(Fr, pos, s)
                beta, gamma = Fr.encode(beta_std), Fr.encode(gamma_std)
                z_x, den_ok = PB._stage_grand_product(ctx, st, beta,
                                                      gamma, prims_)
                return s, beta, gamma, z_x, den_ok

            def cond(carry):
                nonce, _, _, _, _, den_ok = carry
                return jnp.logical_and(~den_ok, nonce < MAX_NONCE)

            def body(carry):
                nonce = carry[0] + 1
                s, beta, gamma, z_x, den_ok = attempt(nonce)
                return (nonce, s, beta, gamma, z_x, den_ok)

            nonce0 = jnp.uint32(0)
            s, beta, gamma, z_x, den_ok = attempt(nonce0)
            nonce, s, beta, gamma, z_x, den_ok = jax.lax.while_loop(
                cond, body, (nonce0, s, beta, gamma, z_x, den_ok))

            c2 = dec_pts(prims_.commit_many([z_x]))
            s = absorb(s, _bn254_device_point_elements(Fr, c2, 1))
            alpha_std, s = PO.big_squeeze(Fr, pos, s)
            alpha = Fr.encode(alpha_std)
            q3 = PB._stage_quotient(ctx, st, z_x, alpha, beta, gamma,
                                    prims_)
            c3 = dec_pts(prims_.commit_many([q3["t_lo_x"], q3["t_mid_x"],
                                             q3["t_hi_x"]]))
            s = absorb(s, _bn254_device_point_elements(Fr, c3, 3))
            z_std, s = PO.big_squeeze(Fr, pos, s, pow_n_not_one=n)
            zc = Fr.encode(z_std)

            # evaluations are v-independent: compute with v = 1, absorb,
            # squeeze the real v, rerun the openings (XLA CSEs the shared
            # v-independent subgraph)
            keys = ("a_z", "b_z", "c_z", "s_sigma_1_z", "s_sigma_2_z",
                    "r_z", "z_omega_z")
            q5a = PB._stage_openings(ctx, st, q3, z_x, alpha, beta,
                                     gamma, zc, Fr.const(1))
            s = absorb(s, [q5a[k] for k in keys])
            v_std, s = PO.big_squeeze(Fr, pos, s)
            q5 = PB._stage_openings(ctx, st, q3, z_x, alpha, beta,
                                    gamma, zc, Fr.encode(v_std))
            c4 = dec_pts(prims_.commit_many([q5["w_z_x_quo"],
                                             q5["w_z_omega_x"]]))
            evals = {k: Fr.decode(q5[k]) for k in keys}
            ch = jnp.stack([alpha_std, Fr.decode(beta), Fr.decode(gamma),
                            z_std, v_std]).astype(U32)
            diag_bits = jnp.stack([
                st["satisfied"], q3["t_tail_zero"], q5["rem1"],
                q5["rem2"], den_ok])
            return c1, c2, c3, c4, evals, ch, nonce, diag_bits

        self._run = jax.jit(run)
        self._run_many = jax.jit(jax.vmap(
            run, in_axes=(None, None, 0, 0, 0, 0, 0)))

    def _assemble(self, c1, c2, c3, c4, evals, ch, nonce, bits):
        from . import plonk_bn254 as PB
        if not bool(bits[4]):
            raise RuntimeError(
                "no admissible beta/gamma in %d retries" % MAX_NONCE)
        pick = lambda cms, i: PB.BigG1Affine(cms.x[i], cms.y[i],
                                             cms.inf[i])
        proof = PB.BN254Proof(
            a_s=pick(c1, 0), b_s=pick(c1, 1), c_s=pick(c1, 2),
            z_s=pick(c2, 0), t_lo_s=pick(c3, 0), t_mid_s=pick(c3, 1),
            t_hi_s=pick(c3, 2), w_z_s=pick(c4, 0),
            w_z_omega_s=pick(c4, 1),
            **{k: v for k, v in evals.items()})
        diags = PB.BN254Diagnostics(
            satisfied=bits[0], t_tail_zero=bits[1],
            w_z_rem_zero=bits[2], w_zw_rem_zero=bits[3])
        return (PoseidonFsProof(proof=proof, nonce=int(nonce),
                                challenge=np.asarray(ch)), diags)

    def prove(self, a_w, b_w, c_w, rand9, public_inputs=None):
        ctx = self.ctx
        pi = (jnp.zeros((ctx.n, 16), U32) if public_inputs is None
              else jnp.asarray(public_inputs, U32))
        out = self._run(self._pre, jnp.asarray(self._state0),
                        jnp.asarray(a_w, U32), jnp.asarray(b_w, U32),
                        jnp.asarray(c_w, U32), jnp.asarray(rand9, U32),
                        pi)
        return self._assemble(*jax.device_get(out))

    def prove_many(self, a_w, b_w, c_w, rand9, public_inputs=None):
        """B complete BN254 FS proofs in ONE dispatch."""
        ctx = self.ctx
        B = np.asarray(a_w).shape[0]
        pi = (jnp.zeros((B, ctx.n, 16), U32) if public_inputs is None
              else jnp.asarray(public_inputs, U32))
        out = self._run_many(self._pre, jnp.asarray(self._state0),
                             jnp.asarray(a_w, U32), jnp.asarray(b_w, U32),
                             jnp.asarray(c_w, U32),
                             jnp.asarray(rand9, U32), pi)
        c1, c2, c3, c4, evals, ch, nonce, bits = jax.device_get(out)
        import jax.tree_util as jtu
        lane = lambda t, i: jtu.tree_map(lambda x: x[i], t)
        return [self._assemble(lane(c1, i), lane(c2, i), lane(c3, i),
                               lane(c4, i),
                               {k: v[i] for k, v in evals.items()},
                               ch[i], nonce[i], bits[i])
                for i in range(B)]


def derive_bn254_challenges_host(ctx, vk_points, proof, nonce: int,
                                 public_inputs=None,
                                 capacity: int = 1) -> np.ndarray:
    """Verifier-side BN254 transcript replay (python-int Poseidon).
    Returns (5, 16) standard-form challenge words."""
    from ..utils.params import BN254_FR
    r = BN254_FR.p
    pos = PO.make_params(r, t=3)
    n = ctx.n
    hs = PO.HostSponge(pos, capacity)
    hs.absorb_elements(_bn254_preamble_elements(ctx, vk_points))
    pi = ([0] * n if public_inputs is None
          else [_bn254_from_words(w) for w in np.asarray(public_inputs)])
    pid = PO.host_tree_digest(pos, pi)
    hs.absorb_elements([pid, int(nonce)])
    hs.absorb_elements(
        _bn254_host_point_elements(proof.a_s)
        + _bn254_host_point_elements(proof.b_s)
        + _bn254_host_point_elements(proof.c_s))
    beta = hs.squeeze()
    gamma = hs.squeeze()
    hs.absorb_elements(_bn254_host_point_elements(proof.z_s))
    alpha = hs.squeeze()
    hs.absorb_elements(
        _bn254_host_point_elements(proof.t_lo_s)
        + _bn254_host_point_elements(proof.t_mid_s)
        + _bn254_host_point_elements(proof.t_hi_s))
    z = hs.squeeze(pow_n_not_one=n)
    hs.absorb_elements([_bn254_from_words(np.asarray(getattr(proof, k)))
                        for k in ("a_z", "b_z", "c_z", "s_sigma_1_z",
                                  "s_sigma_2_z", "r_z", "z_omega_z")])
    v = hs.squeeze()
    return np.stack([np.array([(int(c) >> (16 * k)) & 0xFFFF
                               for k in range(16)], dtype=np.uint32)
                     for c in (alpha, beta, gamma, z, v)])


def verify_bn254_fs_poseidon(ctx, vk, fs_proof: PoseidonFsProof,
                             public_inputs=None) -> bool:
    """Replay the 254-bit Poseidon transcript off-device and run the two
    real-pairing checks."""
    from . import plonk_bn254 as PB
    ch = derive_bn254_challenges_host(ctx, list(vk), fs_proof.proof,
                                     fs_proof.nonce, public_inputs)
    return PB.verify_bn254(ctx, vk, fs_proof.proof, ch,
                           public_inputs=public_inputs)


def derive_challenges_host(ctx, vk_points, proof, nonce: int,
                           public_inputs=None,
                           capacity: int = 4) -> np.ndarray:
    """Verifier-side transcript replay (python-int Poseidon oracle).
    Returns [alpha beta gamma z v] standard form."""
    r = ctx.params.field.p
    pos = PO.make_params(r)
    n = ctx.n
    hs = PO.HostSponge(pos, capacity)
    hs.absorb_elements(_preamble_elements(ctx, vk_points))
    pi = ([0] * n if public_inputs is None
          else [int(v) for v in np.asarray(public_inputs)])
    pid = PO.host_tree_digest(pos, pi)
    hs.absorb_elements([pid, int(nonce)])
    hs.absorb_elements(
        _host_point_elements(proof.a_s) + _host_point_elements(proof.b_s)
        + _host_point_elements(proof.c_s))
    beta = hs.squeeze()
    gamma = hs.squeeze()
    hs.absorb_elements(_host_point_elements(proof.z_s))
    alpha = hs.squeeze()
    hs.absorb_elements(
        _host_point_elements(proof.t_lo_s)
        + _host_point_elements(proof.t_mid_s)
        + _host_point_elements(proof.t_hi_s))
    z = hs.squeeze(pow_n_not_one=n)
    hs.absorb_elements([int(np.asarray(getattr(proof, k))) for k in
                        ("a_z", "b_z", "c_z", "s_sigma_1_z",
                         "s_sigma_2_z", "r_z", "z_omega_z")])
    v = hs.squeeze()
    return np.array([alpha, beta, gamma, z, v], dtype=np.uint32)


def verify_scaled_fs_poseidon(ctx, vk, fs_proof: PoseidonFsProof,
                              public_inputs=None) -> bool:
    """Replay the Poseidon transcript off-device and run the two-pairing
    check; tampering with any commitment or evaluation shifts the derived
    challenges AND breaks the pairing identity."""
    from . import plonk_scaled as PS
    ch = derive_challenges_host(ctx, list(vk), fs_proof.proof,
                                fs_proof.nonce, public_inputs)
    return PS.verify_scaled(ctx, vk, fs_proof.proof, ch,
                            public_inputs=public_inputs)
