"""End-to-end PLONK over BN254 (models/plonk_bn254.py): prove + verify
with real optimal-ate pairing checks at a small domain, commitment
cross-check against a python-int KZG evaluation at the known test tau
(the oracle style of src/plonk-test.c, production curve).
"""
import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

if not os.environ.get("PLONK_TPU_HEAVY_TESTS"):
    pytest.skip("BN254 end-to-end graphs (16-limb prover + real-pairing "
                "verifier) take on the order of an hour of XLA CPU "
                "compile; set PLONK_TPU_HEAVY_TESTS=1 to run this lane "
                "(results recorded in BENCH_NOTES.md)",
                allow_module_level=True)

import bn254_oracle as O
from plonk_tpu.models import plonk_bn254 as PB
from plonk_tpu.utils.params import BN254_FR

R = BN254_FR.p
N = 8
SECRET = 987654321
RNG = np.random.default_rng(7)


def words(v, n=16):
    return np.array([(int(v) >> (16 * k)) & 0xFFFF for k in range(n)],
                    dtype=np.uint32)


def words_vec(vals):
    return np.stack([words(v) for v in vals])


def from_words(w):
    w = np.asarray(w, dtype=np.uint64)
    v = 0
    for k in range(w.shape[-1] - 1, -1, -1):
        v = (v << 16) | int(w[k])
    return v


@pytest.fixture(scope="module")
def ctx():
    return PB.bn254_setup(N, secret=SECRET, rolled=True)


@pytest.fixture(scope="module")
def circuit():
    """n mul gates c = a*b, identity copy permutation."""
    a = [int.from_bytes(RNG.bytes(31), "little") % R for _ in range(N)]
    b = [int.from_bytes(RNG.bytes(31), "little") % R for _ in range(N)]
    c = [(x * y) % R for x, y in zip(a, b)]
    sel = np.zeros((5, N, 16), dtype=np.uint32)
    sel[3] = words_vec([1] * N)                     # q_m = 1
    sel[2] = words_vec([R - 1] * N)                 # q_o = -1
    copies = np.stack([
        np.stack([np.full(N, t), np.arange(1, N + 1)], axis=-1)
        for t in range(3)]).astype(np.int32)        # identity permutation
    return (sel, copies, words_vec(a), words_vec(b), words_vec(c),
            a, b, c)


@pytest.fixture(scope="module")
def proof_and_inputs(ctx, circuit):
    sel, copies, aw, bw, cw, a, b, c = circuit
    challenge = words_vec([111111, 222222, 333333, 444444, 555555])
    rand9 = words_vec(list(range(17, 26)))
    fn = jax.jit(lambda s, cp, x, y, z, ch, rd: PB.prove_bn254(
        ctx, s, cp, x, y, z, ch, rd))
    proof, diags = fn(sel, copies, aw, bw, cw, challenge, rand9)
    return proof, diags, challenge, rand9


class TestProver:
    def test_diagnostics(self, proof_and_inputs):
        _, diags, _, _ = proof_and_inputs
        assert bool(np.asarray(diags.satisfied))
        assert bool(np.asarray(diags.t_tail_zero))
        assert bool(np.asarray(diags.w_z_rem_zero))
        assert bool(np.asarray(diags.w_zw_rem_zero))

    def test_precompute_path_bit_identical(self, ctx, circuit,
                                           proof_and_inputs):
        """make_prover_bn254 (circuit tables computed once by
        precompute_bn254, threaded as runtime args) produces the
        bit-identical proof to the inline prove_bn254 path."""
        import jax.tree_util as jtu
        sel, copies, aw, bw, cw = circuit[:5]
        proof_ref, _, challenge, rand9 = proof_and_inputs
        prover = PB.make_prover_bn254(ctx, sel, copies)
        proof, diags = prover(aw, bw, cw, challenge, rand9)
        assert bool(np.asarray(diags.all_ok()))
        for u, v in zip(jtu.tree_leaves(proof), jtu.tree_leaves(proof_ref)):
            assert np.array_equal(np.asarray(u), np.asarray(v))

    def test_wire_commitment_matches_kzg_oracle(self, proof_and_inputs,
                                                circuit):
        """a_s must equal [a_x(tau)] * G computed with python ints:
        a_x = (b1 x + b2) z_H + sum_i a_i L_i(x), evaluated at the known
        test tau via barycentric Lagrange."""
        proof, _, _, rand9 = proof_and_inputs
        _, _, _, _, _, a, _, _ = circuit
        tau = SECRET % R
        omega = BN254_FR.root_of_unity(N)
        zh_tau = (pow(tau, N, R) - 1) % R
        n_inv = pow(N, -1, R)
        acc = 0
        for i, ai in enumerate(a):
            wi = pow(omega, i, R)
            li = zh_tau * n_inv % R * wi % R * pow((tau - wi) % R, R - 2,
                                                   R) % R
            acc = (acc + ai * li) % R
        b1, b2 = 17, 18                      # rand9[0], rand9[1]
        a_tau = ((b1 * tau + b2) % R * zh_tau + acc) % R
        exp = O.g1_mul(O.G1_GEN, a_tau)
        got = (from_words(np.asarray(proof.a_s.x)),
               from_words(np.asarray(proof.a_s.y)))
        assert not bool(np.asarray(proof.a_s.inf))
        assert got == exp


class TestVerifier:
    def test_accept(self, ctx, circuit, proof_and_inputs):
        sel, copies = circuit[0], circuit[1]
        proof, _, challenge, _ = proof_and_inputs
        vk = PB.make_vk_bn254(ctx, sel, copies)
        assert PB.verify_bn254(ctx, vk, proof, challenge)

    def test_tamper_rejects(self, ctx, circuit, proof_and_inputs):
        sel, copies = circuit[0], circuit[1]
        proof, _, challenge, _ = proof_and_inputs
        vk = PB.make_vk_bn254(ctx, sel, copies)
        bad = proof._replace(a_z=jnp.asarray(
            words((from_words(np.asarray(proof.a_z)) + 1) % R)))
        assert not PB.verify_bn254(ctx, vk, bad, challenge)


class TestFiatShamir:
    def test_fs_roundtrip_and_tamper(self, ctx, circuit):
        from plonk_tpu.models import fiat_shamir as FS
        sel, copies, aw, bw, cw, _, _, _ = circuit
        rand9 = words_vec(list(range(31, 40)))
        fs = FS.BN254FsProver(ctx, sel, copies)
        out, diags = fs.prove(aw, bw, cw, rand9)
        assert bool(np.asarray(diags.satisfied))
        assert bool(np.asarray(diags.t_tail_zero))
        assert FS.verify_bn254_fs(ctx, fs.vk, out)
        bad = FS.FsProof(out.proof, out.nonce + 1, out.challenge)
        assert not FS.verify_bn254_fs(ctx, fs.vk, bad)

    def test_verify_many(self, ctx, circuit, proof_and_inputs):
        """Batched verification: 2 lanes (same proof, two challenge
        sets -> [True, True]); tamper in lane 0 rejects only lane 0."""
        sel, copies = circuit[0], circuit[1]
        proof, _, challenge, _ = proof_and_inputs
        vk = PB.make_vk_bn254(ctx, sel, copies)
        ch2 = words_vec([999999, 888888, 777777, 666666, 555555])
        proof2, _ = jax.jit(lambda s, cp, x, y, z, ch, rd: PB.prove_bn254(
            ctx, s, cp, x, y, z, ch, rd))(
                sel, copies, circuit[2], circuit[3], circuit[4], ch2,
                words_vec(list(range(17, 26))))
        batch = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs),
                                       proof, proof2)
        chs = jnp.stack([jnp.asarray(challenge), jnp.asarray(ch2)])
        ok = PB.verify_bn254_many(ctx, vk, batch, chs)
        assert np.asarray(ok).tolist() == [True, True]
        tam = batch._replace(a_z=batch.a_z.at[0, 0].set(
            (batch.a_z[0, 0] + 1) % (1 << 16)))
        ok2 = PB.verify_bn254_many(ctx, vk, tam, chs)
        assert np.asarray(ok2).tolist() == [False, True]


class TestDistProver:
    def test_sharded_bit_identical(self, ctx, circuit, proof_and_inputs):
        """Mesh-sharded BN254 prover (dist limb NTT + sharded grand
        product + sharded Pippenger commitments) == single-chip, bit for
        bit (parallel/dist_bn254.py; VERDICT r1 item 1 at production
        scale)."""
        from plonk_tpu.parallel.mesh import make_1d_mesh
        from plonk_tpu.parallel import dist_bn254 as DB
        sel, copies, aw, bw, cw = circuit[:5]
        proof_ref, _, challenge, rand9 = proof_and_inputs
        mesh = make_1d_mesh("sp", 2)
        prims = DB.make_dist_bn254_prims(ctx, mesh)
        proof, diags = PB.prove_bn254(ctx, sel, copies, aw, bw, cw,
                                      challenge, rand9, prims=prims)
        assert bool(np.asarray(diags.all_ok()))
        for f in ("a_z", "b_z", "c_z", "s_sigma_1_z", "s_sigma_2_z",
                  "r_z", "z_omega_z"):
            assert np.array_equal(np.asarray(getattr(proof, f)),
                                  np.asarray(getattr(proof_ref, f))), f
        for f in ("a_s", "b_s", "c_s", "z_s", "t_lo_s", "t_mid_s",
                  "t_hi_s", "w_z_s", "w_z_omega_s"):
            q1, q2 = getattr(proof, f), getattr(proof_ref, f)
            assert np.array_equal(np.asarray(q1.x), np.asarray(q2.x)), f
            assert np.array_equal(np.asarray(q1.y), np.asarray(q2.y)), f
            assert bool(np.asarray(q1.inf)) == bool(np.asarray(q2.inf)), f


class TestBN254PoseidonFs:
    """The single-dispatch 254-bit Poseidon FS prover
    (fs_poseidon.BN254PoseidonFsProver) — round trip through the pairing
    verifier, host-transcript lockstep, tamper rejection, and prove_many
    lane consistency (VERDICT r3 missing 4: this prover was previously
    exercised only by the manual tools/verify_r3e.py script)."""

    @pytest.fixture(scope="class")
    def fs_and_proof(self, ctx, circuit):
        from plonk_tpu.models import fs_poseidon as FSP
        sel, copies, aw, bw, cw = circuit[:5]
        rand9 = words_vec(list(range(41, 50)))
        fs = FSP.BN254PoseidonFsProver(ctx, sel, copies)
        out, diags = fs.prove(aw, bw, cw, rand9)
        return fs, out, diags, rand9

    def test_roundtrip(self, ctx, fs_and_proof):
        from plonk_tpu.models import fs_poseidon as FSP
        fs, out, diags, _ = fs_and_proof
        assert bool(np.asarray(diags.all_ok()))
        assert FSP.verify_bn254_fs_poseidon(ctx, fs.vk, out)

    def test_host_transcript_lockstep(self, ctx, fs_and_proof):
        """The device sponge and the python-int host replay must derive
        the SAME five challenges from the same proof points."""
        from plonk_tpu.models import fs_poseidon as FSP
        fs, out, _, _ = fs_and_proof
        ch_host = FSP.derive_bn254_challenges_host(
            ctx, list(fs.vk), out.proof, out.nonce)
        assert np.array_equal(np.asarray(ch_host),
                              np.asarray(out.challenge))

    def test_tamper_rejects(self, ctx, fs_and_proof):
        from plonk_tpu.models import fs_poseidon as FSP
        fs, out, _, _ = fs_and_proof
        bad_nonce = FSP.PoseidonFsProof(out.proof, out.nonce + 1,
                                        out.challenge)
        assert not FSP.verify_bn254_fs_poseidon(ctx, fs.vk, bad_nonce)
        tam = out.proof._replace(a_z=np.asarray(
            words((from_words(np.asarray(out.proof.a_z)) + 1) % R)))
        bad_eval = FSP.PoseidonFsProof(tam, out.nonce, out.challenge)
        assert not FSP.verify_bn254_fs_poseidon(ctx, fs.vk, bad_eval)

    def test_prove_many_matches_single(self, ctx, circuit, fs_and_proof):
        """prove_many lane 0 with the same witness/rand must reproduce
        the single-proof path bit for bit (vmapped graph == scalar)."""
        import jax.tree_util as jtu
        fs, out, _, rand9 = fs_and_proof
        sel, copies, aw, bw, cw = circuit[:5]
        outs = fs.prove_many(aw[None], bw[None], cw[None], rand9[None])
        assert len(outs) == 1
        out2, diags2 = outs[0]
        assert bool(np.asarray(diags2.all_ok()))
        assert out2.nonce == out.nonce
        assert np.array_equal(out2.challenge, out.challenge)
        for u, v in zip(jtu.tree_leaves(out2.proof),
                        jtu.tree_leaves(out.proof)):
            assert np.array_equal(np.asarray(u), np.asarray(v))
