"""Default-suite BN254 end-to-end smoke: ONE tiny-n prove/verify round
trip on the production curve (VERDICT r4 item 7 — production-curve
correctness must not be heavy-lane-only).

The circuit/challenge constants deliberately MIRROR the dryrun's BN254
leg (__graft_entry__.leg_bn254_prover: n=8, secret=987654321, rng seed
11), so the prover graph here is the same XLA module and hits the same
persistent-cache entries; warm re-runs are minutes, not the hour-scale
cold compile of the full heavy lane (tests/test_plonk_bn254.py).
"""
import numpy as np
import jax
import jax.numpy as jnp

from plonk_tpu.models import plonk_bn254 as PB
from plonk_tpu.utils.params import BN254_FR

R = BN254_FR.p
N = 8


def words_vec(vals):
    return np.stack([
        np.array([(int(v) >> (16 * k)) & 0xFFFF for k in range(16)],
                 dtype=np.uint32) for v in vals])


def from_words(w):
    w = np.asarray(w, dtype=np.uint64)
    v = 0
    for k in range(w.shape[-1] - 1, -1, -1):
        v = (v << 16) | int(w[k])
    return v


def test_bn254_prove_verify_smoke():
    rng = np.random.default_rng(11)
    av = [int.from_bytes(rng.bytes(31), "little") % R for _ in range(N)]
    bv = [int.from_bytes(rng.bytes(31), "little") % R for _ in range(N)]
    cv = [(x * y) % R for x, y in zip(av, bv)]
    sel = np.zeros((5, N, 16), dtype=np.uint32)
    sel[3] = words_vec([1] * N)                  # q_m = 1
    sel[2] = words_vec([R - 1] * N)              # q_o = -1
    copies = np.stack([
        np.stack([np.full(N, t), np.arange(1, N + 1)], axis=-1)
        for t in range(3)]).astype(np.int32)
    ch = words_vec([111111, 222222, 333333, 444444, 555555])
    rnd = words_vec(list(range(17, 26)))
    ctx = PB.bn254_setup(N, secret=987654321, rolled=True)
    args = (sel, copies, words_vec(av), words_vec(bv), words_vec(cv))
    proof, diags = jax.jit(lambda c_, r_: PB.prove_bn254(
        ctx, *args, c_, r_))(ch, rnd)
    assert bool(diags.all_ok()), "BN254 smoke: prover diagnostics"

    vk = PB.make_vk_bn254(ctx, sel, copies)
    assert PB.verify_bn254(ctx, vk, proof, ch), "BN254 smoke: accept"
    bad = proof._replace(a_z=jnp.asarray(words_vec(
        [(from_words(np.asarray(proof.a_z)) + 1) % R])[0]))
    assert not PB.verify_bn254(ctx, vk, bad, ch), \
        "BN254 smoke: tampered proof must reject"
