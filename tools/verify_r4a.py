"""Verify drive for the round-4a changes (CPU backend):
1. entry() toy path -> r_z == 15 (bit-exact anchor).
2. Scaled prove -> verify round trip + tamper rejection at n=16, with
   the commit path flipped PLONK_TPU_PALLAS_MSM=0 -> 1 -> 0 on the SAME
   live ctx (the keyed _fb_tables cache) — proofs must be bit-identical
   across layouts and the verifier must accept both.
3. Fiat-Shamir round trip + wrong-nonce rejection.
"""
import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import jax.tree_util as jtu  # noqa: E402


def main():
    import time
    t0 = time.time()

    # 1) toy bit-exact anchor
    import __graft_entry__ as g
    fn, args = g.entry()
    out = jax.jit(fn)(*args)
    jax.block_until_ready(out)
    assert int(out[0].r_z) == 15, "entry r_z != 15"
    print(f"[{time.time()-t0:.0f}s] entry ok (r_z=15)", flush=True)

    # 2) scaled round trip with the commit layout flipped on a live ctx
    from plonk_tpu.models import plonk_scaled as PS
    from plonk_tpu.models.synthetic import square_chain_circuit
    from plonk_tpu.utils.params import SCALED_FR

    n = 16
    ctx = PS.scaled_new(n, secret=778899)
    sel, copies, a, b, c = square_chain_circuit(SCALED_FR.p, n, x0=5)
    ch = np.array([1111, 2222, 3333, 4444, 5555], dtype=np.uint32)
    rnd = np.array([11, 22, 33, 44, 55, 66, 77, 88, 99], dtype=np.uint32)

    proofs = {}
    for flag in ("0", "1", "0"):
        os.environ["PLONK_TPU_PALLAS_MSM"] = flag
        prover = PS.make_prover(ctx, sel, copies)
        proof, diags = prover(a, b, c, ch, rnd)
        assert bool(np.asarray(diags.all_ok())), f"diags bad (flag={flag})"
        proofs.setdefault(flag, []).append(proof)
    ref = proofs["0"][0]
    for flag, plist in proofs.items():
        for proof in plist:
            for u, v in zip(jtu.tree_leaves(proof), jtu.tree_leaves(ref)):
                assert np.array_equal(np.asarray(u), np.asarray(v)), \
                    f"layout flip changed the proof (flag={flag})"
    print(f"[{time.time()-t0:.0f}s] scaled proofs bit-identical across "
          "commit layouts", flush=True)

    vk = PS.make_vk_scaled(ctx, sel, copies)
    assert PS.verify_scaled(ctx, vk, ref, ch), "verifier rejected"
    bad = ref._replace(a_z=(ref.a_z + 1) % SCALED_FR.p)
    assert not PS.verify_scaled(ctx, vk, bad, ch), "tamper accepted"
    print(f"[{time.time()-t0:.0f}s] verify + tamper rejection ok",
          flush=True)

    # 3) Fiat-Shamir round trip
    from plonk_tpu.models import fiat_shamir as FS
    fsp = FS.ScaledFsProver(ctx, sel, copies)
    fs_out, fdiags = fsp.prove(a, b, c, rnd)
    assert bool(np.asarray(fdiags.all_ok()))
    assert FS.verify_scaled_fs(ctx, fsp.vk, fs_out), "FS rejected"
    bad_fs = FS.FsProof(fs_out.proof, fs_out.nonce + 1, fs_out.challenge)
    assert not FS.verify_scaled_fs(ctx, fsp.vk, bad_fs), \
        "FS accepted wrong nonce"
    print(f"[{time.time()-t0:.0f}s] FS roundtrip + nonce tamper ok",
          flush=True)
    print("VERIFY_R4A_ALL_OK", flush=True)


if __name__ == "__main__":
    main()
