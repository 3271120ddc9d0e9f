"""Round-5 verify drive (CPU): scaled round trip + tamper, FS, toy entry.

Light on purpose — the TPU device queue runs concurrently; this stays on
the CPU backend and small n.
"""
import os
import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np
import jax.numpy as jnp


def main():
    from plonk_tpu.models import plonk_scaled as PS
    from plonk_tpu.utils.params import SCALED_FR
    n = 32
    ctx = PS.scaled_new(n)
    rng = np.random.default_rng(7)
    R = SCALED_FR.p
    # mul gates: a*b=c
    a = rng.integers(1, R, size=n, dtype=np.uint64)
    b = rng.integers(1, R, size=n, dtype=np.uint64)
    c = (a * b) % R
    sel = np.zeros((5, n), dtype=np.uint32)
    sel[3] = 1                      # q_m = 1
    sel[2] = R - 1                  # q_o = -1
    copies = np.stack([
        np.stack([np.full(n, t), np.arange(1, n + 1)], axis=-1)
        for t in range(3)]).astype(np.int32)
    ch = np.array([111111, 222222, 333333, 444444, 555555], dtype=np.uint64)
    rnd = np.arange(17, 26, dtype=np.uint64)
    proof, diags = PS.prove_scaled(ctx, jnp.asarray(sel, jnp.uint32),
                                   jnp.asarray(copies),
                                   jnp.asarray(a, jnp.uint32),
                                   jnp.asarray(b, jnp.uint32),
                                   jnp.asarray(c, jnp.uint32),
                                   jnp.asarray(ch, jnp.uint32),
                                   jnp.asarray(rnd, jnp.uint32))
    assert bool(diags.all_ok()), "prove diags not ok"
    vk = PS.make_vk_scaled(ctx, jnp.asarray(sel, jnp.uint32),
                           jnp.asarray(copies))
    ok = PS.verify_scaled(ctx, vk, proof, jnp.asarray(ch, jnp.uint32))
    assert bool(ok), "verify rejected a valid proof"
    # tamper: bump one evaluation (Proof is a NamedTuple)
    bad = proof._replace(r_z=(proof.r_z + 1) % jnp.uint32(R))
    ok_bad = PS.verify_scaled(ctx, vk, bad, jnp.asarray(ch, jnp.uint32))
    assert not bool(ok_bad), "verifier accepted a tampered proof"
    print("scaled round trip + tamper: OK")

    # Fiat-Shamir
    from plonk_tpu.models import fiat_shamir as FS
    prover = FS.ScaledFsProver(ctx, jnp.asarray(sel, jnp.uint32),
                               jnp.asarray(copies))
    out = prover.prove(jnp.asarray(a, jnp.uint32),
                       jnp.asarray(b, jnp.uint32),
                       jnp.asarray(c, jnp.uint32),
                       jnp.asarray(rnd, jnp.uint32))
    fs_proof = out[0] if isinstance(out, tuple) and not hasattr(
        out, "proof") else out
    assert bool(FS.verify_scaled_fs(ctx, prover.vk, fs_proof)), \
        "FS verify rejected"
    fs_bad = fs_proof._replace(proof=fs_proof.proof._replace(
        r_z=(fs_proof.proof.r_z + 1) % jnp.uint32(R)))
    assert not bool(FS.verify_scaled_fs(ctx, prover.vk, fs_bad)), \
        "FS verifier accepted tampered proof"
    print("fiat-shamir round trip + tamper: OK")

    # toy bit-exact entry
    import __graft_entry__ as G
    fn, args = G.entry()
    out = fn(*args)
    proofs = out[0] if isinstance(out, tuple) else out
    r_z = int(np.asarray(proofs.r_z).ravel()[0])
    assert r_z == 15, f"entry r_z = {r_z} != 15"
    print("toy entry r_z == 15: OK")

    # headline bench lane (the edit under test): varied-rnds path
    import bench
    v = bench.bench_prover_batch(128)
    assert v > 0
    print(f"bench_prover_batch(128) on CPU: {v:.0f} proofs/s OK")


if __name__ == "__main__":
    main()
    print("VERIFY DRIVE: ALL OK")
