"""Verify drive for the round-3e changes (CPU backend, warm test cache):

1. make_prover_bn254 (precompute_bn254 path) proof == inline prove_bn254
   proof, bit for bit, and the real-pairing verifier accepts it.
2. BN254PoseidonFsProver (single-dispatch 254-bit Poseidon FS) round
   trip: prove -> verify_bn254_fs_poseidon, plus nonce-tamper rejection.
3. batch_inv rides the grand product in both (asserted indirectly by 1).

n = 16 keeps the XLA:CPU compiles minutes-scale; the conftest cache dir
is reused for warmth.
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

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
# reuse the fingerprinted test cache (see tests/conftest.py)
import hashlib  # noqa: E402


def _cpu_fingerprint() -> str:
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith("flags"):
                    fl = " ".join(sorted(line.split(":")[1].split()))
                    return hashlib.sha256(fl.encode()).hexdigest()[:12]
    except OSError:
        pass
    import platform
    return hashlib.sha256(platform.processor().encode()).hexdigest()[:12]


_CACHE = os.path.expanduser("~/.cache/plonk_tpu/xla_cpu_tests_"
                            + _cpu_fingerprint())
os.makedirs(_CACHE, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", _CACHE)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

import time  # noqa: E402
import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import jax.tree_util as jtu  # noqa: E402

from plonk_tpu.models import plonk_bn254 as PB  # noqa: E402
from plonk_tpu.models import fs_poseidon as FSP  # noqa: E402
from plonk_tpu.utils.params import BN254_FR  # noqa: E402

R = BN254_FR.p
N = 16


def words_vec(vals):
    return np.stack([np.array([(int(v) >> (16 * k)) & 0xFFFF
                               for k in range(16)], dtype=np.uint32)
                     for v in vals])


def main():
    t0 = time.time()
    rng = np.random.default_rng(7)
    ctx = PB.bn254_setup(N, rolled=True)
    print(f"[{time.time()-t0:.0f}s] setup done", flush=True)

    a = [int.from_bytes(rng.bytes(31), "little") % R for _ in range(N)]
    b = [int.from_bytes(rng.bytes(31), "little") % R for _ in range(N)]
    c = [(x * y) % R for x, y in zip(a, b)]
    sel = np.zeros((5, N, 16), dtype=np.uint32)
    sel[3] = words_vec([1] * N)       # q_m = 1
    sel[2] = words_vec([R - 1] * N)   # q_o = -1
    copies = np.stack([
        np.stack([np.full(N, t), np.arange(1, N + 1)], axis=-1)
        for t in range(3)]).astype(np.int32)
    aw, bw, cw = words_vec(a), words_vec(b), words_vec(c)
    ch = words_vec([111111, 222222, 333333, 444444, 555555])
    rnd = words_vec(list(range(17, 26)))

    # 1) precompute path == inline path, bit for bit
    proof_ref, diags_ref = jax.jit(
        lambda s, cp, x, y, z, ch_, rd: PB.prove_bn254(
            ctx, s, cp, x, y, z, ch_, rd))(sel, copies, aw, bw, cw, ch,
                                           rnd)
    assert bool(np.asarray(diags_ref.all_ok())), "inline proof invalid"
    print(f"[{time.time()-t0:.0f}s] inline prove ok", flush=True)

    prover = PB.make_prover_bn254(ctx, sel, copies)
    proof, diags = prover(aw, bw, cw, ch, rnd)
    assert bool(np.asarray(diags.all_ok())), "precompute proof invalid"
    for u, v in zip(jtu.tree_leaves(proof), jtu.tree_leaves(proof_ref)):
        assert np.array_equal(np.asarray(u), np.asarray(v)), \
            "precompute path diverges from inline path"
    print(f"[{time.time()-t0:.0f}s] precompute path BIT-IDENTICAL",
          flush=True)

    vk = PB.make_vk_bn254(ctx, sel, copies)
    ok = PB.verify_bn254(ctx, vk, proof, ch)
    assert ok, "pairing verifier rejected the precompute-path proof"
    print(f"[{time.time()-t0:.0f}s] pairing verify ok", flush=True)

    # 2) single-dispatch Poseidon FS prover round trip
    fs = FSP.BN254PoseidonFsProver(ctx, sel, copies)
    out, fdiags = fs.prove(aw, bw, cw, rnd)
    assert bool(np.asarray(fdiags.all_ok())), "FS proof diags bad"
    print(f"[{time.time()-t0:.0f}s] poseidon FS prove ok "
          f"(nonce={out.nonce})", flush=True)
    assert FSP.verify_bn254_fs_poseidon(ctx, fs.vk, out), \
        "FS verifier rejected an honest proof"
    bad = FSP.PoseidonFsProof(out.proof, out.nonce + 1, out.challenge)
    assert not FSP.verify_bn254_fs_poseidon(ctx, fs.vk, bad), \
        "FS verifier accepted a wrong nonce"
    print(f"[{time.time()-t0:.0f}s] poseidon FS roundtrip + tamper "
          "rejection OK", flush=True)
    print("VERIFY_R3E_ALL_OK", flush=True)


if __name__ == "__main__":
    main()
