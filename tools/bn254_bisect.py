"""Bisect the BN254 prover's commit-cost anomaly on the real TPU.

Round-3d ablation (tools/bench_micro.py bn254prof, n=2^10):
full prove 1029 ms, field-side-only 1.1 ms, the 9-commit GLV MSM alone
0.21 ms — commits IN CONTEXT cost ~1000x commits in isolation. Variants:

  full        all 4 commit_many calls real (GLV)       [baseline 1029ms]
  plain       all real, PLONK_TPU_BN254_GLV=0 (no endomorphism split)
  r1 / z / t / w   exactly ONE of the 4 commit_many call sites real
  none        all stubbed (field side only)             [baseline 1.1ms]

A stage-selective prims wrapper counts trace-time commit_many calls:
call order in prove_bn254 is fixed (round1 wires, z, t pieces, w pair).

Usage: python tools/bn254_bisect.py [log_n] [variant ...]
"""
import os
import sys
import time
import json

sys.path.insert(0, __file__.rsplit("/", 2)[0])
import numpy as np
import jax
import jax.numpy as jnp

# persistent compile cache through the remote-compile tunnel
cache = os.path.expanduser("~/.cache/plonk_tpu/xla_bench")
os.makedirs(cache, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", cache)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

from plonk_tpu.models import plonk_bn254 as PB  # noqa: E402
from plonk_tpu.utils.params import BN254_FR  # noqa: E402

print("backend:", jax.default_backend(), flush=True)
R = BN254_FR.p


def timeit(fn, *args, reps=6):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps


def words_vec(vals):
    return np.stack([np.array([(int(v) >> (16 * k)) & 0xFFFF
                               for k in range(16)], dtype=np.uint32)
                     for v in vals])


def selective_prims(ctx, mask):
    """mask[i] -> i-th commit_many CALL SITE is real (trace-time count)."""
    base = PB._local_prims(ctx)
    calls = [0]

    def cm(coeffs):
        i = calls[0]
        calls[0] += 1
        if i < len(mask) and mask[i]:
            return base.commit_many(coeffs)
        B = len(coeffs)
        z = jnp.zeros((B, 16), jnp.uint32)
        return PB.BigG1Affine(z, z, jnp.ones((B,), jnp.bool_))

    return base._replace(commit_many=cm)


def main():
    log_n = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    variants = sys.argv[2:] or ["full", "plain", "r1", "z", "t", "w",
                                "none"]
    n = 1 << log_n
    rng = np.random.default_rng(0)
    t0 = time.perf_counter()
    ctx = PB.bn254_setup(n, rolled=True)
    print(f"setup: {time.perf_counter()-t0:.1f}s", flush=True)

    a = [int.from_bytes(rng.bytes(31), "little") % R for _ in range(n)]
    b = [int.from_bytes(rng.bytes(31), "little") % R for _ in range(n)]
    c = [(x * y) % R for x, y in zip(a, b)]
    sel = np.zeros((5, n, 16), dtype=np.uint32)
    sel[3] = words_vec([1] * n)
    sel[2] = words_vec([R - 1] * n)
    copies = np.stack([
        np.stack([np.full(n, t), np.arange(1, n + 1)], axis=-1)
        for t in range(3)]).astype(np.int32)
    aj, bj, cj = (jnp.asarray(v) for v in
                  (words_vec(a), words_vec(b), words_vec(c)))
    ch = jnp.asarray(words_vec([111111, 222222, 333333, 444444, 555555]))
    rnd = jnp.asarray(words_vec(list(range(17, 26))))

    MASKS = {"full": (1, 1, 1, 1), "plain": (1, 1, 1, 1),
             "r1": (1, 0, 0, 0), "z": (0, 1, 0, 0), "t": (0, 0, 1, 0),
             "w": (0, 0, 0, 1), "none": (0, 0, 0, 0)}
    for name in variants:
        os.environ["PLONK_TPU_BN254_GLV"] = "0" if name == "plain" else "1"
        t0 = time.perf_counter()
        prims = selective_prims(ctx, MASKS[name])
        prover = PB.make_prover_bn254(ctx, sel, copies, prims=prims)
        out = prover(aj, bj, cj, ch, rnd)
        jax.block_until_ready(out)
        build = time.perf_counter() - t0
        dt = timeit(lambda: prover(aj, bj, cj, ch, rnd))
        print(json.dumps({"variant": name, "log_n": log_n,
                          "ms": round(dt * 1000, 2),
                          "compile_s": round(build, 1)}), flush=True)


if __name__ == "__main__":
    main()
