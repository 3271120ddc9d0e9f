"""One-time 2^20 scaled-prover feasibility probe on the real chip
(VERDICT r4 item 6 / BASELINE.md upper end): times each stage —
scaled_new SRS build, fixed-base table build at PLONK_TPU_FB_WB
(default 3: the wb=4 Pallas-layout table is ~1.2 GB at 2^20; wb=3 is
~700 MB and ~2.5x cheaper to build), prover compile, and the proof
itself — and leaves the table disk-cached for the bench lane.

    PLONK_TPU_FB_WB=3 python tools/probe_2e20.py [log_n]
"""
import sys
import os
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("PLONK_TPU_FB_WB", "3")

import numpy as np
import jax

cache = os.path.expanduser("~/.cache/plonk_tpu/xla_bench")
os.makedirs(cache, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", cache)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

import jax.numpy as jnp
from plonk_tpu.models import plonk_scaled as PS
from plonk_tpu.models.synthetic import square_chain_circuit
from plonk_tpu.utils.params import SCALED_FR


def main():
    log_n = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    n = 1 << log_n
    t0 = time.perf_counter()
    ctx = PS.scaled_new(n)
    jax.block_until_ready(ctx.srs.g1s.x)
    print(f"scaled_new(2^{log_n}): {time.perf_counter()-t0:.1f}s",
          flush=True)

    t0 = time.perf_counter()
    tbl = PS.fixed_base_table(ctx)
    jax.block_until_ready(tbl.x)
    gb = (tbl.x.nbytes + tbl.y.nbytes) / 1e9
    print(f"fb table wb={tbl.window_bits}: {time.perf_counter()-t0:.1f}s "
          f"({gb:.2f} GB)", flush=True)

    sel, copies, a, b, c = square_chain_circuit(SCALED_FR.p, n)
    t0 = time.perf_counter()
    prover = PS.make_prover(ctx, sel, copies)
    aj, bj, cj = (jax.device_put(jnp.asarray(v, jnp.uint32))
                  for v in (a, b, c))
    ch = jnp.asarray(np.array([1111, 2222, 3333, 4444, 5555], np.uint32))
    rnd = jnp.asarray(np.arange(1, 10, dtype=np.uint32))
    proof, diags = prover(aj, bj, cj, ch, rnd)
    jax.block_until_ready(proof.r_z)
    print(f"compile+first proof: {time.perf_counter()-t0:.1f}s", flush=True)
    assert bool(diags.all_ok()), "2^20 proof diags"

    # async-batched timing with distinct blinding per rep
    reps = 12
    variants = [(rnd + jnp.uint32(97 * i)) % jnp.uint32(SCALED_FR.p)
                for i in range(reps + 1)]
    out = prover(aj, bj, cj, ch, variants[0])
    jax.block_until_ready(out[0].r_z)
    t0 = time.perf_counter()
    for v in variants[1:]:
        out = prover(aj, bj, cj, ch, v)
    jax.block_until_ready(out[0].r_z)
    dt = (time.perf_counter() - t0) / reps
    print(f"proof: {dt*1000:.2f} ms = {1.0/dt:.2f} proofs/s", flush=True)


if __name__ == "__main__":
    main()
