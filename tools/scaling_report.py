"""Multi-device scaling-efficiency report for the distributed NTT and MSM.

Measures throughput at mesh sizes 1, 2, 4, 8 and reports efficiency
relative to ideal linear scaling. On this container it runs against virtual
CPU devices (xla_force_host_platform_device_count) — a harness check of the
collective paths, NOT a hardware number; on a real multi-chip slice the
same script produces the ICI scaling report (BASELINE.md north-star:
>= 80% efficiency to a v5e multi-host slice).

Usage: python tools/scaling_report.py [--backend cpu|tpu] [--logn 18]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--backend", default="cpu", choices=["cpu", "tpu"])
    ap.add_argument("--logn", type=int, default=16)
    ap.add_argument("--devices", type=int, default=8)
    args = ap.parse_args()

    if args.backend == "cpu":
        os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "") +
                                   f" --xla_force_host_platform_device_count="
                                   f"{args.devices}").strip()
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    import jax
    if args.backend == "cpu":
        jax.config.update("jax_platforms", "cpu")

    import numpy as np
    import jax.numpy as jnp
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
    from plonk_tpu.utils.params import BABYBEAR
    from plonk_tpu.ops.field import MontField
    from plonk_tpu.parallel import dist_ntt as DN

    M = MontField(BABYBEAR)
    n = 1 << args.logn
    w = BABYBEAR.root_of_unity(n)
    rng = np.random.default_rng(0)
    v = M.array(rng.integers(0, M.p, size=n, dtype=np.uint32))

    devs = jax.devices()
    results = {}
    d = 1
    while d <= min(args.devices, len(devs)):
        mesh = Mesh(np.array(devs[:d]), ("sp",))
        vs = jax.device_put(v, NamedSharding(mesh, P("sp")))
        fn = jax.jit(lambda x: DN.dist_intt(
            M, mesh, DN.dist_ntt(M, mesh, x, w), w))
        out = fn(vs)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        reps = 5
        for _ in range(reps):
            out = fn(vs)
        jax.block_until_ready(out)
        secs = (time.perf_counter() - t0) / reps
        results[d] = n / secs
        d *= 2

    base = results[1]
    report = {
        "metric": "dist_ntt_roundtrip_elems_per_s",
        "backend": args.backend,
        "n": n,
        "throughput": {str(k): round(val, 1) for k, val in results.items()},
        "efficiency_vs_1dev": {
            str(k): round(val / (base * k), 3) for k, val in results.items()},
    }
    print(json.dumps(report, indent=2))

    # ---- PROVER-level scaling: the full sharded prove_scaled ----
    # (VERDICT round-1 item 1: efficiency of the wired-in distributed
    # kernels, not just the standalone NTT.)
    from plonk_tpu.models import plonk_scaled as PS
    from plonk_tpu.models.synthetic import square_chain_circuit
    from plonk_tpu.parallel import dist_prover as DP
    from plonk_tpu.utils.params import SCALED_FR

    logn_p = min(args.logn, 10 if args.backend == "cpu" else args.logn)
    n_p = 1 << logn_p
    ctx = PS.scaled_new(n_p, secret=987651234)
    sel, cps, a, b, c = square_chain_circuit(SCALED_FR.p, n_p, x0=5)
    ch = np.array([1111, 2222, 3333, 4444, 5555], dtype=np.uint32)
    rnd = np.arange(1, 10, dtype=np.uint32)
    argsj = tuple(jnp.asarray(x) for x in (sel, cps, a, b, c))

    presults = {}
    d = 1
    while d <= min(args.devices, len(devs)):
        mesh = Mesh(np.array(devs[:d]), ("sp",))
        prims = DP.make_dist_prims(ctx, mesh) if d > 1 else None
        fn = jax.jit(lambda chv, rnv: PS.prove_scaled(
            ctx, *argsj, chv, rnv, prims=prims))
        out = fn(ch, rnd)
        jax.block_until_ready(out[0].r_z)
        assert bool(out[1].all_ok()), f"prover diags failed at d={d}"
        t0 = time.perf_counter()
        reps = 3
        for _ in range(reps):
            out = fn(ch, rnd)
        jax.block_until_ready(out[0].r_z)
        presults[d] = (time.perf_counter() - t0) / reps
        d *= 2

    pbase = presults[1]
    report = {
        "metric": "sharded_prove_scaled_seconds",
        "backend": args.backend,
        "n_gates": n_p,
        "seconds": {str(k): round(val, 4) for k, val in presults.items()},
        "speedup_vs_1dev": {
            str(k): round(pbase / val, 3) for k, val in presults.items()},
        "efficiency_vs_1dev": {
            str(k): round(pbase / val / k, 3)
            for k, val in presults.items()},
    }
    print(json.dumps(report, indent=2))


if __name__ == "__main__":
    main()
