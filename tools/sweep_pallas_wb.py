"""Sweep window widths for the fused Pallas commit kernel (real TPU).

Companion to sweep_fb_windows.py (which sweeps the XLA select path):
the Pallas kernel keeps the bucket sweep + Jacobian tree in one VMEM
residency, so its optimum can sit at a different width. Parity is
asserted against the select path at its own best width.

Usage: python tools/sweep_pallas_wb.py [log_n] [wb,wb,...]
"""
import sys, os, time, json

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np

if os.environ.get("PLONK_TPU_CPU"):       # smoke-test lane
    os.environ["JAX_PLATFORMS"] = "cpu"
import jax

if os.environ.get("PLONK_TPU_CPU"):
    jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp

from plonk_tpu.models import plonk_scaled as PS
from plonk_tpu.ops import fixed_base as FB
from plonk_tpu.ops import pallas_msm as PM
from plonk_tpu.utils.params import SCALED_FR

log_n = int(sys.argv[1]) if len(sys.argv) > 1 else 16
widths = ([int(w) for w in sys.argv[2].split(",")]
          if len(sys.argv) > 2 else [3, 4, 5, 6])
n = 1 << log_n
print(json.dumps({"backend": jax.default_backend(), "log_n": log_n}),
      flush=True)

ctx = PS.scaled_new(n)
rng = np.random.default_rng(0)
sc = jnp.asarray(rng.integers(0, SCALED_FR.p, size=(9, n + 6),
                              dtype=np.uint32))
Fq = ctx.Fq


def timeit(fn, *a, reps=5):
    out = fn(*a)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*a)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps


# reference result from the select path (wb=5, round-3 sweep winner)
os.environ["PLONK_TPU_PALLAS_MSM"] = "0"
os.environ["PLONK_TPU_FB_WB"] = "5"
bits = SCALED_FR.p.bit_length()
from plonk_tpu.ops.curve import G1
L = ctx.srs.length
g1s = ctx.srs.g1s
pts = G1(g1s.x[:L], g1s.y[:L], g1s.inf[:L])
stbl = FB.FixedBaseTable(*[
    jax.block_until_ready(v) for v in jax.jit(
        lambda p: (lambda t: (t.x, t.y, t.inf))(
            FB.build_fixed_base_table(Fq, p, 5, bits)))(pts)], 5)
ref = jax.jit(lambda s: FB.msm_fixed_base_many(Fq, stbl, s,
                                               mode="select"))(sc)
base = (np.asarray(ref.x), np.asarray(ref.y), np.asarray(ref.inf))

tiles = ([int(t) for t in sys.argv[3].split(",")]
         if len(sys.argv) > 3 else [1024])

for wb in widths:
    try:
        t0 = time.perf_counter()
        def _build(x, y, i, wb=wb):
            t = PM.build_commit_table(Fq, G1(x, y, i), bits, window_bits=wb)
            return t.x, t.y, t.inf
        tx, ty, ti = jax.jit(_build)(pts.x, pts.y, pts.inf)
        tbl = FB.FixedBaseTable(tx, ty, ti, wb)
        jax.block_until_ready(tbl.x)
        build_s = time.perf_counter() - t0
    except Exception as e:
        print(json.dumps({"wb": wb, "error": str(e)[:160]}), flush=True)
        continue
    for tile in tiles:
        try:
            fn = jax.jit(lambda tx, ty, ti, s, tile=tile, wb=wb:
                         PM.msm_fixed_base_many_pallas(
                             Fq, FB.FixedBaseTable(tx, ty, ti, wb), s,
                             tile=tile))
            dt = timeit(lambda s: fn(tbl.x, tbl.y, tbl.inf, s), sc,
                        reps=10)
            out = fn(tbl.x, tbl.y, tbl.inf, sc)
            ok = (np.array_equal(base[0], np.asarray(out.x))
                  and np.array_equal(base[1], np.asarray(out.y))
                  and np.array_equal(base[2], np.asarray(out.inf)))
            gib = tbl.x.nbytes * 2 / 2**30
            print(json.dumps({"wb": wb, "tile": tile,
                              "pallas_commit9_ms": round(dt * 1000, 2),
                              "table_gib": round(gib, 3),
                              "build_s": round(build_s, 1),
                              "parity": ok}), flush=True)
        except Exception as e:
            print(json.dumps({"wb": wb, "tile": tile,
                              "error": str(e)[:160]}), flush=True)
