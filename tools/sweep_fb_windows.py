"""Sweep fixed-base window widths for the 9-commitment path (real TPU).

Round-3 priority 2 (CLAUDE.md): narrower windows stream fewer table
bytes through HBM (the measured bottleneck of the 24 ms commit at 2^16)
at the cost of more tree adds; this prints one JSON line per width so
the best default can be pinned per size. Also times the fused Pallas
commit kernel (ops/pallas_msm.py) at its narrow widths when it fits.

Usage: python tools/sweep_fb_windows.py [log_n] [wb,wb,...]
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
from plonk_tpu.utils.params import SCALED_FR

log_n = int(sys.argv[1]) if len(sys.argv) > 1 else 16
widths = ([int(w) for w in sys.argv[2].split(",")]
          if len(sys.argv) > 2 else [4, 5, 6, 7, 8])
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


from plonk_tpu.ops.curve import G1

L = ctx.srs.length
g1s = ctx.srs.g1s
pts = G1(g1s.x[:L], g1s.y[:L], g1s.inf[:L])
bits = SCALED_FR.p.bit_length()

base = None
for wb in widths:
    try:
        t0 = time.perf_counter()
        def _build(x, y, i, wb=wb):
            t = FB.build_fixed_base_table(ctx.Fq, G1(x, y, i), wb, bits)
            return t.x, t.y, t.inf
        tx, ty, ti = jax.jit(_build)(pts.x, pts.y, pts.inf)
        tbl = FB.FixedBaseTable(tx, ty, ti, wb)
        jax.block_until_ready(tbl.x)
        build_s = time.perf_counter() - t0
        fn = jax.jit(lambda tx, ty, ti, s: FB.msm_fixed_base_many(
            Fq, FB.FixedBaseTable(tx, ty, ti, tbl.window_bits), s,
            mode="select"))
        dt = timeit(lambda s: fn(tbl.x, tbl.y, tbl.inf, s), sc, reps=10)
        out = fn(tbl.x, tbl.y, tbl.inf, sc)
        if base is None:
            base = (np.asarray(out.x), np.asarray(out.y),
                    np.asarray(out.inf))
        else:
            assert np.array_equal(base[0], np.asarray(out.x)), wb
            assert np.array_equal(base[1], np.asarray(out.y)), wb
        gib = tbl.x.nbytes * 2 / 2**30
        print(json.dumps({"wb": wb, "commit9_ms": round(dt * 1000, 2),
                          "table_gib": round(gib, 3),
                          "build_s": round(build_s, 1)}), flush=True)
    except Exception as e:
        print(json.dumps({"wb": wb, "error": str(e)[:160]}), flush=True)
