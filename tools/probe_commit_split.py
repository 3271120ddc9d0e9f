"""Split commit9 time into select-sweep vs Jacobian tree (real TPU)."""
import sys, time, json, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax
import jax.numpy as jnp

from plonk_tpu.models import plonk_scaled as PS
from plonk_tpu.ops import fixed_base as FB
from plonk_tpu.utils.params import SCALED_FR

print("backend:", jax.default_backend(), flush=True)
n = 1 << 16
ctx = PS.scaled_new(n)
tbl = PS.fixed_base_table(ctx)
print("table:", tbl.x.shape, "wb", tbl.window_bits, flush=True)
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


sel_fn = jax.jit(lambda tx, ty, ti, s: FB.select_terms_many(
    Fq, FB.FixedBaseTable(tx, ty, ti, tbl.window_bits), s))
dt_sel = timeit(lambda s: sel_fn(tbl.x, tbl.y, tbl.inf, s), sc)
print(json.dumps({"select_terms_ms": round(dt_sel * 1000, 2)}), flush=True)

terms = sel_fn(tbl.x, tbl.y, tbl.inf, sc)
tree_fn = jax.jit(lambda t: jax.vmap(lambda q: FB._tree_reduce(Fq, q))(t))
dt_tree = timeit(lambda: tree_fn(terms))
print(json.dumps({"tree_ms": round(dt_tree * 1000, 2)}), flush=True)

full_fn = jax.jit(lambda tx, ty, ti, s: FB.msm_fixed_base_many(
    Fq, FB.FixedBaseTable(tx, ty, ti, tbl.window_bits), s, mode="select"))
dt_full = timeit(lambda s: full_fn(tbl.x, tbl.y, tbl.inf, s), sc)
print(json.dumps({"full_commit9_ms": round(dt_full * 1000, 2)}), flush=True)
