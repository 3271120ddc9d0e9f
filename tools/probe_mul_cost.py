"""Isolate where the 16-limb Pallas commit kernel's time goes on device:
1. per-mont_mul cost in the kernel's sublane-limb layout (chained muls,
   one pallas_call);
2. the commit kernel's pallas_call alone (partials, no epilogue) vs the
   full big_commit_many_pallas, same table/scalars.
"""
import sys
import time
import functools

sys.path.insert(0, __file__.rsplit("/", 2)[0])
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from plonk_tpu.ops.bigfield import BigMontField
from plonk_tpu.ops import bigcurve as BC
from plonk_tpu.ops import pallas_bigmsm as PBM

print("backend:", jax.default_backend(), flush=True)
try:
    cache = "/root/.cache/plonk_tpu/xla_bench"
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
except Exception:
    pass

F = BigMontField(BC.BN254_FQ)
L = F.limbs
TL = 1024
K = 64          # chained muls per kernel pass


def mul_kernel(const_ref, a_ref, b_ref, o_ref):
    Fo = PBM._make_field(L, const_ref)
    x = a_ref[:]
    b = b_ref[:]
    for _ in range(K):
        x = Fo["mul"](x, b)
    o_ref[:] = x


def run_muls(a, b, consts):
    return pl.pallas_call(
        mul_kernel,
        grid=(1,),
        in_specs=[pl.BlockSpec((5, L, TL), lambda i: (0, 0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((L, TL), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((L, TL), lambda i: (0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((L, TL), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((L, TL), jnp.uint32),
    )(consts, a, b)


def timeit(fn, *args, reps=10):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps


rng = np.random.default_rng(0)
avals = [int.from_bytes(rng.bytes(31), "little") % F.p for _ in range(TL)]
bvals = [int.from_bytes(rng.bytes(31), "little") % F.p for _ in range(TL)]
a = jnp.asarray(np.asarray(F.encode_host(avals)).T.copy())   # (L, TL)
b = jnp.asarray(np.asarray(F.encode_host(bvals)).T.copy())
consts = jnp.asarray(PBM._field_consts(L, int(F.p), TL))
f = jax.jit(run_muls)
out = f(a, b, consts)
# correctness vs host ints
got = F.decode_host(np.asarray(out).T)
exp = []
for x, y in zip(avals, bvals):
    v = x
    for _ in range(K):
        v = v * y % F.p
    exp.append(v)
ok = all(int(g) == e for g, e in zip(got, exp))
print("chained-mul parity:", ok, flush=True)
dt = timeit(f, a, b, consts)
per_mul = dt / (K * TL)
print(f"kernel mont_mul: {dt*1e3:.3f} ms for {K}x{TL} -> "
      f"{per_mul*1e9:.2f} ns per element-mul "
      f"({1/per_mul/1e9:.3f} G muls/s)", flush=True)

# ---- commit kernel: pallas_call partials vs full path ----
L_pts, B, wb = 1024, 9, 4
W = -(-254 // wb)
nb = 1 << wb
tbl = BC.BigFixedBaseTable(
    x=jnp.asarray(rng.integers(0, 1 << 16, size=(W, nb, L_pts, L),
                               dtype=np.uint32)),
    y=jnp.asarray(rng.integers(0, 1 << 16, size=(W, nb, L_pts, L),
                               dtype=np.uint32)),
    inf=jnp.zeros((W, nb, L_pts), dtype=bool),
    window_bits=wb)
sc = jnp.asarray(rng.integers(0, 1 << 16, size=(B, L_pts, 16),
                              dtype=np.uint32))

for wg in (2, 4):
    full = jax.jit(functools.partial(PBM.big_commit_many_pallas,
                                     F, tile=128, wg=wg))
    dt_full = timeit(full, tbl, sc, reps=5)
    print(f"wg={wg}: full commit (1024 pts, B=9): {dt_full*1e3:.1f} ms",
          flush=True)
print("PROBE_DONE", flush=True)
