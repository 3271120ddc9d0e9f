"""Per-op cost in the Pallas sublane-limb layout on the real chip: which
primitive makes the 16-limb mont_mul 60x slower than its op-count model?
Times K repetitions of each candidate op on (32, 1024) u32 tiles."""
import sys
import time
import functools

sys.path.insert(0, __file__.rsplit("/", 2)[0])
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

print("backend:", jax.default_backend(), flush=True)
try:
    cache = "/root/.cache/plonk_tpu/xla_bench"
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
except Exception:
    pass

ROWS, TL, K = 32, 1024, 256


def make_kernel(op):
    def kern(a_ref, b_ref, o_ref):
        x = a_ref[:]
        b = b_ref[:]
        for i in range(K):
            x = op(x, b, i)
        o_ref[:] = x
    return kern


def run(op, a, b):
    return pl.pallas_call(
        make_kernel(op),
        grid=(1,),
        in_specs=[pl.BlockSpec((ROWS, TL), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((ROWS, TL), lambda i: (0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((ROWS, TL), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((ROWS, TL), jnp.uint32),
    )(a, b)


def timeit(fn, *args, reps=20):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps


OPS = {
    "add": lambda x, b, i: x + b,
    "mul_u32": lambda x, b, i: x * b,
    "and_shift": lambda x, b, i: (x & 0xFFFF) + (b >> 16),
    "pad_shift1": lambda x, b, i: jnp.pad(
        x, [(1, 0), (0, 0)])[:ROWS, :] + b,
    "pad_shift8": lambda x, b, i: jnp.pad(
        x, [(8, 0), (0, 0)])[:ROWS, :] + b,
    "pad_shift_var": lambda x, b, i: jnp.pad(
        x, [(1 << (i % 5), 0), (0, 0)])[:ROWS, :] + b,
    "roll1_sub": lambda x, b, i: pltpu.roll(x, 1, 0) + b,
    "roll_var_sub": lambda x, b, i: pltpu.roll(x, 1 << (i % 5), 0) + b,
    "slice_row1": lambda x, b, i: x * x[(i % ROWS):(i % ROWS) + 1, :],
    "reduce_row": lambda x, b, i: x * jnp.sum(
        jnp.where(jax.lax.broadcasted_iota(
            jnp.int32, x.shape, 0) == (i % ROWS), x, 0).astype(jnp.int32),
        axis=0, keepdims=True).astype(jnp.uint32),
    "cmp_where": lambda x, b, i: jnp.where(x == b, x + 1, b),
    "concat_zero": lambda x, b, i: jnp.concatenate(
        [x[:16], jnp.zeros((16, TL), jnp.uint32)], axis=0) + b,
}

rng = np.random.default_rng(0)
a = jnp.asarray(rng.integers(0, 1 << 16, size=(ROWS, TL),
                             dtype=np.uint32))
b = jnp.asarray(rng.integers(0, 1 << 16, size=(ROWS, TL),
                             dtype=np.uint32))

base = None
for name, op in OPS.items():
    try:
        f = jax.jit(functools.partial(run, op))
        dt = timeit(f, a, b)
        per_op = dt / K * 1e9
        if name == "add":
            base = per_op
        rel = f" ({per_op/base:.1f}x add)" if base else ""
        print(f"{name:14s}: {per_op:8.2f} ns/op{rel}", flush=True)
    except Exception as e:
        print(f"{name:14s}: FAILED {str(e)[:120]}", flush=True)
print("OPS_PROBE_DONE", flush=True)
