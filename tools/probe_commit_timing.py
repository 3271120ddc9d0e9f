"""Trustworthy timing of the reworked BN254 Pallas commit at 2^12:
distinct scalars per rep, host transfer of a result limb each rep (hard
sync), plus parity vs the GLV Pippenger path. Distinguishes real compute
from the suspicious 0.1 ms async readings."""
import sys
import time
import functools

sys.path.insert(0, __file__.rsplit("/", 2)[0])
import numpy as np
import jax
import jax.numpy as jnp

from plonk_tpu.models import plonk_bn254 as PB
from plonk_tpu.ops import bigcurve as BC
from plonk_tpu.ops.pallas_bigmsm import big_commit_many_pallas
from plonk_tpu.ops.bigfield import BigMontField

print("backend:", jax.default_backend(), flush=True)
try:
    cache = "/root/.cache/plonk_tpu/xla_bench"
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
except Exception:
    pass

log_n = int(sys.argv[1]) if len(sys.argv) > 1 else 12
n = 1 << log_n
ctx = PB.bn254_setup(n, rolled=True)
Fq = BigMontField(BC.BN254_FQ, rolled=True)
Fr = ctx.Fr
tbl = PB.bn254_fixed_base_table(ctx)
print(f"table ready wb={tbl.window_bits} shape={tuple(tbl.x.shape)}",
      flush=True)
rng = np.random.default_rng(0)
REPS = 5
scs = []
for r in range(REPS + 1):
    s = rng.integers(0, 1 << 16, size=(9, ctx.srs.length, 16),
                     dtype=np.uint32)
    s[..., 15] &= 0x0FFF
    scs.append(jnp.asarray(s))

import os
configs = os.environ.get("PROBE_CFGS", "128:2,128:4,128:8")
for tile, wg in [tuple(map(int, c.split(':'))) for c in configs.split(',')]:
    fn = jax.jit(functools.partial(big_commit_many_pallas, Fq,
                                   tile=tile, wg=wg))
    try:
        out = fn(tbl, scs[0])
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for r in range(1, REPS + 1):
            out = fn(tbl, scs[r])
            _ = np.asarray(out.X)          # hard sync + transfer
        dt = (time.perf_counter() - t0) / REPS
        print(f"tile={tile} wg={wg}: {dt*1e3:.1f} ms/9-commits "
              "(hard-sync)", flush=True)
    except Exception as e:
        print(f"tile={tile} wg={wg}: FAILED {str(e)[:160]}", flush=True)

# parity vs GLV on the last scalars
gfn = jax.jit(lambda s: PB._commit_many(
    ctx, [Fr.encode(s[i]) for i in range(9)]))
glv = gfn(scs[REPS])
fn = jax.jit(functools.partial(big_commit_many_pallas, Fq, tile=128,
                               wg=4))
out = fn(tbl, scs[REPS])
x, y, inf = BC.big_to_affine(Fq, out)
# _commit_many returns MONTGOMERY-form affine coords — decode BOTH sides
ok = (np.array_equal(np.asarray(Fq.decode(x)),
                     np.asarray(Fq.decode(glv.x)))
      and np.array_equal(np.asarray(Fq.decode(y)),
                         np.asarray(Fq.decode(glv.y)))
      and np.array_equal(np.asarray(inf), np.asarray(glv.inf)))
print(f"parity pallas(wg4) vs GLV at 2^{log_n}: {ok}", flush=True)
print("TIMING_PROBE_DONE", flush=True)
