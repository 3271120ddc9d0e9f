"""Final device parity: pallas commit (wg=4) vs GLV _commit_many at
2^12, Montgomery-decoded on both sides. All graphs warm from cache."""
import sys, functools
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
    jax.config.update("jax_compilation_cache_dir",
                      "/root/.cache/plonk_tpu/xla_bench")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
except Exception:
    pass

n = 1 << 12
ctx = PB.bn254_setup(n, rolled=True)
Fq = BigMontField(BC.BN254_FQ, rolled=True)
Fr = ctx.Fr
tbl = PB.bn254_fixed_base_table(ctx)
L = ctx.srs.length
rng = np.random.default_rng(0)
sc = rng.integers(0, 1 << 16, size=(9, L, 16), dtype=np.uint32)
sc[..., 15] &= 0x0FFF
scj = jnp.asarray(sc)

pfn = jax.jit(functools.partial(big_commit_many_pallas, Fq,
                                tile=128, wg=4))
out = pfn(tbl, scj)
x, y, inf = BC.big_to_affine(Fq, out)
px, py = np.asarray(Fq.decode(x)), np.asarray(Fq.decode(y))
pinf = np.asarray(inf)

cfn = jax.jit(lambda s: PB._commit_many(
    ctx, [Fr.encode(s[i]) for i in range(9)]))
g = cfn(scj)
gx, gy = np.asarray(Fq.decode(g.x)), np.asarray(Fq.decode(g.y))
ginf = np.asarray(g.inf)
ok = (np.array_equal(px, gx) and np.array_equal(py, gy)
      and np.array_equal(pinf, ginf))
print("pallas(wg4) == GLV at 2^12 (both decoded):", ok, flush=True)
assert ok
print("PARITY_FINAL_OK", flush=True)
