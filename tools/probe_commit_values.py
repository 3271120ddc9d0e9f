"""Value-level check of the reworked commit kernel on device: compare
compiled outputs against interpret-mode outputs on the SAME tiny inputs
(real curve points so the Jacobian algebra is meaningful), across wg and
tile configs. Exposes whether the 0.1 ms timings are real work or a
miscompiled grid."""
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])
import numpy as np
import jax
import jax.numpy as jnp

from plonk_tpu.ops.bigfield import BigMontField
from plonk_tpu.ops import bigcurve as BC
from plonk_tpu.ops.pallas_bigmsm import big_commit_many_pallas

print("backend:", jax.default_backend(), flush=True)
try:
    cache = "/root/.cache/plonk_tpu/xla_bench"
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
except Exception:
    pass

F = BigMontField(BC.BN254_FQ, rolled=True)
rng = np.random.default_rng(1)
L_pts, B, wb, sbits = 200, 3, 4, 254

ks = [int(rng.integers(1, 1 << 40)) for _ in range(L_pts)]
g = BC.bn254_generator(F, shape=(1,))
bits = jnp.asarray(np.stack([BC.scalar_to_bits(k, 40) for k in ks]))
pts = BC.big_jac_mul(F, BC.BigG1J(
    jnp.broadcast_to(g.X, (L_pts, F.limbs)),
    jnp.broadcast_to(g.Y, (L_pts, F.limbs)),
    jnp.broadcast_to(g.Z, (L_pts, F.limbs))), bits, 40)
x, y, inf = BC.big_to_affine(F, pts)
one = jnp.broadcast_to(F.const(1), (L_pts, F.limbs))
pts_aff = BC.BigG1J(x, y, jnp.where(inf[..., None],
                                    jnp.zeros_like(one), one))
t0 = time.time()
tbl = jax.jit(lambda p: BC.build_big_table(F, p, wb, sbits))(pts_aff)
tbl = BC.BigFixedBaseTable(jax.block_until_ready(tbl.x),
                           tbl.y, tbl.inf, wb)
print(f"table built in {time.time()-t0:.1f}s", flush=True)
sc = np.asarray(rng.integers(0, 1 << 16, size=(B, L_pts, 16),
                             dtype=np.uint32))
sc[..., 15] &= 0x0FFF
sc = jnp.asarray(sc)

ref = None
for interp, tile, wg in ((True, 128, 2), (False, 128, 1),
                        (False, 128, 2), (False, 128, 4),
                        (False, 256, 2)):
    try:
        fn = jax.jit(lambda t, s, ti=tile, w=wg, ip=interp:
                     big_commit_many_pallas(F, t, s, tile=ti, wg=w,
                                            interpret=ip))
        out = fn(tbl, sc)
        ox, oy, oinf = BC.big_to_affine(F, out)
        trip = (np.asarray(F.decode(ox)), np.asarray(F.decode(oy)),
                np.asarray(oinf))
        tag = f"interp={int(interp)} tile={tile} wg={wg}"
        if ref is None:
            ref = trip
            print(f"{tag}: REFERENCE", flush=True)
        else:
            ok = all(np.array_equal(a, b) for a, b in zip(trip, ref))
            print(f"{tag}: match={ok}", flush=True)
    except Exception as e:
        print(f"interp={int(interp)} tile={tile} wg={wg}: "
              f"FAILED {str(e)[:160]}", flush=True)
print("VALUES_PROBE_DONE", flush=True)
