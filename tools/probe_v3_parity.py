import os, sys, time
sys.path.insert(0, "/root/repo")
os.environ["JAX_PLATFORMS"]="cpu"
import jax; jax.config.update("jax_platforms","cpu")
import numpy as np
sys.path.insert(0, "/root/repo/tests")
import conftest
from test_pallas_bigmsm import _setup, F
from plonk_tpu.ops import bigcurve as BC
from plonk_tpu.ops.pallas_bigmsm import big_commit_many_pallas
for cfg in [(5,3,32,4,128,2), (130,2,8,4,128,4)]:
    L,B,sb,wb,tile,wg = cfg
    tbl, sc = _setup(L,B,sb,wb,seed=7)
    t0=time.time()
    got = jax.jit(lambda t, s: big_commit_many_pallas(
        F, t, s, tile=tile, wg=wg, interpret=True, version="v3"))(tbl, sc)
    ref = jax.jit(lambda t, s: BC.big_msm_fixed_base_many(F, t, s))(tbl, sc)
    rx, ry, rinf = BC.big_to_affine(F, ref)
    gx, gy, ginf = BC.big_to_affine(F, got)
    ok = (np.array_equal(np.asarray(F.decode(gx)), np.asarray(F.decode(rx)))
          and np.array_equal(np.asarray(F.decode(gy)), np.asarray(F.decode(ry)))
          and np.array_equal(np.asarray(ginf), np.asarray(rinf)))
    print(f"v3 cfg={cfg} parity={ok} ({time.time()-t0:.0f}s)", flush=True)
    assert ok
print("V3 INTERPRET PARITY OK", flush=True)
