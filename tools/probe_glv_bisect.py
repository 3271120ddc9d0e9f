"""Discriminate: is the device GLV mismatch caused by (a) the new
shift-based _full_product_cols, (b) the GLV machinery, or (c) the shared
Pippenger MSM? One-hot scalar, python oracle, three paths x two
multiply modes."""
import sys, os, functools
sys.path.insert(0, __file__.rsplit("/", 2)[0])
import numpy as np
import jax
import jax.numpy as jnp
from plonk_tpu.models import plonk_bn254 as PB
from plonk_tpu.ops import bigcurve as BC
from plonk_tpu.ops.bigfield import BigMontField

print("backend:", jax.default_backend(), flush=True)
try:
    cache = "/root/.cache/plonk_tpu/xla_bench"
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
except Exception:
    pass

Q = BC.BN254_FQ.p
n = 1 << 12
ctx = PB.bn254_setup(n, rolled=True)
Fq = BigMontField(BC.BN254_FQ, rolled=True)
Fr = ctx.Fr
L = ctx.srs.length
g1s = ctx.srs.g1s
dec = lambda w: int(Fq.decode_host(np.asarray(w)))

def _inv(a): return pow(a, Q - 2, Q)
def _padd(p1, p2):
    if p1 is None: return p2
    if p2 is None: return p1
    x1, y1 = p1; x2, y2 = p2
    if x1 == x2:
        if (y1 + y2) % Q == 0: return None
        m = (3 * x1 * x1) * _inv(2 * y1) % Q
    else: m = (y2 - y1) * _inv(x2 - x1) % Q
    x3 = (m * m - x1 - x2) % Q
    return x3, (m * (x1 - x3) - y1) % Q
def _pmul(p, k):
    r = None
    while k:
        if k & 1: r = _padd(r, p)
        p = _padd(p, p); k >>= 1
    return r

def words_to_int(w):
    w = np.asarray(w, dtype=np.uint64)
    v = np.zeros(w.shape[:-1], dtype=object)
    for k in range(w.shape[-1] - 1, -1, -1):
        v = v * 65536 + w[..., k]
    return v

rng = np.random.default_rng(4)
j = int(rng.integers(0, L))
v = int(rng.integers(1, 1 << 16))
exp = _pmul((dec(g1s.x[j]), dec(g1s.y[j])), v)
sc = np.zeros((2, L, 16), dtype=np.uint32)
sc[:, j, 0] = v
scj = jnp.asarray(sc)

one = jnp.broadcast_to(Fq.const(1), g1s.x.shape)
Z = jnp.where(g1s.inf[..., None], jnp.zeros_like(one), one)
pts = BC.BigG1J(jnp.where(g1s.inf[..., None], one, g1s.x),
                jnp.where(g1s.inf[..., None], one, g1s.y), Z)

for mul_mode in ("shift", "dot"):
    os.environ["PLONK_TPU_BIGMUL"] = mul_mode
    for name, fn in (
        ("glv", lambda s: __import__("plonk_tpu.ops.glv",
            fromlist=["big_msm_glv_many"]).big_msm_glv_many(
                Fq, pts, s, window_bits=8)),
        ("pip", lambda s: BC.big_msm_pippenger_many(
            Fq, pts, s, window_bits=8, scalar_bits=254)),
    ):
        try:
            out = jax.jit(fn)(scj)
            x, y, inf = BC.big_to_affine(Fq, out)
            xi = words_to_int(Fq.decode(x)); yi = words_to_int(Fq.decode(y))
            ok = ((int(xi[0]), int(yi[0])) == exp
                  and not bool(np.asarray(inf)[0]))
            print(f"mul={mul_mode} {name}: oracle match {ok}", flush=True)
        except Exception as e:
            print(f"mul={mul_mode} {name}: FAILED {str(e)[:150]}",
                  flush=True)
print("GLV_BISECT_DONE", flush=True)
