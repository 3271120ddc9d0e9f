"""Layer-peel the _commit_many device mismatch: (1) the scalar prep
(encode-pad-decode) output vs input; (2) GLV with B=9 raw words;
(3) full _commit_many, all vs the python oracle on one-hot scalars."""
import sys, functools
sys.path.insert(0, __file__.rsplit("/", 2)[0])
import numpy as np
import jax
import jax.numpy as jnp
from plonk_tpu.models import plonk_bn254 as PB
from plonk_tpu.ops import bigcurve as BC
from plonk_tpu.ops import bigpoly as BPol
from plonk_tpu.ops.glv import big_msm_glv_many
from plonk_tpu.ops.bigfield import BigMontField

print("backend:", jax.default_backend(), flush=True)
try:
    jax.config.update("jax_compilation_cache_dir",
                      "/root/.cache/plonk_tpu/xla_bench")
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

rng = np.random.default_rng(0)
sc = np.zeros((9, L, 16), dtype=np.uint32)
oracle = []
for b in range(9):
    j = int(rng.integers(0, L))
    v = int(rng.integers(1, 1 << 16))
    sc[b, j, 0] = v
    oracle.append((j, v, _pmul((dec(g1s.x[j]), dec(g1s.y[j])), v)))
scj = jnp.asarray(sc)

# layer 1: scalar prep
prep = jax.jit(lambda s: Fr.decode(jnp.stack(
    [BPol.pad_to(Fr.encode(s[i]), L)[..., :L, :] for i in range(9)])))
out = np.asarray(prep(scj))
print("scalar-prep identity:", np.array_equal(out, sc), flush=True)
if not np.array_equal(out, sc):
    bad = np.argwhere((out != sc).any(axis=-1))
    print("  first bad (lane, idx):", bad[:5].tolist(), flush=True)

# layer 2: GLV B=9 on raw words
one = jnp.broadcast_to(Fq.const(1), g1s.x.shape)
Z = jnp.where(g1s.inf[..., None], jnp.zeros_like(one), one)
pts = BC.BigG1J(jnp.where(g1s.inf[..., None], one, g1s.x),
                jnp.where(g1s.inf[..., None], one, g1s.y), Z)
gout = jax.jit(lambda s: big_msm_glv_many(Fq, pts, s, window_bits=8))(scj)
x, y, inf = BC.big_to_affine(Fq, gout)
xi, yi = words_to_int(Fq.decode(x)), words_to_int(Fq.decode(y))
ok = all((int(xi[b]), int(yi[b])) == oracle[b][2] for b in range(9))
print("glv B=9 raw words == oracle:", ok, flush=True)

# layer 3: full _commit_many
cfn = jax.jit(lambda s: PB._commit_many(
    ctx, [Fr.encode(s[i]) for i in range(9)]))
cout = cfn(scj)
cx, cy = words_to_int(cout.x), words_to_int(cout.y)
ok3 = all((int(cx[b]), int(cy[b])) == oracle[b][2] for b in range(9))
print("_commit_many == oracle:", ok3, flush=True)
print("LAYERS_DONE", flush=True)
