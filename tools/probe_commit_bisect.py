"""Bisect the 2^12 pallas-vs-GLV commit mismatch with structured scalar
patterns (same array shapes everywhere -> all compiled graphs reused):
zeros, one-hot (host oracle), first-tile-only, window-0-only, full
random. Prints which commitments / coordinates differ."""
import sys
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

Q = BC.BN254_FQ.p
n = 1 << 12
ctx = PB.bn254_setup(n, rolled=True)
Fq = BigMontField(BC.BN254_FQ, rolled=True)
Fr = ctx.Fr
tbl = PB.bn254_fixed_base_table(ctx)
L = ctx.srs.length
g1s = ctx.srs.g1s
dec = lambda w: int(Fq.decode_host(np.asarray(w)))


def _inv(a):
    return pow(a, Q - 2, Q)


def _padd(p1, p2):
    if p1 is None:
        return p2
    if p2 is None:
        return p1
    x1, y1 = p1
    x2, y2 = p2
    if x1 == x2:
        if (y1 + y2) % Q == 0:
            return None
        m = (3 * x1 * x1) * _inv(2 * y1) % Q
    else:
        m = (y2 - y1) * _inv(x2 - x1) % Q
    x3 = (m * m - x1 - x2) % Q
    return x3, (m * (x1 - x3) - y1) % Q


def _pmul(p, k):
    r = None
    while k:
        if k & 1:
            r = _padd(r, p)
        p = _padd(p, p)
        k >>= 1
    return r


pfn = jax.jit(functools.partial(big_commit_many_pallas, Fq,
                                tile=128, wg=4))
gfn = jax.jit(lambda s: PB._commit_many(
    ctx, [Fr.encode(s[i]) for i in range(9)]))


def words_to_int(w):
    w = np.asarray(w, dtype=np.uint64)
    v = np.zeros(w.shape[:-1], dtype=object)
    for k in range(w.shape[-1] - 1, -1, -1):
        v = v * 65536 + w[..., k]
    return v


def run_pallas(sc):
    out = pfn(tbl, jnp.asarray(sc))
    x, y, inf = BC.big_to_affine(Fq, out)
    return (words_to_int(Fq.decode(x)), words_to_int(Fq.decode(y)),
            np.asarray(inf))


def run_glv(sc):
    out = gfn(jnp.asarray(sc))
    return (words_to_int(out.x), words_to_int(out.y),
            np.asarray(out.inf))


def compare(tag, sc, oracle=None):
    p = run_pallas(sc)
    g = run_glv(sc)
    pg = all(np.array_equal(a, b) for a, b in zip(p, g))
    line = f"{tag}: pallas==glv {pg}"
    if oracle is not None:
        po = all(
            (oracle[b] is None and p[2][b]) or
            (oracle[b] is not None and not p[2][b]
             and (int(p[0][b]), int(p[1][b])) == oracle[b])
            for b in range(9))
        go = all(
            (oracle[b] is None and g[2][b]) or
            (oracle[b] is not None and not g[2][b]
             and (int(g[0][b]), int(g[1][b])) == oracle[b])
            for b in range(9))
        line += f" | pallas==oracle {po} | glv==oracle {go}"
    if not pg:
        for b in range(9):
            eq = (p[0][b] == g[0][b] and p[1][b] == g[1][b]
                  and p[2][b] == g[2][b])
            if not eq:
                line += f"\n  lane {b}: pallas=({p[0][b]},{p[1][b]}," \
                        f"{p[2][b]}) glv=({g[0][b]},{g[1][b]},{g[2][b]})"
    print(line, flush=True)


rng = np.random.default_rng(0)

sc = np.zeros((9, L, 16), dtype=np.uint32)
compare("all-zero", sc, oracle=[None] * 9)

sc = np.zeros((9, L, 16), dtype=np.uint32)
oracle = []
for b in range(9):
    j = int(rng.integers(0, L))
    v = int(rng.integers(1, 1 << 16))
    sc[b, j, 0] = v
    oracle.append(_pmul((dec(g1s.x[j]), dec(g1s.y[j])), v))
compare("one-hot-16bit", sc, oracle)

sc = np.zeros((9, L, 16), dtype=np.uint32)
oracle = []
for b in range(9):
    j = int(rng.integers(0, L))
    words = rng.integers(0, 1 << 16, size=16, dtype=np.uint32)
    words[15] &= 0x0FFF
    sc[b, j] = words
    v = 0
    for k in range(15, -1, -1):
        v = (v << 16) | int(words[k])
    oracle.append(_pmul((dec(g1s.x[j]), dec(g1s.y[j])), v))
compare("one-hot-252bit", sc, oracle)

sc = rng.integers(0, 1 << 16, size=(9, L, 16), dtype=np.uint32)
sc[..., 15] &= 0x0FFF
sc[:, 128:] = 0
compare("tile0-random", sc.astype(np.uint32))

sc = rng.integers(0, 1 << 16, size=(9, L, 16), dtype=np.uint32)
sc[..., 15] &= 0x0FFF
sc[:, :4000] = 0
compare("tail-tiles-random", sc.astype(np.uint32))

sc = np.zeros((9, L, 16), dtype=np.uint32)
sc[:, :, 0] = rng.integers(0, 16, size=(9, L), dtype=np.uint32)
compare("window0-only", sc)

sc = rng.integers(0, 1 << 16, size=(9, L, 16), dtype=np.uint32)
sc[..., 15] &= 0x0FFF
compare("full-random", sc.astype(np.uint32))
print("BISECT_DONE", flush=True)
