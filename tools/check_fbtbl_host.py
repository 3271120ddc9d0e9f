"""Host-side oracle check of the cached BN254 fixed-base table: decode a
few entries and compare with python-int EC arithmetic from the SRS."""
import sys, os
os.environ["JAX_PLATFORMS"] = "cpu"
import jax; jax.config.update("jax_platforms", "cpu")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
from plonk_tpu.models import plonk_bn254 as PB
from plonk_tpu.ops import bigcurve as BC
from plonk_tpu.ops.bigfield import BigMontField

Q = BC.BN254_FQ.p
F = BigMontField(BC.BN254_FQ)

def dec(w):
    return int(F.decode_host(np.asarray(w)))

def _inv(a): return pow(a, Q - 2, Q)
def _add(p1, p2):
    if p1 is None: return p2
    if p2 is None: return p1
    x1, y1 = p1; x2, y2 = p2
    if x1 == x2:
        if (y1 + y2) % Q == 0: return None
        m = (3 * x1 * x1) * _inv(2 * y1) % Q
    else:
        m = (y2 - y1) * _inv(x2 - x1) % Q
    x3 = (m * m - x1 - x2) % Q
    return x3, (m * (x1 - x3) - y1) % Q
def _mul(p, k):
    r = None
    while k:
        if k & 1: r = _add(r, p)
        p = _add(p, p); k >>= 1
    return r

n = 1 << 12
ctx = PB.bn254_setup(n, rolled=True)
tbl = PB.bn254_fixed_base_table(ctx)
g1s = ctx.srs.g1s
wb = tbl.window_bits
rng = np.random.default_rng(0)
bad = 0
for trial in range(12):
    w = int(rng.integers(0, tbl.x.shape[0]))
    d = int(rng.integers(1, tbl.x.shape[1]))
    i = int(rng.integers(0, tbl.x.shape[2]))
    px, py = dec(g1s.x[i]), dec(g1s.y[i])
    exp = _mul((px, py), d << (wb * w))
    gx, gy = dec(tbl.x[w, d, i]), dec(tbl.y[w, d, i])
    inf = bool(np.asarray(tbl.inf[w, d, i]))
    ok = (not inf) and exp == (gx, gy)
    if not ok:
        bad += 1
        print(f"MISMATCH w={w} d={d} i={i}: got=({gx},{gy},inf={inf}) "
              f"exp={exp}")
    else:
        print(f"ok w={w} d={d} i={i}")
print("BAD:", bad)
