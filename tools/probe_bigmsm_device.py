"""Lowering probe for the 16-limb Pallas commit kernel on the real chip:
random table contents (parity is NOT checked here — this only exercises
the Mosaic compile), tiny shapes, full traceback on failure."""
import sys
import traceback

sys.path.insert(0, __file__.rsplit("/", 2)[0])
import numpy as np
import jax
import jax.numpy as jnp

from plonk_tpu.ops.bigfield import BigMontField
from plonk_tpu.ops import bigcurve as BC
from plonk_tpu.ops.pallas_bigmsm import big_commit_many_pallas

print("backend:", jax.default_backend(), flush=True)
F = BigMontField(BC.BN254_FQ)
L_pts, B, wb = 256, 9, 4
W = -(-254 // wb)
nb = 1 << wb
rng = np.random.default_rng(0)
tbl = BC.BigFixedBaseTable(
    x=jnp.asarray(rng.integers(0, 1 << 16, size=(W, nb, L_pts, F.limbs),
                               dtype=np.uint32)),
    y=jnp.asarray(rng.integers(0, 1 << 16, size=(W, nb, L_pts, F.limbs),
                               dtype=np.uint32)),
    inf=jnp.zeros((W, nb, L_pts), dtype=bool),
    window_bits=wb)
sc = jnp.asarray(rng.integers(0, 1 << 16, size=(B, L_pts, 16),
                              dtype=np.uint32))
try:
    out = jax.jit(lambda t, s: big_commit_many_pallas(
        F, t, s, tile=128, wg=2))(tbl, sc)
    jax.block_until_ready(out)
    print("LOWERING OK", flush=True)
except Exception:
    traceback.print_exc()
    print("LOWERING FAILED", flush=True)

# field-op unit check on device: decode(mul(a, b)) == a*b % p vs python
from plonk_tpu.utils.params import BN254_FR
rng2 = np.random.default_rng(3)
Fr = BigMontField(BC.BN254_FQ, rolled=True)
avals = [int.from_bytes(rng2.bytes(31), "little") % Fr.p for _ in range(64)]
bvals = [int.from_bytes(rng2.bytes(31), "little") % Fr.p for _ in range(64)]
am, bm = Fr.array(avals), Fr.array(bvals)
got = Fr.decode_host(np.asarray(jax.jit(Fr.mont_mul)(am, bm)))
exp = np.array([(x * y) % Fr.p for x, y in zip(avals, bvals)], dtype=object)
print("rolled mont_mul (shift path) parity:",
      bool((got == exp).all()), flush=True)
assert (got == exp).all()
