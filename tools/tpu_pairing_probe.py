"""Real-TPU probe: compile+run the BN254 pairing on the chip."""
import sys, time, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tests"))
import jax
import jax.numpy as jnp
import numpy as np

print("devices:", jax.devices(), flush=True)
import bn254_oracle as O
from plonk_tpu.ops import bigpairing as BP
from plonk_tpu.ops import tower as T
from plonk_tpu.ops.bigcurve import bn254_generator

F = BP.pairing_field(rolled=True)
g1 = bn254_generator(F)
gx, gy, _ = BP.g2_to_affine(F, BP.g2_generator(F))
fn = jax.jit(lambda p, x, y: BP.pairing(F, p, x, y))
t0 = time.time()
out = fn(g1, gx, gy)
jax.block_until_ready(out.c0.c0.c0)
t1 = time.time()
e1 = O.pairing(O.G1_GEN, (O.G2_GEN_X, O.G2_GEN_Y))
print(f"TPU pairing compile+run: {t1-t0:.1f}s parity:",
      T.f12_decode_host(F, out) == e1, flush=True)
t0 = time.time()
out = fn(g1, gx, gy)
jax.block_until_ready(out.c0.c0.c0)
t1 = time.time()
print(f"TPU pairing warm run: {(t1-t0)*1000:.1f} ms", flush=True)
