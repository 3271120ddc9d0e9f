"""Time the compile of each pairing stage on CPU (diagnosis only)."""
import sys, time
sys.path.insert(0, __file__.rsplit("/", 2)[0])
import os
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
import numpy as np
import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp

from plonk_tpu.ops import bigpairing as BP
from plonk_tpu.ops import tower as T
from plonk_tpu.ops.bigcurve import bn254_generator

F = BP.pairing_field(rolled=True)

g1 = bn254_generator(F)
gx, gy, _ = BP.g2_to_affine(F, BP.g2_generator(F))

def tc(name, fn, *args):
    t0 = time.time()
    lowered = jax.jit(fn).lower(*args)
    t1 = time.time()
    compiled = lowered.compile()
    t2 = time.time()
    out = compiled(*args)
    jax.block_until_ready(out)
    t3 = time.time()
    print(f"{name}: trace {t1-t0:.1f}s compile {t2-t1:.1f}s run {t3-t2:.1f}s",
          flush=True)
    return out

ml = tc("miller_loop", lambda p, x, y: BP.miller_loop(F, *(
    __import__("plonk_tpu.ops.bigcurve", fromlist=["big_to_affine"])
    .big_to_affine(F, p)[:2]), x, y), g1, gx, gy)
tc("easy_part", lambda f: BP._easy_part(F, f), ml)
ez = BP._easy_part(F, ml)
tc("pow_x", lambda f: BP._pow_x(F, f), ez)
tc("final_exp_chain", lambda f: BP.final_exponentiation(F, f), ml)
print("done", flush=True)
