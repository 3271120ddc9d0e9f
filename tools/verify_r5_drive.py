import sys; sys.path.insert(0, "/root/repo")
import os
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
import jax; jax.config.update("jax_platforms", "cpu")
import numpy as np
import jax.numpy as jnp
from plonk_tpu.models import plonk_scaled as PS
from plonk_tpu.models.synthetic import square_chain_circuit
from plonk_tpu.utils.params import SCALED_FR

n = 32
ctx = PS.scaled_new(n, secret=424242)
sel, cps, a, b, c = square_chain_circuit(SCALED_FR.p, n, x0=3)
ch = jnp.asarray(np.array([101, 202, 303, 404, 505], np.uint32))
rnd = jnp.asarray(np.arange(1, 10, dtype=np.uint32))
proof, diags = jax.jit(lambda c_, r_: PS.prove_scaled(
    ctx, *(jnp.asarray(x) for x in (sel, cps, a, b, c)), c_, r_))(ch, rnd)
assert bool(diags.all_ok()), "diags"
vk = PS.make_vk_scaled(ctx, jnp.asarray(sel), jnp.asarray(cps))
assert PS.verify_scaled(ctx, vk, proof, ch), "accept"
bad = proof._replace(a_z=(proof.a_z + 1) % jnp.uint32(SCALED_FR.p))
assert not PS.verify_scaled(ctx, vk, bad, ch), "tamper must reject"
print("verify drive: prove/verify/tamper OK")
