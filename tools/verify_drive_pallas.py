import sys; sys.path.insert(0, "/root/repo")
import os
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
os.environ["PLONK_TPU_PALLAS_MSM"] = "1"   # force the fused commit kernel
import jax; jax.config.update("jax_platforms", "cpu")
import numpy as np, jax.numpy as jnp
from plonk_tpu.models import plonk_scaled as PS
from plonk_tpu.models.synthetic import square_chain_circuit

n = 64
ctx = PS.scaled_new(n)
sel, cps, a, b, c = square_chain_circuit(ctx.params.field.p, n)
rng = np.random.default_rng(1)
ch = rng.integers(1, ctx.params.field.p, size=(5,), dtype=np.uint32)
rnd = rng.integers(1, ctx.params.field.p, size=(9,), dtype=np.uint32)
proof, diags = PS.prove_scaled(ctx, sel, cps, a, b, c, ch, rnd)
assert diags.all_ok(), "diags failed"
vk = PS.make_vk_scaled(ctx, sel, cps)
ok = PS.verify_scaled(ctx, vk, proof, ch)
assert bool(ok), "verify failed"
bad = proof._replace(r_z=jnp.asarray(
    (int(proof.r_z) + 1) % ctx.params.field.p, jnp.uint32))
assert not bool(PS.verify_scaled(ctx, vk, bad, ch)), "tamper accepted"
# parity: pallas commit vs select path on the same witness
os.environ["PLONK_TPU_PALLAS_MSM"] = "0"
ctx2 = PS.scaled_new(n)
proof2, d2 = PS.prove_scaled(ctx2, sel, cps, a, b, c, ch, rnd)
assert d2.all_ok()
for f in proof._fields:
    v1, v2 = getattr(proof, f), getattr(proof2, f)
    if hasattr(v1, "x"):
        assert int(v1.x) == int(v2.x) and int(v1.y) == int(v2.y), f
    else:
        assert int(v1) == int(v2), f
print("VERIFY OK: pallas-commit prove/verify round trip, tamper rejected, "
      "bit-identical to select path")
