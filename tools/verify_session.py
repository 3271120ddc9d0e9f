"""Session verification drive (CPU): toy bit-exact entry, scaled
prove->verify round trip + tamper rejection, and the Pallas commit
kernel (interpret) against the XLA fixed-base path."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.setdefault("XLA_FLAGS",
                      "--xla_force_host_platform_device_count=8")
import jax

jax.config.update("jax_platforms", "cpu")
import numpy as np
import jax.numpy as jnp

# 1. toy bit-exact path
import __graft_entry__ as GE

fn, args = GE.entry()
proof, diags = jax.jit(fn)(*args)
assert int(proof.r_z) == 15, int(proof.r_z)
print("entry: r_z == 15 ok")

# 2. scaled prove -> verify + tamper rejection
from plonk_tpu.models import plonk_scaled as PS
from plonk_tpu.models.synthetic import square_chain_circuit
from plonk_tpu.utils.params import SCALED_FR

n = 64
ctx = PS.scaled_new(n, secret=987654321)
sel, cps, a, b, c = square_chain_circuit(SCALED_FR.p, n, x0=5)
ch = jnp.asarray(np.array([123, 456, 789, 1011, 1213], np.uint32))
rnd = jnp.asarray(np.arange(2, 11, dtype=np.uint32))
proof, dg = jax.jit(lambda *xs: PS.prove_scaled(ctx, *xs))(
    jnp.asarray(sel), jnp.asarray(cps), jnp.asarray(a), jnp.asarray(b),
    jnp.asarray(c), ch, rnd)
assert bool(dg.all_ok())
vk = PS.make_vk_scaled(ctx, jnp.asarray(sel), jnp.asarray(cps))
assert bool(PS.verify_scaled(ctx, vk, proof, ch)), "verify rejected"
bad = proof._replace(a_z=(proof.a_z + jnp.uint32(1)) % jnp.uint32(ctx.Fr.p))
assert not bool(PS.verify_scaled(ctx, vk, bad, ch)), "tamper accepted"
print("scaled: prove->verify ok, tamper rejected")

# 3. the changed kernel: Pallas commit (interpret) == XLA fixed base
from plonk_tpu.ops import fixed_base as FB
from plonk_tpu.ops import pallas_msm as PM
from plonk_tpu.ops.curve import G1

L = ctx.srs.length
g1s = ctx.srs.g1s
pts = G1(g1s.x[:L], g1s.y[:L], g1s.inf[:L])
bits = SCALED_FR.p.bit_length()
rng = np.random.default_rng(7)
sc = jnp.asarray(rng.integers(0, SCALED_FR.p, size=(9, L),
                              dtype=np.uint32))
ptbl = PM.build_commit_table(ctx.Fq, pts, bits, window_bits=4)
got = PM.msm_fixed_base_many_pallas(ctx.Fq, ptbl, sc, tile=128,
                                    interpret=True)
rtbl = FB.build_fixed_base_table(ctx.Fq, pts, 5, bits)
ref = FB.msm_fixed_base_many(ctx.Fq, rtbl, sc)
assert bool(jnp.array_equal(got.x, ref.x)), "pallas commit x mismatch"
assert bool(jnp.array_equal(got.y, ref.y)), "pallas commit y mismatch"
assert bool(jnp.array_equal(got.inf, ref.inf)), "pallas commit inf"
print("pallas commit kernel (flattened-lane tree): parity ok")
print("VERIFY OK")
