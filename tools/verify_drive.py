"""User-style end-to-end drive of the framework through the package
surface (CPU backend, 8 virtual devices). Run from the repo root:
    python tools/verify_drive.py
"""
import sys
sys.path.insert(0, __file__.rsplit("/", 2)[0])
import os
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
import numpy as np
import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp

from plonk_tpu.utils.params import SCALED_FR, BN254_FR
from plonk_tpu.models import plonk_scaled as PS
from plonk_tpu.models import fiat_shamir as FS
from plonk_tpu.models.synthetic import square_chain_circuit

R = SCALED_FR.p
print("devices:", len(jax.devices()), jax.default_backend())

# 1. scaled prove (fixed-base commitments) -> verify
n = 16
ctx = PS.scaled_new(n, secret=31415926)
sel, cps, a, b, c = square_chain_circuit(R, n, x0=7)
ch = np.array([123, 456, 789, 1011, 1213], dtype=np.uint32)
rnd = np.arange(1, 10, dtype=np.uint32)
proof, diags = jax.jit(lambda ch, rnd: PS.prove_scaled(
    ctx, jnp.asarray(sel), jnp.asarray(cps), jnp.asarray(a), jnp.asarray(b),
    jnp.asarray(c), ch, rnd))(ch, rnd)
print("1. prove diags all_ok:", bool(diags.all_ok()))
vk = PS.make_vk_scaled(ctx, sel, cps)
print("1. verify:", PS.verify_scaled(ctx, vk, proof, ch))
bad = proof._replace(b_z=jnp.uint32((int(proof.b_z) + 1) % R))
print("1. tampered verify (want False):", PS.verify_scaled(ctx, vk, bad, ch))

# 2. Fiat-Shamir end-to-end
fs = FS.ScaledFsProver(ctx, sel, cps)
out, fdiags = fs.prove(a, b, c, rnd)
print("2. FS prove ok:", bool(fdiags.all_ok()), "nonce:", out.nonce,
      "challenge:", out.challenge.tolist())
print("2. FS verify:", FS.verify_scaled_fs(ctx, fs.vk, out))
print("2. FS wrong-nonce verify (want False):",
      FS.verify_scaled_fs(ctx, fs.vk, FS.FsProof(out.proof, out.nonce + 1,
                                                 out.challenge)))

# 3. batched verification
chs = np.stack([ch, np.array([9, 8, 7, 6, 5], np.uint32)])
p2, d2 = jax.jit(lambda ch, rnd: PS.prove_scaled(
    ctx, jnp.asarray(sel), jnp.asarray(cps), jnp.asarray(a), jnp.asarray(b),
    jnp.asarray(c), ch, rnd))(chs[1], rnd)
batch = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), proof, p2)
ok = PS.verify_scaled_many(ctx, vk, batch, chs)
print("3. verify_many:", np.asarray(ok).tolist())
tam = batch._replace(r_z=batch.r_z.at[0].set((batch.r_z[0] + 1) % R))
print("3. tampered lane 0 (want [False, True]):",
      np.asarray(PS.verify_scaled_many(ctx, vk, tam, chs)).tolist())

# 4. BN254 multi-limb field through the public API
from plonk_tpu.ops.bigfield import BigMontField, big_ntt, big_intt
F = BigMontField(BN254_FR)
xs = [0, 1, F.p - 1, 12345678901234567890123456789]
w = BN254_FR.root_of_unity(8)
vec = F.array(xs + [0] * 4)
back = F.decode_host(big_intt(F, big_ntt(F, vec, w), w))
print("4. BN254 NTT roundtrip:", list(back) == xs + [0] * 4)

# 5. sharded prover bit-identity on the 8-device mesh
from plonk_tpu.parallel.mesh import make_1d_mesh
from plonk_tpu.parallel import dist_prover as DP
n2 = 64
ctx2 = PS.scaled_new(n2, secret=2718281828)  # secret > 2^31: ADVICE fix lane
sel2, cps2, a2, b2, c2 = square_chain_circuit(R, n2, x0=3)
args2 = tuple(jnp.asarray(x) for x in (sel2, cps2, a2, b2, c2))
mesh = make_1d_mesh("sp", 8)
pd, dd = PS.prove_scaled(ctx2, *args2, ch, rnd,
                         prims=DP.make_dist_prims(ctx2, mesh))
pl, _ = jax.jit(lambda c, r: PS.prove_scaled(ctx2, *args2, c, r))(ch, rnd)
same = all(int(getattr(pd, f)) == int(getattr(pl, f)) for f in
           ("a_z", "b_z", "c_z", "r_z", "z_omega_z")) and \
       int(pd.w_z_s.x) == int(pl.w_z_s.x) and int(pd.z_s.y) == int(pl.z_s.y)
print("5. sharded prover ok + bit-identical:", bool(dd.all_ok()), same)
vk2 = PS.make_vk_scaled(ctx2, sel2, cps2)
print("5. big-secret (>= 2^31) SRS verifies:",
      PS.verify_scaled(ctx2, vk2, pl, ch))

# 6. probes: bad witness, bad params
a_bad = np.array(a, dtype=np.uint32).copy(); a_bad[2] ^= 1
_, dbad = jax.jit(lambda aw: PS.prove_scaled(
    ctx, jnp.asarray(sel), jnp.asarray(cps), aw, jnp.asarray(b),
    jnp.asarray(c), ch, rnd))(jnp.asarray(a_bad))
print("6. bad witness satisfied flag (want False):", bool(dbad.satisfied))
from plonk_tpu.utils.params import PlonkParams, SCALED_CURVE
try:
    PS.ScaledContext(params=PlonkParams(curve=SCALED_CURVE,
                                        omega=SCALED_FR.root_of_unity(16),
                                        k1=SCALED_FR.root_of_unity(16), k2=49),
                     srs=ctx.srs, n=16)
    print("6. k1-in-H accepted (BUG)")
except ValueError as e:
    print("6. k1-in-H rejected:", str(e)[:40])
print("ALL DRIVES DONE")
