"""Which half of verify_bn254's graph owns the ~90 min XLA:CPU compile:
point reduction (_verify_points) vs the 4-lane pairing ratio check."""
import sys, os, time
sys.path.insert(0, "/root/repo")
os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "3")
os.environ["JAX_PLATFORMS"] = "cpu"
import jax; jax.config.update("jax_platforms", "cpu")
sys.path.insert(0, "/root/repo/tests")
import conftest  # persistent cache
import numpy as np, jax.numpy as jnp
from plonk_tpu.models import plonk_bn254 as PB
from plonk_tpu.ops import bigpairing as BPair
from plonk_tpu.ops.tower import Fq2, Fq12, f12_mul
from plonk_tpu.ops.bigcurve import BigG1J
from plonk_tpu.utils.params import BN254_FR

R = BN254_FR.p
N = 8
rng = np.random.default_rng(11)
words_vec = lambda vals: np.stack([
    np.array([(int(v) >> (16 * k)) & 0xFFFF for k in range(16)],
             dtype=np.uint32) for v in vals])
av = [int.from_bytes(rng.bytes(31), "little") % R for _ in range(N)]
bv = [int.from_bytes(rng.bytes(31), "little") % R for _ in range(N)]
cv = [(x * y) % R for x, y in zip(av, bv)]
sel = np.zeros((5, N, 16), dtype=np.uint32)
sel[3] = words_vec([1] * N)
sel[2] = words_vec([R - 1] * N)
cps = np.stack([np.stack([np.full(N, t), np.arange(1, N + 1)], axis=-1)
                for t in range(3)]).astype(np.int32)
ch = words_vec([111111, 222222, 333333, 444444, 555555])
rnd = words_vec(list(range(17, 26)))
ctx = PB.bn254_setup(N, secret=987654321, rolled=True)
args = (sel, cps, words_vec(av), words_vec(bv), words_vec(cv))
t0 = time.time()
proof, diags = jax.jit(lambda c_, r_: PB.prove_bn254(
    ctx, *args, c_, r_))(ch, rnd)
jax.block_until_ready(proof.r_z)
print(f"prove (cached?): {time.time()-t0:.1f}s", flush=True)
t0 = time.time()
vk = PB.make_vk_bn254(ctx, sel, cps)
print(f"vk: {time.time()-t0:.1f}s", flush=True)

pi = jnp.zeros((N, 16), np.uint32)
t0 = time.time()
pts = jax.jit(lambda v, p, c, q: PB._verify_points(ctx, v, p, c, q))(
    vk, proof, jnp.asarray(ch, np.uint32), pi)
jax.block_until_ready(pts[0].X)
print(f"_verify_points compile+run: {time.time()-t0:.1f}s", flush=True)

Fp = BPair.pairing_field(rolled=True)
srs = ctx.srs
def ratio_part(w1, nr1, w2, nr2):
    from plonk_tpu.ops.bigcurve import big_to_affine
    st = lambda xs: jnp.stack(xs)
    lanes = BigG1J(st([w1.X, nr1.X, w2.X, nr2.X]),
                   st([w1.Y, nr1.Y, w2.Y, nr2.Y]),
                   st([w1.Z, nr1.Z, w2.Z, nr2.Z]))
    st2 = lambda cs: Fq2(st([c.c0 for c in cs]), st([c.c1 for c in cs]))
    g2sx = Fq2(srs.g2_sx.c0, srs.g2_sx.c1)
    g2sy = Fq2(srs.g2_sy.c0, srs.g2_sy.c1)
    g21x = Fq2(srs.g2_1x.c0, srs.g2_1x.c1)
    g21y = Fq2(srs.g2_1y.c0, srs.g2_1y.c1)
    qx = st2([g2sx, g21x, g2sx, g21x])
    qy = st2([g2sy, g21y, g2sy, g21y])
    px, py, pinf = big_to_affine(Fp, lanes)
    ml = BPair.miller_loop(Fp, px, py, qx, qy)
    return ml
t0 = time.time()
ml = jax.jit(ratio_part)(*pts)
jax.block_until_ready(ml.c0.c0.c0 if hasattr(ml, "c0") else ml)
print(f"miller 4-lane compile+run: {time.time()-t0:.1f}s", flush=True)
import jax.tree_util as jtu
t0 = time.time()
lane = lambda i: jtu.tree_map(lambda t: t[i], ml)
fe = jax.jit(lambda m: BPair.final_exponentiation(
    Fp, jtu.tree_map(lambda a, b: jnp.stack([a, b]),
                     f12_mul(Fp, lane(0), lane(1)),
                     f12_mul(Fp, lane(2), lane(3)))))(ml)
jax.block_until_ready(jtu.tree_leaves(fe)[0])
print(f"final-exp compile+run: {time.time()-t0:.1f}s", flush=True)
print("DONE", flush=True)
