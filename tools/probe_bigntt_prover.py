"""BN254 prover proof parity: pallas-NTT prims vs XLA prims (CPU
interpret, n=8). Proofs must be BIT-IDENTICAL (field values unique)."""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ["JAX_PLATFORMS"] = "cpu"
import jax; jax.config.update("jax_platforms", "cpu")
sys.path.insert(0, "/root/repo/tests")
import conftest  # persistent cache
import numpy as np, jax.numpy as jnp
import jax.tree_util as jtu
from plonk_tpu.models import plonk_bn254 as PB
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

os.environ["PLONK_TPU_BN254_NTT"] = "xla"
p_x, d_x = jax.jit(lambda c_, r_: PB.prove_bn254(ctx, *args, c_, r_))(ch, rnd)
assert bool(d_x.all_ok())
print("xla prims proof ok", flush=True)

os.environ["PLONK_TPU_BN254_NTT"] = "pallas"
p_p, d_p = jax.jit(lambda c_, r_: PB.prove_bn254(
    ctx, *args, c_, r_, prims=PB._local_prims(ctx)))(ch, rnd)
assert bool(d_p.all_ok())
print("pallas prims proof ok", flush=True)

fx, tx = jtu.tree_flatten_with_path(p_x)
fp, tp = jtu.tree_flatten_with_path(p_p)
assert tx == tp
for (path, u), (_, v) in zip(fx, fp):
    assert np.array_equal(np.asarray(u), np.asarray(v)), \
        f"proof leaf {jtu.keystr(path)} differs"
print("PROOF BIT-IDENTICAL: pallas-NTT prims == xla prims", flush=True)
