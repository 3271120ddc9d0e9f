"""Time the full BN254 prover at 2^log_n with the round-5 kernels
(pallas NTT prims + commit kernel per env): compile + per-proof ms."""
import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax
cache = os.path.expanduser("~/.cache/plonk_tpu/xla_bench")
os.makedirs(cache, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", cache)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
import jax.numpy as jnp
from plonk_tpu.models import plonk_bn254 as PB
from plonk_tpu.utils.params import BN254_FR

log_n = int(sys.argv[1]) if len(sys.argv) > 1 else 12
n = 1 << log_n
R = BN254_FR.p
print(f"ntt={os.environ.get('PLONK_TPU_BN254_NTT','<default>')} "
      f"kernel={os.environ.get('PLONK_TPU_BIGMSM_KERNEL','<default>')}",
      flush=True)
ctx = PB.bn254_setup(n, rolled=True)
rng = np.random.default_rng(0)
words_vec = lambda vals: np.stack([
    np.array([(int(v) >> (16 * k)) & 0xFFFF for k in range(16)],
             dtype=np.uint32) for v in vals])
a = [int.from_bytes(rng.bytes(31), "little") % R for _ in range(n)]
b = [int.from_bytes(rng.bytes(31), "little") % R for _ in range(n)]
c = [(x * y) % R for x, y in zip(a, b)]
sel = np.zeros((5, n, 16), dtype=np.uint32)
sel[3] = words_vec([1] * n)
sel[2] = words_vec([R - 1] * n)
copies = np.stack([np.stack([np.full(n, t), np.arange(1, n + 1)], axis=-1)
                   for t in range(3)]).astype(np.int32)
aw, bw, cw = words_vec(a), words_vec(b), words_vec(c)
ch = words_vec([111111, 222222, 333333, 444444, 555555])
t0 = time.perf_counter()
prover = PB.make_prover_bn254(ctx, sel, copies)
aj, bj, cj = (jax.device_put(jnp.asarray(v, jnp.uint32))
              for v in (aw, bw, cw))
out = prover(aj, bj, cj, ch, words_vec(list(range(17, 26))))
jax.block_until_ready(out[0].r_z)
print(f"compile+first: {time.perf_counter()-t0:.1f}s", flush=True)
assert bool(out[1].all_ok()), "diags"
reps = 8
variants = [words_vec([17 + 31 * i + j for j in range(9)])
            for i in range(reps + 1)]
o = prover(aj, bj, cj, ch, variants[0]); jax.block_until_ready(o[0].r_z)
t0 = time.perf_counter()
for v in variants[1:]:
    o = prover(aj, bj, cj, ch, v)
jax.block_until_ready(o[0].r_z)
dt = (time.perf_counter() - t0) / reps
print(f"proof: {dt*1000:.2f} ms = {1/dt:.3f} proofs/s", flush=True)
