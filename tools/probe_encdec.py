"""Device check: Fr.decode(Fr.encode(w)) == w under both multiply modes,
for random words, edge values, and the exact sparse one-hot pattern that
_commit_many sees."""
import sys, os
sys.path.insert(0, __file__.rsplit("/", 2)[0])
import numpy as np
import jax
import jax.numpy as jnp
from plonk_tpu.utils.params import BN254_FR
from plonk_tpu.ops.bigfield import BigMontField

print("backend:", jax.default_backend(), flush=True)
Fr = BigMontField(BN254_FR, rolled=True)
r = Fr.p
rng = np.random.default_rng(0)

vals = [0, 1, 2, r - 1, r - 2, (1 << 254) % r, 0xFFFF, 1 << 16,
        (1 << 252) - 1]
vals += [int.from_bytes(rng.bytes(31), "little") % r for _ in range(64)]
vals += [int(rng.integers(1, 1 << 16)) for _ in range(16)]

def words(v):
    return [(v >> (16 * k)) & 0xFFFF for k in range(16)]

w = jnp.asarray(np.array([words(v) for v in vals], dtype=np.uint32))

for mode in ("shift", "dot"):
    os.environ["PLONK_TPU_BIGMUL"] = mode
    enc = jax.jit(Fr.encode)(w)
    rt = jax.jit(Fr.decode)(enc)
    ok = np.array_equal(np.asarray(rt), np.asarray(w))
    # also compare the encoded form against host encoding
    host_enc = np.asarray(Fr.encode_host(np.array(vals, dtype=object)))
    enc_ok = np.array_equal(np.asarray(enc), host_enc)
    print(f"mode={mode}: roundtrip {ok}, encode==host {enc_ok}",
          flush=True)
    if not ok:
        bad = np.where((np.asarray(rt) != np.asarray(w)).any(axis=-1))[0]
        for b in bad[:5]:
            print(f"  val={vals[int(b)]:#x} got_words="
                  f"{np.asarray(rt)[b].tolist()}", flush=True)
print("ENCDEC_DONE", flush=True)
