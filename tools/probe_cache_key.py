"""Root-cause probe for the per-process remote-compile cache misses
(VERDICT r4 item 4 / CLAUDE.md round-4: identical sha-verified StableHLO
for the big BN254 jit_run prover graph recompiles ~1100 s in EVERY new
process, while small/medium graphs hit the persistent cache).

Wraps jax._src.cache_key.get to print a PER-COMPONENT sha256 for every
cache key computed (computation / jaxlib / backend version / XLA flags /
compile_options / accelerator_config / compression / custom_hook), then
exits once the target prover module's key has been printed — key
generation happens BEFORE compilation, and only JaxRuntimeError is
caught around it, so SystemExit skips the expensive compile.

Run TWICE in separate processes and diff the output:
    python tools/probe_cache_key.py [log_n] > /tmp/ck_a.log
    python tools/probe_cache_key.py [log_n] > /tmp/ck_b.log
    diff /tmp/ck_a.log /tmp/ck_b.log
The differing component names the culprit.
"""
import sys
import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import hashlib
import numpy as np

import jax

# same persistent-cache config as bench.py so is_cache_used() is true
cache = os.path.expanduser("~/.cache/plonk_tpu/xla_bench")
os.makedirs(cache, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", cache)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

import jax._src.cache_key as ck

TARGET = os.environ.get("PROBE_CK_TARGET", "prove")
_orig_get = ck.get


def _component_digests(module, devices, compile_options, backend,
                       compression_algorithm, ignore_callbacks):
    comps = [
        ("computation",
         lambda h: ck._hash_computation(h, module, ignore_callbacks)),
        ("jax_lib_version",
         lambda h: h.update(ck.jaxlib_version_str.encode())),
        ("backend_version", lambda h: ck._hash_platform(h, backend)),
        ("xla_flags",
         lambda h: ck._hash_xla_flags(h, ck.get_flag_prefixes())),
        ("compile_options",
         lambda h: ck._hash_serialized_compile_options(
             h, compile_options,
             strip_device_assignment=(backend.platform == "gpu"))),
        ("accelerator_config",
         lambda h: ck._hash_accelerator_config(h, devices)),
        ("compression",
         lambda h: ck._hash_string(h, compression_algorithm)),
        ("custom_hook",
         lambda h: ck._hash_string(h, ck.custom_hook())),
    ]
    out = []
    for name, fn in comps:
        h = hashlib.sha256()
        try:
            fn(h)
            out.append((name, h.hexdigest()[:16]))
        except Exception as e:
            out.append((name, f"ERROR {e!r}"[:60]))
    return out


def logged_get(module, devices, compile_options, backend,
               compression_algorithm="zstandard",
               ignore_callbacks=ck.IgnoreCallbacks.NO):
    key = _orig_get(module, devices, compile_options, backend,
                    compression_algorithm, ignore_callbacks)
    name = str(module.operation.attributes["sym_name"])
    print(f"== module {name}", flush=True)
    for cname, dig in _component_digests(
            module, devices, compile_options, backend,
            compression_algorithm, ignore_callbacks):
        print(f"   {cname:20s} {dig}", flush=True)
    print(f"   final_key           {key}", flush=True)
    # also dump the serialized compile options themselves for a byte diff
    try:
        ser = compile_options.SerializeAsString()
        print(f"   compile_options_len {len(ser)} sha "
              f"{hashlib.sha256(ser).hexdigest()[:16]}", flush=True)
        with open(f"/tmp/ck_opts_{os.getpid()}_{name.strip(chr(34))}.bin",
                  "wb") as f:
            f.write(ser)
    except Exception as e:
        print(f"   compile_options dump failed: {e!r}", flush=True)
    if TARGET in name:
        print("target module key computed; exiting before compile",
              flush=True)
        sys.stdout.flush()
        os._exit(0)
    return key


ck.get = logged_get


def main():
    log_n = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    import jax.numpy as jnp
    from plonk_tpu.models import plonk_bn254 as PB
    from plonk_tpu.utils.params import BN254_FR

    n = 1 << log_n
    R = BN254_FR.p
    ctx = PB.bn254_setup(n, rolled=True)
    rng = np.random.default_rng(0)

    def words_vec(vals):
        return np.stack([np.array([(int(v) >> (16 * k)) & 0xFFFF
                                   for k in range(16)], dtype=np.uint32)
                         for v in vals])

    a = [int.from_bytes(rng.bytes(31), "little") % R for _ in range(n)]
    b = [int.from_bytes(rng.bytes(31), "little") % R for _ in range(n)]
    c = [(x * y) % R for x, y in zip(a, b)]
    sel = np.zeros((5, n, 16), dtype=np.uint32)
    sel[3] = words_vec([1] * n)
    sel[2] = words_vec([R - 1] * n)
    copies = np.stack([
        np.stack([np.full(n, t), np.arange(1, n + 1)], axis=-1)
        for t in range(3)]).astype(np.int32)
    aw, bw, cw = words_vec(a), words_vec(b), words_vec(c)
    ch = words_vec([111111, 222222, 333333, 444444, 555555])
    rnd = words_vec(list(range(17, 26)))
    prover = PB.make_prover_bn254(ctx, sel, copies)
    out = prover(aw, bw, cw, ch, rnd)
    jax.block_until_ready(out[0].r_z)
    print("prover ran to completion (no exit-before-compile hit)",
          flush=True)


if __name__ == "__main__":
    main()
