"""Test configuration: force the CPU backend with 8 virtual devices so
multi-chip sharding (mesh/pjit/shard_map) is exercised without TPU hardware.

The session env pins JAX_PLATFORMS=axon (the real-chip tunnel) and the
jaxtyping pytest plugin imports jax before conftests load, so setting the
env var alone is not enough — we also flip the live jax config (backends
are not initialized yet at conftest time)."""
import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: the BN254 pairing/prover graphs take
# minutes to compile on the CPU backend; caching cuts re-runs ~4x
# (measured: 39 s cold -> 9.6 s warm for the pairing).
#
# The dir is keyed by a CPU-feature fingerprint: XLA:CPU AOT artifacts
# embed the compile machine's ISA features, and loading an entry built
# on a different machine SEGFAULTS the process mid-suite (observed
# 2026-08-18 after a container migration: "machine features ... could
# lead to SIGILL" warnings, then a crash in backend_compile_and_load).
def _cpu_fingerprint() -> str:
    import hashlib
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith("flags"):
                    flags_ = " ".join(sorted(line.split(":")[1].split()))
                    return hashlib.sha256(flags_.encode()).hexdigest()[:12]
    except OSError:
        pass
    import platform
    return hashlib.sha256(platform.processor().encode()).hexdigest()[:12]


_CACHE = os.path.expanduser("~/.cache/plonk_tpu/xla_cpu_tests_"
                            + _cpu_fingerprint())
os.makedirs(_CACHE, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", _CACHE)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

# XLA:CPU executable.serialize() segfaults NONDETERMINISTICALLY on the
# giant pairing executables (jax 0.9.0; observed twice, different graphs,
# same C++ crash inside the cache write — uncatchable from Python). A
# failed cache WRITE must not kill the test process: run each write in a
# forked child (COW, cheap); a child crash just skips that entry.
import time as _time  # noqa: E402
import jax._src.compilation_cache as _cc  # noqa: E402

_orig_put = _cc.put_executable_and_time


def _forked_put(cache_key, module_name, executable, backend, compile_time):
    pid = os.fork()
    if pid == 0:  # child: attempt the real write, never raise/return
        try:
            _orig_put(cache_key, module_name, executable, backend,
                      compile_time)
        except BaseException:
            pass
        finally:
            os._exit(0)
    deadline = _time.time() + 300
    while _time.time() < deadline:
        done, _ = os.waitpid(pid, os.WNOHANG)
        if done:
            return
        _time.sleep(0.2)
    import signal as _signal
    os.kill(pid, _signal.SIGKILL)   # exact child PID, never a pattern
    os.waitpid(pid, 0)


_cc.put_executable_and_time = _forked_put
