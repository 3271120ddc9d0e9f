"""Test configuration: force the CPU backend with 8 virtual devices so
multi-chip sharding (mesh/pjit/shard_map) is exercised without TPU hardware.

The session env pins JAX_PLATFORMS=axon (the real-chip tunnel) and the
jaxtyping pytest plugin imports jax before conftests load, so setting the
env var alone is not enough — we also flip the live jax config (backends
are not initialized yet at conftest time)."""
import os
import sys

# Silence the cpu_aot_loader's per-entry E-level feature warnings:
# +prefer-no-gather/-scatter are XLA tuning flags that never appear in
# raw cpuinfo, so EVERY persistent-cache load "warns" (loads succeed);
# a BN254 test run prints hundreds of them (round-5 finding).
os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "3")
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
# The dir is keyed by a machine+XLA fingerprint (see
# plonk_tpu/utils/cachedir.py): stale AOT entries built under a
# different XLA target config are rejected per-load (round-4 dryrun
# timeout) or SEGFAULT the suite (2026-08-18 incident), so the dir
# must rotate whenever the machine OR XLA's chosen target features do.
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from plonk_tpu.utils.cachedir import enable_persistent_cache  # noqa: E402

_CACHE = enable_persistent_cache(jax, kind="tests")

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
