"""Persistent XLA:CPU compile-cache directory with a staleness-proof key.

XLA:CPU AOT cache entries embed the COMPILE machine's target-feature
string; loading an entry whose features the current host/XLA rejects
costs a warning + forced recompile per entry (and, per the 2026-08-18
incident, a SIGILL/segfault risk). Round 4's fingerprint keyed the dir
on /proc/cpuinfo flags only — after a container migration the flags were
identical but XLA's *chosen* target features differed
(+prefer-no-gather/-scatter), so the dir did not rotate and every load
was rejected, blowing the dryrun past the driver's timeout
(MULTICHIP_r04.json rc=124; VERDICT r4 item 1c).

Fix: key the dir on what the CURRENT jax/XLA would actually emit — the
target-feature string extracted from a tiny serialized executable —
plus jaxlib version, CPU model name, and cpuinfo flags. Any change in
machine OR XLA target config rotates to a fresh dir.

Requires the default jax platform to be CPU before calling (both call
sites — tests/conftest.py and __graft_entry__.dryrun_multichip — flip
the platform first).
"""
from __future__ import annotations

import hashlib
import os
import re

_FP_CACHE: dict = {}


def _cpuinfo_parts() -> tuple[str, str]:
    model, flags = "", ""
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if not model and line.startswith("model name"):
                    model = line.split(":", 1)[1].strip()
                if not flags and line.startswith("flags"):
                    flags = " ".join(sorted(line.split(":", 1)[1].split()))
                if model and flags:
                    break
    except OSError:
        pass
    return model, flags


def xla_target_features() -> str:
    """Target-feature string of the executables the current XLA:CPU
    emits, extracted from a tiny serialized executable (~0.2 s, verified
    byte-stable across processes). The serialized blob embeds one
    contiguous comma-separated list (the same string the cpu_aot_loader
    prints when it rejects an entry)."""
    if "features" in _FP_CACHE:
        return _FP_CACHE["features"]
    feats = "feature-probe-failed"
    try:
        import jax
        import numpy as np
        comp = jax.jit(lambda x: x * 2 + 1).lower(
            np.arange(8, dtype=np.int32)).compile()
        ser = comp.runtime_executable().serialize()
        runs = re.findall(rb"[+\-][a-z0-9_.\-]+(?:,[+\-][a-z0-9_.\-]+){20,}",
                          ser)
        if runs:
            feats = b"|".join(sorted(set(runs))).decode()
    except Exception:
        pass
    _FP_CACHE["features"] = feats
    return feats


def machine_fingerprint() -> str:
    """12-hex digest over (jaxlib version, CPU model, cpuinfo flags,
    XLA-chosen target features)."""
    if "fp" in _FP_CACHE:
        return _FP_CACHE["fp"]
    try:
        import jaxlib.version
        jl = jaxlib.version.__version__
    except Exception:
        jl = "unknown"
    model, flags = _cpuinfo_parts()
    blob = "\n".join([jl, model, flags, xla_target_features()])
    fp = hashlib.sha256(blob.encode()).hexdigest()[:12]
    _FP_CACHE["fp"] = fp
    return fp


def xla_cpu_cache_dir(kind: str = "tests") -> str:
    """Create + return the fingerprinted persistent-cache dir."""
    d = os.path.expanduser(
        f"~/.cache/plonk_tpu/xla_cpu_{kind}_{machine_fingerprint()}")
    os.makedirs(d, exist_ok=True)
    return d


def enable_persistent_cache(jax_module, kind: str = "tests") -> str:
    """Point jax's persistent compilation cache at the fingerprinted dir."""
    d = xla_cpu_cache_dir(kind)
    jax_module.config.update("jax_compilation_cache_dir", d)
    jax_module.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax_module.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    return d
