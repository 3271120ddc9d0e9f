"""Multi-host (DCN) initialization and global-mesh helpers.

The reference is single-threaded C with no communication layer (SURVEY
§2.3); within one slice this framework scales over ICI via
jax.sharding.Mesh (parallel/mesh.py). Across hosts the standard TPU-native
path is `jax.distributed` + DCN: every process calls
`init_distributed()` before first device use, then builds ONE global mesh
over `jax.devices()` (which, after initialization, enumerates the devices
of ALL hosts).

This container has a single host, so the multi-process path cannot be
executed here; it is written env-driven (the standard TPU pod runtime
variables) and the single-host fallback is exercised by tests and the
driver dryrun. On a real v5e multi-host slice no code change is needed:
the same entry points pick up COORDINATOR_ADDRESS/NUM_PROCESSES/PROCESS_ID
(or the TPU runtime's automatic cluster detection) and the data layout
below shards exactly as on one host.

Design notes for the sharded prover at multi-host scale:
- keep the `sp` axis INSIDE a host's ICI domain (all_to_all-heavy
  four-step NTT transposes ride ICI, not DCN) and map a `dp` axis
  (independent proofs / witness batches) across hosts — DCN then carries
  only per-proof inputs and the tiny per-proof outputs;
- the fixed-base table is replicated per host (it is SRS-derived and
  read-only), so no cross-host traffic in commitments beyond the final
  G1 partials (all_gather of a few hundred bytes).
"""
from __future__ import annotations

import os

import numpy as np
import jax
from jax.sharding import Mesh


def init_distributed(coordinator_address: str | None = None,
                     num_processes: int | None = None,
                     process_id: int | None = None) -> bool:
    """Initialize jax.distributed from args or the standard environment
    (COORDINATOR_ADDRESS / NUM_PROCESSES / PROCESS_ID). Returns True when
    a multi-process runtime was initialized, False for the single-process
    fallback (nothing to do — jax.devices() is already the world)."""
    coordinator_address = coordinator_address or os.environ.get(
        "COORDINATOR_ADDRESS")
    if num_processes is None:
        num_processes = int(os.environ.get("NUM_PROCESSES", "0") or 0)
    if process_id is None:
        process_id = int(os.environ.get("PROCESS_ID", "-1"))
    if not coordinator_address or num_processes <= 1:
        return False
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id)
    return True


def global_mesh(sp: int | None = None, dp: int | None = None,
                devices=None) -> Mesh:
    """A (dp, sp) mesh over the global device list. Defaults: `sp` = the
    per-host device count (so the NTT all_to_alls stay on ICI) and `dp` =
    the host count. Works identically single-host (dp=1)."""
    devs = list(devices if devices is not None else jax.devices())
    if sp is None:
        sp = max(1, jax.local_device_count())
        while len(devs) % sp:
            sp //= 2
    if dp is None:
        dp = len(devs) // sp
    if dp * sp > len(devs):
        raise ValueError(f"mesh {dp}x{sp} needs {dp*sp} devices, "
                         f"have {len(devs)}")
    arr = np.array(devs[:dp * sp]).reshape(dp, sp)
    return Mesh(arr, ("dp", "sp"))


def process_count() -> int:
    return jax.process_count()


def is_coordinator() -> bool:
    return jax.process_index() == 0
