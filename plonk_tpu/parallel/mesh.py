"""Device-mesh helpers for the multi-chip paths.

The reference is single-threaded C with no communication layer of any kind
(SURVEY §2.3); scaling here is jax-native: `jax.sharding.Mesh` over ICI with
XLA collectives (all_to_all for NTT transposes, all_gather for MSM partial
combination, ppermute for scan boundaries)."""
from __future__ import annotations

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(shape: dict) -> Mesh:
    """Build a mesh from {'axis': size}; sizes must multiply to a divisor of
    the available device count (extra devices are left unused)."""
    total = int(np.prod(list(shape.values())))
    devs = jax.devices()
    if total > len(devs):
        raise ValueError(f"mesh needs {total} devices, have {len(devs)}")
    arr = np.array(devs[:total]).reshape(tuple(shape.values()))
    return Mesh(arr, tuple(shape.keys()))


def make_1d_mesh(axis: str = "sp", n: int | None = None) -> Mesh:
    n = n if n is not None else len(jax.devices())
    return make_mesh({axis: n})


def shard_vector(mesh: Mesh, x, axis: str):
    """Place a 1-D array sharded along its only dimension."""
    return jax.device_put(x, NamedSharding(mesh, P(axis)))
