"""Run __graft_entry__ (entry + dryrun_multichip) on the CPU backend with
8 virtual devices — safe to run alongside a TPU job (the sitecustomize
pins JAX_PLATFORMS=axon, so flip the live config before first device use).
"""
import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import __graft_entry__ as g  # noqa: E402

fn, args = g.entry()
out = jax.jit(fn)(*args)
jax.block_until_ready(out)
print("entry ok; r_z =", int(out[0].r_z), flush=True)
g.dryrun_multichip(8)
print("dryrun_multichip(8) ok", flush=True)
