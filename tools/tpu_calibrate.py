"""TPU primitive calibration: measures the raw throughput of the
building blocks the framework's design choices depend on.

Run on the real chip:  python tools/tpu_calibrate.py
Prints one JSON line per experiment.
"""
import json
import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax
import jax.numpy as jnp


def timeit(fn, *args, reps=10):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps


def main():
    from plonk_tpu.ops.field import MontField
    from plonk_tpu.utils.params import BABYBEAR

    print("backend:", jax.default_backend(), flush=True)
    M = MontField(BABYBEAR)
    n = 1 << 22
    rng = np.random.default_rng(0)
    a = M.encode(jnp.asarray(rng.integers(0, M.p, size=n, dtype=np.uint32)))
    b = M.encode(jnp.asarray(rng.integers(0, M.p, size=n, dtype=np.uint32)))

    # 1. elementwise Montgomery mul (the VPU unit of account)
    f = jax.jit(lambda x, y: M.mont_mul(x, y))
    dt = timeit(f, a, b)
    print(json.dumps({"exp": "mont_mul_2e22", "ms": round(dt * 1e3, 3),
                      "gmuls_per_s": round(n / dt / 1e9, 2)}), flush=True)

    # 2. chain of 8 Montgomery muls (amortizes launch/HBM)
    def chain(x, y):
        for _ in range(8):
            x = M.mont_mul(x, y)
        return x
    f = jax.jit(chain)
    dt = timeit(f, a, b)
    print(json.dumps({"exp": "mont_mul_chain8_2e22",
                      "ms": round(dt * 1e3, 3),
                      "gmuls_per_s": round(8 * n / dt / 1e9, 2)}), flush=True)

    # 3. raw u32 multiply (single pass)
    f = jax.jit(lambda x, y: x * y)
    dt = timeit(f, a, b)
    print(json.dumps({"exp": "u32_mul_2e22", "ms": round(dt * 1e3, 3),
                      "gops_per_s": round(n / dt / 1e9, 2)}), flush=True)

    # 4. raw f32 multiply-add chain x8
    af = jnp.asarray(rng.random(n, dtype=np.float32))
    bf = jnp.asarray(rng.random(n, dtype=np.float32))
    def fchain(x, y):
        for _ in range(8):
            x = x * y + y
        return x
    f = jax.jit(fchain)
    dt = timeit(f, af, bf)
    print(json.dumps({"exp": "f32_fma_chain8_2e22",
                      "ms": round(dt * 1e3, 3),
                      "gops_per_s": round(8 * n / dt / 1e9, 2)}), flush=True)

    # 5. int8 MXU matmul with s32 accumulation (1k^3)
    A8 = jnp.asarray(rng.integers(-100, 100, size=(1024, 1024),
                                  dtype=np.int8))
    B8 = jnp.asarray(rng.integers(-100, 100, size=(1024, 1024),
                                  dtype=np.int8))
    f = jax.jit(lambda x, y: jax.lax.dot_general(
        x, y, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32))
    dt = timeit(f, A8, B8)
    print(json.dumps({"exp": "int8_matmul_1k3", "ms": round(dt * 1e3, 3),
                      "tops": round(2 * 1024**3 / dt / 1e12, 2)}), flush=True)

    # 5b. batch of 16 int8 matmuls (the limb-decomposed NTT shape)
    A16 = jnp.asarray(rng.integers(-100, 100, size=(16, 1024, 1024),
                                   dtype=np.int8))
    f = jax.jit(lambda x, y: jax.lax.dot_general(
        x, y, (((2,), (0,)), ((), ())),
        preferred_element_type=jnp.int32))
    dt = timeit(f, A16, B8)
    print(json.dumps({"exp": "int8_matmul_16x1k3", "ms": round(dt * 1e3, 3),
                      "tops": round(16 * 2 * 1024**3 / dt / 1e12, 2)}),
          flush=True)

    # 6. bf16 matmul baseline
    Abf = jnp.asarray(rng.random((1024, 1024), dtype=np.float32),
                      dtype=jnp.bfloat16)
    f = jax.jit(lambda x, y: jnp.dot(x, y,
                                     preferred_element_type=jnp.float32))
    dt = timeit(f, Abf, Abf)
    print(json.dumps({"exp": "bf16_matmul_1k3", "ms": round(dt * 1e3, 3),
                      "tflops": round(2 * 1024**3 / dt / 1e12, 2)}),
          flush=True)

    # 7. random row gather: 256k rows from a (8M,) u32 array
    big = jnp.asarray(rng.integers(0, 1 << 30, size=1 << 23,
                                   dtype=np.uint32))
    idx = jnp.asarray(rng.integers(0, 1 << 23, size=1 << 18,
                                   dtype=np.int32))
    f = jax.jit(lambda t, i: t[i])
    dt = timeit(f, big, idx)
    print(json.dumps({"exp": "gather_256k_of_8M", "ms": round(dt * 1e3, 3),
                      "melems_per_s": round((1 << 18) / dt / 1e6, 1)}),
          flush=True)

    # 8. one full-width DIT stage in XLA (reshape butterflies) at 2^22
    from plonk_tpu.ops.ntt import _twiddle_table
    tw = M.array(_twiddle_table(M.p, BABYBEAR.root_of_unity(n), n))

    def stage(y):
        half = n // 2
        yv = y.reshape(1, 2, half)
        even = yv[:, 0, :]
        odd = M.mul(yv[:, 1, :], tw[:half])
        return jnp.concatenate([M.add(even, odd), M.sub(even, odd)],
                               axis=-1)
    f = jax.jit(stage)
    dt = timeit(f, a)
    print(json.dumps({"exp": "one_butterfly_stage_2e22",
                      "ms": round(dt * 1e3, 3)}), flush=True)

    # 9. tunnel sync (completion) latency: sync-per-call minus the
    # async-pipelined per-call time, for a small and a prover-sized
    # program. This is the artifact that inflates every sync-per-call
    # benchmark (measured 0.1 ms small / ~24 ms large on 2026-08-19;
    # varies by day) — see CLAUDE.md. Time N async dispatches, sync
    # once; never time sync-per-call.
    for label, fn, arg in [
            ("small", jax.jit(lambda x: x + 1),
             jnp.ones((8, 128), jnp.uint32)),
            ("chain64_2e20", jax.jit(
                lambda x: jax.lax.fori_loop(
                    0, 64, lambda i, v: M.mul(v, v), x)),
             M.encode(jnp.arange(1 << 20, dtype=jnp.uint32)
                      % jnp.uint32(M.p - 1) + 1))]:
        out = fn(arg)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(8):
            jax.block_until_ready(fn(arg))
        sync = (time.perf_counter() - t0) / 8
        t0 = time.perf_counter()
        o = arg
        for _ in range(8):
            o = fn(arg)
        jax.block_until_ready(o)
        asyn = (time.perf_counter() - t0) / 8
        print(json.dumps({"exp": f"sync_latency_{label}",
                          "sync_ms": round(sync * 1e3, 3),
                          "async_ms": round(asyn * 1e3, 3),
                          "sync_overhead_ms":
                              round((sync - asyn) * 1e3, 3)}),
              flush=True)


if __name__ == "__main__":
    main()
