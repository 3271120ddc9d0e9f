"""Pallas TPU kernel: fused intra-row NTT butterfly stages.

The blocked NTT (ops/ntt.py) runs log2(C) "intra-row" stages whose
butterflies act within each C-wide row. As plain XLA ops every stage is an
HBM round trip (~4 MB read+write per stage at 2^20). This kernel keeps a
(block_rows, C) tile resident in VMEM and applies ALL intra-row stages
before writing back — one HBM pass for log2(C) stages. Butterfly partners
are reached with lane rolls (pltpu.roll); the Montgomery arithmetic is the
same uint32 limb code as ops/field.py, fully VPU-friendly.

Column stages (butterfly distance >= C) remain in XLA where the reshape is
already layout-friendly.

Used by ops/ntt.py when `use_pallas` is enabled (bench path); numerical
parity with the XLA path is asserted in tests/test_pallas_ntt.py via
interpret mode on CPU and on-device in bench smoke runs.
"""
from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

U32 = jnp.uint32
_MASK16 = jnp.uint32(0xFFFF)


def _mont_ops(p: int, n_prime: int):
    # NOTE: construct the jnp constants lazily inside each op so they are
    # created during the kernel trace (pallas_call rejects captured
    # consts created outside the kernel).

    def add(a, b):
        pj = jnp.uint32(p)
        s = a + b
        return jnp.where(s >= pj, s - pj, s)

    def sub(a, b):
        pj = jnp.uint32(p)
        d = a - b
        return jnp.where(a >= b, d, d + pj)

    def mul(a, b):
        pj = jnp.uint32(p)
        npj = jnp.uint32(n_prime)
        mask16 = jnp.uint32(0xFFFF)
        a0 = a & mask16
        a1 = a >> 16
        b0 = b & mask16
        b1 = b >> 16
        p00 = a0 * b0
        p01 = a0 * b1
        p10 = a1 * b0
        p11 = a1 * b1
        mid = (p00 >> 16) + (p01 & mask16) + (p10 & mask16)
        lo = (p00 & mask16) | ((mid & mask16) << 16)
        hi = p11 + (p01 >> 16) + (p10 >> 16) + (mid >> 16)
        m = lo * npj
        m0 = m & mask16
        m1 = m >> 16
        q0 = pj & mask16
        q1 = pj >> 16
        r00 = m0 * q0
        r01 = m0 * q1
        r10 = m1 * q0
        r11 = m1 * q1
        rmid = (r00 >> 16) + (r01 & mask16) + (r10 & mask16)
        rlo = (r00 & mask16) | ((rmid & mask16) << 16)
        rhi = r11 + (r01 >> 16) + (r10 >> 16) + (rmid >> 16)
        carry = (lo != 0).astype(U32)
        t = hi + rhi + carry
        return jnp.where(t >= pj, t - pj, t)

    return add, sub, mul


def _row_stages_kernel(p: int, n_prime: int, C: int, block_rows: int,
                       tw_ref, y_ref, out_ref):
    add, sub, mul = _mont_ops(p, n_prime)
    pos = jax.lax.broadcasted_iota(jnp.int32, (block_rows, C), 1)
    y = y_ref[:]
    half = 1
    s = 0
    while half < C:
        tv = tw_ref[s, :]
        in_low = (pos % (2 * half)) < half
        down = pltpu.roll(y, C - half, 1)   # y[j + half] at position j
        up = pltpu.roll(y, half, 1)         # y[j - half] at position j
        low_new = add(y, mul(down, tv))
        high_new = sub(up, mul(y, tv))
        y = jnp.where(in_low, low_new, high_new)
        half *= 2
        s += 1
    out_ref[:] = y


def row_stages(p: int, n_prime: int, y: jnp.ndarray,
               tw_stack: jnp.ndarray, block_rows: int = 256,
               interpret: bool = False) -> jnp.ndarray:
    """Apply all intra-row butterfly stages to y (R, C) in one fused pass.
    tw_stack: (log2(C), C) per-stage lane twiddles (Montgomery form)."""
    R, C = y.shape
    block_rows = min(block_rows, R)
    while R % block_rows:
        block_rows -= 1  # largest divisor of R at most the requested size
    kern = functools.partial(_row_stages_kernel, p, n_prime, C, block_rows)
    return pl.pallas_call(
        kern,
        grid=(R // block_rows,),
        in_specs=[
            pl.BlockSpec((tw_stack.shape[0], C), lambda i: (0, 0),
                         memory_space=pl.ANY
                         if interpret else pltpu.VMEM),
            pl.BlockSpec((block_rows, C), lambda i: (i, 0),
                         memory_space=pl.ANY
                         if interpret else pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_rows, C), lambda i: (i, 0),
                               memory_space=pl.ANY
                               if interpret else pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((R, C), U32),
        interpret=interpret,
    )(tw_stack, y)


# ---------------- full per-row transforms (DIF / DIT) ----------------
#
# A row of width C holds one complete size-C transform, all log2(C)
# stages resident in VMEM:
# - DIF (decimation in frequency): natural input -> BIT-REVERSED output;
#   butterfly (a, b) -> (a + b, (a - b) * tw), stages half = C/2 .. 1.
# - DIT (decimation in time): bit-reversed input -> natural output;
#   butterfly (a, b) -> (a + b*tw, a - b*tw), stages half = 1 .. C/2.
# The per-stage lane twiddle vector tv[pos] = w^((pos mod half) * n/(2half))
# is IDENTICAL for both; only stage order and butterfly form differ. Using
# DIF forward + DIT inverse eliminates every bit-reversal permutation from
# the four-step transform (ops/fused_ntt.py).


def _full_row_kernel(p: int, n_prime: int, C: int, block_rows: int,
                     dif: bool, tw_ref, y_ref, out_ref):
    add, sub, mul = _mont_ops(p, n_prime)
    pos = jax.lax.broadcasted_iota(jnp.int32, (block_rows, C), 1)
    y = y_ref[:]
    stages = []
    half = 1
    s = 0
    while half < C:
        stages.append((half, s))
        half *= 2
        s += 1
    if dif:
        stages = stages[::-1]
    for half, s in stages:
        tv = tw_ref[s, :]
        in_low = (pos % (2 * half)) < half
        down = pltpu.roll(y, C - half, 1)   # y[j + half] at position j
        up = pltpu.roll(y, half, 1)         # y[j - half] at position j
        if dif:
            # low: a + b ; high: (a' - b') * tv where at a high position
            # the local value IS b and `up` is a
            low_new = add(y, down)
            high_new = mul(sub(up, y), tv)
        else:
            low_new = add(y, mul(down, tv))
            high_new = sub(up, mul(y, tv))
        y = jnp.where(in_low, low_new, high_new)
    out_ref[:] = y


def row_transform(p: int, n_prime: int, y: jnp.ndarray,
                  tw_stack: jnp.ndarray, dif: bool,
                  block_rows: int = 256,
                  interpret: bool = False) -> jnp.ndarray:
    """One complete size-C NTT per row of y (R, C), fused in VMEM.
    dif=True: natural -> bit-reversed; dif=False: bit-reversed -> natural.
    tw_stack as produced by ops/ntt._stage_tables for half < C."""
    R, C = y.shape
    block_rows = min(block_rows, R)
    while R % block_rows:
        block_rows -= 1
    kern = functools.partial(_full_row_kernel, p, n_prime, C, block_rows,
                             dif)
    return pl.pallas_call(
        kern,
        grid=(R // block_rows,),
        in_specs=[
            pl.BlockSpec((tw_stack.shape[0], C), lambda i: (0, 0),
                         memory_space=pl.ANY
                         if interpret else pltpu.VMEM),
            pl.BlockSpec((block_rows, C), lambda i: (i, 0),
                         memory_space=pl.ANY
                         if interpret else pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_rows, C), lambda i: (i, 0),
                               memory_space=pl.ANY
                               if interpret else pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((R, C), U32),
        interpret=interpret,
    )(tw_stack, y)
