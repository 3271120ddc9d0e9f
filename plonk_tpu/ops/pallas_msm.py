"""Pallas TPU kernel: fused fixed-base multi-commitment MSM.

The XLA select-sweep path (ops/fixed_base.py) is two HBM-bound passes:
the bucket sweep rewrites a (B, W, L) accumulator once per bucket
(~128x21 MB at 2^16/wb=7), and the Jacobian tree then runs log2(W*L)
full-width adds with an HBM round trip per level. Measured on the real
chip: 8.3 ms sweep + ~7 ms tree for the 9 commitments at 2^16.

This kernel fuses BOTH phases into one pass per point tile, entirely in
VMEM:

  grid = (n_tiles, n_buckets - 1)        # buckets innermost
  per (tile, d):  acc[b, w, i] <- table[w, d+1, i]  where digit == d+1
  at the last d:  in-VMEM Jacobian tree over (W, TL) -> one point per
                  commitment lane, written as the tile's partial sum.

The table is streamed through VMEM exactly once (Pallas pipelines the
per-bucket blocks); the accumulator never touches HBM; the tree adds are
pure VPU compute on resident data. Because the tree is now compute-cheap
(no HBM round trip per level), NARROW windows win: wb=4 streams 8x fewer
table bytes than wb=7 and the extra tree adds are almost free. The
per-tile partials (n_tiles x B points) are folded by a tiny XLA tree.

Montgomery arithmetic is the same 16-bit-limb uint32 code as
ops/pallas_ntt.py; the Jacobian formulas mirror ops/curve.py jac_add /
jac_double (a = 0 short Weierstrass, Z == 0 encodes infinity).

Reference counterpart: src/srs.h:53-68 (srs_commit) — one ladder per
coefficient there; one table stream for all nine commitments here.

Round-3 on-device history (tools/sweep_pallas_wb.py, 2^16, 9 commits):
the first lowering ran buckets as an inner grid axis and a full-width
roll tree — 15.8 ms, losing to the XLA select sweep (10.2 ms at wb=5).
Folding the sweep into one grid step per tile cut it to 11.4 ms; the
flattened-lane reduction tree (every halving step 128-aligned, every
lane useful) cut it to 4.84 ms at wb=4/tile=1024 — now the accelerator
DEFAULT commit path (PLONK_TPU_PALLAS_MSM=0 restores the select sweep).
Parity vs the XLA fixed-base path is asserted on device by every bench
run (bench.check_pallas_commit_parity).
"""
from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .curve import G1, G1J
from .fixed_base import FixedBaseTable, build_fixed_base_table

U32 = jnp.uint32


def _mont_ops(p: int, n_prime: int):
    """In-kernel Montgomery field ops (single u32 word, 16-bit limb
    products) — identical math to ops/pallas_ntt.py."""

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
        rhi = r11 + (r01 >> 16) + (r10 >> 16) + (rmid >> 16)
        carry = (lo != 0).astype(U32)
        t = hi + rhi + carry
        return jnp.where(t >= pj, t - pj, t)

    return add, sub, mul


def _jac_ops(p: int, n_prime: int, enc2: int, enc3: int, enc8: int):
    """Branchless Jacobian add/double on (X, Y, Z) u32 triples; ports
    ops/curve.py jac_add / jac_double (a = 0; Z == 0 is infinity)."""
    add, sub, mul = _mont_ops(p, n_prime)

    def dbl(X, Y, Z):
        c2 = jnp.uint32(enc2)
        c3 = jnp.uint32(enc3)
        c8 = jnp.uint32(enc8)
        A = mul(X, X)
        B = mul(Y, Y)
        Cc = mul(B, B)
        t = add(X, B)
        D = mul(c2, sub(sub(mul(t, t), A), Cc))
        E = mul(c3, A)
        Ff = mul(E, E)
        X3 = sub(Ff, mul(c2, D))
        Y3 = sub(mul(E, sub(D, X3)), mul(c8, Cc))
        Z3 = mul(c2, mul(Y, Z))
        return X3, Y3, Z3

    def jadd(X1, Y1, Z1, X2, Y2, Z2):
        c2 = jnp.uint32(enc2)
        Z1Z1 = mul(Z1, Z1)
        Z2Z2 = mul(Z2, Z2)
        U1 = mul(X1, Z2Z2)
        U2 = mul(X2, Z1Z1)
        S1 = mul(Y1, mul(Z2, Z2Z2))
        S2 = mul(Y2, mul(Z1, Z1Z1))
        H = sub(U2, U1)
        r = sub(S2, S1)
        HH = mul(H, H)
        HHH = mul(H, HH)
        V = mul(U1, HH)
        rr = mul(r, r)
        X3 = sub(sub(rr, HHH), mul(c2, V))
        Y3 = sub(mul(r, sub(V, X3)), mul(S1, HHH))
        Z3 = mul(mul(Z1, Z2), H)

        dX, dY, dZ = dbl(X1, Y1, Z1)

        p_inf = Z1 == 0
        q_inf = Z2 == 0
        same_x = (H == 0) & ~p_inf & ~q_inf
        same_pt = same_x & (r == 0)
        inverse = same_x & (r != 0)

        X3 = jnp.where(same_pt, dX, X3)
        Y3 = jnp.where(same_pt, dY, Y3)
        Z3 = jnp.where(same_pt, dZ, Z3)
        Z3 = jnp.where(inverse, jnp.zeros_like(Z3), Z3)
        X3 = jnp.where(p_inf, X2, X3)
        Y3 = jnp.where(p_inf, Y2, Y3)
        Z3 = jnp.where(p_inf, Z2, Z3)
        X3 = jnp.where(q_inf, X1, X3)
        Y3 = jnp.where(q_inf, Y1, Y3)
        Z3 = jnp.where(q_inf, Z1, Z3)
        return X3, Y3, Z3

    return jadd, dbl


def _commit_kernel(p: int, n_prime: int, one: int, enc2: int, enc3: int,
                   enc8: int, wb: int, B: int, W: int, TL: int, nb: int,
                   scal_ref, tx_ref, ty_ref, tinf_ref,
                   ox_ref, oy_ref, oz_ref):
    """ONE grid step per point tile: the full bucket sweep (unrolled
    python loop over the (nb, W, TL) table block resident in VMEM) plus
    the Jacobian tree. The round-3 version ran buckets as an inner grid
    axis — 960 dependent micro-steps whose fixed cost serialized the
    whole pass (15.8 ms); folding them into the tile step leaves
    ~L/TL independent steps that pipeline against the table stream."""
    jadd, _ = _jac_ops(p, n_prime, enc2, enc3, enc8)
    onej = jnp.uint32(one)

    # digits for this tile: (B, W, TL)
    shifts = (jax.lax.broadcasted_iota(U32, (B, W, TL), 1)
              * jnp.uint32(wb))
    digits = (scal_ref[:][:, None, :] >> shifts) & jnp.uint32((1 << wb) - 1)

    # bucket 0 is the identity -> start there and sweep d = 1..nb-1
    X = jnp.full((B, W, TL), onej, U32)
    Y = jnp.full((B, W, TL), onej, U32)
    Z = jnp.zeros((B, W, TL), U32)
    for d in range(1, nb):
        hit = digits == jnp.uint32(d)
        tinf = tinf_ref[d][None] != 0
        X = jnp.where(hit, jnp.where(tinf, onej, tx_ref[d][None]), X)
        Y = jnp.where(hit, jnp.where(tinf, onej, ty_ref[d][None]), Y)
        Z = jnp.where(hit, jnp.where(tinf, jnp.uint32(0), onej), Z)

    # Tree-sum in VMEM. The round-3 kernel reduced the window axis with
    # pltpu.roll partners — each of the log2(W) levels ran the FULL
    # (B, W, TL) width, so 8 windows cost 24 full-width jadd-equivalents
    # with most lanes computing garbage nobody reads. Flattening the
    # (W, TL) block onto the lane axis instead makes every halving step
    # a contiguous 128-aligned slice and every lane useful: total work
    # is ~W*TL jadd-lanes per commitment (3.2x less), the dominant cost
    # of the whole kernel.
    X = X.reshape(B, W * TL)
    Y = Y.reshape(B, W * TL)
    Z = Z.reshape(B, W * TL)
    t = W * TL
    while t > 128:                                # aligned halving
        h = t // 2
        X, Y, Z = jadd(X[:, :h], Y[:, :h], Z[:, :h],
                       X[:, h:t], Y[:, h:t], Z[:, h:t])
        t = h
    # stop at one full 128-lane register per commitment: the last seven
    # roll levels run the whole VPU for <=128 live lanes (mostly wasted)
    # and dominated the round-3 kernel; a tiny XLA tree over the
    # (n_tiles, B, 128) partials finishes the sum instead.
    ox_ref[0] = X
    oy_ref[0] = Y
    oz_ref[0] = Z


def _pad_pow2(n: int) -> int:
    return 1 << (n - 1).bit_length() if n > 1 else 1


def commit_many_pallas(F, table: FixedBaseTable, scalars: jnp.ndarray,
                       tile: int = 1024, interpret: bool = False) -> G1J:
    """(B, L) standard-form scalars -> (B,) Jacobian commitments against
    the fixed-base window table, as ONE fused Pallas pass (sweep + tree).
    W must cover the scalar bits; the window axis must be padded to a
    power of two by the table builder (build_commit_table)."""
    W, nb, L = table.x.shape
    # int() guard: a table rebuilt from jit OUTPUTS carries window_bits
    # as a concrete i32 array; the kernel must close over a python int
    # or tracing rejects it as a captured constant (bench round 3).
    wb = int(table.window_bits)
    B = scalars.shape[0]
    if W & (W - 1):
        raise ValueError("window count must be a power of two "
                         "(build_commit_table pads it)")
    TL = max(128, min(tile, _pad_pow2(L)))   # kernel emits (B, 128)
    n_tiles = -(-L // TL)
    Lp = n_tiles * TL
    # bucket-major table layout (nb, W, L): the streamed (bucket) axis
    # must lead so each grid step's block is (1, W, TL) — Mosaic requires
    # the LAST TWO block dims to tile the array (W == full axis, TL | 128)
    tx = jnp.swapaxes(table.x, 0, 1)
    ty = jnp.swapaxes(table.y, 0, 1)
    tinf = jnp.swapaxes(table.inf.astype(U32), 0, 1)
    if Lp != L:
        padp = [(0, 0), (0, 0), (0, Lp - L)]
        tx = jnp.pad(tx, padp)
        ty = jnp.pad(ty, padp)
        tinf = jnp.pad(tinf, padp, constant_values=1)
        scalars = jnp.pad(jnp.asarray(scalars, U32),
                          [(0, 0), (0, Lp - L)])
    else:
        scalars = jnp.asarray(scalars, U32)

    p, npr = int(F.p), int(F.n_prime)
    R = (1 << 32) % p
    enc = lambda c: (c * R) % p
    kern = functools.partial(
        _commit_kernel, p, npr, R, enc(2), enc(3), enc(8), wb, B, W, TL,
        nb)
    out_shape = jax.ShapeDtypeStruct((n_tiles, B, 128), U32)
    mem = pl.ANY if interpret else pltpu.VMEM
    ox, oy, oz = pl.pallas_call(
        kern,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((B, TL), lambda t: (0, t), memory_space=mem),
            pl.BlockSpec((nb, W, TL), lambda t: (0, 0, t),
                         memory_space=mem),
            pl.BlockSpec((nb, W, TL), lambda t: (0, 0, t),
                         memory_space=mem),
            pl.BlockSpec((nb, W, TL), lambda t: (0, 0, t),
                         memory_space=mem),
        ],
        out_specs=[
            pl.BlockSpec((1, B, 128), lambda t: (t, 0, 0),
                         memory_space=mem),
            pl.BlockSpec((1, B, 128), lambda t: (t, 0, 0),
                         memory_space=mem),
            pl.BlockSpec((1, B, 128), lambda t: (t, 0, 0),
                         memory_space=mem),
        ],
        out_shape=[out_shape, out_shape, out_shape],
        interpret=interpret,
    )(scalars, tx, ty, tinf)

    # small XLA tree over the per-tile 128-lane partials:
    # (n_tiles, B, 128) -> (B, 128) over tiles, then 7 lane halvings
    from .curve import jac_add
    terms = G1J(ox, oy, oz)                       # (n_tiles, B, 128)
    m = _pad_pow2(n_tiles)
    if m != n_tiles:
        pad = G1J.identity(F, (m - n_tiles, B, 128))
        terms = G1J(jnp.concatenate([terms.X, pad.X]),
                    jnp.concatenate([terms.Y, pad.Y]),
                    jnp.concatenate([terms.Z, pad.Z]))
    while m > 1:
        h = m // 2
        terms = jac_add(F, G1J(terms.X[:h], terms.Y[:h], terms.Z[:h]),
                        G1J(terms.X[h:], terms.Y[h:], terms.Z[h:]))
        m = h
    cur = G1J(terms.X[0], terms.Y[0], terms.Z[0])  # (B, 128)
    t = 128
    while t > 1:
        h = t // 2
        cur = jac_add(F, G1J(cur.X[:, :h], cur.Y[:, :h], cur.Z[:, :h]),
                      G1J(cur.X[:, h:t], cur.Y[:, h:t], cur.Z[:, h:t]))
        t = h
    return G1J(cur.X[:, 0], cur.Y[:, 0], cur.Z[:, 0])


def build_commit_table(F, pts: G1, scalar_bits: int,
                       window_bits: int = 4) -> FixedBaseTable:
    """Window table for the Pallas commit path: narrow windows (the
    fused tree makes extra adds nearly free; fewer buckets = fewer
    streamed bytes AND fewer sweep steps), window axis padded to a power
    of two with identity rows so the in-kernel tree needs no masking."""
    tbl = build_fixed_base_table(F, pts, window_bits, scalar_bits)
    W = tbl.x.shape[0]
    Wp = _pad_pow2(W)
    if Wp != W:
        padw = [(0, Wp - W), (0, 0), (0, 0)]
        tbl = FixedBaseTable(
            x=jnp.pad(tbl.x, padw), y=jnp.pad(tbl.y, padw),
            inf=jnp.pad(tbl.inf, padw, constant_values=True),
            window_bits=window_bits)
    return tbl


def msm_fixed_base_many_pallas(F, table: FixedBaseTable,
                               scalars_batch: jnp.ndarray,
                               tile: int = 1024,
                               interpret: bool = False) -> G1:
    """Drop-in sibling of ops/fixed_base.msm_fixed_base_many returning
    affine points."""
    from .curve import jac_to_affine
    out = commit_many_pallas(F, table, scalars_batch, tile=tile,
                             interpret=interpret)
    return jac_to_affine(F, out)
