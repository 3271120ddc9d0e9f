"""MXU NTT with the modular matmul fused in VMEM (Pallas).

ops/mxu_ntt.py maps the four-step NTT's row transforms onto the MXU as
int8 limb matmuls, but as plain XLA it materializes the (L, R, L, K)
limb-product tensor plus six u32 carry words in HBM — measured 38 ms for
the 2^16 prover field side vs 20.7 blocked (BENCH_NOTES round 2). This
module fuses the whole modular matmul

    limb-split -> L^2 s8 MXU dots -> shift-add word recomposition
    -> REDC64 -> (optional) twiddle Montgomery multiply

into ONE Pallas kernel per (row-tile, col-tile): every intermediate
lives in VMEM, HBM sees only x, W-limb planes, twiddle and the result.
The butterfly multiplies ride the systolic array instead of VPU lane
rolls — the one-pass roll kernel (fused_ntt.fused_ntt_1k) measured ~50x
above its compute roofline because pltpu.roll on the lane axis
dominates (CLAUDE.md round-3 priority 1); here the VPU only does the
O(1)-per-element recomposition.

Montgomery bookkeeping (identical to ops/mxu_ntt.py):
  x~ = x * R mod p (R = 2^32), W~[j,k] = w^{jk} * 2^64 mod p.
  V = X~ @ W~ (exact, < 2^96) -> REDC64(V) = V * 2^{-64} = (X @ W) R mod p.

Replaces the reference's O(n^2) schoolbook poly products
(/root/reference/src/poly.h:106-122) like every other NTT lane; layout
and host tables are shared with ops/mxu_ntt.py (mxu_perm).
"""
from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .mxu_ntt import (_dft_limbs, _twiddle_std, _split, _n_limbs, _LB,
                      mxu_perm)

U32 = jnp.uint32
_MASK16 = jnp.uint32(0xFFFF)


def _mulfull(a, b):
    # NOTE: the mask is constructed per call so the kernel trace owns it
    # (pallas_call rejects consts created outside the kernel).
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
    return hi, lo


def _mont_matmul_kernel(p: int, n_prime: int, L: int, C: int,
                        with_tw: bool, *refs):
    """One (Tr, C) x (C, Tk) modular matmul tile, all in VMEM.

    refs: w_ref (L, C, Tk) s8, x_ref (Tr, C) u32, [tw_ref (Tr, Tk) u32,]
          out_ref (Tr, Tk) u32.
    """
    if with_tw:
        w_ref, x_ref, tw_ref, out_ref = refs
    else:
        w_ref, x_ref, out_ref = refs
        tw_ref = None
    pj = jnp.uint32(p)
    npj = jnp.uint32(n_prime)
    mask16 = jnp.uint32(0xFFFF)
    mask = jnp.uint32((1 << _LB) - 1)
    x = x_ref[:]
    xs = [((x >> (_LB * a)) & mask).astype(jnp.int8) for a in range(L)]

    nk = 2 * L - 1
    buckets = [None] * nk
    for a in range(L):
        for b in range(L):
            t = jax.lax.dot_general(
                xs[a], w_ref[b],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)
            k = a + b
            buckets[k] = t if buckets[k] is None else buckets[k] + t

    # shift-add recomposition into 16-bit carry words (bucket values are
    # bounded by L * C * (2^7-1)^2 — asserted < 2^31 by the caller)
    bmax_bits = (L * C * ((1 << _LB) - 1) ** 2).bit_length()
    n_words = (_LB * (nk - 1) + bmax_bits + 15) // 16
    words = [None] * n_words

    def wadd(i, v):
        words[i] = v if words[i] is None else words[i] + v

    for k in range(nk):
        bk = buckets[k].astype(U32)
        off = _LB * k
        m0, sh = divmod(off, 16)
        wadd(m0, (bk & jnp.uint32((1 << (16 - sh)) - 1)) << sh)
        wadd(m0 + 1, (bk >> (16 - sh)) & mask16)
        if sh + bmax_bits > 32:
            wadd(m0 + 2, bk >> (32 - sh))
    words = [w if w is not None else jnp.zeros_like(buckets[0].astype(U32))
             for w in words]
    carry = jnp.zeros_like(words[0])
    for m in range(n_words):
        s = words[m] + carry
        words[m] = s & mask16
        carry = s >> 16
    while len(words) < 6:
        words.append(jnp.zeros_like(words[0]))
    v0 = words[0] | (words[1] << 16)
    v1 = words[2] | (words[3] << 16)
    v2 = words[4] | (words[5] << 16)

    # REDC twice: (v0, v1, v2) * 2^{-64} mod p, result < 2p then reduce
    m = v0 * npj
    mhi, _ = _mulfull(m, pj)
    c0 = (v0 != 0).astype(U32)
    s = v1 + mhi
    c1 = (s < v1).astype(U32)
    s2 = s + c0
    c2 = (s2 < s).astype(U32)
    u0, u1 = s2, v2 + c1 + c2

    m = u0 * npj
    mhi, _ = _mulfull(m, pj)
    c0 = (u0 != 0).astype(U32)
    r = u1 + mhi + c0
    r = jnp.where(r >= pj, r - pj, r)

    if tw_ref is not None:
        # Montgomery multiply by the fused twiddle
        t = tw_ref[:]
        hi, lo = _mulfull(r, t)
        mm = lo * npj
        mhi2, _ = _mulfull(mm, pj)
        cc = (lo != 0).astype(U32)
        rr = hi + mhi2 + cc
        r = jnp.where(rr >= pj, rr - pj, rr)
    out_ref[:] = r


def _pick_tile(n: int, target: int) -> int:
    t = min(n, target)
    while n % t:
        t //= 2
    return max(t, 1)


def mont_matmul_pallas(F, x: jnp.ndarray, w_limbs: jnp.ndarray,
                       tw: jnp.ndarray | None = None,
                       row_tile: int = 256, col_tile: int = 256,
                       interpret: bool = False) -> jnp.ndarray:
    """(R, C) Montgomery u32 @ standard-form W (C, K) pre-scaled by 2^64
    and limb-split into w_limbs (L, C, K) s8 -> Montgomery (R, K), with
    an optional fused (R, K) Montgomery twiddle multiply."""
    R, C = x.shape
    L, C2, K = w_limbs.shape
    assert C2 == C and L == _n_limbs(F.p)
    bmax = L * C * ((1 << _LB) - 1) ** 2
    assert bmax.bit_length() <= 31, "contraction too long for s32 buckets"
    Tr = _pick_tile(R, row_tile)
    Tk = _pick_tile(K, col_tile)
    kern = functools.partial(_mont_matmul_kernel, F.p, F.n_prime, L, C,
                             tw is not None)
    mem = pl.ANY if interpret else pltpu.VMEM
    in_specs = [
        pl.BlockSpec((L, C, Tk), lambda i, j: (0, 0, j), memory_space=mem),
        pl.BlockSpec((Tr, C), lambda i, j: (i, 0), memory_space=mem),
    ]
    args = [w_limbs, x]
    if tw is not None:
        in_specs.append(pl.BlockSpec((Tr, Tk), lambda i, j: (i, j),
                                     memory_space=mem))
        args.append(tw)
    return pl.pallas_call(
        kern,
        grid=(R // Tr, K // Tk),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((Tr, Tk), lambda i, j: (i, j),
                               memory_space=mem),
        out_shape=jax.ShapeDtypeStruct((R, K), U32),
        interpret=interpret,
    )(*args)


def mxu_ntt_pallas(F, x: jnp.ndarray, w: int, inverse: bool = False,
                   interpret: bool = False) -> jnp.ndarray:
    """Forward transform, Montgomery in/out, batched over leading dims;
    output in the mxu_perm (transposed) layout — bit-identical to
    ops/mxu_ntt.mxu_ntt (asserted in tests/test_mxu_ntt.py)."""
    n = x.shape[-1]
    p = F.p
    batch = x.shape[:-1]
    nb = int(np.prod(batch)) if batch else 1
    n1, n2 = _split(n)
    wq = pow(w, -1, p) if inverse else w

    W1 = jnp.asarray(_dft_limbs(p, pow(wq, n2, p), n1))
    W2 = jnp.asarray(_dft_limbs(p, pow(wq, n1, p), n2))
    tw = jnp.asarray(F.encode_host(_twiddle_std(p, w, n1, n2, inverse)))

    a = x.reshape((nb, n1, n2)).swapaxes(-1, -2)     # (nb, i2, i1)
    a = mont_matmul_pallas(
        F, a.reshape(nb * n2, n1), W1, jnp.tile(tw, (nb, 1)),
        interpret=interpret).reshape(nb, n2, n1)
    a = a.swapaxes(-1, -2)                           # (nb, k1, i2)
    a = mont_matmul_pallas(F, a.reshape(nb * n1, n2), W2,
                           interpret=interpret)
    return a.reshape(batch + (n,))


def mxu_intt_pallas(F, y: jnp.ndarray, w: int,
                    interpret: bool = False) -> jnp.ndarray:
    """Inverse of mxu_ntt_pallas: mxu_perm-layout Montgomery input,
    natural-order Montgomery coefficients out, scaled by 1/n."""
    n = y.shape[-1]
    p = F.p
    batch = y.shape[:-1]
    nb = int(np.prod(batch)) if batch else 1
    n1, n2 = _split(n)
    w_inv = pow(w, -1, p)

    W2i = jnp.asarray(_dft_limbs(p, pow(w_inv, n1, p), n2))
    W1i = jnp.asarray(_dft_limbs(p, pow(w_inv, n2, p), n1))
    tw = jnp.asarray(F.encode_host(_twiddle_std(p, w, n1, n2, True)))

    a = y.reshape(nb * n1, n2)                       # rows k1, cols k2
    a = mont_matmul_pallas(F, a, W2i,
                           interpret=interpret).reshape(nb, n1, n2)
    a = a.swapaxes(-1, -2)                           # (nb, i2, k1)
    # inverse twiddle attaches to the INTERMEDIATE (input of pass 2);
    # one XLA mont_mul pass — cheap next to the matmuls
    a = F.mont_mul(a, tw)
    a = mont_matmul_pallas(
        F, a.reshape(nb * n2, n1), W1i,
        interpret=interpret).reshape(nb, n2, n1)
    a = a.swapaxes(-1, -2).reshape(batch + (n,))     # natural (i1, i2)
    return F.mont_mul(a, F.const(pow(n, -1, p)))
