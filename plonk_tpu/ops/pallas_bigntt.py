"""Pallas TPU 16-limb (254-bit) fused NTT over BN254-Fr — the
production-curve port of ops/fused_ntt.py (VERDICT r4 item 3: the BN254
field side runs ~30x over its compute roofline on the stage-at-a-time
XLA path, ~log2(n) HBM round trips of (n, 16) u32 + per-stage dispatch).

Structure = the toy five-step fused transform (ops/fused_ntt.py):

  forward (natural coefficients in, SCRAMBLED evaluations out):
    1. reshape/transpose  (B, n, L)        -> (B*n2, L, n1)
    2. Pallas row pass    DIF, root w^n2   -> rows rev(k1)
    3. twiddle multiply   w^{i2 k1} (XLA mont_mul, rev-permuted k1 axis)
    4. transpose                           -> (B*n1, L, n2)
    5. Pallas row pass    DIF, root w^n1   -> X[rev(k1), rev(k2)]
  inverse: the DIT mirror with inverse roots/twiddles + 1/n scale.

Each row pass runs ALL log2(C) butterfly stages in one VMEM residency
(grid over 8-row blocks); butterflies are lane-axis rolls + masked
selects; the field arithmetic is pallas_bigmsm's sublane-limb Montgomery
kernel in lazy (<2p) mode with one canonicalizing csub_p at block output,
so emitted arrays are bit-exact canonical Montgomery words.

Layout contract (same as the scaled prover's fused prims,
plonk_scaled.fused_prims): pointwise algebra between forward and inverse
is layout-agnostic; position-indexed tables are permuted host-side with
fused_ntt.scrambled_perm. Wired into the BN254 prover via BN254Prims
(ntt4n/intt4n/perm4n) — proofs are bit-identical to the XLA path
(field values are unique, only the intermediate layout differs).

Replaces src/poly.h:106-122 at production scale.
"""
from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .ntt import _check_root
from .fused_ntt import _split, _bitrev, scrambled_perm
from .pallas_bigmsm import _make_field, _field_consts, _N_CONSTS

U32 = jnp.uint32


def _stage_values(p: int, w: int, C: int) -> list:
    """Per-stage length-C twiddle value lists (python ints) — the
    254-bit lift of ops/ntt._stage_tables at n == C (whose u32 table
    build overflows for BN254-Fr)."""
    tw = [1] * (C // 2)
    cur = 1
    for i in range(C // 2):
        tw[i] = cur
        cur = (cur * w) % p
    tables = []
    half = 1
    while half < C:
        stride = C // (2 * half)
        tables.append([tw[(j % half) * stride] for j in range(C)])
        half *= 2
    return tables


def _row_tables(F, w_row: int, C: int) -> np.ndarray:
    """(S, L, C) Montgomery-word per-stage lane twiddle tables."""
    enc = np.stack([F.encode_host(np.asarray(t, dtype=object))
                    for t in _stage_values(F.p, w_row, C)])   # (S, C, L)
    return np.ascontiguousarray(np.swapaxes(enc, 1, 2))       # (S, L, C)


def _row_kernel(L: int, RB: int, C: int, dif: bool, scaled: bool,
                const_ref, tw_ref, y_ref, out_ref):
    """All log2(C) butterfly stages of RB independent size-C transforms
    in one VMEM residency. y block: (RB, L, C) — limbs on sublanes,
    elements on lanes; butterflies pair lanes via rolls (reshaped to 2D:
    3D lane-axis rolls are not relied on)."""
    F = _make_field(L, const_ref, lazy=True)
    add, sub, mul, csub_p = F["add"], F["sub"], F["mul"], F["csub_p"]
    y = y_ref[...]

    def lroll(v, k):
        flat = v.reshape(RB * L, C)
        return pltpu.roll(flat, k, 1).reshape(RB, L, C)

    pos = jax.lax.broadcasted_iota(jnp.int32, (1, 1, C), 2)
    st = []
    half, s = 1, 0
    while half < C:
        st.append((half, s))
        half *= 2
        s += 1
    if dif:
        st = st[::-1]
    for half, s in st:
        tv = tw_ref[s][None]                  # (1, L, C)
        in_low = (pos % (2 * half)) < half
        down = lroll(y, C - half)
        up = lroll(y, half)
        if dif:
            low_new = add(y, down)
            high_new = mul(sub(up, y), tv)
        else:
            low_new = add(y, mul(down, tv))
            high_new = sub(up, mul(y, tv))
        y = jnp.where(in_low, low_new, high_new)
    if scaled:
        y = mul(y, const_ref[_N_CONSTS][None])
    out_ref[...] = csub_p(y)


def _big_row_pass(F, x3: jnp.ndarray, w_row: int, dif: bool,
                  scale: int | None = None,
                  interpret: bool = False) -> jnp.ndarray:
    """Size-C transforms along the last axis of x3 (R, L, C)."""
    R, L, C = x3.shape
    RB = 8
    Rp = -(-R // RB) * RB
    if Rp != R:            # pad with zero rows (transforms of zeros)
        x3 = jnp.pad(x3, [(0, Rp - R), (0, 0), (0, 0)])
    consts = _field_consts(L, int(F.p), C)
    extra = F.encode_host(np.asarray(
        [1 if scale is None else scale], dtype=object))[0]   # (L,)
    consts = np.concatenate(
        [consts, np.broadcast_to(extra[:, None], (1, L, C))], axis=0)
    tw = jnp.asarray(_row_tables(F, w_row, C))
    kern = functools.partial(_row_kernel, L, RB, C, dif,
                             scale is not None)
    mem = pl.ANY if interpret else pltpu.VMEM
    return pl.pallas_call(
        kern,
        grid=(Rp // RB,),
        in_specs=[
            pl.BlockSpec((_N_CONSTS + 1, L, C), lambda r: (0, 0, 0),
                         memory_space=mem),
            pl.BlockSpec(tw.shape, lambda r: (0, 0, 0), memory_space=mem),
            pl.BlockSpec((RB, L, C), lambda r: (r, 0, 0),
                         memory_space=mem),
        ],
        out_specs=pl.BlockSpec((RB, L, C), lambda r: (r, 0, 0),
                               memory_space=mem),
        out_shape=jax.ShapeDtypeStruct((Rp, L, C), U32),
        interpret=interpret,
    )(jnp.asarray(consts), tw, x3)[:R]


def _tw_mid(F, w: int, n1: int, n2: int, inverse: bool) -> jnp.ndarray:
    """(n2, n1, L) Montgomery twiddle matrix w^{+-i2 k1}, k1 bit-reversed
    (fused_ntt._twiddle_matrix lifted to limb words — its uint64 cumprod
    overflows for 254-bit moduli, so build with python ints)."""
    p = F.p
    wq = pow(w, -1, p) if inverse else w
    row = [pow(wq, k, p) for k in range(n1)]
    out = np.empty((n2, n1), dtype=object)
    acc = [1] * n1
    for i2 in range(n2):
        out[i2] = acc
        acc = [(a * r) % p for a, r in zip(acc, row)]
    out = out[:, _bitrev(n1)]
    return jnp.asarray(F.encode_host(out))


def big_fused_ntt(F, x: jnp.ndarray, w: int, inverse: bool = False,
                  interpret: bool = False) -> jnp.ndarray:
    """Forward 16-limb transform, batched over leading dims: x
    (..., n, L) natural-order Montgomery words -> SCRAMBLED-layout
    evaluations (see fused_ntt.scrambled_perm)."""
    n, L = x.shape[-2], x.shape[-1]
    _check_root(F.p, w, n)
    batch = x.shape[:-2]
    nb = int(np.prod(batch)) if batch else 1
    n1, n2 = _split(n)
    wq = pow(w, -1, F.p) if inverse else w

    a = x.reshape((nb, n1, n2, L))
    a = jnp.transpose(a, (0, 2, 3, 1)).reshape(nb * n2, L, n1)
    a = _big_row_pass(F, a, pow(wq, n2, F.p), dif=True,
                      interpret=interpret)
    a = a.reshape(nb, n2, L, n1)
    tw = _tw_mid(F, w, n1, n2, inverse)              # (n2, n1, L)
    a = F.mont_mul(jnp.transpose(a, (0, 1, 3, 2)), tw)   # (nb,n2,n1,L)
    a = jnp.transpose(a, (0, 2, 3, 1)).reshape(nb * n1, L, n2)
    a = _big_row_pass(F, a, pow(wq, n1, F.p), dif=True,
                      interpret=interpret)
    a = a.reshape(nb, n1, L, n2)
    return jnp.transpose(a, (0, 1, 3, 2)).reshape(batch + (n, L))


def big_fused_intt(F, y: jnp.ndarray, w: int,
                   interpret: bool = False) -> jnp.ndarray:
    """Inverse 16-limb transform: SCRAMBLED-layout input (big_fused_ntt
    output), natural-order coefficients out, scaled by 1/n."""
    n, L = y.shape[-2], y.shape[-1]
    batch = y.shape[:-2]
    nb = int(np.prod(batch)) if batch else 1
    n1, n2 = _split(n)
    w_inv = pow(w, -1, F.p)

    a = y.reshape(nb * n1, n2, L)
    a = jnp.transpose(a, (0, 2, 1))                  # (nb*n1, L, n2)
    a = _big_row_pass(F, a, pow(w_inv, n1, F.p), dif=False,
                      interpret=interpret)
    a = a.reshape(nb, n1, L, n2)
    tw = _tw_mid(F, w, n1, n2, True)                 # (n2, rev k1, L)
    a = F.mont_mul(jnp.transpose(a, (0, 3, 1, 2)), tw)   # (nb,n2,n1,L)
    a = jnp.transpose(a, (0, 1, 3, 2)).reshape(nb * n2, L, n1)
    a = _big_row_pass(F, a, pow(w_inv, n2, F.p), dif=False,
                      scale=pow(n, -1, F.p), interpret=interpret)
    a = a.reshape(nb, n2, L, n1)
    # (nb, n2, L, n1) -> natural (nb, n1*n2, L): element index i1*n2+i2
    return jnp.transpose(a, (0, 3, 1, 2)).reshape(batch + (n, L))
