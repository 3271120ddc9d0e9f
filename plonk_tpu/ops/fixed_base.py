"""Fixed-base MSM: precomputed window tables + gather + tree reduction.

The prover's 9 commitments (and the verifier key's 8) are all MSMs against
the SAME fixed SRS points (reference: src/srs.h:53-68 recomputes a full
scalar-mul ladder per coefficient, per commitment). On TPU the generic
Pippenger path (ops/msm.py) pays an argsort (~45% of its time) plus a
segmented associative scan per window. With fixed bases both disappear:

  precompute  T[w][d][i] = d * 2^(w*window_bits) * P_i   (once per SRS)
  commit      sum over (w, i) of T[w][digit(s_i, w)][i]

— a pure gather along the digit axis followed by a lane-parallel binary
tree of Jacobian additions. No sort, no scan, no sequential bucket walk:
every step is a full-width VPU op, which is exactly the shape TPUs want.

Costs for B-bit scalars with window width w over L points:
  table:   ceil(B/w) * 2^w * L points (built with ~2^w vectorized adds,
           one batched affine conversion; cached per SRS)
  commit:  ceil(B/w) * L gathered points, 2 * ceil(B/w) * L Jacobian adds
           in log depth.

Identical group outputs to srs_commit_naive / msm_pippenger (asserted in
tests/test_srs_msm.py).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from .curve import G1, G1J, jac_from_affine, jac_to_affine, jac_add, \
    jac_double

U32 = jnp.uint32


class FixedBaseTable(NamedTuple):
    """Affine window-multiple table. Arrays of shape
    (n_windows, n_buckets, L); `inf` marks identity entries (all of row
    d=0, plus any d*2^shift*P_i that lands on the identity — possible for
    tiny toy subgroups, never for production-scale r)."""
    x: jnp.ndarray
    y: jnp.ndarray
    inf: jnp.ndarray
    window_bits: int

    @property
    def n_windows(self) -> int:
        return self.x.shape[0]

    @property
    def n_buckets(self) -> int:
        return self.x.shape[1]

    @property
    def length(self) -> int:
        return self.x.shape[2]


def pick_window_bits(L: int, scalar_bits: int,
                     budget_bytes: int = 2 << 30) -> int:
    """Window width for the select-sweep commit path. Narrower windows
    stream fewer table bytes AND run fewer sweep steps (steps = 2^w,
    per-step work ~ n_windows); wider windows only reduce the tree adds
    (small). Swept on the real chip at 2^16 (tools/sweep_fb_windows.py,
    round 3): wb=5 10.2 ms, 6 10.8, 7 11.8, 8 15.0, 4 59.6 (a 16-entry
    select axis underfills the 128-lane tile) -> prefer 5. Override with
    PLONK_TPU_FB_WB."""
    env = os.environ.get("PLONK_TPU_FB_WB")
    if env:
        return int(env)
    for w in (5, 6, 7):
        n_windows = -(-scalar_bits // w)
        entries = n_windows * (1 << w) * L
        if entries * 9 <= budget_bytes:   # x + y (4B each) + inf (1B)
            return w
    return 3


def build_fixed_base_table(F, pts: G1, window_bits: int,
                           scalar_bits: int) -> FixedBaseTable:
    """Precompute T[w][d] = d * 2^(w*window_bits) * pts for d in
    [0, 2^window_bits). Everything rolled/batched: the shifted bases come
    from one scan (inner doubling fori_loop), the d-multiples from ONE
    scan of adds batched over (windows, points) — per-window python loops
    multiply both the graph and the (remote) compile time."""
    n_windows = -(-scalar_bits // window_bits)
    n_buckets = 1 << window_bits
    base0 = jac_from_affine(F, pts)

    def next_base(carry, _):
        nxt = jax.lax.fori_loop(
            0, window_bits, lambda i, q: jac_double(F, q), carry)
        return nxt, carry

    _, bases = jax.lax.scan(next_base, base0, None, length=n_windows)
    bases = G1J(bases.X, bases.Y, bases.Z)             # (W, L)

    def step(carry, _):
        return jac_add(F, carry, bases), carry

    _, mult = jax.lax.scan(step, bases, None, length=n_buckets - 1)
    aff = jac_to_affine(F, G1J(mult.X, mult.Y, mult.Z))  # (B-1, W, L)
    L = pts.x.shape[0]
    ident = G1.identity((1, n_windows, L))
    x = jnp.concatenate([ident.x, aff.x]).swapaxes(0, 1)
    y = jnp.concatenate([ident.y, aff.y]).swapaxes(0, 1)
    inf = jnp.concatenate([ident.inf, aff.inf]).swapaxes(0, 1)
    return FixedBaseTable(x=x, y=y, inf=inf, window_bits=window_bits)


import os

_GATHER_MODE = os.environ.get("PLONK_TPU_FB_GATHER", "auto")


def _digits(table: FixedBaseTable, scalars: jnp.ndarray) -> jnp.ndarray:
    wb = int(table.window_bits)   # may be a jit-output i32 scalar
    n_windows, n_buckets, _ = table.x.shape
    shifts = jnp.asarray([w * wb for w in range(n_windows)], U32)
    return ((scalars[..., None, :] >> shifts[:, None])
            & jnp.uint32(n_buckets - 1))


def _terms_from(F, gx, gy, ginf) -> G1J:
    one = jnp.broadcast_to(F.ones(), gx.shape).astype(U32)
    Z = jnp.where(ginf, jnp.zeros_like(one), one)
    return G1J(jnp.where(ginf, one, gx), jnp.where(ginf, one, gy), Z)


def _gather_terms(F, table: FixedBaseTable, scalars: jnp.ndarray) -> G1J:
    """Standard-form scalars (L,) -> the n_windows*L Jacobian terms, via
    XLA gather (random access into the table)."""
    digits = _digits(table, scalars).astype(jnp.int32)
    idx = digits[:, None, :]
    gx = jnp.take_along_axis(table.x, idx, axis=1).reshape(-1)
    gy = jnp.take_along_axis(table.y, idx, axis=1).reshape(-1)
    ginf = jnp.take_along_axis(table.inf, idx, axis=1).reshape(-1)
    return _terms_from(F, gx, gy, ginf)


def select_terms_many(F, table: FixedBaseTable, scalars: jnp.ndarray,
                      unroll: int = 16) -> G1J:
    """(B, L) scalars -> (B, n_windows*L) Jacobian terms via a STREAMING
    bucket sweep: a lax.scan over the bucket axis selecting into an
    accumulator. No gather op at all — the table is read exactly once,
    sequentially (HBM-streaming friendly), shared by ALL B commitments.
    TPU random gathers run element-at-a-time; this trades them for
    n_buckets full-width selects. `unroll` buckets are processed per scan
    step (per-iteration loop overhead dominates at 512 buckets x ~30us)."""
    B = scalars.shape[0]
    n_windows, n_buckets, L = table.x.shape
    digits = _digits(table, scalars)                   # (B, W, L)
    while n_buckets % unroll:
        unroll //= 2
    d_ids = jnp.arange(n_buckets, dtype=U32).reshape(-1, unroll)
    chunk = lambda a: a.transpose(1, 0, 2).reshape(
        (n_buckets // unroll, unroll, n_windows, L))

    def step(acc, inputs):
        ds, tx, ty, tinf = inputs                      # tx: (unroll, W, L)
        ax, ay, ainf = acc
        for u in range(unroll):
            m = digits == ds[u]                        # (B, W, L)
            ax = jnp.where(m, tx[u][None], ax)
            ay = jnp.where(m, ty[u][None], ay)
            ainf = jnp.where(m, tinf[u][None], ainf)
        return (ax, ay, ainf), None

    init = (jnp.zeros((B, n_windows, L), U32),
            jnp.zeros((B, n_windows, L), U32),
            jnp.ones((B, n_windows, L), jnp.bool_))
    (gx, gy, ginf), _ = jax.lax.scan(
        step, init,
        (d_ids, chunk(table.x), chunk(table.y), chunk(table.inf)))
    shape = (B, n_windows * L)
    return _terms_from(F, gx.reshape(shape), gy.reshape(shape),
                       ginf.reshape(shape))


def _tree_reduce(F, terms: G1J) -> G1J:
    """Lane-parallel binary EC-sum: log2 halving steps of full-width
    Jacobian adds (contiguous halves, no strided access)."""
    n = terms.X.shape[0]
    m = 1 << (n - 1).bit_length() if n > 1 else 1
    if m != n:
        pad = G1J.identity(F, (m - n,))
        terms = G1J(jnp.concatenate([terms.X, pad.X]),
                    jnp.concatenate([terms.Y, pad.Y]),
                    jnp.concatenate([terms.Z, pad.Z]))
    while m > 1:
        h = m // 2
        terms = jac_add(F, G1J(terms.X[:h], terms.Y[:h], terms.Z[:h]),
                        G1J(terms.X[h:], terms.Y[h:], terms.Z[h:]))
        m = h
    return G1J(terms.X[0], terms.Y[0], terms.Z[0])


def msm_fixed_base(F, table: FixedBaseTable, scalars: jnp.ndarray) -> G1:
    """sum_i scalars[i] * P_i against the precomputed table. Scalars in
    STANDARD form (the digit decomposition is a bit pattern), coordinates
    whatever form the table was built in."""
    terms = _gather_terms(F, table, jnp.asarray(scalars, U32))
    return jac_to_affine(F, _tree_reduce(F, terms))


def msm_fixed_base_many(F, table: FixedBaseTable,
                        scalars_batch: jnp.ndarray,
                        mode: str | None = None) -> G1:
    """Batched commitments: (B, L) scalars -> G1 batch of shape (B,). One
    graph for all commitments; the term selection and the tree are
    batched, so the tree stays full-width even for small L.

    mode: "gather" (per-element XLA gather), "select" (streaming bucket
    sweep — reads the table once for ALL commitments), or None -> env
    PLONK_TPU_FB_GATHER / auto (select on TPU, gather on CPU)."""
    scalars_batch = jnp.asarray(scalars_batch, U32)
    mode = mode or _GATHER_MODE
    if mode == "auto":
        mode = "gather" if jax.default_backend() == "cpu" else "select"
    if mode == "select":
        terms = select_terms_many(F, table, scalars_batch)
        out = jax.vmap(lambda t: _tree_reduce(F, t))(terms)
        return jac_to_affine(F, out)
    fn = jax.vmap(lambda s: msm_fixed_base(F, table, s))
    return fn(scalars_batch)
