"""Elliptic-curve kernels over multi-limb fields (BN254-class G1).

The toy/scaled curve kernels (ops/curve.py) run on single-u32 coordinates;
these are the same branchless masked-lane formulas lifted to BigMontField
elements (trailing 16-bit-limb axis, ops/bigfield.py): selects broadcast
the lane mask over the limb axis, equality/zero tests reduce over it.
Jacobian coordinates only — at 254 bits an affine add's Fermat inversion
is ~250 field muls, so the inversion-free formulas are not optional.

Curve constants (arkworks/gnark standard): BN254 G1 is y^2 = x^3 + 3 over
Fq with generator (1, 2) and prime order r = BN254_FR.p.

Reference lineage: src/g1.h (affine, branchy, 8-bit) — re-designed rather
than ported, same as ops/curve.py (SURVEY §2.1 row 5).
"""
from __future__ import annotations

import dataclasses
from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from .bigfield import BigMontField
from ..utils.params import FieldParams

U32 = jnp.uint32

# BN254 base field (Fq) — the coordinates field; BN254_FR is the scalar.
BN254_FQ = FieldParams(
    p=21888242871839275222246405745257275088696311157297823662689037894645226208583,
    name="BN254-Fq", generator=3, two_adicity=1)

BN254_G1_GEN = (1, 2)
BN254_B = 3


class BigG1J(NamedTuple):
    """Jacobian point batch over a BigMontField: arrays (..., limbs);
    Z == 0 encodes infinity."""
    X: jnp.ndarray
    Y: jnp.ndarray
    Z: jnp.ndarray

    @staticmethod
    def identity(F: BigMontField, shape=()):
        one = jnp.broadcast_to(F.const(1), tuple(shape) + (F.limbs,))
        return BigG1J(one, one, jnp.zeros(tuple(shape) + (F.limbs,), U32))


def _sel(mask, a, b):
    return jnp.where(mask[..., None], a, b)


def _sel_pt(mask, a: BigG1J, b: BigG1J) -> BigG1J:
    return BigG1J(_sel(mask, a.X, b.X), _sel(mask, a.Y, b.Y),
                  _sel(mask, a.Z, b.Z))


def big_jac_double(F: BigMontField, p: BigG1J) -> BigG1J:
    """2P for a = 0 short-Weierstrass curves (the BN254 family)."""
    A = F.square(p.X)
    B = F.square(p.Y)
    Cc = F.square(B)
    t = F.add(p.X, B)
    D = F.add(F.sub(F.square(t), F.add(A, Cc)),
              F.sub(F.square(t), F.add(A, Cc)))
    E = F.add(F.add(A, A), A)
    Ff = F.square(E)
    X3 = F.sub(Ff, F.add(D, D))
    Y3 = F.sub(F.mont_mul(E, F.sub(D, X3)),
               _mul8(F, Cc))
    Z3 = F.add(F.mont_mul(p.Y, p.Z), F.mont_mul(p.Y, p.Z))
    return BigG1J(X3, Y3, Z3)


def _mul8(F, a):
    t = F.add(a, a)
    t = F.add(t, t)
    return F.add(t, t)


def big_jac_add(F: BigMontField, p: BigG1J, q: BigG1J) -> BigG1J:
    """Complete-ish Jacobian addition with masked identity/double/inverse
    handling (mirrors ops/curve.jac_add over limb elements)."""
    Z1Z1 = F.square(p.Z)
    Z2Z2 = F.square(q.Z)
    U1 = F.mont_mul(p.X, Z2Z2)
    U2 = F.mont_mul(q.X, Z1Z1)
    S1 = F.mont_mul(p.Y, F.mont_mul(q.Z, Z2Z2))
    S2 = F.mont_mul(q.Y, F.mont_mul(p.Z, Z1Z1))
    H = F.sub(U2, U1)
    r = F.sub(S2, S1)

    HH = F.square(H)
    HHH = F.mont_mul(H, HH)
    V = F.mont_mul(U1, HH)
    rr = F.square(r)
    X3 = F.sub(F.sub(rr, HHH), F.add(V, V))
    Y3 = F.sub(F.mont_mul(r, F.sub(V, X3)), F.mont_mul(S1, HHH))
    Z3 = F.mont_mul(F.mont_mul(p.Z, q.Z), H)
    gen = BigG1J(X3, Y3, Z3)

    dbl = big_jac_double(F, p)

    p_inf = F.is_zero(p.Z)
    q_inf = F.is_zero(q.Z)
    both = jnp.logical_and(~p_inf, ~q_inf)
    same_x = jnp.logical_and(F.is_zero(H), both)
    same_pt = jnp.logical_and(same_x, F.is_zero(r))
    inverse = jnp.logical_and(same_x, ~F.is_zero(r))

    out = _sel_pt(same_pt, dbl, gen)
    out = BigG1J(out.X, out.Y,
                 _sel(inverse, jnp.zeros_like(out.Z), out.Z))
    out = _sel_pt(p_inf, q, out)
    out = _sel_pt(q_inf, p, out)
    return out


def big_jac_mul(F: BigMontField, base: BigG1J, scalar_bits,
                nbits: int) -> BigG1J:
    """Masked double-and-add ladder; scalar_bits is a (..., nbits) uint32
    0/1 array, LSB first (254-bit scalars don't fit machine ints)."""
    shape = base.X.shape[:-1]
    acc = BigG1J.identity(F, shape)
    cur = base

    def body(i, carry):
        acc, cur = carry
        bit = scalar_bits[..., i] == 1
        acc = _sel_pt(bit, big_jac_add(F, acc, cur), acc)
        return acc, big_jac_double(F, cur)

    acc, _ = jax.lax.fori_loop(0, nbits, body, (acc, cur))
    return acc


def scalar_to_bits(s: int, nbits: int) -> np.ndarray:
    return np.array([(s >> i) & 1 for i in range(nbits)], dtype=np.uint32)


def big_to_affine(F: BigMontField, p: BigG1J):
    """-> (x, y, inf) with Montgomery-form affine coordinates."""
    zinv = F.inv(p.Z)
    zi2 = F.square(zinv)
    x = F.mont_mul(p.X, zi2)
    y = F.mont_mul(p.Y, F.mont_mul(zi2, zinv))
    inf = F.is_zero(p.Z)
    return (_sel(inf, jnp.zeros_like(x), x),
            _sel(inf, jnp.zeros_like(y), y), inf)


def bn254_generator(F: BigMontField, shape=()) -> BigG1J:
    gx = jnp.broadcast_to(F.const(BN254_G1_GEN[0]),
                          tuple(shape) + (F.limbs,))
    gy = jnp.broadcast_to(F.const(BN254_G1_GEN[1]),
                          tuple(shape) + (F.limbs,))
    return BigG1J(gx, gy, jnp.broadcast_to(F.const(1),
                                           tuple(shape) + (F.limbs,)))


def big_on_curve(F: BigMontField, x, y) -> jnp.ndarray:
    """y^2 == x^3 + b (Montgomery-form affine coordinates)."""
    lhs = F.square(y)
    rhs = F.add(F.mont_mul(F.square(x), x), F.const(BN254_B))
    return F.eq(lhs, rhs)


# ---------------- Pippenger MSM over the big curve ----------------
#
# Fixed-base tables don't scale to 254-bit scalars (ceil(254/w) windows
# multiply the table size); arbitrary-base MSM uses the bucket method:
# per window, select-sweep points into buckets (streaming, no sort/gather
# — mirrors ops/fixed_base.select_terms_many), bucket-reduce with the
# descending running sum, combine windows with doublings.


def _big_digits(scalar_words: jnp.ndarray, wb: int,
                n_windows: int) -> jnp.ndarray:
    """(L, n_words) 16-bit scalar words -> (n_windows, L) digits."""
    out = []
    n_words = scalar_words.shape[1]
    for w in range(n_windows):
        lo_bit = w * wb
        word, off = divmod(lo_bit, 16)
        d = scalar_words[:, word] >> off
        if off + wb > 16 and word + 1 < n_words:
            d = d | (scalar_words[:, word + 1] << (16 - off))
        out.append(d & jnp.uint32((1 << wb) - 1))
    return jnp.stack(out)


def _big_seg_scan_chunked(F: BigMontField, pts: BigG1J,
                          starts: jnp.ndarray,
                          n_chunks: int = 256) -> BigG1J:
    """Segmented inclusive EC-prefix-sum over limb points: chunked rolled
    scan + cross-chunk stitch (the BigG1J port of
    ops/msm._seg_scan_add_jac_chunked)."""
    n = pts.X.shape[0]
    n_chunks = min(n_chunks, n)
    while n % n_chunks:
        n_chunks -= 1
    clen = n // n_chunks
    lim = F.limbs
    shp = (n_chunks, clen, lim)
    Xc = pts.X.reshape(shp).swapaxes(0, 1)      # (clen, n_chunks, lim)
    Yc = pts.Y.reshape(shp).swapaxes(0, 1)
    Zc = pts.Z.reshape(shp).swapaxes(0, 1)
    Sc = starts.reshape(n_chunks, clen).swapaxes(0, 1)

    def step(carry, col):
        acc, seen = carry
        x, y, z, s = col
        pt = BigG1J(x, y, z)
        acc = _sel_pt(s, pt, big_jac_add(F, acc, pt))
        seen = jnp.logical_or(seen, s)
        return (acc, seen), (acc, seen)

    ident = BigG1J.identity(F, (n_chunks,))
    (_, _), (scans, seen) = jax.lax.scan(
        step, (ident, jnp.zeros((n_chunks,), jnp.bool_)),
        (Xc, Yc, Zc, Sc))
    l_last = BigG1J(scans.X[-1], scans.Y[-1], scans.Z[-1])
    seen_last = seen[-1]

    def stitch(i, carr):
        prev = BigG1J(carr.X[i - 1], carr.Y[i - 1], carr.Z[i - 1])
        cur = BigG1J(l_last.X[i - 1], l_last.Y[i - 1], l_last.Z[i - 1])
        tot = _sel_pt(seen_last[i - 1], cur,
                      big_jac_add(F, prev, cur))
        return BigG1J(carr.X.at[i].set(tot.X), carr.Y.at[i].set(tot.Y),
                      carr.Z.at[i].set(tot.Z))

    carries = jax.lax.fori_loop(1, n_chunks, stitch,
                                BigG1J.identity(F, (n_chunks,)))
    with_c = big_jac_add(F, BigG1J(carries.X[None], carries.Y[None],
                                   carries.Z[None]), scans)
    out = _sel_pt(seen, scans, with_c)
    return BigG1J(out.X.swapaxes(0, 1).reshape(n, lim),
                  out.Y.swapaxes(0, 1).reshape(n, lim),
                  out.Z.swapaxes(0, 1).reshape(n, lim))


def big_msm_pippenger(F: BigMontField, pts: BigG1J,
                      scalar_words: jnp.ndarray, window_bits: int = 8,
                      scalar_bits: int = 254) -> BigG1J:
    """sum_i s_i * P_i for arbitrary points (the production-size MSM):
    per window, sort by digit + chunked segmented EC-scan (exact bucket
    sums), descending running-sum bucket reduction, window combine with
    doublings. Windows are vmapped (one compiled graph)."""
    wb = window_bits
    n_windows = -(-scalar_bits // wb)
    n_buckets = 1 << wb
    L = pts.X.shape[0]
    digits = _big_digits(scalar_words, wb, n_windows)   # (W, L)

    def one_window(d_row):
        order = jnp.argsort(d_row)
        sd = d_row[order]
        sp = BigG1J(pts.X[order], pts.Y[order], pts.Z[order])
        starts = jnp.concatenate([jnp.ones((1,), jnp.bool_),
                                  sd[1:] != sd[:-1]])
        scanned = _big_seg_scan_chunked(F, sp, starts)
        is_end = jnp.concatenate([sd[:-1] != sd[1:],
                                  jnp.ones((1,), jnp.bool_)])
        widx = jnp.where(is_end, sd.astype(jnp.int32), n_buckets)
        one = jnp.broadcast_to(F.const(1), (n_buckets + 1, F.limbs))
        bx = one.at[widx].set(scanned.X)
        by = one.at[widx].set(scanned.Y)
        bz = jnp.zeros((n_buckets + 1, F.limbs), U32).at[widx].set(
            scanned.Z)

        def reduce_step(i, carry):
            running, total = carry
            b = n_buckets - 1 - i
            pt = BigG1J(bx[b], by[b], bz[b])
            running = big_jac_add(F, running, pt)
            total = big_jac_add(F, total, running)
            return running, total

        ident = BigG1J.identity(F)
        _, total = jax.lax.fori_loop(0, n_buckets - 1, reduce_step,
                                     (ident, ident))
        return total

    wtot = jax.vmap(one_window)(digits)                  # (W,)

    def combine(i, acc):
        w = n_windows - 1 - i
        acc = jax.lax.fori_loop(
            0, wb, lambda j, q: big_jac_double(F, q), acc)
        return big_jac_add(F, acc, BigG1J(wtot.X[w], wtot.Y[w],
                                          wtot.Z[w]))

    acc0 = BigG1J(wtot.X[n_windows - 1], wtot.Y[n_windows - 1],
                  wtot.Z[n_windows - 1])
    return jax.lax.fori_loop(1, n_windows, combine, acc0)


def big_msm_pippenger_many(F: BigMontField, pts: BigG1J,
                           scalar_words: jnp.ndarray, window_bits: int = 8,
                           scalar_bits: int = 254) -> BigG1J:
    """Batched MSMs sharing one compiled graph: scalar_words (B, L, words)
    -> a (B,) Jacobian batch (the 9 per-proof commitments ride one
    call, mirroring ops/msm.msm_pippenger_many)."""
    return jax.vmap(lambda sw: big_msm_pippenger(
        F, pts, sw, window_bits=window_bits,
        scalar_bits=scalar_bits))(scalar_words)


# ---------------- fixed-base MSM over the big curve ----------------
#
# Same design as ops/fixed_base.py (window tables + streaming select +
# tree reduce), lifted to limb coordinates. Scalars arrive as (..., nbits)
# bit arrays or as 16-bit-word arrays (B, L, words).


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class BigFixedBaseTable:
    """window_bits is STATIC pytree metadata (not a leaf): tables are
    runtime jit arguments (the large-constant rule, CLAUDE.md), and the
    digit-extraction loop in big_msm_fixed_base branches on it."""
    x: jnp.ndarray      # (n_windows, n_buckets, L, limbs) Montgomery
    y: jnp.ndarray
    inf: jnp.ndarray    # (n_windows, n_buckets, L)
    window_bits: int

    def tree_flatten(self):
        return (self.x, self.y, self.inf), self.window_bits

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children, window_bits=aux)


def build_big_table(F: BigMontField, pts: BigG1J, window_bits: int,
                    scalar_bits: int) -> BigFixedBaseTable:
    """T[w][d] = d * 2^(w*wb) * pts. Everything rolled: the per-window
    shifted bases come from a scan with an inner doubling fori_loop, the
    d-multiples from ONE scan of adds batched over (windows, points) —
    at 254 bits an unrolled Jacobian add is ~30k HLO ops, so loop
    structure is what keeps the graph compilable."""
    n_windows = -(-scalar_bits // window_bits)
    n_buckets = 1 << window_bits
    L = pts.X.shape[0]

    def next_base(carry, _):
        nxt = jax.lax.fori_loop(
            0, window_bits, lambda i, q: big_jac_double(F, q), carry)
        return nxt, carry

    _, bases = jax.lax.scan(next_base, pts, None, length=n_windows)
    bases = BigG1J(bases.X, bases.Y, bases.Z)          # (W, L, limbs)

    def step(carry, _):
        return big_jac_add(F, carry, bases), carry

    _, mult = jax.lax.scan(step, bases, None, length=n_buckets - 1)
    # mult: (n_buckets-1, W, L, limbs)
    ax, ay, ainf = big_to_affine(F, BigG1J(mult.X, mult.Y, mult.Z))
    ident_xy = jnp.zeros((1, n_windows, L, F.limbs), U32)
    x = jnp.concatenate([ident_xy, ax]).swapaxes(0, 1)
    y = jnp.concatenate([ident_xy, ay]).swapaxes(0, 1)
    inf = jnp.concatenate([jnp.ones((1, n_windows, L), jnp.bool_),
                           ainf]).swapaxes(0, 1)
    return BigFixedBaseTable(x=x, y=y, inf=inf, window_bits=window_bits)


def _big_tree_reduce(F: BigMontField, terms: BigG1J) -> BigG1J:
    n = terms.X.shape[0]
    m = 1 << (n - 1).bit_length() if n > 1 else 1
    if m != n:
        pad = BigG1J.identity(F, (m - n,))
        terms = BigG1J(jnp.concatenate([terms.X, pad.X]),
                       jnp.concatenate([terms.Y, pad.Y]),
                       jnp.concatenate([terms.Z, pad.Z]))
    while m > 1:
        h = m // 2
        terms = big_jac_add(
            F, BigG1J(terms.X[:h], terms.Y[:h], terms.Z[:h]),
            BigG1J(terms.X[h:], terms.Y[h:], terms.Z[h:]))
        m = h
    return BigG1J(terms.X[0], terms.Y[0], terms.Z[0])


def big_fixed_base_mul_many(F: BigMontField, table: BigFixedBaseTable,
                            scalar_words: jnp.ndarray) -> BigG1J:
    """s_i * P for EACH scalar (no cross-point sum): the SRS-generation
    primitive (powers tau^i * G from a 1-point window table — the
    reference computes these with per-power double-and-add ladders,
    src/srs.h:33-36). table must be built over a single point (L == 1);
    scalar_words (B, n_words) 16-bit words, standard form, LSB first.
    Returns a (B,) Jacobian batch."""
    wb = table.window_bits
    n_windows, n_buckets, L, limbs = table.x.shape
    if L != 1:
        raise ValueError("per-scalar fixed-base requires a 1-point table")
    B = scalar_words.shape[0]
    digits = []
    for w in range(n_windows):
        lo_bit = w * wb
        word, off = divmod(lo_bit, 16)
        d = scalar_words[:, word] >> off
        if off + wb > 16 and word + 1 < scalar_words.shape[1]:
            d = d | (scalar_words[:, word + 1] << (16 - off))
        digits.append(d & jnp.uint32(n_buckets - 1))
    digits = jnp.stack(digits)                     # (W, B)

    # gather per (window, scalar): tables are tiny (one point), so a
    # real gather is fine here (no 905MB streaming concern)
    tx = table.x[:, :, 0, :]                       # (W, nb, limbs)
    ty = table.y[:, :, 0, :]
    tinf = table.inf[:, :, 0]                      # (W, nb)
    widx = jnp.arange(n_windows)[:, None]
    gx = tx[widx, digits]                          # (W, B, limbs)
    gy = ty[widx, digits]
    ginf = tinf[widx, digits]                      # (W, B)
    one = jnp.broadcast_to(F.const(1), (n_windows, B, limbs))
    Z = jnp.where(ginf[..., None], jnp.zeros_like(one), one)
    terms = BigG1J(jnp.where(ginf[..., None], one, gx),
                   jnp.where(ginf[..., None], one, gy), Z)
    # tree-reduce over the WINDOW axis only
    m = n_windows
    mm = 1 << (m - 1).bit_length() if m > 1 else 1
    if mm != m:
        pad = BigG1J.identity(F, (mm - m, B))
        terms = BigG1J(jnp.concatenate([terms.X, pad.X]),
                       jnp.concatenate([terms.Y, pad.Y]),
                       jnp.concatenate([terms.Z, pad.Z]))
        m = mm
    while m > 1:
        h = m // 2
        terms = big_jac_add(
            F, BigG1J(terms.X[:h], terms.Y[:h], terms.Z[:h]),
            BigG1J(terms.X[h:], terms.Y[h:], terms.Z[h:]))
        m = h
    return BigG1J(terms.X[0], terms.Y[0], terms.Z[0])


def _big_digits_batch(scalar_words: jnp.ndarray, wb: int,
                      n_windows: int, n_words: int) -> jnp.ndarray:
    """(..., L, n_words) 16-bit words -> (..., W, L) window digits."""
    out = []
    for w in range(n_windows):
        lo_bit = w * wb
        word, off = divmod(lo_bit, 16)
        d = scalar_words[..., word] >> off
        if off + wb > 16 and word + 1 < n_words:
            d = d | (scalar_words[..., word + 1] << (16 - off))
        out.append(d & jnp.uint32((1 << wb) - 1))
    return jnp.stack(out, axis=-2)


def big_msm_fixed_base_many(F: BigMontField, table: BigFixedBaseTable,
                            scalar_words: jnp.ndarray,
                            unroll: int = 4) -> BigG1J:
    """Batched fixed-base MSMs sharing ONE streaming pass over the table:
    scalar_words (B, L, n_words) -> a (B,) Jacobian batch. The production
    commit path — the 9 per-proof BN254 commitments ride one table
    stream + one batched Jacobian tree (the 254-bit lift of
    ops/fixed_base.select_terms_many + msm_fixed_base_many; reference
    loop: src/srs.h:53-68). No gather, no sort: n_buckets full-width
    selects then log2(W*L) halving adds, every step a full VPU op."""
    wb = table.window_bits
    n_windows, n_buckets, L, limbs = table.x.shape
    B = scalar_words.shape[0]
    digits = _big_digits_batch(scalar_words, wb, n_windows,
                               scalar_words.shape[-1])    # (B, W, L)
    while n_buckets % unroll:
        unroll //= 2
    d_ids = jnp.arange(n_buckets, dtype=U32).reshape(-1, unroll)
    chunk = lambda a, tail: a.swapaxes(0, 1).reshape(
        (n_buckets // unroll, unroll, n_windows) + tail)

    def step(acc, inputs):
        ds, tx, ty, tinf = inputs            # tx: (unroll, W, L, limbs)
        ax, ay, ainf = acc
        for u in range(unroll):
            m = digits == ds[u]              # (B, W, L)
            ax = jnp.where(m[..., None], tx[u][None], ax)
            ay = jnp.where(m[..., None], ty[u][None], ay)
            ainf = jnp.where(m, tinf[u][None], ainf)
        return (ax, ay, ainf), None

    init = (jnp.zeros((B, n_windows, L, limbs), U32),
            jnp.zeros((B, n_windows, L, limbs), U32),
            jnp.ones((B, n_windows, L), jnp.bool_))
    (gx, gy, ginf), _ = jax.lax.scan(
        step, init, (d_ids, chunk(table.x, (L, limbs)),
                     chunk(table.y, (L, limbs)),
                     chunk(table.inf, (L,))))
    flat = (B, n_windows * L)
    one = jnp.broadcast_to(F.const(1), flat + (limbs,))
    ginf = ginf.reshape(flat)
    Z = jnp.where(ginf[..., None], jnp.zeros_like(one), one)
    terms = BigG1J(jnp.where(ginf[..., None], one,
                             gx.reshape(flat + (limbs,))),
                   jnp.where(ginf[..., None], one,
                             gy.reshape(flat + (limbs,))), Z)
    # batched tree: halve the term axis with the B axis along for the
    # ride (vmapping _big_tree_reduce would re-trace the adds per lane)
    m = terms.X.shape[1]
    mm = 1 << (m - 1).bit_length() if m > 1 else 1
    if mm != m:
        pad = BigG1J.identity(F, (B, mm - m))
        terms = BigG1J(jnp.concatenate([terms.X, pad.X], axis=1),
                       jnp.concatenate([terms.Y, pad.Y], axis=1),
                       jnp.concatenate([terms.Z, pad.Z], axis=1))
        m = mm
    while m > 1:
        h = m // 2
        terms = big_jac_add(
            F, BigG1J(terms.X[:, :h], terms.Y[:, :h], terms.Z[:, :h]),
            BigG1J(terms.X[:, h:], terms.Y[:, h:], terms.Z[:, h:]))
        m = h
    return BigG1J(terms.X[:, 0], terms.Y[:, 0], terms.Z[:, 0])


def big_msm_fixed_base(F: BigMontField, table: BigFixedBaseTable,
                       scalar_words: jnp.ndarray) -> BigG1J:
    """sum_i s_i * P_i; scalar_words (L, n_words) of 16-bit words (LSB
    first, standard form). Streaming bucket-sweep select (no gather),
    then a lane-parallel Jacobian tree."""
    wb = table.window_bits
    n_windows, n_buckets, L, limbs = table.x.shape
    # digit w of scalar i from its 16-bit words
    digits = []
    for w in range(n_windows):
        lo_bit = w * wb
        word, off = divmod(lo_bit, 16)
        d = scalar_words[:, word] >> off
        if off + wb > 16 and word + 1 < scalar_words.shape[1]:
            d = d | (scalar_words[:, word + 1] << (16 - off))
        digits.append(d & jnp.uint32(n_buckets - 1))
    digits = jnp.stack(digits)                     # (W, L)

    d_ids = jnp.arange(n_buckets, dtype=U32)

    def step(acc, inputs):
        d, tx, ty, tinf = inputs                   # tx: (W, L, limbs)
        ax, ay, ainf = acc
        m = digits == d                            # (W, L)
        ax = jnp.where(m[..., None], tx, ax)
        ay = jnp.where(m[..., None], ty, ay)
        ainf = jnp.where(m, tinf, ainf)
        return (ax, ay, ainf), None

    init = (jnp.zeros((n_windows, L, limbs), U32),
            jnp.zeros((n_windows, L, limbs), U32),
            jnp.ones((n_windows, L), jnp.bool_))
    (gx, gy, ginf), _ = jax.lax.scan(
        step, init, (d_ids, table.x.swapaxes(0, 1),
                     table.y.swapaxes(0, 1), table.inf.swapaxes(0, 1)))
    flat = (n_windows * L,)
    one = jnp.broadcast_to(F.const(1), flat + (limbs,))
    ginf = ginf.reshape(flat)
    Z = jnp.where(ginf[..., None], jnp.zeros_like(one), one)
    terms = BigG1J(jnp.where(ginf[..., None], one,
                             gx.reshape(flat + (limbs,))),
                   jnp.where(ginf[..., None], one,
                             gy.reshape(flat + (limbs,))), Z)
    return _big_tree_reduce(F, terms)
