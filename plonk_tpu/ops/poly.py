"""Dense polynomial arithmetic over a prime field, TPU-style.

Replaces the reference's heap-backed POLY with trailing-zero trimming
(src/poly.h:20-38): here polynomials are fixed-length uint32 coefficient
tensors (ascending degree) with static shapes, so everything jits. Trailing
zeros are value-neutral for every operation the prover performs; effective
lengths (for the reference's length-sensitive error checks) are computed
separately with `effective_len`.

Division is specialized the TPU way: the prover only divides by the
vanishing polynomial x^n - 1 (src/plonk.h:495-510) and by linear factors
(x - c) (src/plonk.h:601-617) — both have closed-form data-parallel
solutions (strided suffix sums / prefix-weighted suffix sums) instead of the
reference's sequential long division (src/poly.h:124-177). A generic long
division is kept for test parity.

Conventions preserved from the reference:
- poly_eval by Horner (src/poly.h:265-272)
- poly_z = prod (x - p_i) (src/poly.h:274-286)
- Lagrange interpolation (src/poly.h:288-321) — computed barycentrically
  here; the interpolating polynomial is unique, so outputs are identical.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

U32 = jnp.uint32


def pad_to(c: jnp.ndarray, length: int) -> jnp.ndarray:
    """Zero-pad the last axis to `length` (no-op if already that long)."""
    cur = c.shape[-1]
    if cur == length:
        return c
    if cur > length:
        raise ValueError(f"cannot pad {cur} down to {length}")
    widths = [(0, 0)] * (c.ndim - 1) + [(0, length - cur)]
    return jnp.pad(c, widths)


def effective_len(c) -> int:
    """Length after reference-style trailing-zero trimming
    (src/poly.h:22-24). Host-side helper (concrete arrays only)."""
    import numpy as np
    a = np.asarray(c)
    n = len(a)
    while n > 1 and a[n - 1] == 0:
        n -= 1
    return n


def padd(F, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    L = max(a.shape[-1], b.shape[-1])
    return F.add(pad_to(a, L), pad_to(b, L))


def psub(F, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    L = max(a.shape[-1], b.shape[-1])
    return F.sub(pad_to(a, L), pad_to(b, L))


def pneg(F, a: jnp.ndarray) -> jnp.ndarray:
    return F.neg(a)


def pscale(F, a: jnp.ndarray, s) -> jnp.ndarray:
    return F.mul(a, s)


def padd_const(F, a: jnp.ndarray, s) -> jnp.ndarray:
    """Add a scalar to the constant term (src/poly.h:66-69)."""
    return a.at[..., 0].set(F.add(a[..., 0], s))


def pshift(F, a: jnp.ndarray, k: int) -> jnp.ndarray:
    """Multiply by x^k (src/poly.h:199-216)."""
    widths = [(0, 0)] * (a.ndim - 1) + [(k, 0)]
    return jnp.pad(a, widths)


def pmul_school(F, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Schoolbook product, O(la*lb) field-muls, fully vectorized across
    columns. Static output length la + lb - 1. Used for small/parity sizes;
    the scale path uses the NTT (ops/ntt.py)."""
    la, lb = a.shape[-1], b.shape[-1]
    L = la + lb - 1
    # row i of the stack is (a_i * b) shifted up by i; anti-diagonal sums
    # accumulate with modular adds (no overflow for any p < 2^31)
    acc = jnp.zeros(a.shape[:-1] + (L,), dtype=U32)
    for i in range(la):
        prod = F.mul(a[..., i:i + 1], b)
        row = jnp.pad(prod, [(0, 0)] * (a.ndim - 1) + [(i, la - 1 - i)])
        acc = F.add(acc, row)
    return acc


def peval(F, c: jnp.ndarray, x) -> jnp.ndarray:
    """Horner evaluation at a scalar point (src/poly.h:265-272)."""
    n = c.shape[-1]
    x = jnp.asarray(x, dtype=U32)

    def body(i, y):
        return F.add(F.mul(y, x), c[..., n - 1 - i])

    y0 = jnp.zeros(jnp.broadcast_shapes(c.shape[:-1], x.shape), dtype=U32)
    return jax.lax.fori_loop(0, n, body, y0)


def peval_many(F, c: jnp.ndarray, xs: jnp.ndarray) -> jnp.ndarray:
    """Evaluate one polynomial at a vector of points."""
    return jax.vmap(lambda x: peval(F, c, x))(xs)


def pz(F, points: jnp.ndarray) -> jnp.ndarray:
    """Vanishing polynomial prod_i (x - points[i]) (src/poly.h:274-286).
    Static output length len(points)+1."""
    n = points.shape[-1]
    acc = jnp.zeros((n + 1,), dtype=U32).at[0].set(F.ones())

    def body(i, acc):
        shifted = jnp.concatenate([jnp.zeros((1,), dtype=U32), acc[:-1]])
        return F.sub(shifted, F.mul(points[i], acc))

    return jax.lax.fori_loop(0, n, body, acc)


def plagrange(F, xs: jnp.ndarray, ys: jnp.ndarray) -> jnp.ndarray:
    """Lagrange interpolation through (xs, ys) (src/poly.h:288-321).

    Computed barycentrically: L = sum_j ys[j] / Z'(xs[j]) * Z(x)/(x - xs[j]).
    The interpolating polynomial of degree < n is unique, so this matches the
    reference's O(n^3) accumulation exactly. Static output length n."""
    n = xs.shape[-1]
    z = pz(F, xs)  # len n+1

    # Z'(x_j) = prod_{i != j} (x_j - x_i)
    diffs = F.sub(xs[:, None], xs[None, :])          # (n, n)
    eye = jnp.eye(n, dtype=jnp.bool_)
    diffs = jnp.where(eye, F.ones(), diffs)
    denom = diffs[:, 0]
    for i in range(1, n):
        denom = F.mul(denom, diffs[:, i])
    w = F.mul(ys, F.inv(denom))                      # (n,)

    # q_j = Z / (x - x_j) via synthetic (Horner) division, vmapped over j.
    def synth_div(c):
        # descending recurrence: b_{n-1} = z_n ; b_k = z_{k+1} + c * b_{k+1}
        def body(i, q):
            k = n - 1 - i
            prev = jnp.where(i == 0, jnp.uint32(0), q[(k + 1) % n])
            return q.at[k].set(F.add(z[k + 1], F.mul(c, prev)))
        return jax.lax.fori_loop(0, n, body, jnp.zeros((n,), dtype=U32))

    qs = jax.vmap(synth_div)(xs)                     # (n, n)
    terms = F.mul(w[:, None], qs)
    acc = terms[0]
    for j in range(1, n):
        acc = F.add(acc, terms[j])
    return acc


def pdivide(F, num: jnp.ndarray, den: jnp.ndarray):
    """Generic long division (parity with src/poly.h:124-177).

    `den`'s effective length must equal its static length (nonzero leading
    coefficient). Returns (quot, rem) with static lengths
    (num_len - den_len + 1, den_len - 1) [reference trims; trailing zeros
    here are value-neutral]. Sequential in deg(num) - deg(den); only used
    for parity tests — the prover uses the closed forms below."""
    num_len, den_len = num.shape[-1], den.shape[-1]
    if den_len > num_len:
        return jnp.zeros((1,), dtype=U32), num
    lead_inv = F.inv(den[den_len - 1])
    qlen = num_len - den_len + 1

    def body(step, carry):
        quot, rem = carry
        i = num_len - 1 - step
        coeff = F.mul(rem[i], lead_inv)
        quot = quot.at[i - (den_len - 1)].set(coeff)
        window = jax.lax.dynamic_slice(rem, (i - (den_len - 1),), (den_len,))
        window = F.sub(window, F.mul(coeff, den))
        rem = jax.lax.dynamic_update_slice(rem, window, (i - (den_len - 1),))
        return quot, rem

    quot0 = jnp.zeros((qlen,), dtype=U32)
    quot, rem = jax.lax.fori_loop(0, qlen, body, (quot0, num))
    return quot, rem[:max(den_len - 1, 1)]


def _suffix_sums(F, u: jnp.ndarray, axis: int = -1) -> jnp.ndarray:
    """Inclusive modular suffix sums along an axis."""
    rev = jnp.flip(u, axis=axis)
    acc = jax.lax.associative_scan(F.add, rev, axis=axis)
    return jnp.flip(acc, axis=axis)


def divide_by_vanishing(F, t: jnp.ndarray, n: int):
    """Exact division by x^n - 1 as strided suffix sums (data-parallel).

    q[i] = sum_{j>=1} t[i + j*n]; remainder rem[i] = t[i] + q[i] for i < n.
    Replaces the sequential poly_divide call at src/plonk.h:495-510.
    Returns (q, rem) with static lengths (len(t) - n, n)."""
    L = t.shape[-1]
    if L <= n:
        raise ValueError("numerator shorter than divisor")
    m = -(-L // n)
    rows = pad_to(t, m * n).reshape(t.shape[:-1] + (m, n))
    s = _suffix_sums(F, rows, axis=-2).reshape(t.shape[:-1] + (m * n,))
    q = s[..., n:L]
    rem = s[..., :n]
    return q, rem


def pow_vector(F, x, L: int) -> jnp.ndarray:
    """pows[i] = x^i for i in [0, L): binary-decomposition products —
    log2(L) full-width contiguous multiplies (an associative_scan over a
    broadcast vector emits strided slice levels, ~10x slower on TPU)."""
    nbits = max((L - 1).bit_length(), 1)
    idx = jnp.arange(L, dtype=U32)
    acc = jnp.broadcast_to(F.ones(), (L,)).astype(U32)
    cur = jnp.asarray(x, U32)
    for j in range(nbits):
        bit = (idx >> j) & 1
        acc = jnp.where(bit == 1, F.mul(acc, cur), acc)
        if j + 1 < nbits:
            cur = F.mul(cur, cur)
    return acc


def divide_by_linear(F, t: jnp.ndarray, c):
    """Division by (x - c) for nonzero c, fully data-parallel.

    q[i] = sum_{j>i} t[j] c^{j-i-1} = (suffix sum of t_j c^j) * c^{-(i+1)}.
    Remainder is t(c). Replaces poly_divide at src/plonk.h:601-617.
    Returns (q, rem_scalar) with q of static length len(t) - 1."""
    L = t.shape[-1]
    c = jnp.asarray(c, dtype=U32)
    u = F.mul(t, pow_vector(F, c, L))
    suf = _suffix_sums(F, u)                               # suf[i] = sum_{j>=i}
    s_excl = F.sub(suf, u)                                 # sum_{j>i}
    ic = F.inv(c)
    icpow = F.mul(pow_vector(F, ic, L), ic)                # ic^1 .. ic^L
    q = F.mul(s_excl, icpow)[..., :L - 1]
    rem = suf[..., 0]                                      # t(c)
    return q, rem
