"""Structured reference string (trusted setup) — replaces src/srs.h.

Two modes:

- mode="reference": bit-exact replication of the reference's srs_create,
  INCLUDING its degenerate-SRS bug: the G1 base point is g1_identity()
  (src/srs.h:27), so every G1 power is the point at infinity and every
  commitment the prover emits is infinity too. srs-test.c:15-17 asserts the
  degenerate value, so this is load-bearing reference behavior (SURVEY §2.2.1).
  The power loop also starts at s^1 even for index 0 (src/srs.h:33-36).

- mode="fixed": the intended SRS of "PLONK by hand": g1s[i] = s^i * G with
  G the real generator (1, 2) and the secret powers accumulated in the BASE
  field exactly like the reference's running gf_mul (src/srs.h:35). This is
  the mode the sound verifier uses.

G2 side is identical in both modes: (g2_1, g2_s) = (G2_gen, secret * G2_gen)
(src/srs.h:39-40).

srs_commit is the naive per-coefficient fold (src/srs.h:53-68) kept for
parity; the performance path is the Pippenger MSM (ops/msm.py), which is
asserted equal.
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.curve import (G1, G2, g1_generator, g2_generator, g1_add, g1_mul,
                         g2_mul)

U32 = jnp.uint32


@dataclasses.dataclass(frozen=True)
class SRS:
    g1s: G1          # batched: arrays of shape (n+1,)
    g2_1: G2
    g2_s: G2
    mode: str

    @property
    def length(self) -> int:
        return self.g1s.x.shape[-1]


def srs_create(Fq, curve, secret: int, n: int, mode: str = "reference") -> SRS:
    """Build the SRS with n+1 G1 powers (src/srs.h:18-43).

    Scalar-power arithmetic differs by mode:
    - "reference": powers accumulate in the BASE field exactly like the
      reference's running gf_mul (src/srs.h:35) — bit-exact parity (the
      points are all infinity there anyway, src/srs.h:27).
    - "fixed": powers accumulate MOD THE GROUP ORDER r, which is what KZG
      actually requires ([s^i]G must be geometric in the exponent group).
      The reference's mod-p powers coincidentally agree on the toy curve
      (2^6 < 101 — no wraparound), but diverge for real parameters; the
      pairing checks fail with mod-p powers."""
    length = n + 1
    if mode == "reference":
        secret = secret % Fq.p
        # reference quirk: loop starts at s^1 even for index 0
        powers = []
        cur = secret
        for _ in range(length):
            powers.append(cur)
            cur = (cur * secret) % Fq.p
    else:
        r = curve.r
        s = secret % r
        powers = []
        cur = 1
        for _ in range(length):
            powers.append(cur)
            cur = (cur * s) % r
    powers = jnp.asarray(np.array(powers, dtype=np.uint32))

    if mode == "reference":
        base = G1.identity()            # the enshrined bug (src/srs.h:27)
    elif mode == "fixed":
        base = g1_generator(curve, Fq)
    else:
        raise ValueError(f"unknown SRS mode {mode!r}")

    g1s = g1_mul(Fq, base, powers)      # batched ladder over all powers
    g2_1 = g2_generator(curve, Fq)
    if mode == "fixed":
        # reduce mod the GROUP ORDER so g2_s stays consistent with the G1
        # powers for secrets >= 2^32 (a raw uint32 cast silently wraps mod
        # 2^32 and every pairing check fails — ADVICE round 1, srs.py:90)
        s_red = secret % curve.r
        g2_s = g2_mul(Fq, curve.d, g2_1, jnp.uint32(s_red),
                      nbits=max(curve.r.bit_length(), 2))
    else:
        g2_s = g2_mul(Fq, curve.d, g2_1, jnp.uint32(secret % (1 << 32)))
    return SRS(g1s=g1s, g2_1=g2_1, g2_s=g2_s, mode=mode)


def srs_multiple_table(Fq, srs_g1s: G1, r: int) -> G1:
    """Fixed-base precomputation for small scalar fields: table[i, k] =
    k * g1s[i] for k in [0, r). Turns every commitment into gathers + a
    fold (no scalar-mul ladders) — the classic fixed-base window trick,
    exact for the toy field where r = 17."""
    scalars = jnp.arange(r, dtype=U32)[None, :]
    pts = G1(srs_g1s.x[:, None], srs_g1s.y[:, None], srs_g1s.inf[:, None])
    return g1_mul(Fq, pts, scalars, nbits=max(r.bit_length(), 1))


def srs_commit_table(Fq, table: G1, coeffs: jnp.ndarray) -> G1:
    """Commitment via the fixed-base table: one gather per SRS point plus
    an EC-add fold. Identical group output to srs_commit_naive."""
    L = min(coeffs.shape[-1], table.x.shape[0])
    rows = jnp.arange(L)
    idx = coeffs[..., :L].astype(jnp.int32)
    terms = G1(table.x[rows, idx], table.y[rows, idx],
               table.inf[rows, idx])

    def body(i, acc):
        return g1_add(Fq, acc, G1(terms.x[..., i], terms.y[..., i],
                                  terms.inf[..., i]))

    return jax.lax.fori_loop(0, L, body, G1.identity(terms.x.shape[:-1]))


def srs_commit_naive(Fq, srs_g1s: G1, coeffs: jnp.ndarray,
                     scalar_bits: int = 32) -> G1:
    """Naive MSM fold: sum_i coeffs[i] * g1s[i] in index order
    (src/srs.h:53-68). coeffs are scalar-field values; the reference feeds
    coeff.value straight into g1_mul (src/srs.h:62-63). Static-shape: uses
    min(len(coeffs), len(g1s)) terms; zero-padded coefficients contribute
    the identity, matching the reference's effective-length behavior.
    scalar_bits bounds the ladder (pass the scalar field's bit length)."""
    L = min(coeffs.shape[-1], srs_g1s.x.shape[-1])
    pts = G1(srs_g1s.x[:L], srs_g1s.y[:L], srs_g1s.inf[:L])
    terms = g1_mul(Fq, pts, coeffs[:L], nbits=scalar_bits)

    def body(i, acc):
        return g1_add(Fq, acc, G1(terms.x[i], terms.y[i], terms.inf[i]))

    return jax.lax.fori_loop(0, L, body, G1.identity())
