"""Canonical byte serialization for proofs and SRS (checkpoint/resume).

The reference has no serialization at all — PROOF is an in-memory struct
(src/plonk.h:24-41) and nothing persists (SURVEY §5). The framework needs a
canonical byte format for cross-process golden tests and SRS caching.

Format (little-endian):
  proof:  magic "TPLK" | u16 version | u16 coord_bytes
          9 points (x, y as coord_bytes each + 1 inf byte)
          7 scalars (coord_bytes each)
  srs:    magic "TSRS" | u16 version | u16 coord_bytes | u64 length
          length points | g2_1 (x, y) | g2_s (x, y)
"""
from __future__ import annotations

import struct

import numpy as np

from ..ops.curve import G1, G2
from ..models.plonk import Proof
from ..models.srs import SRS

_POINTS = ["a_s", "b_s", "c_s", "z_s", "t_lo_s", "t_mid_s", "t_hi_s",
           "w_z_s", "w_z_omega_s"]
_SCALARS = ["a_z", "b_z", "c_z", "s_sigma_1_z", "s_sigma_2_z", "r_z",
            "z_omega_z"]
_VERSION = 1


def _coord_bytes(p: int) -> int:
    return max(1, (p.bit_length() + 7) // 8)


def proof_to_bytes(proof: Proof, q: int, r: int) -> bytes:
    cb = max(_coord_bytes(q), _coord_bytes(r))
    out = [b"TPLK", struct.pack("<HH", _VERSION, cb)]
    for name in _POINTS:
        pt = getattr(proof, name)
        out.append(int(np.asarray(pt.x)).to_bytes(cb, "little"))
        out.append(int(np.asarray(pt.y)).to_bytes(cb, "little"))
        out.append(bytes([int(bool(np.asarray(pt.inf)))]))
    for name in _SCALARS:
        out.append(int(np.asarray(getattr(proof, name))).to_bytes(
            cb, "little"))
    return b"".join(out)


def proof_from_bytes(data: bytes) -> Proof:
    import jax.numpy as jnp
    assert data[:4] == b"TPLK", "bad proof magic"
    version, cb = struct.unpack("<HH", data[4:8])
    assert version == _VERSION
    off = 8
    vals = {}
    for name in _POINTS:
        x = int.from_bytes(data[off:off + cb], "little"); off += cb
        y = int.from_bytes(data[off:off + cb], "little"); off += cb
        inf = bool(data[off]); off += 1
        vals[name] = G1(jnp.uint32(x), jnp.uint32(y), jnp.asarray(inf))
    for name in _SCALARS:
        vals[name] = jnp.uint32(int.from_bytes(data[off:off + cb],
                                               "little")); off += cb
    assert off == len(data), "trailing bytes in proof"
    return Proof(**vals)


def srs_to_bytes(srs: SRS, q: int) -> bytes:
    cb = _coord_bytes(q)
    n = srs.length
    out = [b"TSRS", struct.pack("<HHQ", _VERSION, cb, n)]
    xs = np.asarray(srs.g1s.x)
    ys = np.asarray(srs.g1s.y)
    infs = np.asarray(srs.g1s.inf)
    for i in range(n):
        out.append(int(xs[i]).to_bytes(cb, "little"))
        out.append(int(ys[i]).to_bytes(cb, "little"))
        out.append(bytes([int(bool(infs[i]))]))
    for pt in (srs.g2_1, srs.g2_s):
        out.append(int(np.asarray(pt.x)).to_bytes(cb, "little"))
        out.append(int(np.asarray(pt.y)).to_bytes(cb, "little"))
    return b"".join(out)


def srs_from_bytes(data: bytes, mode: str = "unknown") -> SRS:
    import jax.numpy as jnp
    assert data[:4] == b"TSRS", "bad srs magic"
    version, cb, n = struct.unpack("<HHQ", data[4:16])
    assert version == _VERSION
    off = 16
    xs = np.zeros(n, dtype=np.uint32)
    ys = np.zeros(n, dtype=np.uint32)
    infs = np.zeros(n, dtype=bool)
    for i in range(n):
        xs[i] = int.from_bytes(data[off:off + cb], "little"); off += cb
        ys[i] = int.from_bytes(data[off:off + cb], "little"); off += cb
        infs[i] = bool(data[off]); off += 1
    g2 = []
    for _ in range(2):
        x = int.from_bytes(data[off:off + cb], "little"); off += cb
        y = int.from_bytes(data[off:off + cb], "little"); off += cb
        g2.append(G2(jnp.uint32(x), jnp.uint32(y)))
    assert off == len(data), "trailing bytes in srs"
    return SRS(g1s=G1(jnp.asarray(xs), jnp.asarray(ys), jnp.asarray(infs)),
               g2_1=g2[0], g2_s=g2[1], mode=mode)


# ---------------- BN254 (multi-limb) proof format ----------------
#
# Word-array coordinates: magic "TPB2" | u16 version | u16 coord_bytes
# (32 for BN254) | 9 points (x, y, inf byte) | 7 scalars. Values travel
# as canonical little-endian integers reassembled from the (16,) 16-bit
# word arrays the BN254 prover emits (models/plonk_bn254.py).


def _from_words(w) -> int:
    w = np.asarray(w, dtype=np.uint64)
    v = 0
    for k in range(w.shape[-1] - 1, -1, -1):
        v = (int(v) << 16) | int(w[k])
    return v


def _to_words(v: int, n_words: int):
    return np.array([(v >> (16 * k)) & 0xFFFF for k in range(n_words)],
                    dtype=np.uint32)


def bn254_proof_to_bytes(proof) -> bytes:
    cb = 32
    out = [b"TPB2", struct.pack("<HH", _VERSION, cb)]
    for name in _POINTS:
        pt = getattr(proof, name)
        out.append(_from_words(pt.x).to_bytes(cb, "little"))
        out.append(_from_words(pt.y).to_bytes(cb, "little"))
        out.append(bytes([int(bool(np.asarray(pt.inf)))]))
    for name in _SCALARS:
        out.append(_from_words(getattr(proof, name)).to_bytes(
            cb, "little"))
    return b"".join(out)


def bn254_proof_from_bytes(data: bytes):
    import jax.numpy as jnp
    from ..models.plonk_bn254 import BN254Proof, BigG1Affine
    assert data[:4] == b"TPB2", "bad bn254 proof magic"
    version, cb = struct.unpack("<HH", data[4:8])
    assert version == _VERSION
    nw = cb // 2
    off = 8
    vals = {}
    for name in _POINTS:
        x = int.from_bytes(data[off:off + cb], "little"); off += cb
        y = int.from_bytes(data[off:off + cb], "little"); off += cb
        inf = bool(data[off]); off += 1
        vals[name] = BigG1Affine(jnp.asarray(_to_words(x, nw)),
                                 jnp.asarray(_to_words(y, nw)),
                                 jnp.asarray(inf))
    for name in _SCALARS:
        vals[name] = jnp.asarray(_to_words(int.from_bytes(
            data[off:off + cb], "little"), nw)); off += cb
    assert off == len(data), "trailing bytes in bn254 proof"
    return BN254Proof(**vals)
