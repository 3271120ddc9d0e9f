"""Poseidon permutation + sponge over the scalar field — the on-device
Fiat-Shamir hash.

The host transcript (models/fiat_shamir.py, BLAKE2b) forces a host round
trip per protocol round: commitments come back to the host, get hashed,
and the challenge goes back up the tunnel (~2.9 ms fixed dispatch floor
EACH WAY, tools/tpu_calibrate.py) — the staged FS prover pays 6+
dispatches per proof. Poseidon is an ALGEBRAIC hash: its permutation is
field muls/adds, i.e. exactly what the TPU's vector units are already
doing, so the whole transcript can live on device and the non-interactive
prove collapses into a single jit call (models/fs_poseidon.py).

The reference has no Fiat-Shamir at all (challenges are caller arguments,
src/plonk.h:223-229); this module is on the capability-extension axis,
not the parity axis, so the construction is self-defined (and versioned
by `_SEED_FMT`) rather than borrowed from another ecosystem:

- x^alpha S-box with the smallest alpha >= 3 coprime to p-1 (alpha = 5
  for BN254-Fr-style fields, alpha = 7 for BabyBear where 5 | p-1);
- R_F full rounds (default 8) + R_P partial rounds (first state lane
  only), the standard HADES schedule;
- round constants derived nothing-up-my-sleeve from SHA-256 in counter
  mode over a seed string binding p, t, alpha and the schedule;
- MDS matrix = Cauchy matrix 1/(x_i + y_j), x_i = i, y_j = t + j
  (invertible and MDS for t << p).

Security note: the sponge's capacity is `capacity` field elements, so
collision resistance is ~capacity*log2(p)/2 bits — with the default
t = 8, capacity = 4 that is ~62 bits for the 31-bit scaled field
(benchmarking-grade, like the curve itself) and ~508 bits for BN254-Fr.

Everything here exists twice: a jax form usable inside jit (Montgomery
u32 lanes, one lax.scan over a round tape) and a python-int oracle
(`PoseidonHost`) the verifier replays off-device. Parity between the two
is asserted element-for-element in tests/test_poseidon.py.
"""
from __future__ import annotations

import dataclasses
import functools
import hashlib
import math

import numpy as np
import jax
import jax.numpy as jnp

U32 = jnp.uint32

_SEED_FMT = "tpu-plonk-poseidon-v1/p={p}/t={t}/alpha={alpha}/rf={rf}/rp={rp}"


def _sbox_alpha(p: int) -> int:
    a = 3
    while math.gcd(a, p - 1) != 1:
        a += 2
    return a


@dataclasses.dataclass(frozen=True)
class PoseidonParams:
    """Host-side (python int) Poseidon parameter set. `arc[r][i]` is the
    round constant added to lane i before round r's S-box; `mds[i][j]`
    the state matrix. All ints are canonical (standard form) mod p."""
    p: int
    t: int
    alpha: int
    full_rounds: int
    partial_rounds: int
    arc: tuple          # (R, t) of int
    mds: tuple          # (t, t) of int

    @property
    def rounds(self) -> int:
        return self.full_rounds + self.partial_rounds

    def is_full_round(self, r: int) -> bool:
        half = self.full_rounds // 2
        return r < half or r >= half + self.partial_rounds


@functools.lru_cache(maxsize=None)
def make_params(p: int, t: int = 8, full_rounds: int = 8,
                partial_rounds: int | None = None) -> PoseidonParams:
    """Deterministic parameters for field modulus p and width t.

    partial_rounds defaults follow the Poseidon paper's ballpark for
    x^alpha boxes (interpolation/Groebner bounds grow with log_alpha(p)):
    ~ceil(log2(p) / log2(alpha)) + margin, min 22."""
    alpha = _sbox_alpha(p)
    if partial_rounds is None:
        partial_rounds = max(22, math.ceil(p.bit_length()
                                           / math.log2(alpha)) + 8)
    seed = _SEED_FMT.format(p=p, t=t, alpha=alpha, rf=full_rounds,
                            rp=partial_rounds)
    R = full_rounds + partial_rounds

    def draw(tag: str, i: int) -> int:
        # 64 hash bytes >> 31..254-bit p: modulo bias < 2^-256
        h = hashlib.sha256(f"{seed}/{tag}/{i}".encode()).digest()
        h += hashlib.sha256(f"{seed}/{tag}/{i}/hi".encode()).digest()
        return int.from_bytes(h, "little") % p

    arc = tuple(tuple(draw("arc", r * t + i) for i in range(t))
                for r in range(R))
    # Cauchy MDS: requires the 2t values x_i, y_j pairwise distinct and
    # x_i + y_j != 0 mod p — immediate for 2t << p
    mds = tuple(tuple(pow((i + t + j) % p, p - 2, p) for j in range(t))
                for i in range(t))
    return PoseidonParams(p=p, t=t, alpha=alpha, full_rounds=full_rounds,
                          partial_rounds=partial_rounds, arc=arc, mds=mds)


# ---------------- host oracle (python ints) ----------------


class PoseidonHost:
    """Python-int Poseidon: the verifier-side oracle. State, inputs and
    outputs are canonical ints mod p."""

    def __init__(self, params: PoseidonParams):
        self.pp = params

    def permute(self, state):
        pp = self.pp
        p, t, alpha = pp.p, pp.t, pp.alpha
        s = list(state)
        assert len(s) == t
        for r in range(pp.rounds):
            s = [(x + c) % p for x, c in zip(s, pp.arc[r])]
            if pp.is_full_round(r):
                s = [pow(x, alpha, p) for x in s]
            else:
                s[0] = pow(s[0], alpha, p)
            s = [sum(pp.mds[i][j] * s[j] for j in range(t)) % p
                 for i in range(t)]
        return s


# ---------------- jax permutation (Montgomery u32 lanes) ----------------


@functools.lru_cache(maxsize=None)
def _host_tables(F, params: PoseidonParams):
    """(arc tape (R, t), full-round mask (R,), mds (t, t)) as Montgomery-
    encoded HOST numpy arrays. The cache must hold numpy, not jnp: a
    jnp constant created while tracing is a tracer, and caching it leaks
    it into every later trace (the round-1 id()-cache bug class). The
    jax path is single-u32-word fields (scaled/BabyBear); the multi-limb
    (BN254) transcript replays through the host oracle for now."""
    assert params.p < (1 << 32), "device Poseidon: single-word fields only"
    arc = F.encode_host(np.asarray(params.arc, dtype=np.uint64)
                        .astype(np.uint32))
    mds = F.encode_host(np.asarray(params.mds, dtype=np.uint64)
                        .astype(np.uint32))
    full = np.asarray([params.is_full_round(r)
                       for r in range(params.rounds)], dtype=bool)
    return np.asarray(arc), full, np.asarray(mds)


def _device_tables(F, params: PoseidonParams):
    arc, full, mds = _host_tables(F, params)
    return jnp.asarray(arc), jnp.asarray(full), jnp.asarray(mds)


def _pow_alpha(F, x, alpha: int):
    """x^alpha by square-and-multiply on the static exponent (alpha is
    tiny: 3/5/7)."""
    acc = None
    base = x
    e = alpha
    while e:
        if e & 1:
            acc = base if acc is None else F.mul(acc, base)
        e >>= 1
        if e:
            base = F.square(base)
    return acc


def permute(F, params: PoseidonParams, state: jnp.ndarray) -> jnp.ndarray:
    """Poseidon permutation on a (..., t) Montgomery-form state, all
    rounds as ONE lax.scan over the (arc, is_full) tape (sequential
    elementwise chains are cheap; avoid R unrolled graph copies —
    CLAUDE.md XLA-CPU discipline)."""
    arc, full, mds = _device_tables(F, params)
    t = params.t
    alpha = params.alpha

    def body(s, inputs):
        c, is_full = inputs
        s = F.add(s, c)
        boxed = _pow_alpha(F, s, alpha)
        lane0 = jnp.arange(t) == 0
        s = jnp.where(is_full | lane0, boxed, s)
        # MDS: out_i = sum_j mds[i,j] * s_j  — (t,t)*(...,1,t) products,
        # fold the j axis with t-1 adds (t is static and small)
        prod = F.mul(mds, s[..., None, :])
        acc = prod[..., 0]
        for j in range(1, t):
            acc = F.add(acc, prod[..., j])
        return acc, None

    out, _ = jax.lax.scan(body, state, (arc, full))
    return out


# ---------------- sponge (fixed-structure duplex) ----------------
#
# The transcript absorbs a STATICALLY-known sequence of field elements
# (the protocol fixes how many commitments/evaluations each round
# contributes), so no dynamic padding is needed: each absorb call takes
# a whole number of rate-sized blocks, padded by the CALLER with the
# 1||0* convention via `pad_blocks`. Squeezes emit state[0] and permute
# between outputs; rejection resampling permutes again (counter-free —
# the permutation itself is the counter), identically on both sides.


def rate_of(params: PoseidonParams, capacity: int = 4) -> int:
    r = params.t - capacity
    assert r >= 1
    return r


def pad_elements(elems: list, rate: int) -> list:
    """10* padding to a whole number of rate-blocks (host-side list of
    ints or 0-d device arrays)."""
    out = list(elems) + [1]
    while len(out) % rate:
        out.append(0)
    return out


def absorb(F, params: PoseidonParams, state: jnp.ndarray,
           block: jnp.ndarray, capacity: int = 4) -> jnp.ndarray:
    """One duplex absorb of a (rate,) Montgomery-form block."""
    rate = rate_of(params, capacity)
    assert block.shape[-1] == rate
    mixed = F.add(state[..., :rate], block)
    state = jnp.concatenate([mixed, state[..., rate:]], axis=-1)
    return permute(F, params, state)


def absorb_elements(F, params: PoseidonParams, state: jnp.ndarray,
                    elems: list, capacity: int = 4) -> jnp.ndarray:
    """Absorb a python list of 0-d Montgomery-form scalars (statically
    shaped; applies the 1||0* padding)."""
    rate = rate_of(params, capacity)
    padded = []
    for e in pad_elements(elems, rate):
        if isinstance(e, int):
            padded.append(F.const(e))
        else:
            padded.append(e)
    for i in range(0, len(padded), rate):
        state = absorb(F, params, state, jnp.stack(padded[i:i + rate]),
                       capacity)
    return state


def squeeze(F, params: PoseidonParams, state: jnp.ndarray,
            reject_zero: bool = True, pow_n_not_one: int | None = None):
    """Squeeze ONE field element (standard form) with deterministic
    rejection resampling: permute again while the candidate is
    inadmissible (v == 0, optionally v^n == 1). Returns (value, state);
    traceable (lax.while_loop)."""

    def bad(v):
        b = jnp.asarray(False)
        if reject_zero:
            b = b | (v == 0)
        if pow_n_not_one is not None:
            b = b | (F.pow_static(v, pow_n_not_one) == F.ones())
        return b

    def cond(carry):
        s, _ = carry
        return bad(s[..., 0])

    def body(carry):
        s, _ = carry
        s2 = permute(F, params, s)
        return (s2, s2[..., 0])

    state = permute(F, params, state)
    state, v = jax.lax.while_loop(cond, body, (state, state[..., 0]))
    return F.decode(v), state


def tree_digest(F, params: PoseidonParams, leaves: jnp.ndarray):
    """Binary Poseidon tree hash of a (m,) standard-form vector (m a
    power of two), for absorbing long public vectors: a sequential sponge
    walk over 2^16 elements would be ~16k serial permutations, while the
    tree is log2(m) BATCHED permutations — the TPU-friendly shape.
    Compression: parent = permute([l, r, 0..])[0]. Returns a 0-d
    Montgomery-form digest."""
    x = F.encode(jnp.asarray(leaves, U32))
    t = params.t
    while x.shape[0] > 1:
        m = x.shape[0] // 2
        state = jnp.concatenate(
            [x[0::2, None], x[1::2, None],
             jnp.zeros((m, t - 2), U32)], axis=-1)
        x = permute(F, params, state)[:, 0]
    return x[0]


def host_tree_digest(params: PoseidonParams, leaves) -> int:
    perm = PoseidonHost(params)
    xs = [int(v) % params.p for v in leaves]
    while len(xs) > 1:
        xs = [perm.permute([xs[2 * i], xs[2 * i + 1]]
                           + [0] * (params.t - 2))[0]
              for i in range(len(xs) // 2)]
    return xs[0]


# ---------------- multi-limb (BN254-class) device path ----------------
#
# The same permutation/sponge over a BigMontField: state (..., t, limbs),
# elements are 16-bit-word limb arrays (ops/bigfield.py). The host oracle
# (PoseidonHost / HostSponge) is already arbitrary-precision, so the
# verifier replay needs nothing new; device/host lockstep is asserted in
# tests/test_poseidon.py::TestBigField. Consumed by the BN254
# single-dispatch FS prover (models/fs_poseidon.BN254PoseidonFsProver).


@functools.lru_cache(maxsize=None)
def _big_host_tables(F, params: PoseidonParams):
    """(arc (R, t, limbs), full mask (R,), mds (t, t, limbs)) Montgomery-
    encoded host numpy (the big-field sibling of _host_tables)."""
    arc = F.encode_host(np.asarray(params.arc, dtype=object))
    mds = F.encode_host(np.asarray(params.mds, dtype=object))
    full = np.asarray([params.is_full_round(r)
                       for r in range(params.rounds)], dtype=bool)
    return np.asarray(arc), full, np.asarray(mds)


def big_permute(F, params: PoseidonParams, state: jnp.ndarray
                ) -> jnp.ndarray:
    """Poseidon permutation on a (..., t, limbs) Montgomery-form state,
    all rounds as ONE lax.scan over the (arc, is_full) tape."""
    arc_h, full_h, mds_h = _big_host_tables(F, params)
    arc, full, mds = (jnp.asarray(arc_h), jnp.asarray(full_h),
                      jnp.asarray(mds_h))
    t = params.t

    def pow_alpha(x):
        acc, base, e = None, x, params.alpha
        while e:
            if e & 1:
                acc = base if acc is None else F.mont_mul(acc, base)
            e >>= 1
            if e:
                base = F.square(base)
        return acc

    def body(s, inputs):
        c, is_full = inputs
        s = F.add(s, c)
        boxed = pow_alpha(s)
        lane0 = (jnp.arange(t) == 0)[:, None]          # (t, 1) over limbs
        s = jnp.where(is_full | lane0, boxed, s)
        # out_i = sum_j mds[i,j] * s_j over the second-to-last axis
        prod = F.mont_mul(mds, s[..., None, :, :])     # (..., t, t, limbs)
        acc = prod[..., 0, :]
        for j in range(1, t):
            acc = F.add(acc, prod[..., j, :])
        return acc, None

    out, _ = jax.lax.scan(body, state, (arc, full))
    return out


def big_absorb_elements(F, params: PoseidonParams, state: jnp.ndarray,
                        elems: list, capacity: int = 1) -> jnp.ndarray:
    """Duplex-absorb a python list of (limbs,) Montgomery-form elements
    (ints allowed; 10*-padded per call, mirroring HostSponge)."""
    rate = rate_of(params, capacity)
    padded = [F.const(e) if isinstance(e, int) else e
              for e in pad_elements(elems, rate)]
    for i in range(0, len(padded), rate):
        block = jnp.stack(padded[i:i + rate])          # (rate, limbs)
        mixed = F.add(state[..., :rate, :], block)
        state = jnp.concatenate([mixed, state[..., rate:, :]], axis=-2)
        state = big_permute(F, params, state)
    return state


def big_squeeze(F, params: PoseidonParams, state: jnp.ndarray,
                reject_zero: bool = True,
                pow_n_not_one: int | None = None):
    """Squeeze one element with deterministic rejection resampling.
    Returns (standard-form words (limbs,), state)."""

    def bad(v):
        b = jnp.asarray(False)
        if reject_zero:
            b = b | jnp.all(v == 0)
        if pow_n_not_one is not None:
            b = b | F.eq(F.pow_static_rolled(v, pow_n_not_one),
                         F.const(1))
        return b

    def cond(carry):
        s, _ = carry
        return bad(s[..., 0, :])

    def body(carry):
        s, _ = carry
        s2 = big_permute(F, params, s)
        return (s2, s2[..., 0, :])

    state = big_permute(F, params, state)
    state, v = jax.lax.while_loop(cond, body, (state, state[..., 0, :]))
    return F.decode(v), state


def big_tree_digest(F, params: PoseidonParams, leaves: jnp.ndarray):
    """Binary Poseidon tree over (m, limbs) standard-form leaves (m a
    power of two): log2(m) BATCHED permutations. Returns a (limbs,)
    Montgomery-form digest. Host mirror: host_tree_digest (already
    arbitrary-precision)."""
    x = F.encode(jnp.asarray(leaves, U32))
    t = params.t
    lim = x.shape[-1]
    while x.shape[0] > 1:
        m = x.shape[0] // 2
        state = jnp.concatenate(
            [x[0::2, None], x[1::2, None],
             jnp.zeros((m, t - 2, lim), U32)], axis=-2)
        x = big_permute(F, params, state)[:, 0, :]
    return x[0]


class HostSponge:
    """Python-int mirror of (absorb_elements, squeeze) — the verifier's
    transcript replay. Must stay in lockstep with the device functions
    (asserted in tests/test_poseidon.py)."""

    def __init__(self, params: PoseidonParams, capacity: int = 4):
        self.pp = params
        self.capacity = capacity
        self.rate = rate_of(params, capacity)
        self.perm = PoseidonHost(params)
        self.state = [0] * params.t

    def absorb_elements(self, elems):
        padded = pad_elements([int(e) % self.pp.p for e in elems],
                              self.rate)
        for i in range(0, len(padded), self.rate):
            blk = padded[i:i + self.rate]
            for j, v in enumerate(blk):
                self.state[j] = (self.state[j] + v) % self.pp.p
            self.state = self.perm.permute(self.state)

    def squeeze(self, reject_zero: bool = True,
                pow_n_not_one: int | None = None) -> int:
        p = self.pp.p

        def bad(v):
            if reject_zero and v == 0:
                return True
            if pow_n_not_one is not None and pow(v, pow_n_not_one, p) == 1:
                return True
            return False

        self.state = self.perm.permute(self.state)
        while bad(self.state[0]):
            self.state = self.perm.permute(self.state)
        return self.state[0]
