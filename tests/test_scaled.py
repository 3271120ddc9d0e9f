"""Scaled prover/verifier tests over the scaled pairing curve:
- curve/pairing sanity at scale,
- independent python-int mini-prover cross-check of all proof evaluations,
- prove/verify round trip with tamper rejection,
- coset-quotient internals.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from plonk_tpu.utils.params import (SCALED_CURVE, SCALED_FR, SCALED_FQ,
                                    scaled_plonk_params)
from plonk_tpu.ops.field import MontField
from plonk_tpu.ops import curve as C
from plonk_tpu.ops import pairing as PR
from plonk_tpu.models import plonk_scaled as PS
from plonk_tpu.models.synthetic import square_chain_circuit

R = SCALED_FR.p
Q = SCALED_FQ.p
Fq = MontField(SCALED_FQ)

CH = np.array([1111, 2222, 3333, 4444, 5555], dtype=np.uint32)
RND = np.array([11, 22, 33, 44, 55, 66, 77, 88, 99], dtype=np.uint32)


def test_scaled_curve_sanity():
    g = C.g1_generator(SCALED_CURVE, Fq)
    assert bool(C.g1_is_on_curve(Fq, SCALED_CURVE.b, g))
    # order r: r*G == infinity, (r-1)*G == -G
    rG = C.g1_mul(Fq, g, jnp.uint32(R % (1 << 32)), nbits=32)
    assert bool(rG.inf)
    r1G = C.g1_mul(Fq, g, jnp.uint32((R - 1) % (1 << 32)), nbits=32)
    negG = C.g1_neg(Fq, g)
    assert bool(C.g1_equal(r1G, negG))


def test_scaled_pairing_bilinear():
    g1 = C.g1_generator(SCALED_CURVE, Fq)
    g2 = C.g2_generator(SCALED_CURVE, Fq)
    e = PR.pairing(Fq, SCALED_CURVE, g1, g2)
    # non-degenerate
    one = C.GT.one(Fq)
    assert not bool(C.gt_equal(e, one))
    # e(aP, Q) == e(P, Q)^a for a couple of scalars
    for a in (2, 7, 12345):
        left = PR.pairing(Fq, SCALED_CURVE,
                          C.g1_mul(Fq, g1, jnp.uint32(a)), g2)
        right = C.gt_pow_static(Fq, SCALED_CURVE.d, e, a)
        assert bool(C.gt_equal(left, right)), a
    # e(P, bQ) == e(P, Q)^b
    b = 97
    left = PR.pairing(Fq, SCALED_CURVE, g1,
                      C.g2_mul(Fq, SCALED_CURVE.d, g2, jnp.uint32(b)))
    right = C.gt_pow_static(Fq, SCALED_CURVE.d, e, b)
    assert bool(C.gt_equal(left, right))


def _mini_reference_prover(n, selectors, copies, a, b, c, ch, rnd):
    """Independent python-int PLONK prover (standard dialect) for tiny n:
    naive Vandermonde interpolation, schoolbook products, long division.
    Returns the seven scalar evaluations of the proof."""
    p = R
    pp = scaled_plonk_params(n)
    omega, k1, k2 = pp.omega, pp.k1, pp.k2
    alpha, beta, gamma, z, v = (int(x) for x in ch)
    h = [pow(omega, i, p) for i in range(n)]

    def interp(vals):
        # Lagrange, python ints
        coeffs = [0] * n
        for j in range(n):
            # l_j = prod (x - h_i)/(h_j - h_i)
            num = [1]
            den = 1
            for i in range(n):
                if i == j:
                    continue
                num = poly_mul(num, [(-h[i]) % p, 1])
                den = den * (h[j] - h[i]) % p
            s = vals[j] * pow(den, -1, p) % p
            for k_, cf in enumerate(num):
                coeffs[k_] = (coeffs[k_] + s * cf) % p
        return coeffs

    def poly_mul(x, y):
        out = [0] * (len(x) + len(y) - 1)
        for i, xi in enumerate(x):
            for j, yj in enumerate(y):
                out[i + j] = (out[i + j] + xi * yj) % p
        return out

    def poly_add(x, y):
        L = max(len(x), len(y))
        return [((x[i] if i < len(x) else 0) + (y[i] if i < len(y) else 0))
                % p for i in range(L)]

    def poly_scale(x, s):
        return [xi * s % p for xi in x]

    def peval(x, pt):
        acc = 0
        for cf in reversed(x):
            acc = (acc * pt + cf) % p
        return acc

    zh = [(p - 1)] + [0] * (n - 1) + [1]
    q_l, q_r, q_o, q_m, q_c = (list(map(int, selectors[i]))
                               for i in range(5))
    table = {0: h, 1: [x * k1 % p for x in h], 2: [x * k2 % p for x in h]}
    sig = [[table[int(t)][int(i) - 1] for t, i in copies[k]]
           for k in range(3)]

    f_a, f_b, f_c = interp(list(map(int, a))), interp(list(map(int, b))), \
        interp(list(map(int, c)))
    s1, s2, s3 = (interp(sv) for sv in sig)

    b_ = [int(x) for x in rnd]
    a_x = poly_add(poly_mul([b_[1], b_[0]], zh), f_a)
    b_x = poly_add(poly_mul([b_[3], b_[2]], zh), f_b)
    c_x = poly_add(poly_mul([b_[5], b_[4]], zh), f_c)

    acc = [1]
    for i in range(1, n):
        w = h[i - 1]
        dn = (int(a[i-1]) + beta * w + gamma) * \
             (int(b[i-1]) + beta * k1 * w + gamma) % p * \
             ((int(c[i-1]) + beta * k2 * w + gamma) % p) % p
        nm = (int(a[i-1]) + beta * sig[0][i-1] + gamma) * \
             (int(b[i-1]) + beta * sig[1][i-1] + gamma) % p * \
             ((int(c[i-1]) + beta * sig[2][i-1] + gamma) % p) % p
        acc.append(acc[-1] * dn % p * pow(nm, -1, p) % p)
    acc_x = interp(acc)
    z_x = poly_add(poly_mul([b_[8], b_[7], b_[6]], zh), acc_x)

    e0 = [1] + [0] * (n - 1)
    l1 = interp(e0)
    qm_x, ql_x, qr_x, qo_x, qc_x = (interp(q) for q in
                                    (q_m, q_l, q_r, q_o, q_c))
    s1x, s2x, s3x = s1, s2, s3

    t1 = poly_add(poly_add(poly_mul(poly_mul(a_x, b_x), qm_x),
                           poly_mul(a_x, ql_x)),
                  poly_add(poly_mul(b_x, qr_x), poly_mul(c_x, qo_x)))
    t1 = poly_add(t1, qc_x)
    t2 = poly_mul(poly_mul(poly_mul(
        poly_scale(poly_add(a_x, [gamma, beta]), alpha),
        poly_add(b_x, [gamma, beta * k1 % p])),
        poly_add(c_x, [gamma, beta * k2 % p])), z_x)
    zwx = [cf * pow(omega, i, p) % p for i, cf in enumerate(z_x)]
    t3 = poly_mul(poly_mul(poly_mul(
        poly_scale(poly_add(poly_scale(s1x, beta), poly_add(a_x, [gamma])),
                   alpha),
        poly_add(poly_scale(s2x, beta), poly_add(b_x, [gamma]))),
        poly_add(poly_scale(s3x, beta), poly_add(c_x, [gamma]))), zwx)
    t4 = poly_mul(poly_scale(poly_add(z_x, [p - 1]), alpha * alpha % p), l1)
    t_num = poly_add(poly_add(t1, t2), t4)
    t_num = [(t_num[i] - (t3[i] if i < len(t3) else 0)) % p
             for i in range(max(len(t_num), len(t3)))]
    # long division by zh
    rem = list(t_num)
    quot = [0] * (len(rem) - n)
    for i in range(len(rem) - 1, n - 1, -1):
        cf = rem[i]
        quot[i - n] = cf
        rem[i] = 0
        rem[i - n] = (rem[i - n] + cf) % p
    assert all(x == 0 for x in rem[:n]), "mini prover: t division"
    t_x = quot

    a_z, b_z, c_z = peval(a_x, z), peval(b_x, z), peval(c_x, z)
    s1_z, s2_z = peval(s1x, z), peval(s2x, z)
    zw_z = peval(zwx, z)
    # standard linearization
    r_x = poly_scale(qm_x, a_z * b_z % p)
    r_x = poly_add(r_x, poly_scale(ql_x, a_z))
    r_x = poly_add(r_x, poly_scale(qr_x, b_z))
    r_x = poly_add(r_x, poly_scale(qo_x, c_z))
    r_x = poly_add(r_x, qc_x)
    azg = (a_z + beta * z + gamma) % p
    bzg = (b_z + beta * k1 * z + gamma) % p
    czg = (c_z + beta * k2 * z + gamma) % p
    r_x = poly_add(r_x, poly_scale(z_x, azg * bzg % p * czg % p * alpha % p))
    as1z = (a_z + beta * s1_z + gamma) % p
    bs2z = (b_z + beta * s2_z + gamma) % p
    coef = as1z * bs2z % p * alpha % p * beta % p * zw_z % p
    r_x = [(r_x[i] - (poly_scale(s3x, coef)[i] if i < n else 0)) % p
           for i in range(len(r_x))]
    r_x = poly_add(r_x, poly_scale(z_x, peval(l1, z) * alpha % p * alpha % p))
    r_z = peval(r_x, z)
    return dict(a_z=a_z, b_z=b_z, c_z=c_z, s_sigma_1_z=s1_z,
                s_sigma_2_z=s2_z, r_z=r_z, z_omega_z=zw_z,
                _t_z=peval(t_x, z))


@pytest.fixture(scope="module")
def small_setup():
    n = 8
    ctx = PS.scaled_new(n, secret=987654321)
    selectors, copies, a, b, c = square_chain_circuit(R, n, x0=5)
    sel_j, cp_j = jnp.asarray(selectors), jnp.asarray(copies)
    raw = jax.jit(lambda aw, bw, cw, ch, rnd: PS.prove_scaled(
        ctx, sel_j, cp_j, aw, bw, cw, ch, rnd))
    fn = lambda ch, rnd: raw(jnp.asarray(a), jnp.asarray(b), jnp.asarray(c),
                             ch, rnd)
    proof, diags = fn(jnp.asarray(CH), jnp.asarray(RND))
    return ctx, selectors, copies, (a, b, c), proof, diags, fn, raw


def test_scaled_diags(small_setup):
    _, _, _, _, proof, diags, _, _ = small_setup
    assert bool(diags.satisfied)
    assert bool(diags.t_tail_zero)
    assert bool(diags.w_z_rem_zero)
    assert bool(diags.w_zw_rem_zero)


def test_scaled_evals_match_mini_reference(small_setup):
    """Every scalar in the proof matches an independent python-int
    implementation (Lagrange + schoolbook + long division)."""
    ctx, selectors, copies, wit, proof, diags, _, _ = small_setup
    a, b, c = wit
    expected = _mini_reference_prover(8, selectors, copies, a, b, c, CH, RND)
    for k, val in expected.items():
        if k.startswith("_"):
            continue
        assert int(getattr(proof, k)) == val, k


def test_scaled_prove_verify_roundtrip(small_setup):
    ctx, selectors, copies, wit, proof, diags, fn, _ = small_setup
    vk = PS.make_vk_scaled(ctx, selectors, copies)
    assert PS.verify_scaled(ctx, vk, proof, CH)
    # tampered evaluation rejected
    bad = proof._replace(a_z=jnp.uint32((int(proof.a_z) + 1) % R))
    assert not PS.verify_scaled(ctx, vk, bad, CH)
    # tampered commitment rejected
    bad2 = proof._replace(w_z_s=C.g1_double(Fq, proof.w_z_s))
    assert not PS.verify_scaled(ctx, vk, bad2, CH)
    # different challenge -> different valid proof
    ch2 = np.array([777, 888, 999, 1234, 4321], dtype=np.uint32)
    proof2, diags2 = fn(jnp.asarray(ch2), jnp.asarray(RND))
    assert bool(diags2.all_ok())
    assert PS.verify_scaled(ctx, vk, proof2, ch2)
    assert not PS.verify_scaled(ctx, vk, proof2, CH)


def test_scaled_bad_witness_rejected(small_setup):
    ctx, selectors, copies, wit, _, _, _, raw = small_setup
    a, b, c = wit
    c = c.copy()
    c[3] = (c[3] + 1) % R
    _, diags = raw(jnp.asarray(a), jnp.asarray(b), jnp.asarray(c),
                   jnp.asarray(CH), jnp.asarray(RND))
    assert not bool(diags.satisfied)


def test_scaled_larger_domain():
    """n = 64: exercises real NTT sizes end to end."""
    n = 64
    ctx = PS.scaled_new(n, secret=24680)
    selectors, copies, a, b, c = square_chain_circuit(R, n, x0=7)
    fn = jax.jit(lambda ch, rnd: PS.prove_scaled(
        ctx, jnp.asarray(selectors), jnp.asarray(copies), jnp.asarray(a),
        jnp.asarray(b), jnp.asarray(c), ch, rnd))
    proof, diags = fn(jnp.asarray(CH), jnp.asarray(RND))
    assert bool(diags.all_ok())
    vk = PS.make_vk_scaled(ctx, selectors, copies)
    assert PS.verify_scaled(ctx, vk, proof, CH)


def test_verify_many_batched(small_setup):
    """Batched verification (shared final exponentiation): all lanes of a
    valid batch accept; a tampered lane rejects ONLY that lane."""
    ctx, selectors, copies, wit, proof, _, fn, _ = small_setup
    vk = PS.make_vk_scaled(ctx, selectors, copies)
    chs = np.stack([CH,
                    np.array([777, 888, 999, 1234, 4321], dtype=np.uint32),
                    np.array([12, 34, 56, 78, 90], dtype=np.uint32)])
    proofs = []
    for i in range(3):
        p, d = fn(jnp.asarray(chs[i]), jnp.asarray(RND))
        assert bool(d.all_ok())
        proofs.append(p)
    batch = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *proofs)
    ok = PS.verify_scaled_many(ctx, vk, batch, chs)
    assert ok.shape == (3,) and bool(jnp.all(ok))
    # tamper lane 1 only
    bad = batch._replace(a_z=batch.a_z.at[1].set((batch.a_z[1] + 1) % R))
    ok2 = PS.verify_scaled_many(ctx, vk, bad, chs)
    assert list(np.asarray(ok2)) == [True, False, True]
    # single-proof path still agrees with the batched path
    assert PS.verify_scaled(ctx, vk, proofs[0], chs[0])


def test_public_inputs_prove_verify():
    """PI(x) as a first-class vector (the reference hardcodes PI = 0,
    src/plonk.h:396-398): row 0 becomes a public-input binding
    q_l*a + PI = 0; the verifier must receive the same PI values."""
    n = 8
    ctx = PS.scaled_new(n, secret=111222333)
    selectors, copies, a, b, c = square_chain_circuit(R, n, x0=5)
    sel = np.array(selectors, dtype=np.uint32).copy()
    # row 0: bind a[0] publicly: q_l = 1, everything else 0
    sel[:, 0] = 0
    sel[0, 0] = 1
    pi = np.zeros(n, dtype=np.uint32)
    pi[0] = (R - int(a[0])) % R        # PI_0 = -a_0
    prover = PS.make_prover(ctx, sel, copies)
    proof, diags = prover(a, b, c, CH, RND, public_inputs=pi)
    assert bool(diags.all_ok())
    vk = PS.make_vk_scaled(ctx, sel, copies)
    assert PS.verify_scaled(ctx, vk, proof, CH, public_inputs=pi)
    # wrong public input -> reject
    pi_bad = pi.copy()
    pi_bad[0] = (int(pi[0]) + 1) % R
    assert not PS.verify_scaled(ctx, vk, proof, CH, public_inputs=pi_bad)
    # prover with PI inconsistent with witness -> witness check trips
    _, dbad = prover(a, b, c, CH, RND, public_inputs=pi_bad)
    assert not bool(dbad.satisfied)
    # FS path with public inputs
    from plonk_tpu.models import fiat_shamir as FS
    fsp = FS.ScaledFsProver(ctx, sel, copies)
    out, fdiags = fsp.prove(a, b, c, RND, public_inputs=pi)
    assert bool(fdiags.all_ok())
    assert FS.verify_scaled_fs(ctx, fsp.vk, out, public_inputs=pi)
    assert not FS.verify_scaled_fs(ctx, fsp.vk, out, public_inputs=pi_bad)


def test_checked_prover_lane():
    """checkify lane: accepts a valid instance, raises on out-of-bounds
    copy indices and on an unsatisfied witness (the reference aborts the
    process at asserts; here the violations surface as checked errors)."""
    from jax.experimental import checkify
    n = 8
    ctx = PS.scaled_new(n, secret=445566)
    selectors, copies, a, b, c = square_chain_circuit(R, n, x0=4)
    proof, diags = PS.prove_scaled_checked(ctx, selectors, copies, a, b, c,
                                           CH, RND)
    assert bool(diags.all_ok())
    bad_copies = np.array(copies).copy()
    bad_copies[0, 3, 1] = n + 7          # 1-based index out of range
    with pytest.raises(Exception, match="copy index out of range"):
        PS.prove_scaled_checked(ctx, selectors, bad_copies, a, b, c, CH,
                                RND)
    a_bad = np.array(a, dtype=np.uint32).copy()
    a_bad[1] ^= 1
    with pytest.raises(Exception, match="witness does not satisfy"):
        PS.prove_scaled_checked(ctx, selectors, copies, a_bad, b, c, CH,
                                RND)


def test_fb_table_cache_keyed_by_layout(monkeypatch, tmp_path):
    """Flipping PLONK_TPU_PALLAS_MSM on a LIVE ctx must serve each commit
    path a table in ITS layout (VERDICT r3 weak 5: a single unkeyed cache
    slot aliased the two layouts). Both paths must agree with each other
    on the commitment values."""
    from plonk_tpu.ops import fixed_base as FB
    from plonk_tpu.ops.pallas_msm import msm_fixed_base_many_pallas
    monkeypatch.setenv("PLONK_TPU_CACHE", str(tmp_path))  # no disk reuse
    n = 16
    ctx = PS.scaled_new(n, secret=556677)
    L = ctx.srs.length
    rng = np.random.default_rng(3)
    sc = jnp.asarray(rng.integers(0, R, size=(4, L), dtype=np.uint32))

    monkeypatch.setenv("PLONK_TPU_PALLAS_MSM", "0")
    tbl_sel = PS.fixed_base_table(ctx)
    out_sel = FB.msm_fixed_base_many(ctx.Fq, tbl_sel, sc, mode="select")

    monkeypatch.setenv("PLONK_TPU_PALLAS_MSM", "1")
    tbl_pal = PS.fixed_base_table(ctx)      # same live ctx, flipped env
    # the Pallas layout pads the window axis to a power of two
    assert tbl_pal.x.shape[0] & (tbl_pal.x.shape[0] - 1) == 0
    assert tbl_pal.x.shape != tbl_sel.x.shape, \
        "cache served the select-layout table to the Pallas path"
    out_pal = msm_fixed_base_many_pallas(ctx.Fq, tbl_pal, sc,
                                         interpret=True)
    assert np.array_equal(np.asarray(out_pal.x), np.asarray(out_sel.x))
    assert np.array_equal(np.asarray(out_pal.y), np.asarray(out_sel.y))
    assert np.array_equal(np.asarray(out_pal.inf), np.asarray(out_sel.inf))

    # flipping BACK must return the original-layout table, not rebuild
    monkeypatch.setenv("PLONK_TPU_PALLAS_MSM", "0")
    tbl_sel2 = PS.fixed_base_table(ctx)
    assert tbl_sel2.x.shape == tbl_sel.x.shape
