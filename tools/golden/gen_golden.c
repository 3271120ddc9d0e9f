/*
 * Golden-vector extraction harness.
 *
 * This is NOT reference code: it is an instrumentation driver written for the
 * tpu-plonk project. It #includes the read-only reference headers
 * (/root/reference/src, passed via -I) and re-runs the canonical
 * plonk-test.c scenario (reference plonk-test.c:123-281), dumping every
 * intermediate value of the 5-round prover as JSON so the JAX implementation
 * can be tested stage-by-stage for bit-exact parity.
 *
 * Because plonk_prove (reference plonk.h:223-656) is one monolithic function
 * that frees its intermediates, we re-derive each intermediate here using the
 * reference's own public helpers (poly_mul, interpolate_at_h, srs_eval_at_s,
 * ...) in exactly the order the prover does, and also call plonk_prove itself
 * to capture the final PROOF struct.
 */
#include <assert.h>
#include <stdio.h>
#include "plonk.h"
#include "pairing.h"

static void j_poly(FILE *f, const char *name, const POLY *p, int comma) {
  fprintf(f, "  \"%s\": [", name);
  for (size_t i = 0; i < p->len; i++)
    fprintf(f, "%u%s", p->coeffs[i].value, i + 1 < p->len ? ", " : "");
  fprintf(f, "]%s\n", comma ? "," : "");
}

static void j_hf_arr(FILE *f, const char *name, const HF *v, size_t n, int comma) {
  fprintf(f, "  \"%s\": [", name);
  for (size_t i = 0; i < n; i++)
    fprintf(f, "%u%s", v[i].value, i + 1 < n ? ", " : "");
  fprintf(f, "]%s\n", comma ? "," : "");
}

static void j_g1(FILE *f, const char *name, G1 p, int comma) {
  fprintf(f, "  \"%s\": {\"x\": %u, \"y\": %u, \"inf\": %s}%s\n",
          name, p.x.value, p.y.value, p.infinite ? "true" : "false",
          comma ? "," : "");
}

static void j_matrix(FILE *f, const char *name, const MATRIX *m, int comma) {
  fprintf(f, "  \"%s\": [", name);
  for (size_t r = 0; r < m->m; r++) {
    fprintf(f, "[");
    for (size_t c = 0; c < m->n; c++)
      fprintf(f, "%u%s", matrix_get(m, r, c).value, c + 1 < m->n ? ", " : "");
    fprintf(f, "]%s", r + 1 < m->m ? ", " : "");
  }
  fprintf(f, "]%s\n", comma ? "," : "");
}

int main(void) {
  FILE *f = fopen("plonk_golden.json", "w");
  assert(f);

  /* --- canonical scenario: reference plonk-test.c:123-267 --- */
  GF secret = f101(2);
  size_t n_srs = 6;
  size_t h_len = 4;
  SRS srs = srs_create(secret, n_srs);
  PLONK plonk = plonk_new(srs, h_len);

  CONSTRAINTS cons;
  cons.num_constraints = h_len;
  cons.num_gates = h_len;
  cons.q_m = malloc(4 * sizeof(HF)); cons.q_l = malloc(4 * sizeof(HF));
  cons.q_r = malloc(4 * sizeof(HF)); cons.q_o = malloc(4 * sizeof(HF));
  cons.q_c = malloc(4 * sizeof(HF));
  for (int i = 0; i < 3; i++) {           /* 3 mul gates */
    cons.q_m[i] = hf_one();  cons.q_l[i] = hf_zero();
    cons.q_r[i] = hf_zero(); cons.q_o[i] = hf_neg(hf_one());
    cons.q_c[i] = hf_zero();
  }
  cons.q_m[3] = hf_zero(); cons.q_l[3] = hf_one();   /* 1 sum gate */
  cons.q_r[3] = hf_one();  cons.q_o[3] = hf_neg(hf_one());
  cons.q_c[3] = hf_zero();

  cons.c_a = malloc(4 * sizeof(COPY_OF));
  cons.c_b = malloc(4 * sizeof(COPY_OF));
  cons.c_c = malloc(4 * sizeof(COPY_OF));
  cons.c_a[0] = (COPY_OF){COPYOF_B, 1}; cons.c_a[1] = (COPY_OF){COPYOF_B, 2};
  cons.c_a[2] = (COPY_OF){COPYOF_B, 3}; cons.c_a[3] = (COPY_OF){COPYOF_C, 1};
  cons.c_b[0] = (COPY_OF){COPYOF_A, 1}; cons.c_b[1] = (COPY_OF){COPYOF_A, 2};
  cons.c_b[2] = (COPY_OF){COPYOF_A, 3}; cons.c_b[3] = (COPY_OF){COPYOF_C, 2};
  cons.c_c[0] = (COPY_OF){COPYOF_A, 4}; cons.c_c[1] = (COPY_OF){COPYOF_B, 4};
  cons.c_c[2] = (COPY_OF){COPYOF_C, 4}; cons.c_c[3] = (COPY_OF){COPYOF_C, 3};

  ASSIGNMENTS asg;
  asg.len = 4;
  asg.a = malloc(4 * sizeof(HF)); asg.b = malloc(4 * sizeof(HF));
  asg.c = malloc(4 * sizeof(HF));
  asg.a[0] = hf_new(3); asg.b[0] = hf_new(3);  asg.c[0] = hf_new(9);
  asg.a[1] = hf_new(4); asg.b[1] = hf_new(4);  asg.c[1] = hf_new(16);
  asg.a[2] = hf_new(5); asg.b[2] = hf_new(5);  asg.c[2] = hf_new(25);
  asg.a[3] = hf_new(9); asg.b[3] = hf_new(16); asg.c[3] = hf_new(25);

  HF rnd[9] = {hf_new(7), hf_new(4), hf_new(11), hf_new(12), hf_new(16),
               hf_new(2), hf_new(14), hf_new(11), hf_new(7)};
  CHALLENGE ch = {.alpha = hf_new(15), .beta = hf_new(12),
                  .gamma = hf_new(13), .z = hf_new(5), .v = hf_new(12)};

  fprintf(f, "{\n");

  /* --- precomputation fixtures (plonk_new, plonk.h:53-119) --- */
  j_hf_arr(f, "h", plonk.h, h_len, 1);
  j_hf_arr(f, "k1_h", plonk.k1_h, h_len, 1);
  j_hf_arr(f, "k2_h", plonk.k2_h, h_len, 1);
  j_matrix(f, "h_pows_inv", &plonk.h_pows_inv, 1);
  j_poly(f, "z_h_x", &plonk.z_h_x, 1);

  /* --- SRS (degenerate, srs.h:18-43) --- */
  fprintf(f, "  \"srs_g1s\": [");
  for (size_t i = 0; i < srs.len; i++)
    fprintf(f, "{\"x\": %u, \"y\": %u, \"inf\": %s}%s",
            srs.g1s[i].x.value, srs.g1s[i].y.value,
            srs.g1s[i].infinite ? "true" : "false",
            i + 1 < srs.len ? ", " : "");
  fprintf(f, "],\n");
  fprintf(f, "  \"srs_g2_1\": {\"x\": %u, \"y\": %u},\n", srs.g2_1.x.value, srs.g2_1.y.value);
  fprintf(f, "  \"srs_g2_s\": {\"x\": %u, \"y\": %u},\n", srs.g2_s.x.value, srs.g2_s.y.value);

  /* --- sigma mappings (plonk.h:142-160) --- */
  size_t n = cons.num_constraints;
  HF sg1[4], sg2[4], sg3[4];
  copy_constraints_to_roots(&plonk, cons.c_a, n, sg1);
  copy_constraints_to_roots(&plonk, cons.c_b, n, sg2);
  copy_constraints_to_roots(&plonk, cons.c_c, n, sg3);
  j_hf_arr(f, "sigma_1", sg1, n, 1);
  j_hf_arr(f, "sigma_2", sg2, n, 1);
  j_hf_arr(f, "sigma_3", sg3, n, 1);

  /* --- the 11 interpolations (plonk.h:265-275) --- */
  POLY f_a_x = interpolate_at_h(&plonk, asg.a, h_len);
  POLY f_b_x = interpolate_at_h(&plonk, asg.b, h_len);
  POLY f_c_x = interpolate_at_h(&plonk, asg.c, h_len);
  POLY q_o_x = interpolate_at_h(&plonk, cons.q_o, h_len);
  POLY q_m_x = interpolate_at_h(&plonk, cons.q_m, h_len);
  POLY q_l_x = interpolate_at_h(&plonk, cons.q_l, h_len);
  POLY q_r_x = interpolate_at_h(&plonk, cons.q_r, h_len);
  POLY q_c_x = interpolate_at_h(&plonk, cons.q_c, h_len);
  POLY s1 = interpolate_at_h(&plonk, sg1, h_len);
  POLY s2 = interpolate_at_h(&plonk, sg2, h_len);
  POLY s3 = interpolate_at_h(&plonk, sg3, h_len);
  j_poly(f, "f_a_x", &f_a_x, 1); j_poly(f, "f_b_x", &f_b_x, 1);
  j_poly(f, "f_c_x", &f_c_x, 1);
  j_poly(f, "q_o_x", &q_o_x, 1); j_poly(f, "q_m_x", &q_m_x, 1);
  j_poly(f, "q_l_x", &q_l_x, 1); j_poly(f, "q_r_x", &q_r_x, 1);
  j_poly(f, "q_c_x", &q_c_x, 1);
  j_poly(f, "s_sigma_1", &s1, 1); j_poly(f, "s_sigma_2", &s2, 1);
  j_poly(f, "s_sigma_3", &s3, 1);

  /* --- round 1: blinded wire polys (plonk.h:279-301) --- */
  HF ab[] = {rnd[1], rnd[0]}; POLY abp = poly_new(ab, 2);
  POLY axb = poly_mul(&abp, &plonk.z_h_x); POLY a_x = poly_add(&axb, &f_a_x);
  HF bb[] = {rnd[3], rnd[2]}; POLY bbp = poly_new(bb, 2);
  POLY bxb = poly_mul(&bbp, &plonk.z_h_x); POLY b_x = poly_add(&bxb, &f_b_x);
  HF cb[] = {rnd[5], rnd[4]}; POLY cbp = poly_new(cb, 2);
  POLY cxb = poly_mul(&cbp, &plonk.z_h_x); POLY c_x = poly_add(&cxb, &f_c_x);
  j_poly(f, "a_x", &a_x, 1); j_poly(f, "b_x", &b_x, 1); j_poly(f, "c_x", &c_x, 1);

  /* --- round 2: accumulator (plonk.h:320-379) --- */
  HF omega = hf_new(OMEGA_VALUE), k1 = hf_new(K1_VALUE), k2 = hf_new(K2_VALUE);
  HF acc[4];
  acc[0] = hf_one();
  for (size_t i = 1; i < n; i++) {
    HF aa = asg.a[i-1], ab_ = asg.b[i-1], ac = asg.c[i-1];
    HF w = hf_pow(omega, i - 1);
    HF denom = hf_mul(hf_mul(
        hf_add(aa, hf_add(hf_mul(ch.beta, w), ch.gamma)),
        hf_add(ab_, hf_add(hf_mul(ch.beta, hf_mul(k1, w)), ch.gamma))),
        hf_add(ac, hf_add(hf_mul(ch.beta, hf_mul(k2, w)), ch.gamma)));
    HF e1 = poly_eval(&s1, w), e2 = poly_eval(&s2, w), e3 = poly_eval(&s3, w);
    HF numer = hf_mul(hf_mul(
        hf_add(aa, hf_add(hf_mul(ch.beta, e1), ch.gamma)),
        hf_add(ab_, hf_add(hf_mul(ch.beta, e2), ch.gamma))),
        hf_add(ac, hf_add(hf_mul(ch.beta, e3), ch.gamma)));
    acc[i] = hf_mul(acc[i-1], hf_div(denom, numer));
  }
  j_hf_arr(f, "acc", acc, n, 1);
  POLY acc_x = interpolate_at_h(&plonk, acc, h_len);
  j_poly(f, "acc_x", &acc_x, 1);
  HF zb[] = {rnd[8], rnd[7], rnd[6]}; POLY zbp = poly_new(zb, 3);
  POLY zxb = poly_mul(&zbp, &plonk.z_h_x); POLY z_x = poly_add(&zxb, &acc_x);
  j_poly(f, "z_x", &z_x, 1);

  /* --- round 3: quotient (plonk.h:385-524) --- */
  HF lv[4] = {hf_one(), hf_zero(), hf_zero(), hf_zero()};
  POLY l_1_x = interpolate_at_h(&plonk, lv, h_len);
  j_poly(f, "l_1_x", &l_1_x, 1);

  POLY p_i_x = poly_zero();
  POLY axbx = poly_mul(&a_x, &b_x);
  POLY t1 = poly_mul(&axbx, &q_m_x);
  POLY aql = poly_mul(&a_x, &q_l_x);
  POLY bqr = poly_mul(&b_x, &q_r_x);
  POLY cqo = poly_mul(&c_x, &q_o_x);
  POLY s1_ = poly_add(&t1, &aql);
  POLY s2_ = poly_add(&bqr, &cqo);
  POLY t_1_z_h = poly_add(&s1_, &s2_);
  t_1_z_h = poly_add(&t_1_z_h, &p_i_x);
  t_1_z_h = poly_add(&t_1_z_h, &q_c_x);
  j_poly(f, "t_1_z_h", &t_1_z_h, 1);

  HF bg[] = {ch.gamma, ch.beta}; POLY bgp = poly_new(bg, 2);
  POLY axg = poly_add(&a_x, &bgp);
  POLY aaxg = poly_scale(&axg, ch.alpha);
  HF bk1[] = {ch.gamma, hf_mul(ch.beta, k1)}; POLY bk1p = poly_new(bk1, 2);
  POLY bxg = poly_add(&b_x, &bk1p);
  HF bk2[] = {ch.gamma, hf_mul(ch.beta, k2)}; POLY bk2p = poly_new(bk2, 2);
  POLY cxg = poly_add(&c_x, &bk2p);
  POLY t_2_z_h = poly_mul(&aaxg, &bxg);
  t_2_z_h = poly_mul(&t_2_z_h, &cxg);
  t_2_z_h = poly_mul(&t_2_z_h, &z_x);
  j_poly(f, "t_2_z_h", &t_2_z_h, 1);

  POLY bs1 = poly_scale(&s1, ch.beta);
  POLY as1 = poly_add(&a_x, &bs1);
  POLY as1g = poly_add_hf(&as1, ch.gamma);
  POLY aas1g = poly_scale(&as1g, ch.alpha);
  POLY bs2 = poly_scale(&s2, ch.beta);
  POLY bs2x = poly_add(&b_x, &bs2);
  POLY bs2g = poly_add_hf(&bs2x, ch.gamma);
  POLY bs3 = poly_scale(&s3, ch.beta);
  POLY cs3 = poly_add(&c_x, &bs3);
  POLY cs3g = poly_add_hf(&cs3, ch.gamma);
  HF *zw = malloc(z_x.len * sizeof(HF));
  for (size_t i = 0; i < z_x.len; i++) zw[i] = hf_mul(z_x.coeffs[i], hf_pow(omega, i));
  POLY z_omega_x = poly_new(zw, z_x.len);
  j_poly(f, "z_omega_x", &z_omega_x, 1);
  POLY t_3_z_h = poly_mul(&aas1g, &bs2g);
  t_3_z_h = poly_mul(&t_3_z_h, &cs3g);
  t_3_z_h = poly_mul(&t_3_z_h, &z_omega_x);
  j_poly(f, "t_3_z_h", &t_3_z_h, 1);

  HF no[1] = {hf_neg(hf_one())}; POLY m1 = poly_new(no, 1);
  POLY zx1 = poly_add(&z_x, &m1);
  POLY a2z = poly_scale(&zx1, hf_pow(ch.alpha, 2));
  POLY t_4_z_h = poly_mul(&a2z, &l_1_x);
  j_poly(f, "t_4_z_h", &t_4_z_h, 1);

  POLY t_num = poly_add(&t_1_z_h, &t_2_z_h);
  t_num = poly_sub(&t_num, &t_3_z_h);
  t_num = poly_add(&t_num, &t_4_z_h);
  j_poly(f, "t_x_numer", &t_num, 1);

  POLY t_x, rem;
  poly_divide(&t_num, &plonk.z_h_x, &t_x, &rem);
  assert(poly_is_zero(&rem));
  j_poly(f, "t_x", &t_x, 1);

  size_t part = n + 2;
  POLY t_lo = poly_slice(&t_x, 0, part);
  POLY t_mid = poly_slice(&t_x, part, 2 * part);
  POLY t_hi = poly_slice(&t_x, 2 * part, t_x.len);
  j_poly(f, "t_lo_x", &t_lo, 1); j_poly(f, "t_mid_x", &t_mid, 1);
  j_poly(f, "t_hi_x", &t_hi, 1);

  /* --- round 4: evals + linearization (plonk.h:527-574) --- */
  HF a_z = poly_eval(&a_x, ch.z), b_z = poly_eval(&b_x, ch.z), c_z = poly_eval(&c_x, ch.z);
  HF s1z = poly_eval(&s1, ch.z), s2z = poly_eval(&s2, ch.z);
  HF t_z = poly_eval(&t_x, ch.z);
  HF zwz = poly_eval(&z_omega_x, ch.z);
  fprintf(f, "  \"t_z\": %u,\n", t_z.value);

  POLY r1 = poly_scale(&q_m_x, hf_mul(a_z, b_z));
  POLY aql2 = poly_scale(&q_l_x, a_z);
  POLY bqr2 = poly_scale(&q_r_x, b_z);
  POLY cqo2 = poly_scale(&q_o_x, c_z);
  POLY r_x = poly_add(&r1, &aql2);
  r_x = poly_add(&r_x, &bqr2);
  r_x = poly_add(&r_x, &cqo2);
  HF azg = hf_add(hf_add(a_z, hf_mul(ch.beta, ch.z)), ch.gamma);
  HF bzg = hf_add(hf_add(b_z, hf_mul(hf_mul(ch.beta, k1), ch.z)), ch.gamma);
  HF czg = hf_add(hf_add(c_z, hf_mul(hf_mul(ch.beta, k2), ch.z)), ch.gamma);
  POLY r2 = poly_scale(&z_x, hf_mul(hf_mul(hf_mul(azg, bzg), czg), ch.alpha));
  r_x = poly_add(&r_x, &r2);
  POLY s3bz = poly_scale(&s3, hf_mul(ch.beta, zwz));
  HF as1z = hf_add(a_z, hf_add(hf_mul(ch.beta, s1z), ch.gamma));
  HF bs2z = hf_add(b_z, hf_add(hf_mul(ch.beta, s2z), ch.gamma));
  POLY r3 = poly_mul(&z_x, &s3bz);
  r3 = poly_scale(&r3, hf_mul(hf_mul(as1z, bs2z), ch.alpha));
  r_x = poly_add(&r_x, &r3);
  POLY r4 = poly_scale(&z_x, hf_mul(poly_eval(&l_1_x, ch.z), hf_pow(ch.alpha, 2)));
  r_x = poly_add(&r_x, &r4);
  j_poly(f, "r_x", &r_x, 1);
  HF r_z = poly_eval(&r_x, ch.z);

  /* --- round 5: opening quotients (plonk.h:576-621) --- */
  POLY tmz = poly_scale(&t_mid, hf_pow(ch.z, n + 2));
  POLY thz = poly_scale(&t_hi, hf_pow(ch.z, 2 * n + 4));
  POLY w_z_x = poly_add(&t_lo, &tmz);
  w_z_x = poly_add(&w_z_x, &thz);
  w_z_x = poly_add_hf(&w_z_x, hf_neg(t_z));
  POLY rv = poly_add_hf(&r_x, hf_neg(r_z)); rv = poly_scale(&rv, ch.v);
  POLY av = poly_add_hf(&a_x, hf_neg(a_z)); av = poly_scale(&av, hf_pow(ch.v, 2));
  POLY bv = poly_add_hf(&b_x, hf_neg(b_z)); bv = poly_scale(&bv, hf_pow(ch.v, 3));
  POLY cv = poly_add_hf(&c_x, hf_neg(c_z)); cv = poly_scale(&cv, hf_pow(ch.v, 4));
  POLY s1v = poly_add_hf(&s1, hf_neg(s1z)); s1v = poly_scale(&s1v, hf_pow(ch.v, 5));
  POLY s2v = poly_add_hf(&s2, hf_neg(s2z)); s2v = poly_scale(&s2v, hf_pow(ch.v, 6));
  w_z_x = poly_add(&w_z_x, &rv);
  w_z_x = poly_add(&w_z_x, &av);
  w_z_x = poly_add(&w_z_x, &bv);
  w_z_x = poly_add(&w_z_x, &cv);
  w_z_x = poly_add(&w_z_x, &s1v);
  w_z_x = poly_add(&w_z_x, &s2v);
  j_poly(f, "w_z_x_combined", &w_z_x, 1);

  HF d1[] = {hf_neg(ch.z), hf_one()}; POLY den1 = poly_new(d1, 2);
  POLY wq, rem1; poly_divide(&w_z_x, &den1, &wq, &rem1);
  assert(poly_is_zero(&rem1));
  j_poly(f, "w_z_x_quo", &wq, 1);
  POLY zxz = poly_add_hf(&z_x, hf_neg(zwz));
  HF d2[] = {hf_mul(hf_neg(ch.z), omega), hf_one()}; POLY den2 = poly_new(d2, 2);
  POLY wqw, rem2; poly_divide(&zxz, &den2, &wqw, &rem2);
  assert(poly_is_zero(&rem2));
  j_poly(f, "w_z_omega_x", &wqw, 1);

  /* --- the actual PROOF from the reference prover --- */
  PROOF pf = plonk_prove(&plonk, &cons, &asg, &ch, rnd);
  fprintf(f, "  \"proof\": {\n");
  fprintf(f, "    \"a_s\": {\"x\": %u, \"y\": %u, \"inf\": %s},\n", pf.a_s.x.value, pf.a_s.y.value, pf.a_s.infinite ? "true" : "false");
  fprintf(f, "    \"b_s\": {\"x\": %u, \"y\": %u, \"inf\": %s},\n", pf.b_s.x.value, pf.b_s.y.value, pf.b_s.infinite ? "true" : "false");
  fprintf(f, "    \"c_s\": {\"x\": %u, \"y\": %u, \"inf\": %s},\n", pf.c_s.x.value, pf.c_s.y.value, pf.c_s.infinite ? "true" : "false");
  fprintf(f, "    \"z_s\": {\"x\": %u, \"y\": %u, \"inf\": %s},\n", pf.z_s.x.value, pf.z_s.y.value, pf.z_s.infinite ? "true" : "false");
  fprintf(f, "    \"t_lo_s\": {\"x\": %u, \"y\": %u, \"inf\": %s},\n", pf.t_lo_s.x.value, pf.t_lo_s.y.value, pf.t_lo_s.infinite ? "true" : "false");
  fprintf(f, "    \"t_mid_s\": {\"x\": %u, \"y\": %u, \"inf\": %s},\n", pf.t_mid_s.x.value, pf.t_mid_s.y.value, pf.t_mid_s.infinite ? "true" : "false");
  fprintf(f, "    \"t_hi_s\": {\"x\": %u, \"y\": %u, \"inf\": %s},\n", pf.t_hi_s.x.value, pf.t_hi_s.y.value, pf.t_hi_s.infinite ? "true" : "false");
  fprintf(f, "    \"w_z_s\": {\"x\": %u, \"y\": %u, \"inf\": %s},\n", pf.w_z_s.x.value, pf.w_z_s.y.value, pf.w_z_s.infinite ? "true" : "false");
  fprintf(f, "    \"w_z_omega_s\": {\"x\": %u, \"y\": %u, \"inf\": %s},\n", pf.w_z_omega_s.x.value, pf.w_z_omega_s.y.value, pf.w_z_omega_s.infinite ? "true" : "false");
  fprintf(f, "    \"a_z\": %u, \"b_z\": %u, \"c_z\": %u,\n", pf.a_z.value, pf.b_z.value, pf.c_z.value);
  fprintf(f, "    \"s_sigma_1_z\": %u, \"s_sigma_2_z\": %u,\n", pf.s_sigma_1_z.value, pf.s_sigma_2_z.value);
  fprintf(f, "    \"r_z\": %u, \"z_omega_z\": %u\n", pf.r_z.value, pf.z_omega_z.value);
  fprintf(f, "  },\n");

  /* sanity: our re-derived values match the proof's scalar tail */
  assert(hf_equal(a_z, pf.a_z) && hf_equal(b_z, pf.b_z) && hf_equal(c_z, pf.c_z));
  assert(hf_equal(s1z, pf.s_sigma_1_z) && hf_equal(s2z, pf.s_sigma_2_z));
  assert(hf_equal(r_z, pf.r_z) && hf_equal(zwz, pf.z_omega_z));

  /* --- pairing vectors (pairing-test.c style, plus extras) --- */
  G1 g1g = g1_generator();
  G2 g2g = g2_generator();
  GTP e_gg = pairing(&g1g, &g2g);
  fprintf(f, "  \"pairing_g1_g2\": [%u, %u],\n", e_gg.a.value, e_gg.b.value);
  G1 p2 = g1_mul(&g1g, 2);
  GTP e_2g_g = pairing(&p2, &g2g);
  fprintf(f, "  \"pairing_2g1_g2\": [%u, %u],\n", e_2g_g.a.value, e_2g_g.b.value);
  G2 q2 = g2_mul(g2g, 2);
  GTP e_g_2g = pairing(&g1g, &q2);
  fprintf(f, "  \"pairing_g1_2g2\": [%u, %u],\n", e_g_2g.a.value, e_g_2g.b.value);
  /* miller loop value before final exponentiation */
  GTP ml = pairing_f(17, &g1g, &g2g);
  fprintf(f, "  \"miller_g1_g2\": [%u, %u],\n", ml.a.value, ml.b.value);

  /* --- g1 full subgroup table: i*G for i = 0..17 --- */
  fprintf(f, "  \"g1_multiples\": [");
  for (int i = 0; i <= 17; i++) {
    G1 m = g1_mul(&g1g, i);
    fprintf(f, "{\"x\": %u, \"y\": %u, \"inf\": %s}%s",
            m.x.value, m.y.value, m.infinite ? "true" : "false", i < 17 ? ", " : "");
  }
  fprintf(f, "],\n");

  /* --- g2 multiples: i*G2 for i = 1..17 (g2_mul(·,0) is UB in the reference) --- */
  fprintf(f, "  \"g2_multiples\": [");
  for (int i = 1; i <= 17; i++) {
    G2 m = g2_mul(g2g, i);
    fprintf(f, "{\"x\": %u, \"y\": %u}%s", m.x.value, m.y.value, i < 17 ? ", " : "");
  }
  fprintf(f, "],\n");

  /* --- non-degenerate srs_eval check data (srs-test.c scenario) --- */
  {
    GF sec5 = f101(5);
    SRS s5 = srs_create(sec5, 5);
    HF pc[] = {f17(1), f17(2), f17(3)};
    POLY pl = poly_new(pc, 3);
    G1 ev = srs_eval_at_s(&s5, &pl);
    fprintf(f, "  \"srs5_eval\": {\"x\": %u, \"y\": %u, \"inf\": %s},\n",
            ev.x.value, ev.y.value, ev.infinite ? "true" : "false");
    srs_free(&s5);
  }

  fprintf(f, "  \"scenario\": {\"secret\": 2, \"n_srs\": 6, \"h_len\": 4, \"alpha\": 15, \"beta\": 12, \"gamma\": 13, \"z\": 5, \"v\": 12, \"rand\": [7, 4, 11, 12, 16, 2, 14, 11, 7]}\n");
  fprintf(f, "}\n");
  fclose(f);
  printf("golden written\n");
  return 0;
}
