/*
 * Reference-prover throughput measurement (project-authored harness; builds
 * against the read-only reference headers with -I/root/reference/src).
 * Times plonk_prove on the canonical 4-gate circuit, single thread —
 * the baseline for bench.py's vs_baseline ratio.
 */
#include <assert.h>
#include <stdio.h>
#include <time.h>
#include "plonk.h"

int main(int argc, char **argv) {
  int iters = argc > 1 ? atoi(argv[1]) : 2000;

  GF secret = f101(2);
  SRS srs = srs_create(secret, 6);
  PLONK plonk = plonk_new(srs, 4);

  CONSTRAINTS cons;
  cons.num_constraints = 4;
  cons.q_m = malloc(4 * sizeof(HF)); cons.q_l = malloc(4 * sizeof(HF));
  cons.q_r = malloc(4 * sizeof(HF)); cons.q_o = malloc(4 * sizeof(HF));
  cons.q_c = malloc(4 * sizeof(HF));
  for (int i = 0; i < 3; i++) {
    cons.q_m[i] = hf_one();  cons.q_l[i] = hf_zero();
    cons.q_r[i] = hf_zero(); cons.q_o[i] = hf_neg(hf_one());
    cons.q_c[i] = hf_zero();
  }
  cons.q_m[3] = hf_zero(); cons.q_l[3] = hf_one();
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

  /* warmup + checksum */
  PROOF p0 = plonk_prove(&plonk, &cons, &asg, &ch, rnd);
  assert(p0.r_z.value == 15);

  struct timespec t0, t1;
  clock_gettime(CLOCK_MONOTONIC, &t0);
  unsigned sink = 0;
  for (int i = 0; i < iters; i++) {
    PROOF p = plonk_prove(&plonk, &cons, &asg, &ch, rnd);
    sink += p.r_z.value;
  }
  clock_gettime(CLOCK_MONOTONIC, &t1);
  double secs = (t1.tv_sec - t0.tv_sec) + (t1.tv_nsec - t0.tv_nsec) * 1e-9;
  printf("{\"iters\": %d, \"seconds\": %.6f, \"proofs_per_s\": %.2f, \"sink\": %u}\n",
         iters, secs, iters / secs, sink);
  return 0;
}
