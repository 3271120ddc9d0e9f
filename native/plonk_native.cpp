// Native host engine for tpu-plonk.
//
// The TPU (JAX/XLA/Pallas) owns the compute path; this C++ library is the
// host-side runtime the reference never had to have (it was all one C file):
// fast golden-model implementations used to cross-check TPU kernels at
// sizes where python-int arithmetic is too slow, plus batch witness
// generation for the synthetic circuit family. Exposed through ctypes
// (plonk_tpu/utils/native.py); no pybind11 dependency.
//
// All moduli are < 2^31, so every product fits in uint64_t.
//
// Component map (reference parity targets):
//   mulmod/powmod      — src/hf.h, src/gf.h semantics (inv(0)=0, 0^0=1)
//   ntt_u32            — evaluation-domain engine replacing src/poly.h
//                        products and src/plonk.h:106-195 interpolation
//   poly_mul_school    — src/poly.h:106-122 (golden for NTT checks)
//   ec_msm_naive       — src/srs.h:53-68 fold (golden for Pippenger)
//   square_chain_witness — scaled synthetic circuit witness generation

#include <cstdint>
#include <cstring>
#include <vector>

extern "C" {

static inline uint32_t addmod_u32(uint32_t a, uint32_t b, uint32_t p) {
  uint32_t s = a + b;  // p < 2^31 so no overflow
  return s >= p ? s - p : s;
}

static inline uint32_t submod_u32(uint32_t a, uint32_t b, uint32_t p) {
  return a >= b ? a - b : a + (p - b);
}

static inline uint32_t mulmod_u32(uint32_t a, uint32_t b, uint32_t p) {
  return (uint32_t)(((uint64_t)a * b) % p);
}

uint32_t powmod_u32(uint32_t base, uint64_t e, uint32_t p) {
  uint64_t r = 1, b = base % p;
  while (e) {
    if (e & 1) r = r * b % p;
    b = b * b % p;
    e >>= 1;
  }
  return (uint32_t)r;
}

uint32_t invmod_u32(uint32_t a, uint32_t p) {  // Fermat; inv(0) = 0
  return powmod_u32(a, p - 2, p);
}

// In-place iterative radix-2 NTT over F_p. `w` must be a primitive n-th
// root of unity; inverse != 0 applies w^{-1} and the 1/n scale.
void ntt_u32(uint32_t* data, uint64_t n, uint32_t p, uint32_t w,
             int inverse) {
  if (n <= 1) return;
  uint32_t wq = inverse ? invmod_u32(w, p) : w;
  // bit-reversal permutation
  for (uint64_t i = 1, j = 0; i < n; i++) {
    uint64_t bit = n >> 1;
    for (; j & bit; bit >>= 1) j ^= bit;
    j ^= bit;
    if (i < j) { uint32_t t = data[i]; data[i] = data[j]; data[j] = t; }
  }
  for (uint64_t len = 2; len <= n; len <<= 1) {
    uint32_t wlen = powmod_u32(wq, n / len, p);
    for (uint64_t i = 0; i < n; i += len) {
      uint32_t cur = 1;
      for (uint64_t k = 0; k < len / 2; k++) {
        uint32_t u = data[i + k];
        uint32_t v = mulmod_u32(data[i + k + len / 2], cur, p);
        data[i + k] = addmod_u32(u, v, p);
        data[i + k + len / 2] = submod_u32(u, v, p);
        cur = mulmod_u32(cur, wlen, p);
      }
    }
  }
  if (inverse) {
    uint32_t n_inv = invmod_u32((uint32_t)(n % p), p);
    for (uint64_t i = 0; i < n; i++) data[i] = mulmod_u32(data[i], n_inv, p);
  }
}

// out[0..la+lb-2] = a * b (schoolbook golden; out must be zeroed by caller
// or will be overwritten here).
void poly_mul_school(const uint32_t* a, uint64_t la, const uint32_t* b,
                     uint64_t lb, uint32_t p, uint32_t* out) {
  uint64_t lo = la + lb - 1;
  std::memset(out, 0, lo * sizeof(uint32_t));
  for (uint64_t i = 0; i < la; i++) {
    if (!a[i]) continue;
    for (uint64_t j = 0; j < lb; j++) {
      out[i + j] = addmod_u32(out[i + j], mulmod_u32(a[i], b[j], p), p);
    }
  }
}

// ---- affine short-Weierstrass EC over F_p (y^2 = x^3 + b), p < 2^31 ----

struct Pt { uint32_t x, y; int inf; };

static Pt ec_add(const Pt& A, const Pt& B, uint32_t p) {
  if (A.inf) return B;
  if (B.inf) return A;
  if (A.x == B.x) {
    if (addmod_u32(A.y, B.y, p) == 0) return Pt{0, 0, 1};
    // doubling
    if (A.y == 0) return Pt{0, 0, 1};
    uint32_t m = mulmod_u32(mulmod_u32(3, mulmod_u32(A.x, A.x, p), p),
                            invmod_u32(mulmod_u32(2, A.y, p), p), p);
    uint32_t xr = submod_u32(mulmod_u32(m, m, p),
                             mulmod_u32(2, A.x, p), p);
    uint32_t yr = submod_u32(mulmod_u32(m, submod_u32(A.x, xr, p), p),
                             A.y, p);
    return Pt{xr, yr, 0};
  }
  uint32_t m = mulmod_u32(submod_u32(B.y, A.y, p),
                          invmod_u32(submod_u32(B.x, A.x, p), p), p);
  uint32_t xr = submod_u32(submod_u32(mulmod_u32(m, m, p), A.x, p), B.x, p);
  uint32_t yr = submod_u32(mulmod_u32(m, submod_u32(A.x, xr, p), p), A.y, p);
  return Pt{xr, yr, 0};
}

static Pt ec_mul(Pt P, uint64_t k, uint32_t p) {
  Pt R{0, 0, 1};
  while (k) {
    if (k & 1) R = ec_add(R, P, p);
    P = ec_add(P, P, p);
    k >>= 1;
  }
  return R;
}

// naive MSM golden: out_xyinf[3] = sum_i scalars[i] * (xs[i], ys[i])
void ec_msm_naive(const uint32_t* xs, const uint32_t* ys,
                  const uint8_t* infs, const uint32_t* scalars, uint64_t n,
                  uint32_t p, uint32_t* out_xyinf) {
  Pt acc{0, 0, 1};
  for (uint64_t i = 0; i < n; i++) {
    Pt P{xs[i], ys[i], infs[i] != 0};
    acc = ec_add(acc, ec_mul(P, scalars[i], p), p);
  }
  out_xyinf[0] = acc.x;
  out_xyinf[1] = acc.y;
  out_xyinf[2] = acc.inf;
}

// scalar multiple table: out[i] = (i==0 ? inf : i*G) for i in [0, count)
void ec_mul_table(uint32_t gx, uint32_t gy, uint64_t count, uint32_t p,
                  uint32_t* out_x, uint32_t* out_y, uint8_t* out_inf) {
  Pt acc{0, 0, 1};
  Pt G{gx, gy, 0};
  for (uint64_t i = 0; i < count; i++) {
    out_x[i] = acc.x;
    out_y[i] = acc.y;
    out_inf[i] = (uint8_t)acc.inf;
    acc = ec_add(acc, G, p);
  }
}

// witness columns of the square-chain circuit (models/synthetic.py)
void square_chain_witness(uint32_t x0, uint64_t n, uint32_t p,
                          uint32_t* a, uint32_t* b, uint32_t* c) {
  uint64_t cur = x0 % p;
  for (uint64_t i = 0; i < n; i++) {
    a[i] = (uint32_t)cur;
    b[i] = (uint32_t)cur;
    cur = cur * cur % p;
    c[i] = (uint32_t)cur;
  }
}

}  // extern "C"
