// Shared float32 math for the standalone native engines
// (native_model.cpp: offline ConformerCTC; chunk_native_model.cpp:
// streaming ChunkConformer). Numerics mirror flax defaults.
#pragma once

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstdlib>
#include <cstring>
#include <map>
#include <string>
#include <vector>
#ifdef _OPENMP
#include <omp.h>
#endif
#if defined(__x86_64__)
#include <immintrin.h>
#endif

#include "native_model.h"  // asr::Tensor

namespace asr {
namespace math {

constexpr float kLnEps = 1e-3f;   // Keras LayerNormalization default (model parity, round 5)
constexpr float kBnEps = 1e-3f;   // Keras BatchNormalization default (model parity, round 5)

// Branch-free polynomial expf (Cephes 2^k * 2^r split, ~2 ulp). glibc's
// expf can't auto-vectorize (errno + table lookups); this one SIMD-lowers
// cleanly under -O3, and Swish/Sigmoid/softmax loops are a top-3 cost of
// the streaming engine. Error is ~1e-7 relative — orders of magnitude
// inside the native-engine parity tolerances (2e-3 logits / 1e-4 probs).
inline float FastExp(float x) {
  x = std::min(std::max(x, -87.0f), 88.0f);
  const float z = x * 1.44269504088896341f;            // x / ln 2
  const float n = std::floor(z + 0.5f);
  float r = x - n * 0.693359375f;                      // Cody-Waite high
  r -= n * -2.12194440e-4f;                            // Cody-Waite low
  float p = 1.9875691500e-4f;
  p = p * r + 1.3981999507e-3f;
  p = p * r + 8.3334519073e-3f;
  p = p * r + 4.1665795894e-2f;
  p = p * r + 1.6666665459e-1f;
  p = p * r + 5.0000001201e-1f;
  p = p * r * r + r + 1.0f;
  union {
    uint32_t i;
    float f;
  } s;
  s.i = (uint32_t)((int32_t)n + 127) << 23;            // 2^n
  return p * s.f;
}

inline float Sigmoid(float x) { return 1.0f / (1.0f + FastExp(-x)); }
inline float Swish(float x) { return x * Sigmoid(x); }

// bfloat16 weight storage. The streaming chunk engine is DRAM-bandwidth
// bound (every chunk streams every weight once; arithmetic intensity is
// pinned by the tiny t=4 row count), so halving weight bytes is ~2x.
// bf16 is also what the TPU training path computes in, so weights have
// at most bf16-information anyway. Activations and accumulation stay
// f32.
inline float Bf16ToF32(uint16_t v) {
  // memcpy bit-cast, NOT a union: gcc auto-vectorizes this form (union
  // round-trips through memory and killed the GEMM to 0.4 GF/s)
  const uint32_t i = (uint32_t)v << 16;
  float f;
  std::memcpy(&f, &i, 4);
  return f;
}

inline uint16_t F32ToBf16(float f) {  // round-to-nearest-even
  union {
    float f;
    uint32_t i;
  } u = {f};
  const uint32_t lsb = (u.i >> 16) & 1u;
  return (uint16_t)((u.i + 0x7fffu + lsb) >> 16);
}

// y[m,n] = x[m,k] * w[k,n]
//
// Register-tiled micro-kernel: a 4-row x 32-column output tile lives in
// registers across the ENTIRE k loop, so each w element feeds 4 FMAs and
// the output never round-trips through L1 inside the loop. This is the
// streaming-engine hot path (t=4 rows per 160 ms chunk -> tiny-m GEMMs).
// Microbenchmarked (g++ -O3): tile=32 beats the p-outer row-blocked loop
// on every shape and ISA tried — 66 vs 39 GF/s on the chunk FF shape
// with -march=native (AVX-512), 49 vs 33 with AVX2, 17 vs 17 plain;
// tile=16 SPILLS and collapses to 4 GF/s, hence the fixed 32.
// Accumulation order per output element (ascending p) is unchanged, so
// results are bit-identical across variants. OpenMP splits the row
// blocks when built with it (OMP_NUM_THREADS; single-thread otherwise).
// weight load: f32 passthrough or bf16 widen (1 shift) — both forms
// auto-vectorize. int8 never reaches MatMul: it has its own integer
// kernels (DenseInt8VnniKernel / DenseInt8ScalarKernel below).
inline float WVal(float w) { return w; }
inline float WVal(uint16_t w) { return Bf16ToF32(w); }

// --- AVX-512 VNNI int8 GEMM fast path -----------------------------------
//
// y[i,j] = sx_i * scale_j * (dot_ij - 128 * colsum_j) + bias_j, where
// dot_ij = sum_p (xq[i,p]+128) * w8[p,j] runs on vpdpbusd (64 int8 MACs
// per instruction; the unsigned-activation shift +128 is corrected with
// the precomputed per-column weight sums). Activations are quantized per
// ROW at call time (symmetric, amax/127) — the engine's parity fixtures
// still decode token-for-token (logit gaps >> ~0.5% quantization noise).
// i32 accumulation is exact: |4-product group| <= 4*255*127 ~ 1.3e5, so
// overflow needs k > ~6e4 (ours is <= 2048).

inline bool HasVnni() {
#if defined(__x86_64__) || defined(__i386__)
  return __builtin_cpu_supports("avx512vnni") &&
         __builtin_cpu_supports("avx512bw");
#else
  return false;
#endif
}

// Per-column sums of the quantized weights — the unsigned-activation
// (+128) correction term. Needed by BOTH int8 kernels (VNNI and the
// scalar fallback compute the same quantized math, so --int8 decodes
// identically on every host CPU).
inline void ColSumInt8(const signed char* w, int k, int n,
                       std::vector<int>* colsum) {
  colsum->assign(n, 0);
  for (int p = 0; p < k; ++p)
    for (int j = 0; j < n; ++j) (*colsum)[j] += w[(long)p * n + j];
}

// p4-interleaved repack (see Int8Tensor.packed).
inline void PackInt8Vnni(const signed char* w, int k, int n,
                         std::vector<signed char>* packed) {
  const int k4 = (k + 3) & ~3;
  const int n16 = (n + 15) & ~15;
  packed->assign((size_t)(k4 / 4) * n16 * 4, 0);
  for (int p = 0; p < k; ++p)
    for (int j = 0; j < n; ++j)
      (*packed)[(((size_t)(p / 4) * n16 + j) << 2) + (p & 3)] =
          w[(long)p * n + j];
}

// Per-row activation quantization into SHIFTED unsigned bytes
// (u = clamp(round(x/sx), -127, 127) + 128); rows padded to k4 with 0
// (paired weight bytes are 0 there, so padding contributes nothing).
inline void QuantizeRowsU8(const float* x, int m, int k, int k4,
                           unsigned char* u, float* sx) {
  for (int i = 0; i < m; ++i) {
    const float* xi = x + (long)i * k;
    float amax = 0.0f;
    for (int p = 0; p < k; ++p) amax = std::max(amax, std::fabs(xi[p]));
    const float s = amax > 0.0f ? amax / 127.0f : 1.0f;
    sx[i] = s;
    const float inv = 1.0f / s;
    unsigned char* ui = u + (size_t)i * k4;
    for (int p = 0; p < k; ++p) {
      const float v = std::min(127.0f, std::max(-127.0f,
                                                std::nearbyint(xi[p] * inv)));
      ui[p] = (unsigned char)((int)v + 128);
    }
    for (int p = k; p < k4; ++p) ui[p] = 0;
  }
}

// 4 shifted activation bytes as one i32 lane value, without type-punning
// the byte buffer (strict aliasing): memcpy folds to a single 32-bit load.
inline int ActQuad(const unsigned char* p) {
  int32_t v;
  std::memcpy(&v, p, 4);
  return v;
}

#if defined(__x86_64__)
// Row-blocked x4: one 64-byte packed-weight load feeds FOUR vpdpbusd
// (one per activation row), so the weight stream — the dominant traffic
// at m>=4 — is read once per 4 rows instead of once per row.
__attribute__((target("avx512f,avx512bw,avx512vnni"))) inline void
DenseInt8VnniKernel(const unsigned char* u, const signed char* packed,
                    const int* colsum, const float* scale,
                    const float* bias, const float* sx, float* y, int m,
                    int k4, int n, int n16) {
  int i = 0;
  for (; i + 4 <= m; i += 4) {
    const unsigned char* u0 = u + (size_t)i * k4;
    const unsigned char* u1 = u0 + k4;
    const unsigned char* u2 = u1 + k4;
    const unsigned char* u3 = u2 + k4;
    for (int jb = 0; jb < n16; jb += 16) {
      __m512i a0 = _mm512_setzero_si512(), a1 = _mm512_setzero_si512();
      __m512i a2 = _mm512_setzero_si512(), a3 = _mm512_setzero_si512();
      const signed char* pb = packed + ((size_t)jb << 2);
      for (int p4 = 0; p4 < k4; p4 += 4) {
        const __m512i b = _mm512_loadu_si512(
            pb + ((size_t)(p4 >> 2) * n16 << 2));
        a0 = _mm512_dpbusd_epi32(a0, _mm512_set1_epi32(ActQuad(u0 + p4)), b);
        a1 = _mm512_dpbusd_epi32(a1, _mm512_set1_epi32(ActQuad(u1 + p4)), b);
        a2 = _mm512_dpbusd_epi32(a2, _mm512_set1_epi32(ActQuad(u2 + p4)), b);
        a3 = _mm512_dpbusd_epi32(a3, _mm512_set1_epi32(ActQuad(u3 + p4)), b);
      }
      alignas(64) int l0[16], l1[16], l2[16], l3[16];
      _mm512_store_si512(l0, a0);
      _mm512_store_si512(l1, a1);
      _mm512_store_si512(l2, a2);
      _mm512_store_si512(l3, a3);
      const int jhi = std::min(jb + 16, n);
      for (int j = jb; j < jhi; ++j) {
        const int c = 128 * colsum[j];  // int subtract: exact
        const float sc = scale[j];
        const float bj = bias[j];
        y[(long)i * n + j] = sx[i] * sc * (float)(l0[j - jb] - c) + bj;
        y[(long)(i + 1) * n + j] =
            sx[i + 1] * sc * (float)(l1[j - jb] - c) + bj;
        y[(long)(i + 2) * n + j] =
            sx[i + 2] * sc * (float)(l2[j - jb] - c) + bj;
        y[(long)(i + 3) * n + j] =
            sx[i + 3] * sc * (float)(l3[j - jb] - c) + bj;
      }
    }
  }
  for (; i < m; ++i) {
    const unsigned char* ui = u + (size_t)i * k4;
    float* yi = y + (long)i * n;
    const float si = sx[i];
    for (int jb = 0; jb < n16; jb += 16) {
      __m512i acc = _mm512_setzero_si512();
      const signed char* pb = packed + ((size_t)jb << 2);
      for (int p4 = 0; p4 < k4; p4 += 4) {
        const __m512i a = _mm512_set1_epi32(ActQuad(ui + p4));
        const __m512i b = _mm512_loadu_si512(
            pb + ((size_t)(p4 >> 2) * n16 << 2));
        acc = _mm512_dpbusd_epi32(acc, a, b);
      }
      alignas(64) int lanes[16];
      _mm512_store_si512(lanes, acc);
      const int jhi = std::min(jb + 16, n);
      for (int j = jb; j < jhi; ++j)
        yi[j] = si * scale[j] * (float)(lanes[j - jb] - 128 * colsum[j]) +
                bias[j];
    }
  }
}
#endif

// Portable int8 kernel computing the EXACT same quantized math as the
// VNNI path — unsigned-shifted activation bytes, exact int32 dot,
// identical float writeback expression — so --int8 tokens are
// bit-identical across host CPUs (the int32 accumulation is exact, and
// the float ops below mirror DenseInt8VnniKernel's order). The int16
// partial products (<=255*127) let the compiler use widening-multiply
// SIMD under -O3 even without VNNI.
inline void DenseInt8ScalarKernel(const unsigned char* u,
                                  const signed char* q, const int* colsum,
                                  const float* scale, const float* bias,
                                  const float* sx, float* y, int m, int k,
                                  int k4, int n) {
  static thread_local std::vector<int> acc;
  acc.resize(n);
  for (int i = 0; i < m; ++i) {
    const unsigned char* ui = u + (size_t)i * k4;
    std::fill(acc.begin(), acc.end(), 0);
    for (int p = 0; p < k; ++p) {
      const int uv = ui[p];
      const signed char* wp = q + (long)p * n;
      for (int j = 0; j < n; ++j) acc[j] += uv * (int)wp[j];
    }
    float* yi = y + (long)i * n;
    const float si = sx[i];
    for (int j = 0; j < n; ++j)
      yi[j] = si * scale[j] * (float)(acc[j] - 128 * colsum[j]) + bias[j];
  }
}

// Per-output-column int8 quantization: scale[j] = max_p |w[p,j]| / 127.
inline void QuantizeInt8(const float* w, int k, int n, signed char* q,
                         float* scale) {
  for (int j = 0; j < n; ++j) {
    float amax = 0.0f;
    for (int p = 0; p < k; ++p)
      amax = std::max(amax, std::fabs(w[(long)p * n + j]));
    const float s = amax > 0.0f ? amax / 127.0f : 1.0f;
    scale[j] = s;
    const float inv = 1.0f / s;
    for (int p = 0; p < k; ++p) {
      const float v = w[(long)p * n + j] * inv;
      q[(long)p * n + j] =
          (signed char)std::min(127.0f, std::max(-127.0f, std::nearbyint(v)));
    }
  }
}

template <typename W>
inline void MatMulRowsTail(const float* x, const W* w, float* y,
                           int i_begin, int m, int k, int n) {
  for (int i = i_begin; i < m; ++i) {
    const float* xi = x + (long)i * k;
    float* yi = y + (long)i * n;
    for (int p = 0; p < k; ++p) {
      const float v = xi[p];
      const W* wp = w + (long)p * n;
      for (int j = 0; j < n; ++j) yi[j] += v * WVal(wp[j]);
    }
  }
}

template <typename W>
inline void MatMulBlock4(const float* x0, const float* x1, const float* x2,
                         const float* x3, const W* w, float* y0,
                         float* y1, float* y2, float* y3, int k, int n,
                         int jlo, int jhi) {
  constexpr int NT = 32;
  int j0 = jlo;
  for (; j0 + NT <= jhi; j0 += NT) {
      float a0[NT] = {0}, a1[NT] = {0}, a2[NT] = {0}, a3[NT] = {0};
      const W* wp = w + j0;
      for (int p = 0; p < k; ++p, wp += n) {
        const float b0 = x0[p], b1 = x1[p], b2 = x2[p], b3 = x3[p];
        for (int j = 0; j < NT; ++j) {
          const float b = WVal(wp[j]);
          a0[j] += b0 * b;
          a1[j] += b1 * b;
          a2[j] += b2 * b;
          a3[j] += b3 * b;
        }
      }
      for (int j = 0; j < NT; ++j) {
        y0[j0 + j] = a0[j];
        y1[j0 + j] = a1[j];
        y2[j0 + j] = a2[j];
        y3[j0 + j] = a3[j];
      }
    }
    if (j0 < jhi) {  // n tail (< NT columns)
      const int T = jhi - j0;
      float a0[NT] = {0}, a1[NT] = {0}, a2[NT] = {0}, a3[NT] = {0};
      const W* wp = w + j0;
      for (int p = 0; p < k; ++p, wp += n) {
        const float b0 = x0[p], b1 = x1[p], b2 = x2[p], b3 = x3[p];
        for (int j = 0; j < T; ++j) {
          const float b = WVal(wp[j]);
          a0[j] += b0 * b;
          a1[j] += b1 * b;
          a2[j] += b2 * b;
          a3[j] += b3 * b;
        }
      }
      for (int j = 0; j < T; ++j) {
        y0[j0 + j] = a0[j];
        y1[j0 + j] = a1[j];
        y2[j0 + j] = a2[j];
        y3[j0 + j] = a3[j];
      }
    }
}

template <typename W>
inline void MatMul(const float* x, const W* w, float* y, int m, int k,
                   int n) {
  std::memset(y, 0, sizeof(float) * m * n);
  const int m4 = m - (m % 4);
#ifdef _OPENMP
  if (m4 >= 4 && m4 < 64 && (long)k * n >= 32768) {
    // small-m (streaming) shapes: split the COLUMN range across threads
    // so each streams a slice of w — aggregate DRAM bandwidth is the
    // wall here, not FLOPs
#pragma omp parallel
    {
      const int nth = omp_get_num_threads();
      const int tid = omp_get_thread_num();
      // 32-aligned column slices
      const int ntiles = (n + 31) / 32;
      const int lo = (int)((long)ntiles * tid / nth) * 32;
      const int hi = (int)std::min<long>((long)ntiles * (tid + 1) / nth * 32,
                                         n);
      if (lo < hi)
        for (int i = 0; i < m4; i += 4)
          MatMulBlock4(x + (long)i * k, x + (long)(i + 1) * k,
                       x + (long)(i + 2) * k, x + (long)(i + 3) * k, w,
                       y + (long)i * n, y + (long)(i + 1) * n,
                       y + (long)(i + 2) * n, y + (long)(i + 3) * n, k, n,
                       lo, hi);
    }
    MatMulRowsTail(x, w, y, m4, m, k, n);
    return;
  }
#pragma omp parallel for schedule(static) if (m4 >= 64)
#endif
  for (int i = 0; i < m4; i += 4) {
    MatMulBlock4(x + (long)i * k, x + (long)(i + 1) * k,
                 x + (long)(i + 2) * k, x + (long)(i + 3) * k, w,
                 y + (long)i * n, y + (long)(i + 1) * n,
                 y + (long)(i + 2) * n, y + (long)(i + 3) * n, k, n, 0, n);
  }
  MatMulRowsTail(x, w, y, m4, m, k, n);
}

// Dense through one of the three weight storages (exactly one of
// kf/kh/kq non-null). Shared by both standalone engines' DenseByName.
inline Tensor DenseAny(const Tensor& x, const Tensor* kf,
                       const Bf16Tensor* kh, const Int8Tensor* kq,
                       const Tensor& bias) {
  const int m = (int)(x.size() / x.shape.back());
  const int k = x.shape.back();
  const int n = kf ? kf->shape.back()
                   : (kh ? kh->shape.back() : kq->shape.back());
  Tensor y;
  y.shape = x.shape;
  y.shape.back() = n;
  y.data.resize((long)m * n);
  if (kq) {
    // Same quantized math on every CPU: per-row activation quantization
    // + exact int32 dot + identical float writeback; the VNNI kernel is
    // just a faster encoding of it (bit-identical, asserted in
    // unit_tests.cpp TestInt8Kernels). Scratch is thread_local — this
    // runs inside the per-chunk streaming hot loop.
    const int k4 = (k + 3) & ~3;
    static thread_local std::vector<unsigned char> u;
    static thread_local std::vector<float> sx;
    u.resize((size_t)m * k4);
    sx.resize(m);
    QuantizeRowsU8(x.data.data(), m, k, k4, u.data(), sx.data());
#if defined(__x86_64__)
    if (!kq->packed.empty()) {
      const int n16 = (n + 15) & ~15;
      DenseInt8VnniKernel(u.data(), kq->packed.data(), kq->colsum.data(),
                          kq->scale.data(), bias.data.data(), sx.data(),
                          y.data.data(), m, k4, n, n16);
      return y;
    }
#endif
    DenseInt8ScalarKernel(u.data(), kq->data.data(), kq->colsum.data(),
                          kq->scale.data(), bias.data.data(), sx.data(),
                          y.data.data(), m, k, k4, n);
    return y;
  }
  if (kh)
    MatMul(x.data.data(), kh->data.data(), y.data.data(), m, k, n);
  else
    MatMul(x.data.data(), kf->data.data(), y.data.data(), m, k, n);
  for (int i = 0; i < m; ++i)
    for (int j = 0; j < n; ++j) y.data[(long)i * n + j] += bias.data[j];
  return y;
}

inline Tensor Dense(const Tensor& x, const Tensor& kernel,
                    const Tensor& bias) {
  const int m = x.size() / x.shape.back();
  const int k = x.shape.back();
  const int n = kernel.shape.back();
  Tensor y;
  y.shape = x.shape;
  y.shape.back() = n;
  y.data.resize((long)m * n);
  MatMul(x.data.data(), kernel.data.data(), y.data.data(), m, k, n);
  for (int i = 0; i < m; ++i)
    for (int j = 0; j < n; ++j) y.data[(long)i * n + j] += bias.data[j];
  return y;
}

// LayerNorm over the last axis, float32 (flax nn.LayerNorm).
inline void LayerNormIp(Tensor* x, const Tensor& scale, const Tensor& bias) {
  const int d = x->shape.back();
  const int m = x->size() / d;
  for (int i = 0; i < m; ++i) {
    float* row = x->data.data() + (long)i * d;
    double mean = 0, sq = 0;
    for (int j = 0; j < d; ++j) mean += row[j];
    mean /= d;
    for (int j = 0; j < d; ++j) {
      const double c = row[j] - mean;
      sq += c * c;
    }
    const float inv = 1.0f / std::sqrt((float)(sq / d) + kLnEps);
    for (int j = 0; j < d; ++j)
      row[j] = ((float)(row[j] - mean)) * inv * scale.data[j] +
               bias.data[j];
  }
}

inline void SoftmaxRow(float* row, int n) {
  float mx = row[0];
  for (int i = 1; i < n; ++i) mx = std::max(mx, row[i]);
  double sum = 0;
  for (int i = 0; i < n; ++i) {
    row[i] = FastExp(row[i] - mx);
    sum += row[i];
  }
  const float inv = (float)(1.0 / sum);
  for (int i = 0; i < n; ++i) row[i] *= inv;
}

// Re-encode every large 2-D weight matrix at reduced width (shared by
// both standalone engines' Load): small tensors, biases, norms and the
// 3-D/4-D conv kernels stay f32. In kInt8 mode the frontend DFT / mel
// bases stay bf16 (log-power is safe at 8 mantissa bits but 8-bit
// integers visibly move quiet bins); everything else gets per-column
// int8, VNNI-packed when the CPU supports vpdpbusd.
inline void ReencodeWeights(std::map<std::string, Tensor>* tensors,
                            std::map<std::string, Bf16Tensor>* bf16,
                            std::map<std::string, Int8Tensor>* int8,
                            WeightStore store) {
  if (store == WeightStore::kF32) return;
  // test hook: parity fixtures are tiny, so they lower the size floor to
  // force the quantized kernels through real coverage
  long min_elems = 16384;
  if (const char* e = std::getenv("ASR_REENCODE_MIN"))
    min_elems = std::max(1L, std::atol(e));
  for (auto it = tensors->begin(); it != tensors->end();) {
    Tensor& t = it->second;
    // embeddings are row-GATHERED by id (not GEMM'd) via get() — keep f32
    if (!(t.shape.size() == 2 && t.size() >= min_elems) ||
        it->first.find("embedding") != std::string::npos) {
      ++it;
      continue;
    }
    const bool frontend = it->first.rfind("frontend/", 0) == 0;
    if (store == WeightStore::kBf16 || frontend) {
      Bf16Tensor b;
      b.shape = t.shape;
      b.data.resize(t.data.size());
      for (size_t i = 0; i < t.data.size(); ++i)
        b.data[i] = F32ToBf16(t.data[i]);
      bf16->emplace(it->first, std::move(b));
    } else {
      Int8Tensor q;
      q.shape = t.shape;
      q.data.resize(t.data.size());
      q.scale.resize(t.shape[1]);
      QuantizeInt8(t.data.data(), t.shape[0], t.shape[1], q.data.data(),
                   q.scale.data());
      ColSumInt8(q.data.data(), t.shape[0], t.shape[1], &q.colsum);
      if (HasVnni())
        PackInt8Vnni(q.data.data(), t.shape[0], t.shape[1], &q.packed);
      int8->emplace(it->first, std::move(q));
    }
    it = tensors->erase(it);
  }
}

// --- Radix-2 FFT (frontend fast path) --------------------------------------

inline bool FftPlanInit(FftPlan* plan, int n) {
  if (n < 4 || (n & (n - 1)) != 0) return false;
  plan->n = n;
  int lg = 0;
  while ((1 << lg) < n) ++lg;
  plan->rev.assign(n, 0);
  for (int i = 0; i < n; ++i) {
    int r = 0;
    for (int b = 0; b < lg; ++b) r |= ((i >> b) & 1) << (lg - 1 - b);
    plan->rev[i] = r;
  }
  plan->wre.clear();
  plan->wim.clear();
  for (int len = 2; len <= n; len <<= 1)
    for (int j = 0; j < len / 2; ++j) {
      const double ang = -2.0 * 3.14159265358979323846 * j / len;
      plan->wre.push_back((float)std::cos(ang));
      plan->wim.push_back((float)std::sin(ang));
    }
  return true;
}

// In-place iterative Cooley-Tukey over (re, im), length plan.n.
inline void FftRun(const FftPlan& plan, float* re, float* im) {
  const int n = plan.n;
  for (int i = 0; i < n; ++i) {
    const int r = plan.rev[i];
    if (i < r) {
      std::swap(re[i], re[r]);
      std::swap(im[i], im[r]);
    }
  }
  size_t tw = 0;
  for (int len = 2; len <= n; len <<= 1) {
    const int half = len / 2;
    const float* wr = plan.wre.data() + tw;
    const float* wi = plan.wim.data() + tw;
    for (int i = 0; i < n; i += len)
      for (int j = 0; j < half; ++j) {
        const int a = i + j, b = a + half;
        const float xr = re[b] * wr[j] - im[b] * wi[j];
        const float xi = re[b] * wi[j] + im[b] * wr[j];
        re[b] = re[a] - xr;
        im[b] = im[a] - xi;
        re[a] += xr;
        im[a] += xi;
      }
    tw += half;
  }
}

// Keras/TF 'SAME' padding amounts.
inline void SamePad(int in, int k, int s, int* lo, int* hi) {
  const int out = (in + s - 1) / s;
  const int pad = std::max((out - 1) * s + k - in, 0);
  *lo = pad / 2;
  *hi = pad - pad / 2;
}

}  // namespace math
}  // namespace asr
