// Shared float32 math for the standalone native engines
// (native_model.cpp: offline ConformerCTC; chunk_native_model.cpp:
// streaming ChunkConformer). Numerics mirror flax defaults.
#pragma once

#include <algorithm>
#include <cmath>
#include <cstring>

#include "native_model.h"  // asr::Tensor

namespace asr {
namespace math {

constexpr float kLnEps = 1e-6f;   // flax LayerNorm default
constexpr float kBnEps = 1e-5f;   // flax BatchNorm default

inline float Sigmoid(float x) { return 1.0f / (1.0f + std::exp(-x)); }
inline float Swish(float x) { return x * Sigmoid(x); }

// y[m,n] = x[m,k] * w[k,n]
//
// 4-row register blocking: each w row is loaded once and scaled into 4
// output rows (4 FMAs per weight load instead of 1 — measured ~3x over
// the naive row loop; accumulation order per row is unchanged, so
// results are bit-identical). OpenMP splits the row blocks when enabled
// (OMP_NUM_THREADS; single-thread without it).
inline void MatMul(const float* x, const float* w, float* y, int m, int k,
                   int n) {
  std::memset(y, 0, sizeof(float) * m * n);
  const int m4 = m - (m % 4);
#ifdef _OPENMP
#pragma omp parallel for schedule(static) if (m4 >= 16)
#endif
  for (int i = 0; i < m4; i += 4) {
    const float* x0 = x + (long)i * k;
    const float* x1 = x0 + k;
    const float* x2 = x1 + k;
    const float* x3 = x2 + k;
    float* y0 = y + (long)i * n;
    float* y1 = y0 + n;
    float* y2 = y1 + n;
    float* y3 = y2 + n;
    for (int p = 0; p < k; ++p) {
      const float a0 = x0[p], a1 = x1[p], a2 = x2[p], a3 = x3[p];
      const float* wp = w + (long)p * n;
      for (int j = 0; j < n; ++j) {
        const float b = wp[j];
        y0[j] += a0 * b;
        y1[j] += a1 * b;
        y2[j] += a2 * b;
        y3[j] += a3 * b;
      }
    }
  }
  for (int i = m4; i < m; ++i) {
    const float* xi = x + (long)i * k;
    float* yi = y + (long)i * n;
    for (int p = 0; p < k; ++p) {
      const float v = xi[p];
      const float* wp = w + (long)p * n;
      for (int j = 0; j < n; ++j) yi[j] += v * wp[j];
    }
  }
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
    row[i] = std::exp(row[i] - mx);
    sum += row[i];
  }
  const float inv = (float)(1.0 / sum);
  for (int i = 0; i < n; ++i) row[i] *= inv;
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
