// Minimal native unit tests (no framework): tokener, greedy decoder, wav
// round trip, bf16 weight math. Exits non-zero on failure.
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <fstream>
#include <vector>

#include "ctc_greedy_decoder.h"
#include "native_math.h"
#include "tokener.h"
#include "wav_reader.h"

#define CHECK(cond)                                                     \
  do {                                                                  \
    if (!(cond)) {                                                      \
      std::fprintf(stderr, "CHECK failed at %s:%d: %s\n", __FILE__,     \
                   __LINE__, #cond);                                    \
      std::exit(1);                                                     \
    }                                                                   \
  } while (0)

static void TestTokener() {
  const char* path = "/tmp/asr_test_vocab.txt";
  {
    std::ofstream out(path);
    out << "<S>\n</S>\nni3\nhao3\n";
  }
  asr::Tokener t;
  CHECK(t.Load(path, /*blank_at_zero=*/false));
  CHECK(t.NumClasses() == 5);  // 4 tokens + appended blank
  CHECK(t.Blank() == 4);
  CHECK(t.Id("ni3") == 2);
  CHECK(t.Token(3) == "hao3");
  CHECK(t.StartId() == 0 && t.EndId() == 1);
  CHECK(t.Id("absent") == -1);

  asr::Tokener t0;
  CHECK(t0.Load(path, /*blank_at_zero=*/true));
  CHECK(t0.Blank() == 0);
  CHECK(t0.Id("ni3") == 3);
}

static void TestGreedyDecoder() {
  // 6 frames, 3 classes, blank=2: argmax seq = [0,0,2,1,1,0] -> [0,1,0]
  std::vector<float> logits = {
      9, 0, 0,  9, 0, 0,  0, 0, 9,
      0, 9, 0,  0, 9, 0,  9, 0, 0,
  };
  auto out = asr::CtcGreedyDecode(logits.data(), 6, 3, 2);
  CHECK(out.size() == 3);
  CHECK(out[0] == 0 && out[1] == 1 && out[2] == 0);
}

static void TestWavRoundTrip() {
  const char* path = "/tmp/asr_test_tone.wav";
  const int sr = 16000, n = 1600;
  std::vector<int16_t> pcm(n);
  for (int i = 0; i < n; ++i)
    pcm[i] = static_cast<int16_t>(
        20000 * std::sin(2.0 * 3.14159265 * 440.0 * i / sr));
  {
    std::ofstream out(path, std::ios::binary);
    auto w32 = [&](uint32_t v) { out.write(reinterpret_cast<char*>(&v), 4); };
    auto w16 = [&](uint16_t v) { out.write(reinterpret_cast<char*>(&v), 2); };
    out.write("RIFF", 4);
    w32(36 + n * 2);
    out.write("WAVE", 4);
    out.write("fmt ", 4);
    w32(16);
    w16(1);   // PCM
    w16(1);   // mono
    w32(sr);
    w32(sr * 2);
    w16(2);
    w16(16);
    out.write("data", 4);
    w32(n * 2);
    out.write(reinterpret_cast<char*>(pcm.data()), n * 2);
  }
  asr::WavData wav;
  CHECK(asr::ReadWav(path, &wav));
  CHECK(wav.sample_rate == sr);
  CHECK(static_cast<int>(wav.samples.size()) == n);
  CHECK(std::fabs(wav.samples[0]) < 1e-4);
  float maxv = 0;
  for (float v : wav.samples) maxv = std::max(maxv, std::fabs(v));
  CHECK(maxv > 0.55f && maxv < 0.65f);  // 20000/32768
}

static void TestBf16MatMul() {
  // bf16 weight storage (native_math.h): round-trip + GEMM accuracy.
  using asr::math::Bf16ToF32;
  using asr::math::F32ToBf16;
  CHECK(Bf16ToF32(F32ToBf16(1.0f)) == 1.0f);
  CHECK(Bf16ToF32(F32ToBf16(-2.5f)) == -2.5f);
  // round-to-nearest-even: 1 + 2^-9 rounds back to 1, 1 + 3*2^-9 rounds up
  CHECK(Bf16ToF32(F32ToBf16(1.0f + 1.0f / 512)) == 1.0f);
  CHECK(Bf16ToF32(F32ToBf16(1.0f + 3.0f / 512)) == 1.0f + 1.0f / 128);

  const int m = 5, k = 96, n = 80;  // covers 4-row block + tail paths
  std::vector<float> x((size_t)m * k), wf((size_t)k * n);
  std::vector<uint16_t> wh((size_t)k * n);
  unsigned s = 1234;
  auto rnd = [&]() {  // LCG in [-1, 1)
    s = s * 1664525u + 1013904223u;
    return (float)(int32_t)s / 2147483648.0f;
  };
  for (auto& v : x) v = rnd();
  for (size_t i = 0; i < wf.size(); ++i) {
    wf[i] = rnd();
    wh[i] = F32ToBf16(wf[i]);
  }
  std::vector<float> yf((size_t)m * n), yh((size_t)m * n);
  asr::math::MatMul(x.data(), wf.data(), yf.data(), m, k, n);
  asr::math::MatMul(x.data(), wh.data(), yh.data(), m, k, n);
  double num = 0, den = 0;
  for (size_t i = 0; i < yf.size(); ++i) {
    num += (yf[i] - yh[i]) * (yf[i] - yh[i]);
    den += yf[i] * yf[i];
  }
  // bf16 has 8 mantissa bits -> per-element rel error ~2^-9; the GEMM
  // accumulates independent roundings, keeping relative L2 error ~1e-3
  CHECK(num / den < 1e-5);
  CHECK(num / den > 0);  // it IS quantized (not silently f32)
}

static void TestInt8Kernels() {
  // int8 path: per-column weight quantize + per-row activation quantize
  // + exact int32 dot must track the f32 GEMM within quantization noise,
  // and the VNNI kernel (when this CPU has it) must be BIT-IDENTICAL to
  // the portable scalar kernel — --int8 numerics are CPU-independent.
  const int m = 5, k = 97, n = 83;  // deliberately unaligned k4/n16 tails
  const int k4 = (k + 3) & ~3, n16 = (n + 15) & ~15;
  std::vector<float> x((size_t)m * k), wf((size_t)k * n), bias(n);
  unsigned s = 99;
  auto rnd = [&]() {
    s = s * 1664525u + 1013904223u;
    return (float)(int32_t)s / 2147483648.0f;
  };
  for (auto& v : x) v = rnd();
  for (auto& v : wf) v = rnd();
  for (auto& v : bias) v = rnd();
  std::vector<signed char> q((size_t)k * n);
  std::vector<float> scale(n);
  asr::math::QuantizeInt8(wf.data(), k, n, q.data(), scale.data());
  for (int j = 0; j < n; ++j) {
    CHECK(scale[j] > 0);
    float amax = 0;
    for (int p = 0; p < k; ++p)
      amax = std::max(amax, std::fabs(wf[(size_t)p * n + j]));
    // column max quantizes to exactly +-127
    CHECK(std::fabs(amax - 127.0f * scale[j]) < 1e-6f * amax);
  }
  std::vector<int> colsum;
  asr::math::ColSumInt8(q.data(), k, n, &colsum);

  std::vector<unsigned char> u((size_t)m * k4);
  std::vector<float> sx(m);
  asr::math::QuantizeRowsU8(x.data(), m, k, k4, u.data(), sx.data());

  std::vector<float> yq((size_t)m * n);
  asr::math::DenseInt8ScalarKernel(u.data(), q.data(), colsum.data(),
                                   scale.data(), bias.data(), sx.data(),
                                   yq.data(), m, k, k4, n);

  // accuracy vs the f32 GEMM (+bias)
  std::vector<float> yf((size_t)m * n);
  asr::math::MatMul(x.data(), wf.data(), yf.data(), m, k, n);
  double num = 0, den = 0;
  for (size_t i = 0; i < yf.size(); ++i) {
    yf[i] += bias[i % n];
    num += (yf[i] - yq[i]) * (yf[i] - yq[i]);
    den += yf[i] * yf[i];
  }
  // weight + activation each add ~1/254 per-element rounding over k=97
  // independent terms -> relative L2 well under 1e-3 on random data
  CHECK(num / den < 1e-3);
  CHECK(num / den > 0);  // it IS quantized

#if defined(__x86_64__)
  if (asr::math::HasVnni()) {
    std::vector<signed char> packed;
    asr::math::PackInt8Vnni(q.data(), k, n, &packed);
    std::vector<float> yv((size_t)m * n, -1e30f);
    asr::math::DenseInt8VnniKernel(u.data(), packed.data(), colsum.data(),
                                   scale.data(), bias.data(), sx.data(),
                                   yv.data(), m, k4, n, n16);
    for (size_t i = 0; i < yq.size(); ++i) CHECK(yv[i] == yq[i]);
  }
#endif
}

static void TestFftMatchesDft() {
  // packed real-pair FFT (the frontend fast path) vs the literal
  // hann-windowed DFT sums it replaces.
  const int n = 256, n_freq = n / 2 + 1;
  asr::FftPlan plan;
  CHECK(asr::math::FftPlanInit(&plan, n));
  CHECK(!asr::math::FftPlanInit(&plan, 100));  // non-power-of-2 refused

  std::vector<float> a(n), b(n), win(n);
  unsigned s = 7;
  auto rnd = [&]() {
    s = s * 1664525u + 1013904223u;
    return (float)(int32_t)s / 2147483648.0f;
  };
  for (int p = 0; p < n; ++p) {
    a[p] = rnd();
    b[p] = rnd();
    win[p] = (float)(0.5 - 0.5 * std::cos(2.0 * 3.14159265358979323846 *
                                          p / n));
  }
  std::vector<float> re(n), im(n);
  for (int p = 0; p < n; ++p) {
    re[p] = a[p] * win[p];
    im[p] = b[p] * win[p];
  }
  asr::math::FftRun(plan, re.data(), im.data());
  for (int j = 0; j < n_freq; ++j) {
    const int nj = (n - j) & (n - 1);
    const float ar = 0.5f * (re[j] + re[nj]), ai = 0.5f * (im[j] - im[nj]);
    const float br = 0.5f * (im[j] + im[nj]), bi = 0.5f * (re[nj] - re[j]);
    double war = 0, wai = 0, wbr = 0, wbi = 0;  // direct windowed DFT
    for (int p = 0; p < n; ++p) {
      const double ang = 2.0 * 3.14159265358979323846 * p * j / n;
      war += a[p] * win[p] * std::cos(ang);
      wai -= a[p] * win[p] * std::sin(ang);
      wbr += b[p] * win[p] * std::cos(ang);
      wbi -= b[p] * win[p] * std::sin(ang);
    }
    CHECK(std::fabs(ar - war) < 1e-3);
    CHECK(std::fabs(ai - wai) < 1e-3);
    CHECK(std::fabs(br - wbr) < 1e-3);
    CHECK(std::fabs(bi - wbi) < 1e-3);
  }
}

int main() {
  TestTokener();
  TestGreedyDecoder();
  TestWavRoundTrip();
  TestBf16MatMul();
  TestInt8Kernels();
  TestFftMatchesDft();
  std::printf("all native tests passed\n");
  return 0;
}
