#include "native_model.h"

#include <chrono>
#include <cmath>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <fstream>
#include <sstream>

#include "native_math.h"

namespace asr {

using namespace asr::math;  // MatMul / Dense / LayerNormIp / ... (shared
                            // with the chunk streaming engine)

const Tensor& NativeModel::get(const std::string& name) const {
  auto it = tensors_.find(name);
  if (it == tensors_.end()) {
    std::fprintf(stderr, "native_model: missing tensor %s\n", name.c_str());
    static Tensor empty;
    return empty;
  }
  return it->second;
}

Tensor NativeModel::DenseByName(const Tensor& x,
                                const std::string& base) const {
  const Tensor& bias = get(base + "/bias");
  const std::string kname = base + "/kernel";
  const auto i8 = int8_.find(kname);
  if (i8 != int8_.end())
    return DenseAny(x, nullptr, nullptr, &i8->second, bias);
  const auto it = bf16_.find(kname);
  if (it != bf16_.end()) return DenseAny(x, nullptr, &it->second, nullptr,
                                         bias);
  return Dense(x, get(kname), bias);
}

bool NativeModel::Load(const std::string& dir, WeightStore store) {
  std::ifstream mf(dir + "/manifest.txt");
  if (!mf) return false;
  std::ifstream wf(dir + "/weights.bin", std::ios::binary);
  if (!wf) return false;

  std::string line;
  while (std::getline(mf, line)) {
    std::istringstream ss(line);
    std::string kind;
    ss >> kind;
    if (kind == "config") {
      std::string key, value;
      ss >> key >> value;
      if (key == "dmodel") cfg_.dmodel = std::stoi(value);
      else if (key == "reduction_factor")
        cfg_.reduction_factor = std::stoi(value);
      else if (key == "num_blocks") cfg_.num_blocks = std::stoi(value);
      else if (key == "head_size") cfg_.head_size = std::stoi(value);
      else if (key == "num_heads") cfg_.num_heads = std::stoi(value);
      else if (key == "kernel_size") cfg_.kernel_size = std::stoi(value);
      else if (key == "fc_factor") cfg_.fc_factor = std::stof(value);
      else if (key == "ctcdecoder_num_blocks")
        cfg_.ctcdecoder_num_blocks = std::stoi(value);
      else if (key == "ctcdecoder_kernel_size")
        cfg_.ctcdecoder_kernel_size = std::stoi(value);
      else if (key == "ctcdecoder_fc_factor")
        cfg_.ctcdecoder_fc_factor = std::stof(value);
      else if (key == "translator_num_blocks")
        cfg_.translator_num_blocks = std::stoi(value);
      else if (key == "translator_kernel_size")
        cfg_.translator_kernel_size = std::stoi(value);
      else if (key == "translator_fc_factor")
        cfg_.translator_fc_factor = std::stof(value);
      else if (key == "sample_rate") cfg_.sample_rate = std::stoi(value);
      else if (key == "n_mels") cfg_.n_mels = std::stoi(value);
      else if (key == "stride_ms") cfg_.stride_ms = std::stoi(value);
      else if (key == "n_fft") cfg_.n_fft = std::stoi(value);
      else if (key == "num_phone_classes")
        cfg_.num_phone_classes = std::stoi(value);
      else if (key == "num_char_classes")
        cfg_.num_char_classes = std::stoi(value);
      else if (key == "mel_layer_type") cfg_.mel_layer_type = value;
    } else if (kind == "tensor") {
      std::string name;
      long offset;
      int ndim;
      ss >> name >> offset >> ndim;
      Tensor t;
      long n = 1;
      for (int i = 0; i < ndim; ++i) {
        int d;
        ss >> d;
        t.shape.push_back(d);
        n *= d;
      }
      if (ndim == 0) t.shape.push_back(1), n = 1;
      t.data.resize(n);
      wf.seekg(offset);
      wf.read(reinterpret_cast<char*>(t.data.data()), n * sizeof(float));
      if (!wf) return false;
      tensors_.emplace(std::move(name), std::move(t));
    }
  }
  // Flatten MHA projection kernels/biases to 2-D/1-D once ([d,h,hs] ->
  // [d,h*hs]; out kernel [h,hs,d] -> [h*hs,d]; bias [h,hs] -> [h*hs]) so
  // the hot path — and the quantizer — see plain Dense weights instead
  // of copying+reshaping per call.
  for (auto& kv : tensors_) {
    const std::string& n = kv.first;
    if (n.find("/mha/") == std::string::npos) continue;
    Tensor& t = kv.second;
    const bool kernel =
        n.size() > 7 && n.compare(n.size() - 7, 7, "/kernel") == 0;
    if (kernel && t.shape.size() == 3) {
      if (n.find("/out/kernel") != std::string::npos)
        t.shape = {t.shape[0] * t.shape[1], t.shape[2]};
      else
        t.shape = {t.shape[0], t.shape[1] * t.shape[2]};
    } else if (!kernel && t.shape.size() == 2) {
      t.shape = {t.shape[0] * t.shape[1]};
    }
  }
  // Flatten the two 3x3 subsampling conv kernels [3,3,cin,cout] ->
  // [9*cin, cout] so the conv runs as an im2col GEMM through DenseByName
  // (and the re-encoder can store conv2 — the model's single biggest
  // GEMM, ~5 GFLOP per 30 s — in bf16/int8 like any Dense).
  for (const char* c : {"params/encoder/conv_subsampling/conv1/kernel",
                        "params/encoder/conv_subsampling/conv2/kernel"}) {
    auto it = tensors_.find(c);
    if (it != tensors_.end() && it->second.shape.size() == 4)
      it->second.shape = {it->second.shape[0] * it->second.shape[1] *
                              it->second.shape[2],
                          it->second.shape[3]};
  }
  // FFT frontend eligibility: the stored DFT basis must equal the
  // analytic hann-windowed Fourier basis (ops/frontend.py stft_kernels).
  // A custom/trained basis fails the spot check and keeps the GEMM path.
  {
    const auto it = tensors_.find("frontend/dft");
    const int n = cfg_.n_fft, n_freq = n / 2 + 1;
    if (it != tensors_.end() && it->second.shape.size() == 2 &&
        it->second.dim(0) == n && it->second.dim(1) == 2 * n_freq &&
        FftPlanInit(&fft_plan_, n)) {
      const Tensor& dft = it->second;
      fft_window_.resize(n);
      const double two_pi = 2.0 * 3.14159265358979323846;
      for (int p = 0; p < n; ++p)
        fft_window_[p] = (float)(0.5 - 0.5 * std::cos(two_pi * p / n));
      bool ok = true;
      for (int p = 0; p < n && ok; p += 89)
        for (int j = 0; j < n_freq; j += 53) {
          const double ang = two_pi * p * j / n;
          const float want_re = fft_window_[p] * (float)std::cos(ang);
          const float want_im = -fft_window_[p] * (float)std::sin(ang);
          if (std::fabs(dft.data[(long)p * 2 * n_freq + j] - want_re) >
                  1e-4f ||
              std::fabs(dft.data[(long)p * 2 * n_freq + n_freq + j] -
                        want_im) > 1e-4f) {
            ok = false;
            break;
          }
        }
      fft_frontend_ = ok;
    }
  }
  ReencodeWeights(&tensors_, &bf16_, &int8_, store);
  return cfg_.num_phone_classes > 0;
}

// -- frontend ---------------------------------------------------------------

Tensor NativeModel::LogMel(const std::vector<float>& wav) const {
  const int n_fft = cfg_.n_fft;
  const int hop = cfg_.sample_rate * cfg_.stride_ms / 1000;
  const int n_freq = n_fft / 2 + 1;
  const int t = (int)wav.size();
  const int frames = (t + hop - 1) / hop;
  int lo, hi;
  SamePad(t, n_fft, hop, &lo, &hi);

  // frame -> windowed DFT matmul (ops/frontend.py power_spectrogram).
  // DFT [n_fft, 2*n_freq] / mel basis [n_freq, n_mels] may be stored
  // bf16 in quantized modes (ReencodeWeights keeps frontend bases out
  // of int8).
  auto mm = [&](const float* xp, const char* name, float* yp, int m,
                int k, int n) {
    std::map<std::string, Bf16Tensor>::const_iterator it = bf16_.find(name);
    if (it != bf16_.end())
      MatMul(xp, it->second.data.data(), yp, m, k, n);
    else
      MatMul(xp, get(name).data.data(), yp, m, k, n);
  };
  // materialize ALL frames (a per-frame m=1 MatMul defeats the register
  // blocking — measured 3x slower; the FFT path reuses the same layout)
  std::vector<float> all_frames((long)frames * n_fft, 0.0f);
  for (int f = 0; f < frames; ++f) {
    const int start = f * hop - lo;
    const int s0 = std::max(start, 0);
    const int s1 = std::min(start + n_fft, t);
    if (s1 > s0)
      std::memcpy(all_frames.data() + (long)f * n_fft + (s0 - start),
                  wav.data() + s0, (size_t)(s1 - s0) * sizeof(float));
  }
  Tensor power;
  power.shape = {frames, n_freq};
  power.data.resize((long)frames * n_freq);
  if (fft_frontend_) {
    // real-packed radix-2 FFT: two windowed real frames per complex
    // transform (split by conjugate symmetry) — ~40x fewer ops than the
    // windowed-DFT GEMM, ~1e-6 relative difference
    std::vector<float> re(n_fft), im(n_fft);
    for (int f = 0; f < frames; f += 2) {
      const float* fa = all_frames.data() + (long)f * n_fft;
      const bool two = f + 1 < frames;
      const float* fb = two ? fa + n_fft : nullptr;
      for (int p = 0; p < n_fft; ++p) {
        re[p] = fa[p] * fft_window_[p];
        im[p] = two ? fb[p] * fft_window_[p] : 0.0f;
      }
      FftRun(fft_plan_, re.data(), im.data());
      float* pa = power.data.data() + (long)f * n_freq;
      float* pb = two ? pa + n_freq : nullptr;
      for (int j = 0; j < n_freq; ++j) {
        const int nj = (n_fft - j) & (n_fft - 1);
        const float xr = re[j], xi = im[j], yr = re[nj], yi = im[nj];
        const float ar = 0.5f * (xr + yr), ai = 0.5f * (xi - yi);
        pa[j] = ar * ar + ai * ai;
        if (two) {
          const float br = 0.5f * (xi + yi), bi = 0.5f * (yr - xr);
          pb[j] = br * br + bi * bi;
        }
      }
    }
  } else {
    std::vector<float> spec((long)frames * 2 * n_freq);
    mm(all_frames.data(), "frontend/dft", spec.data(), frames, n_fft,
       2 * n_freq);
    for (int f = 0; f < frames; ++f) {
      const float* sp = spec.data() + (long)f * 2 * n_freq;
      for (int j = 0; j < n_freq; ++j) {
        const float re = sp[j], im = sp[n_freq + j];
        power.data[(long)f * n_freq + j] = re * re + im * im;
      }
    }
  }

  // dB with per-utterance max-norm, floor -80 (amplitude_to_db)
  const float ln10 = std::log(10.0f);
  float mx = -1e30f;
  for (auto& v : power.data) {
    v = 10.0f * std::log(std::max(v, 1e-10f)) / ln10;
    mx = std::max(mx, v);
  }
  for (auto& v : power.data) v = std::max(v - mx, -80.0f);

  if (cfg_.mel_layer_type == "Spectrogram") return power;

  Tensor mel;                                    // fb [n_freq, n_mels]
  mel.shape = {frames, cfg_.n_mels};
  mel.data.resize((long)frames * cfg_.n_mels);
  mm(power.data.data(), "frontend/freq2mel", mel.data.data(), frames,
     n_freq, cfg_.n_mels);
  return mel;
}

// -- conv subsampling -------------------------------------------------------

// x [T, F, Cin] -> conv2d 3x3 stride (st, sf) SAME + relu. The kernel
// (flax layout [3, 3, Cin, Cout], flattened to [9*Cin, Cout] at Load)
// multiplies im2col patch rows through DenseByName, so the conv GEMM —
// conv2 is the single biggest matmul in the model — uses the same
// register-tiled / bf16 / int8-VNNI kernels as every Dense. Time-blocked
// so the patch buffer stays small; per-row int8 activation quantization
// makes the blocking numerics-neutral.
Tensor NativeModel::Conv2dGemmRelu(const Tensor& x, const std::string& base,
                                   int st, int sf) const {
  const int t = x.dim(0), f = x.dim(1), cin = x.dim(2);
  constexpr int kh = 3, kw = 3;
  const int cout = get(base + "/bias").dim(0);
  int tlo, thi, flo, fhi;
  SamePad(t, kh, st, &tlo, &thi);
  SamePad(f, kw, sf, &flo, &fhi);
  (void)thi;
  (void)fhi;
  const int ot = (t + st - 1) / st, of = (f + sf - 1) / sf;
  const int kdim = kh * kw * cin;
  Tensor y;
  y.shape = {ot, of, cout};
  y.data.resize((long)ot * of * cout);
  constexpr int kBlock = 64;  // output-time rows per GEMM
  Tensor patches;
  for (int i0 = 0; i0 < ot; i0 += kBlock) {
    const int ib = std::min(kBlock, ot - i0);
    patches.shape = {ib * of, kdim};
    patches.data.assign((long)ib * of * kdim, 0.0f);
    for (int i = 0; i < ib; ++i)
      for (int j = 0; j < of; ++j) {
        float* row = patches.data.data() + ((long)i * of + j) * kdim;
        for (int a = 0; a < kh; ++a) {
          const int ti = (i0 + i) * st - tlo + a;
          if (ti < 0 || ti >= t) continue;
          for (int b = 0; b < kw; ++b) {
            const int fj = j * sf - flo + b;
            if (fj < 0 || fj >= f) continue;
            std::memcpy(row + ((long)a * kw + b) * cin,
                        x.data.data() + ((long)ti * f + fj) * cin,
                        (size_t)cin * sizeof(float));
          }
        }
      }
    Tensor out = DenseByName(patches, base);
    for (long e = 0; e < out.size(); ++e)
      out.data[e] = std::max(out.data[e], 0.0f);
    std::memcpy(y.data.data() + (long)i0 * of * cout, out.data.data(),
                (size_t)out.size() * sizeof(float));
  }
  return y;
}

Tensor NativeModel::ConvSubsampling(const Tensor& mel) const {
  // [T, n_mels] -> [T, n_mels, 1]
  Tensor x = mel;
  x.shape = {mel.dim(0), mel.dim(1), 1};
  const std::string p = "params/encoder/conv_subsampling/";
  x = Conv2dGemmRelu(x, p + "conv1", cfg_.reduction_factor / 2, 2);
  x = Conv2dGemmRelu(x, p + "conv2", 2, 2);
  const int t = x.dim(0);
  x.shape = {t, x.dim(1) * x.dim(2)};
  return DenseByName(x, p + "linear");
}

// -- conformer block --------------------------------------------------------

void NativeModel::ConformerBlockFwd(Tensor* x, const std::string& prefix,
                                    int kernel_size, float fc_factor,
                                    const Tensor* cross_enc) const {
  const std::string p = "params/" + prefix + "/";
  const int d = x->shape.back();
  const int t = x->size() / d;

  auto ff = [&](const std::string& mod) {
    Tensor y = *x;
    LayerNormIp(&y, get(p + mod + "/ln/scale"), get(p + mod + "/ln/bias"));
    y = DenseByName(y, p + mod + "/ffn1");
    for (auto& v : y.data) v = Swish(v);
    y = DenseByName(y, p + mod + "/ffn2");
    for (long i = 0; i < x->size(); ++i)
      x->data[i] += fc_factor * y.data[i];
  };

  ff("ff_module_1");

  // MHSA (self) or RMHSA (PE + cross-attention, Translator blocks)
  {
    const bool cross = cross_enc != nullptr;
    const std::string mod = cross ? "rmhsa" : "mhsa";
    Tensor y = *x;
    if (cross) {
      // interleaved sin/cos positional encoding (layers.py:212-231)
      for (int i = 0; i < t; ++i)
        for (int j = 0; j < d; ++j) {
          const double angle =
              i / std::pow(10000.0, (2.0 * (j / 2)) / (double)d);
          y.data[(long)i * d + j] +=
              (j % 2 == 0) ? (float)std::sin(angle)
                           : (float)std::cos(angle);
        }
    }
    LayerNormIp(&y, get(p + mod + "/ln/scale"), get(p + mod + "/ln/bias"));
    const Tensor& kv = cross ? *cross_enc : y;
    const int tk = kv.size() / kv.shape.back();
    const int h = cfg_.num_heads, hs = cfg_.head_size;
    const std::string a = p + mod + "/mha/";
    // q/k/v projections (kernels pre-flattened at load to [d, h*hs])
    auto proj = [&](const Tensor& inp, const char* name) {
      return DenseByName(inp, a + name);         // [*, h*hs]
    };
    Tensor q = proj(y, "query"), k = proj(kv, "key"), v = proj(kv, "value");
    const float scale = 1.0f / std::sqrt((float)hs);
    Tensor ctx;
    ctx.shape = {t, h * hs};
    ctx.data.assign((long)t * h * hs, 0.0f);
    // per-head matmul formulation: Qh [t, hs] @ Kh^T [hs, tk] -> softmax
    // rows -> @ Vh [tk, hs] — the scalar dot loops this replaces were the
    // engine's top hot spot (gprof 41% self in the block forward)
    std::vector<float> qh((long)t * hs), kt((long)hs * tk),
        vh((long)tk * hs), scores((long)t * tk), ctxh((long)t * hs);
    for (int head = 0; head < h; ++head) {
      for (int i = 0; i < t; ++i)
        std::memcpy(qh.data() + (long)i * hs,
                    q.data.data() + (long)i * h * hs + head * hs,
                    (size_t)hs * sizeof(float));
      for (int j = 0; j < tk; ++j) {
        const float* kj = k.data.data() + (long)j * h * hs + head * hs;
        for (int e = 0; e < hs; ++e) kt[(long)e * tk + j] = kj[e];
        std::memcpy(vh.data() + (long)j * hs,
                    v.data.data() + (long)j * h * hs + head * hs,
                    (size_t)hs * sizeof(float));
      }
      MatMul(qh.data(), kt.data(), scores.data(), t, hs, tk);
      for (int i = 0; i < t; ++i) {
        float* row = scores.data() + (long)i * tk;
        for (int j = 0; j < tk; ++j) row[j] *= scale;
        SoftmaxRow(row, tk);
      }
      MatMul(scores.data(), vh.data(), ctxh.data(), t, tk, hs);
      for (int i = 0; i < t; ++i)
        std::memcpy(ctx.data.data() + (long)i * h * hs + head * hs,
                    ctxh.data() + (long)i * hs, (size_t)hs * sizeof(float));
    }
    // out projection (kernel pre-flattened at load to [h*hs, d])
    Tensor o = DenseByName(ctx, a + "out");
    for (long i = 0; i < x->size(); ++i) x->data[i] += o.data[i];
  }

  // conv module
  {
    const std::string m = p + "conv_module/";
    Tensor y = *x;
    LayerNormIp(&y, get(m + "ln/scale"), get(m + "ln/bias"));
    y = DenseByName(y, m + "pw_conv_1");
    // GLU: first half * sigmoid(second half)
    {
      Tensor g;
      g.shape = {t, d};
      g.data.resize((long)t * d);
      for (int i = 0; i < t; ++i)
        for (int j = 0; j < d; ++j)
          g.data[(long)i * d + j] =
              y.data[(long)i * 2 * d + j] *
              Sigmoid(y.data[(long)i * 2 * d + d + j]);
      y = std::move(g);
    }
    // depthwise conv over time, kernel [k, 1, d], SAME
    {
      const Tensor& kern = get(m + "dw_conv/kernel");
      const Tensor& bias = get(m + "dw_conv/bias");
      const int k = kern.dim(0);
      int lo, hi;
      SamePad(t, k, 1, &lo, &hi);
      (void)hi;
      Tensor z;
      z.shape = {t, d};
      z.data.assign((long)t * d, 0.0f);
      for (int i = 0; i < t; ++i) {
        float* zi = z.data.data() + (long)i * d;
        for (int a2 = 0; a2 < k; ++a2) {
          const int ti = i - lo + a2;
          if (ti < 0 || ti >= t) continue;
          const float* yi = y.data.data() + (long)ti * d;
          const float* w = kern.data.data() + (long)a2 * d;
          for (int j = 0; j < d; ++j) zi[j] += yi[j] * w[j];
        }
        for (int j = 0; j < d; ++j) zi[j] += bias.data[j];
      }
      y = std::move(z);
    }
    y = DenseByName(y, m + "dw_pw");
    // BatchNorm (inference: running stats)
    {
      const std::string bs = "batch_stats/" + prefix + "/conv_module/bn/";
      const Tensor& mean = get(bs + "mean");
      const Tensor& var = get(bs + "var");
      const Tensor& scale = get(m + "bn/scale");
      const Tensor& bias = get(m + "bn/bias");
      const int n = y.shape.back();
      for (int i = 0; i < t; ++i)
        for (int j = 0; j < n; ++j) {
          float& v = y.data[(long)i * n + j];
          v = (v - mean.data[j]) /
                  std::sqrt(var.data[j] + kBnEps) * scale.data[j] +
              bias.data[j];
          v = Swish(v);
        }
    }
    y = DenseByName(y, m + "pw_conv_2");
    for (long i = 0; i < x->size(); ++i) x->data[i] += y.data[i];
  }

  ff("ff_module_2");
  LayerNormIp(x, get(p + "ln/scale"), get(p + "ln/bias"));
}

// -- public pipeline --------------------------------------------------------

Tensor NativeModel::Encode(const std::vector<float>& wav) const {
  const bool timings = std::getenv("ASR_STAGE_TIMINGS") != nullptr;
  auto now = [] { return std::chrono::steady_clock::now(); };
  auto t0 = now();
  auto lap = [&](const char* name) {
    if (!timings) return;
    std::fprintf(stderr, "encode_%s: %.4f\n", name,
                 std::chrono::duration<double>(now() - t0).count());
    t0 = now();
  };
  Tensor mel = LogMel(wav);
  lap("logmel");
  Tensor x = ConvSubsampling(mel);
  lap("subsample");
  for (int i = 0; i < cfg_.num_blocks; ++i)
    ConformerBlockFwd(&x,
                      "encoder/conformer_block_" + std::to_string(i),
                      cfg_.kernel_size, cfg_.fc_factor, nullptr);
  lap("blocks");
  return x;
}

Tensor NativeModel::CtcLogits(const Tensor& enc) const {
  const std::string p = "params/ctc_decoder/";
  Tensor x = DenseByName(enc, p + "project");
  for (int i = 0; i < cfg_.ctcdecoder_num_blocks; ++i)
    ConformerBlockFwd(
        &x, "ctc_decoder/decoder_conformer_block_" + std::to_string(i),
        cfg_.ctcdecoder_kernel_size, cfg_.ctcdecoder_fc_factor, nullptr);
  return DenseByName(x, p + "fully_connected");
}

std::vector<int> NativeModel::GreedyPhones(const Tensor& logits) const {
  const int t = logits.dim(0), v = logits.dim(1);
  const int blank = cfg_.num_phone_classes - 1;
  std::vector<int> out;
  int prev = -1;
  for (int i = 0; i < t; ++i) {
    const float* row = logits.data.data() + (long)i * v;
    int best = 0;
    for (int j = 1; j < v; ++j)
      if (row[j] > row[best]) best = j;
    if (best != prev && best != blank) out.push_back(best);
    prev = best;
  }
  return out;
}

std::vector<int> NativeModel::Translate(const std::vector<int>& phone_ids,
                                        const Tensor& enc) const {
  // serving pads decoded phones with 10 zeros (asr_trainer.py:163-170)
  std::vector<int> ids = phone_ids;
  for (int i = 0; i < 10; ++i) ids.push_back(0);
  const std::string p = "params/translator/";
  const Tensor& emb = get(p + "inp_embedding/embedding");  // [Vp, d]
  const int d = emb.dim(1);
  Tensor x;
  x.shape = {(int)ids.size(), d};
  x.data.resize((long)ids.size() * d);
  for (size_t i = 0; i < ids.size(); ++i) {
    const int id = std::max(0, std::min(ids[i], emb.dim(0) - 1));
    std::memcpy(x.data.data() + i * d, emb.data.data() + (long)id * d,
                sizeof(float) * d);
  }
  for (int i = 0; i < cfg_.translator_num_blocks; ++i)
    ConformerBlockFwd(
        &x, "translator/decoder_conformer_block_" + std::to_string(i),
        cfg_.translator_kernel_size, cfg_.translator_fc_factor, &enc);
  Tensor logits = DenseByName(x, p + "fully_connected");
  const int v = logits.dim(1);
  std::vector<int> out;
  for (int i = 0; i < logits.dim(0); ++i) {
    const float* row = logits.data.data() + (long)i * v;
    int best = 0;
    for (int j = 1; j < v; ++j)
      if (row[j] > row[best]) best = j;
    out.push_back(best);
  }
  return out;
}

}  // namespace asr
