#include "chunk_native_model.h"

#include <cmath>
#include <cstdio>
#include <cstring>
#include <fstream>
#include <sstream>

#include "native_math.h"

namespace asr {

using namespace asr::math;

namespace {

// buffer_validity (chunk_conformer.py:169-184), B=1:
// slot j of [cache_len + t] holds a REAL frame?
inline bool SlotValid(int j, int cache_len, int t, int fill, int skip) {
  (void)t;
  const int f = std::min(fill, cache_len);
  if (j < cache_len - f) return false;                  // zero-init prefix
  if (j >= cache_len && j < cache_len + skip) return false;  // ring garbage
  return true;
}

// Right-aligned lookahead ring feed (ChunkConformer._ring_feed), B=1.
// x_out = [wb + t, d]; returns skip; updates ring/fill; n_final out.
// in_skip marks a garbage PREFIX of `fresh` (an upstream ring still
// warming up); real frames always form a contiguous suffix.
Tensor RingFeed(Tensor* ring, int* ring_fill, const Tensor& fresh, int wb,
                int* skip, int* n_final, int in_skip = 0) {
  const int t = fresh.dim(0);
  if (wb == 0) {
    *skip = in_skip;
    *n_final = std::max(t - in_skip, 0);
    return fresh;
  }
  const int d = fresh.dim(1);
  Tensor x;
  x.shape = {wb + t, d};
  x.data.resize((long)(wb + t) * d);
  std::memcpy(x.data.data(), ring->data.data(), sizeof(float) * wb * d);
  std::memcpy(x.data.data() + (long)wb * d, fresh.data.data(),
              sizeof(float) * t * d);
  *skip = (wb - std::min(*ring_fill, wb)) + in_skip;
  // new ring = last wb rows of x
  std::memcpy(ring->data.data(), x.data.data() + (long)t * d,
              sizeof(float) * wb * d);
  *ring_fill = std::min(*ring_fill + std::max(t - in_skip, 0), wb);
  *n_final = std::max(t - *skip, 0);
  return x;
}

Tensor ZerosT(int t, int d) {
  Tensor z;
  z.shape = {t, d};
  z.data.assign((long)t * d, 0.0f);
  return z;
}

// conv2d 3x3 VALID stride (st, sf) + relu; x [T, F, Cin], kernel
// [3, 3, Cin, Cout] (flax layout).
Tensor Conv2dValidRelu(const Tensor& x, const Tensor& kernel,
                       const Tensor& bias, int st, int sf) {
  const int t = x.dim(0), f = x.dim(1), cin = x.dim(2);
  const int kh = kernel.dim(0), kw = kernel.dim(1);
  const int cout = kernel.dim(3);
  const int ot = (t - kh) / st + 1, of = (f - kw) / sf + 1;
  Tensor y;
  y.shape = {ot, of, cout};
  y.data.assign((long)ot * of * cout, 0.0f);
  for (int i = 0; i < ot; ++i)
    for (int j = 0; j < of; ++j) {
      float* out = y.data.data() + ((long)i * of + j) * cout;
      for (int a = 0; a < kh; ++a) {
        const int ti = i * st + a;
        for (int b = 0; b < kw; ++b) {
          const int fj = j * sf + b;
          const float* xin = x.data.data() + ((long)ti * f + fj) * cin;
          const float* w =
              kernel.data.data() + (((long)a * kw + b) * cin) * cout;
          for (int ci = 0; ci < cin; ++ci)
            for (int co = 0; co < cout; ++co)
              out[co] += xin[ci] * w[ci * cout + co];
        }
      }
      for (int co = 0; co < cout; ++co)
        out[co] = std::max(out[co] + bias.data[co], 0.0f);
    }
  return y;
}

int ArgMaxRow(const float* row, int n) {
  int best = 0;
  for (int j = 1; j < n; ++j)
    if (row[j] > row[best]) best = j;
  return best;
}

}  // namespace

const Tensor& ChunkNativeModel::get(const std::string& name) const {
  auto it = tensors_.find(name);
  if (it == tensors_.end()) {
    std::fprintf(stderr, "chunk_native_model: missing tensor %s\n",
                 name.c_str());
    static Tensor empty;
    return empty;
  }
  return it->second;
}

Tensor ChunkNativeModel::DenseByName(const Tensor& x,
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

bool ChunkNativeModel::Load(const std::string& dir, WeightStore store) {
  std::ifstream mf(dir + "/manifest.txt");
  if (!mf) return false;
  std::ifstream wf(dir + "/weights.bin", std::ios::binary);
  if (!wf) return false;

  bool is_chunk = false;
  std::string line;
  while (std::getline(mf, line)) {
    std::istringstream ss(line);
    std::string kind;
    ss >> kind;
    if (kind == "config") {
      std::string key, value;
      ss >> key >> value;
      auto stk = [&](const char* p, ChunkStackCfg* c) {
        const std::string pre(p);
        if (key == pre + "_dmodel") c->dmodel = std::stoi(value);
        else if (key == pre + "_num_blocks") c->num_blocks = std::stoi(value);
        else if (key == pre + "_head_size") c->head_size = std::stoi(value);
        else if (key == pre + "_num_heads") c->num_heads = std::stoi(value);
        else if (key == pre + "_kernel_size")
          c->kernel_size = std::stoi(value);
        else if (key == pre + "_fc_factor") c->fc_factor = std::stof(value);
        else if (key == pre + "_win_front") c->win_front = std::stoi(value);
        else if (key == pre + "_win_back") c->win_back = std::stoi(value);
      };
      if (key == "kind") is_chunk = (value == "chunk");
      else if (key == "dmodel") cfg_.dmodel = std::stoi(value);
      else if (key == "reduction_factor")
        cfg_.reduction_factor = std::stoi(value);
      else if (key == "sample_rate") cfg_.sample_rate = std::stoi(value);
      else if (key == "n_mels") cfg_.n_mels = std::stoi(value);
      else if (key == "stride_ms") cfg_.stride_ms = std::stoi(value);
      else if (key == "chunk_num") cfg_.chunk_num = std::stoi(value);
      else if (key == "n_fft") cfg_.n_fft = std::stoi(value);
      else if (key == "num_phone_classes")
        cfg_.num_phone_classes = std::stoi(value);
      else if (key == "num_char_classes")
        cfg_.num_char_classes = std::stoi(value);
      else {
        stk("enc", &cfg_.enc);
        stk("pk", &cfg_.pk);
        stk("dec", &cfg_.dec);
        stk("hlp", &cfg_.hlp);
      }
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
  // Flatten MHA projection kernels/biases to 2-D/1-D once, so the hot
  // path calls Dense on them directly instead of copying+reshaping the
  // weight tensor every block step ([d,h,hs] -> [d,h*hs]; out kernel
  // [h,hs,d] -> [h*hs,d]; bias [h,hs] -> [h*hs]).
  for (auto& kv : tensors_) {
    const std::string& n = kv.first;
    if (n.find("/mhsa/mha/") == std::string::npos) continue;
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
  // FFT frontend eligibility — same verification as the offline engine
  // (native_model.cpp): the stored DFT basis must equal the analytic
  // hann-windowed Fourier basis or the GEMM path is kept.
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
  return is_chunk && cfg_.num_phone_classes > 0;
}

ChunkStreamState ChunkNativeModel::InitState() const {
  ChunkStreamState st;
  st.wav.assign(cfg_.chunk_samples(), 0.0f);
  st.sub = ZerosT(cfg_.sub_length(), cfg_.n_mels);
  auto stack = [](const ChunkStackCfg& c) {
    StackState s;
    for (int i = 0; i < c.num_blocks; ++i) {
      s.key.push_back(ZerosT(c.win_front, c.num_heads * c.head_size));
      s.val.push_back(ZerosT(c.win_front, c.num_heads * c.head_size));
      s.cnn.push_back(ZerosT(c.kernel_size, c.dmodel));
    }
    return s;
  };
  st.enc = stack(cfg_.enc);
  st.pk = stack(cfg_.pk);
  st.hlp = stack(cfg_.hlp);
  st.dec = stack(cfg_.dec);
  st.enc_ring = ZerosT(std::max(cfg_.enc.lookahead(), 1), cfg_.dmodel);
  st.pk_ring = ZerosT(std::max(cfg_.pk.lookahead(), 1), cfg_.dmodel);
  st.hlp_ring = ZerosT(std::max(cfg_.hlp.lookahead(), 1), cfg_.dmodel);
  st.dec_ring = ZerosT(std::max(cfg_.dec.lookahead(), 1), cfg_.dmodel);
  return st;
}

// -- front --------------------------------------------------------------

Tensor ChunkNativeModel::FrontStep(ChunkStreamState* st,
                                   const float* chunk) const {
  const int cs = cfg_.chunk_samples();
  const int hop = cfg_.hop();
  const int n_fft = cfg_.n_fft;
  const int n_freq = n_fft / 2 + 1;
  const int n_mels = cfg_.n_mels;

  // 2-chunk window: [wav tail | new chunk]
  std::vector<float> full(2 * cs);
  std::memcpy(full.data(), st->wav.data(), sizeof(float) * cs);
  std::memcpy(full.data() + cs, chunk, sizeof(float) * cs);
  std::memcpy(st->wav.data(), chunk, sizeof(float) * cs);

  // 'valid' causal framing: frame i = samples [i*hop - (n_fft-1),
  // i*hop], left zero-padded (ops/frontend.py frame_signal 'valid');
  // n_frames = ceil(T/hop); keep the last chunk_num.
  const int total = 2 * cs;
  const int frames_all = (total + hop - 1) / hop;
  const int t = cfg_.chunk_num;
  const int first = frames_all - t;
  // DFT [n_fft, 2*n_freq] / mel basis [n_freq, n_mels] — may be bf16
  auto mm = [&](const float* xp, const char* name, float* yp, int m, int k,
                int n) {
    std::map<std::string, Bf16Tensor>::const_iterator it = bf16_.find(name);
    if (it != bf16_.end())
      MatMul(xp, it->second.data.data(), yp, m, k, n);
    else
      MatMul(xp, get(name).data.data(), yp, m, k, n);
  };
  Tensor mel;
  mel.shape = {t, n_mels};
  mel.data.assign((long)t * n_mels, 0.0f);
  // Batch all chunk frames into ONE [t, n_fft] x [n_fft, 2*n_freq] GEMM
  // (and one mel GEMM) — per-frame m=1 matmuls fall off the register-
  // tiled kernel's fast path and dominated the profile.
  std::vector<float> frames((long)t * n_fft, 0.0f);
  std::vector<float> spec((long)t * 2 * n_freq);
  std::vector<float> db((long)t * n_freq);
  const float inv_ln10 = 1.0f / std::log(10.0f);
  for (int f = 0; f < t; ++f) {
    const int end = (first + f) * hop;           // inclusive frame end
    const int start = end - (n_fft - 1);
    float* row = frames.data() + (long)f * n_fft;
    for (int i = 0; i < n_fft; ++i) {
      const int s = start + i;
      row[i] = (s >= 0 && s < total) ? full[s] : 0.0f;
    }
  }
  if (fft_frontend_) {
    // packed real-pair FFT — kills both the DFT GEMM's FLOPs and its
    // per-chunk basis weight stream (2-4 MB in bf16/f32 storage)
    std::vector<float> re(n_fft), im(n_fft);
    for (int f = 0; f < t; f += 2) {
      const float* fa = frames.data() + (long)f * n_fft;
      const bool two = f + 1 < t;
      const float* fb = two ? fa + n_fft : nullptr;
      for (int p = 0; p < n_fft; ++p) {
        re[p] = fa[p] * fft_window_[p];
        im[p] = two ? fb[p] * fft_window_[p] : 0.0f;
      }
      FftRun(fft_plan_, re.data(), im.data());
      float* da = db.data() + (long)f * n_freq;
      float* dbr = two ? da + n_freq : nullptr;
      for (int j = 0; j < n_freq; ++j) {
        const int nj = (n_fft - j) & (n_fft - 1);
        const float xr = re[j], xi = im[j], yr = re[nj], yi = im[nj];
        const float ar = 0.5f * (xr + yr), ai = 0.5f * (xi - yi);
        da[j] = std::log(std::max(ar * ar + ai * ai, 1e-10f)) * inv_ln10;
        if (two) {
          const float br = 0.5f * (xi + yi), bi = 0.5f * (yr - xr);
          dbr[j] =
              std::log(std::max(br * br + bi * bi, 1e-10f)) * inv_ln10;
        }
      }
    }
  } else {
    mm(frames.data(), "frontend/dft", spec.data(), t, n_fft, 2 * n_freq);
    // plain log10 power — the causal chunk variant has NO max-norm
    // (ops/frontend.py chunk_amplitude_to_db)
    for (int f = 0; f < t; ++f) {
      const float* sp = spec.data() + (long)f * 2 * n_freq;
      float* dbf = db.data() + (long)f * n_freq;
      for (int j = 0; j < n_freq; ++j) {
        const float re = sp[j], im = sp[n_freq + j];
        dbf[j] = std::log(std::max(re * re + im * im, 1e-10f)) * inv_ln10;
      }
    }
  }
  mm(db.data(), "frontend/freq2mel", mel.data.data(), t, n_freq, n_mels);

  // subsampling on [mel tail | new mel], freq pad [2, 2], two VALID convs
  const int sl = cfg_.sub_length();
  const int tt = sl + t;
  Tensor x;
  x.shape = {tt, n_mels + 4, 1};
  x.data.assign((long)tt * (n_mels + 4), 0.0f);
  for (int i = 0; i < tt; ++i) {
    const float* src = (i < sl)
                           ? st->sub.data.data() + (long)i * n_mels
                           : mel.data.data() + (long)(i - sl) * n_mels;
    std::memcpy(x.data.data() + ((long)i * (n_mels + 4) + 2), src,
                sizeof(float) * n_mels);
  }
  // new mel tail = last sl rows of [tail | mel]
  Tensor new_sub = ZerosT(sl, n_mels);
  for (int i = 0; i < sl; ++i) {
    const int j = tt - sl + i;
    const float* src = (j < sl)
                           ? st->sub.data.data() + (long)j * n_mels
                           : mel.data.data() + (long)(j - sl) * n_mels;
    std::memcpy(new_sub.data.data() + (long)i * n_mels, src,
                sizeof(float) * n_mels);
  }
  st->sub = std::move(new_sub);

  const std::string p = "params/front/conv_subsampling/";
  x = Conv2dValidRelu(x, get(p + "conv1/kernel"), get(p + "conv1/bias"),
                      cfg_.reduction_factor / 2, 2);
  x = Conv2dValidRelu(x, get(p + "conv2/kernel"), get(p + "conv2/bias"),
                      2, 2);
  const int xt = x.dim(0);
  x.shape = {xt, x.dim(1) * x.dim(2)};
  x = DenseByName(x, p + "linear");
  // keep the last sub_length frames
  Tensor out;
  out.shape = {sl, x.dim(1)};
  out.data.assign(x.data.end() - (long)sl * x.dim(1), x.data.end());
  return out;
}

// -- chunk block (streaming) ---------------------------------------------

void ChunkNativeModel::BlockStream(const std::string& prefix,
                                   const ChunkStackCfg& c, Tensor* x,
                                   Tensor* key_cache, Tensor* val_cache,
                                   Tensor* g_cache, int fill, int skip,
                                   int n_keep) const {
  const std::string p = "params/" + prefix + "/";
  const int d = x->shape.back();
  const int t = x->dim(0);

  auto ff = [&](const std::string& mod) {
    Tensor y = *x;
    LayerNormIp(&y, get(p + mod + "/ln/scale"), get(p + mod + "/ln/bias"));
    y = DenseByName(y, p + mod + "/ffn1");
    for (auto& v : y.data) v = Swish(v);
    y = DenseByName(y, p + mod + "/ffn2");
    for (long i = 0; i < x->size(); ++i)
      x->data[i] += c.fc_factor * y.data[i];
  };

  // advance-ring update: append src[:n_keep] (rows < skip zeroed), keep
  // the last `win` rows. Caches hold DERIVED rows (K/V projections,
  // post-GLU conv activations) — all row-local, so cached rows equal what
  // re-projecting the window would produce, bit for bit.
  auto advance = [&](Tensor* cache, int win, const Tensor& src, int w) {
    const int keep = std::max(std::min(n_keep, win), 0);
    float* cd = cache->data.data();
    // shift left by `keep` rows in place, then write the appended rows
    // (rows < skip are ring-warmup garbage -> zeroed)
    if (keep > 0)
      std::memmove(cd, cd + (long)keep * w,
                   sizeof(float) * (long)(win - keep) * w);
    for (int r = n_keep - keep; r < n_keep; ++r) {
      float* dst = cd + (long)(win - n_keep + r) * w;
      if (r >= skip)
        std::memcpy(dst, src.data.data() + (long)r * w, sizeof(float) * w);
      else
        std::memset(dst, 0, sizeof(float) * w);
    }
  };

  ff("ff_module_1");

  // MHSA with banded mask over [K/V cache | projected new rows]
  // (stream_band_mask). Only the t new rows are layer-normed + projected;
  // the win_front context K/V come from the cache.
  {
    const int wf = c.win_front;
    const int L = wf + t;
    const int h = c.num_heads, hs = c.head_size;
    const int dk = h * hs;
    const std::string a = p + "mhsa/mha/";
    Tensor y = *x;
    LayerNormIp(&y, get(p + "mhsa/ln/scale"), get(p + "mhsa/ln/bias"));
    Tensor qn = DenseByName(y, a + "query");
    Tensor kn = DenseByName(y, a + "key");
    Tensor vn = DenseByName(y, a + "value");
    Tensor K;
    K.shape = {L, dk};
    K.data.resize((long)L * dk);
    std::memcpy(K.data.data(), key_cache->data.data(),
                sizeof(float) * wf * dk);
    std::memcpy(K.data.data() + (long)wf * dk, kn.data.data(),
                sizeof(float) * t * dk);
    Tensor V;
    V.shape = {L, dk};
    V.data.resize((long)L * dk);
    std::memcpy(V.data.data(), val_cache->data.data(),
                sizeof(float) * wf * dk);
    std::memcpy(V.data.data() + (long)wf * dk, vn.data.data(),
                sizeof(float) * t * dk);
    advance(key_cache, wf, kn, dk);
    advance(val_cache, wf, vn, dk);

    const float scale = 1.0f / std::sqrt((float)hs);
    Tensor ctx;
    ctx.shape = {t, dk};
    ctx.data.assign((long)t * dk, 0.0f);
    std::vector<float> scores(L);
    std::vector<char> valid(L);
    for (int j = 0; j < L; ++j)
      valid[j] = SlotValid(j, wf, t, fill, skip) ? 1 : 0;
    for (int head = 0; head < h; ++head) {
      for (int qi = 0; qi < t; ++qi) {
        // band for local query index p = wf + qi (stream_band_mask)
        const int pq = wf + qi;
        int low = std::max(pq - wf, 0);
        int high = std::min(pq + c.win_back, L);
        low -= std::max(low - (L - c.win_back), 0);
        high += std::max(c.win_back - high, 0);
        const float* qv = qn.data.data() + (long)qi * dk + head * hs;
        for (int j = 0; j < L; ++j) {
          const bool ok = valid[j] && j >= low && j <= high;
          if (!ok) {
            scores[j] = -1e30f;
            continue;
          }
          const float* kj = K.data.data() + (long)j * dk + head * hs;
          float s = 0;
          for (int e = 0; e < hs; ++e) s += qv[e] * kj[e];
          scores[j] = s * scale;
        }
        SoftmaxRow(scores.data(), L);
        float* out = ctx.data.data() + (long)qi * dk + head * hs;
        for (int j = 0; j < L; ++j) {
          const float w = scores[j];
          // masked slots exp to ~2^-125 under FastExp (not exact 0):
          // skip anything that small — it contributes < 1e-30 and
          // subnormal FMAs are slow on x86
          if (w <= 1e-30f) continue;
          const float* vj = V.data.data() + (long)j * dk + head * hs;
          for (int e = 0; e < hs; ++e) out[e] += w * vj[e];
        }
      }
    }
    Tensor o = DenseByName(ctx, a + "out");
    for (long i = 0; i < x->size(); ++i) x->data[i] += o.data[i];
  }

  // causal conv module over [post-GLU cache | new rows]: LN + pw_conv_1
  // + GLU are row-local, so only the t new rows are computed.
  {
    const int k = c.kernel_size;
    const int L = k + t;
    const std::string m = p + "conv_module/";
    Tensor y = *x;
    LayerNormIp(&y, get(m + "ln/scale"), get(m + "ln/bias"));
    y = DenseByName(y, m + "pw_conv_1");
    // GLU + zero invalid slots (== offline causal zero pad at conv input);
    // new row r sits at window index k + r. Scratch tensors are
    // thread_local: the per-block alloc/zero churn showed up in the
    // profile (gn/z are the two hottest ZerosT sites).
    thread_local Tensor gn;
    gn.shape = {t, d};
    gn.data.resize((long)t * d);
    for (int r = 0; r < t; ++r) {
      if (!SlotValid(k + r, k, t, fill, skip)) {
        std::memset(gn.data.data() + (long)r * d, 0, sizeof(float) * d);
        continue;
      }
      for (int j = 0; j < d; ++j)
        gn.data[(long)r * d + j] =
            y.data[(long)r * 2 * d + j] *
            Sigmoid(y.data[(long)r * 2 * d + d + j]);
    }
    Tensor g;
    g.shape = {L, d};
    g.data.resize((long)L * d);
    std::memcpy(g.data.data(), g_cache->data.data(), sizeof(float) * k * d);
    std::memcpy(g.data.data() + (long)k * d, gn.data.data(),
                sizeof(float) * t * d);
    advance(g_cache, k, gn, d);
    // depthwise causal conv, pad (k-1) left, keep last t rows
    const Tensor& kern = get(m + "dw_conv/kernel");  // [k, 1, d]
    const Tensor& dbias = get(m + "dw_conv/bias");
    thread_local Tensor z;
    z.shape = {t, d};
    z.data.assign((long)t * d, 0.0f);
    for (int i = 0; i < t; ++i) {
      float* zi = z.data.data() + (long)i * d;
      const int pos = k + i;                 // output row in full coords
      for (int a2 = 0; a2 < k; ++a2) {
        const int ti = pos - (k - 1) + a2;
        if (ti < 0 || ti >= L) continue;
        const float* gi = g.data.data() + (long)ti * d;
        const float* w = kern.data.data() + (long)a2 * d;
        for (int j = 0; j < d; ++j) zi[j] += gi[j] * w[j];
      }
      for (int j = 0; j < d; ++j) zi[j] += dbias.data[j];
    }
    Tensor y2 = DenseByName(z, m + "dw_pw");
    {
      const std::string bs = "batch_stats/" + prefix + "/conv_module/bn/";
      const Tensor& mean = get(bs + "mean");
      const Tensor& var = get(bs + "var");
      const Tensor& scale = get(m + "bn/scale");
      const Tensor& bias = get(m + "bn/bias");
      const int n = y2.shape.back();
      for (int i = 0; i < t; ++i)
        for (int j = 0; j < n; ++j) {
          float& v = y2.data[(long)i * n + j];
          v = (v - mean.data[j]) /
                  std::sqrt(var.data[j] + kBnEps) * scale.data[j] +
              bias.data[j];
          v = Swish(v);
        }
    }
    y2 = DenseByName(y2, m + "pw_conv_2");
    for (long i = 0; i < x->size(); ++i) x->data[i] += y2.data[i];
  }

  ff("ff_module_2");
  LayerNormIp(x, get(p + "ln/scale"), get(p + "ln/bias"));
}

Tensor ChunkNativeModel::StackStream(const std::string& prefix,
                                     const ChunkStackCfg& c, StackState* st,
                                     const Tensor& x, int skip) const {
  const int t = x.dim(0);
  const int n_keep = t - c.lookahead();
  Tensor cur = x;
  for (int i = 0; i < c.num_blocks; ++i)
    BlockStream(prefix + "/block_" + std::to_string(i), c, &cur,
                &st->key[i], &st->val[i], &st->cnn[i], st->fill, skip,
                n_keep);
  st->fill += std::max(n_keep - skip, 0);
  return cur;
}

// -- fused streaming step --------------------------------------------------

ChunkStepResult ChunkNativeModel::Step(ChunkStreamState* st,
                                       const float* chunk,
                                       bool live) const {
  ChunkStepResult res;
  const int t = cfg_.sub_length();
  const int blank = cfg_.num_phone_classes - 1;

  Tensor front_out = FrontStep(st, chunk);
  int skip_e = 0, n_final_e = 0;
  Tensor x_e = RingFeed(&st->enc_ring, &st->enc_ring_fill, front_out,
                        cfg_.enc.lookahead(), &skip_e, &n_final_e);
  Tensor enc_out = StackStream("encoder", cfg_.enc, &st->enc, x_e, skip_e);
  // encoder final region: slots [skip_e, t) of the first t rows
  if (enc_out.dim(0) > t) {
    enc_out.data.resize((long)t * enc_out.dim(1));
    enc_out.shape[0] = t;
  }

  int skip = 0, n_final = 0;
  Tensor xin = RingFeed(&st->pk_ring, &st->pk_ring_fill, enc_out,
                        cfg_.pk.lookahead(), &skip, &n_final,
                        /*in_skip=*/t - n_final_e);
  Tensor proj = DenseByName(xin, "params/phone_picker/project");
  Tensor hidden =
      StackStream("phone_picker/stack", cfg_.pk, &st->pk, proj, skip);
  Tensor logits = DenseByName(hidden, "params/phone_picker/fully_connected");
  // first t rows are this step's slots; last n_final of them are real
  res.n_final = n_final;
  const int vp = logits.dim(1);
  for (int f = 0; f < t; ++f)
    res.phone_ids.push_back(
        ArgMaxRow(logits.data.data() + (long)f * vp, vp));

  const int wb = cfg_.dec.lookahead();
  const int d = cfg_.dmodel;
  const int vc = cfg_.num_char_classes;
  for (int f = 0; f < t; ++f) {
    const bool valid = f >= t - n_final;
    const bool keep = valid && res.phone_ids[f] != blank;
    if (!keep) continue;
    res.picked_any = true;
    Tensor hf;
    hf.shape = {1, d};
    hf.data.assign(hidden.data.data() + (long)f * hidden.dim(1),
                   hidden.data.data() + (long)f * hidden.dim(1) + d);
    int skip_h = 0, nf_h = 0;
    Tensor x_h = RingFeed(&st->hlp_ring, &st->hlp_ring_fill, hf,
                          cfg_.hlp.lookahead(), &skip_h, &nf_h);
    Tensor helper_out =
        StackStream("helper/stack", cfg_.hlp, &st->hlp, x_h, skip_h);
    // helper final region: first row of this step's slot
    if (helper_out.dim(0) > 1) {
      helper_out.data.resize(helper_out.dim(1));
      helper_out.shape[0] = 1;
    }
    int skip2 = 0, nf2 = 0;
    Tensor x2 = RingFeed(&st->dec_ring, &st->dec_ring_fill, helper_out, wb,
                         &skip2, &nf2, /*in_skip=*/1 - nf_h);
    Tensor p2 = DenseByName(x2, "params/decoder/project");
    Tensor dout = StackStream("decoder/stack", cfg_.dec, &st->dec, p2, skip2);
    if (live) {
      // char logits for the committed row AND the wb provisional rows
      // (live lookahead text, like the JAX fused_stream_step)
      Tensor lg = DenseByName(dout, "params/decoder/fully_connected");
      if (nf2 > 0)
        res.char_ids.push_back(ArgMaxRow(lg.data.data(), vc));
      if (wb > 0) {
        res.provisional.clear();
        for (int j = 0; j < wb; ++j) {
          if (j < wb - st->dec_ring_fill) continue;   // not yet filled
          res.provisional.push_back(
              ArgMaxRow(lg.data.data() + (long)(1 + j) * vc, vc));
        }
      }
    } else if (nf2 > 0) {
      // no live text wanted: decode only the committed row — the
      // [num_char_classes=9161]-wide FC is the single most expensive GEMM
      // per picked phone, and provisional rows are display-only (the
      // reference's native session has no live lookahead text at all)
      Tensor row0;
      row0.shape = {1, dout.dim(1)};
      row0.data.assign(dout.data.begin(), dout.data.begin() + dout.dim(1));
      Tensor lg = DenseByName(row0, "params/decoder/fully_connected");
      res.char_ids.push_back(ArgMaxRow(lg.data.data(), vc));
    }
  }
  return res;
}

}  // namespace asr
