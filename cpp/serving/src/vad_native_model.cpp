#include "vad_native_model.h"

#include <algorithm>
#include <cmath>
#include <cstdio>
#include <fstream>
#include <sstream>

#include "native_math.h"

namespace asr {

using namespace asr::math;

const Tensor& VadNativeModel::get(const std::string& name) const {
  auto it = tensors_.find(name);
  if (it == tensors_.end()) {
    std::fprintf(stderr, "vad_native_model: missing tensor %s\n",
                 name.c_str());
    static Tensor empty;
    return empty;
  }
  return it->second;
}

bool VadNativeModel::Load(const std::string& dir) {
  std::ifstream mf(dir + "/manifest.txt");
  if (!mf) return false;
  std::ifstream wf(dir + "/weights.bin", std::ios::binary);
  if (!wf) return false;

  bool is_vad = false;
  std::string line;
  while (std::getline(mf, line)) {
    std::istringstream ss(line);
    std::string kind;
    ss >> kind;
    if (kind == "config") {
      std::string key, value;
      ss >> key >> value;
      if (key == "kind") is_vad = (value == "vad");
      else if (key == "dmodel") cfg_.dmodel = std::stoi(value);
      else if (key == "frame_input") cfg_.frame_input = std::stoi(value);
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
      t.data.resize(n);
      wf.seekg(offset);
      wf.read(reinterpret_cast<char*>(t.data.data()),
              n * (long)sizeof(float));
      if (!wf) return false;
      tensors_[name] = std::move(t);
    }
  }
  return is_vad && !tensors_.empty();
}

namespace {

// Causal Conv1D: kernel [k, in, out], pad (k-1, 0) left — flax
// nn.Conv(padding=[(2, 0)]) with k=3 in models/vad.py.
Tensor CausalConv1D(const Tensor& x, const Tensor& kernel,
                    const Tensor& bias) {
  const int t = x.shape[0];
  const int cin = x.shape[1];
  const int k = kernel.shape[0];
  const int cout = kernel.shape[2];
  Tensor y;
  y.shape = {t, cout};
  y.data.assign((long)t * cout, 0.0f);
  for (int i = 0; i < t; ++i) {
    float* yi = y.data.data() + (long)i * cout;
    for (int j = 0; j < k; ++j) {
      const int src = i - (k - 1) + j;
      if (src < 0) continue;
      const float* xs = x.data.data() + (long)src * cin;
      const float* wj = kernel.data.data() + (long)j * cin * cout;
      for (int c = 0; c < cin; ++c) {
        const float v = xs[c];
        if (v == 0.0f) continue;
        const float* w = wj + (long)c * cout;
        for (int o = 0; o < cout; ++o) yi[o] += v * w[o];
      }
    }
    for (int o = 0; o < cout; ++o) yi[o] += bias.data[o];
  }
  return y;
}

void ReluIp(Tensor* x) {
  for (auto& v : x->data) v = std::max(v, 0.0f);
}

}  // namespace

std::vector<float> VadNativeModel::Infer(const float* frames,
                                         int n_frames) const {
  Tensor x;
  x.shape = {n_frames, cfg_.frame_input};
  x.data.assign(frames, frames + (long)n_frames * cfg_.frame_input);

  Tensor h = Dense(x, get("params/embed/kernel"), get("params/embed/bias"));
  h = Dense(h, get("params/dense1/kernel"), get("params/dense1/bias"));
  ReluIp(&h);
  h = CausalConv1D(h, get("params/cnn1/kernel"), get("params/cnn1/bias"));
  ReluIp(&h);
  h = Dense(h, get("params/dense2/kernel"), get("params/dense2/bias"));
  ReluIp(&h);
  h = CausalConv1D(h, get("params/cnn2/kernel"), get("params/cnn2/bias"));
  ReluIp(&h);
  h = Dense(h, get("params/dense3/kernel"), get("params/dense3/bias"));
  ReluIp(&h);
  Tensor logits = Dense(h, get("params/fc/kernel"), get("params/fc/bias"));

  std::vector<float> probs(n_frames);
  for (int i = 0; i < n_frames; ++i) probs[i] = Sigmoid(logits.data[i]);
  return probs;
}

bool VadNativeModel::Voiced(const float* samples, long n, int downsample,
                            float threshold) const {
  std::vector<float> ds;
  ds.reserve(n / downsample + 1);
  for (long i = 0; i < n; i += downsample) ds.push_back(samples[i]);
  const int n_frames = (int)(ds.size() / cfg_.frame_input);
  if (n_frames <= 0) return false;
  const auto probs = Infer(ds.data(), n_frames);
  int voiced = 0;
  for (float p : probs)
    if (p >= threshold) ++voiced;
  // majority vote over the window (reference VadInference counts voiced
  // frames in the trailing 0.2 s buffer)
  return voiced * 2 >= n_frames;
}

std::vector<VadSegment> VadNativeModel::Segments(
    const float* samples, long n, int sample_rate, int downsample,
    float threshold, float merge_gap_s, float max_len_s) const {
  std::vector<float> ds;
  ds.reserve(n / downsample + 1);
  for (long i = 0; i < n; i += downsample) ds.push_back(samples[i]);
  const int n_frames = (int)(ds.size() / cfg_.frame_input);
  std::vector<VadSegment> segs;
  if (n_frames <= 0) return segs;
  const auto probs = Infer(ds.data(), n_frames);

  // frame -> original-signal samples
  const long fs = (long)cfg_.frame_input * downsample;
  long start = -1;
  for (int i = 0; i < n_frames; ++i) {
    const bool v = probs[i] >= threshold;
    if (v && start < 0) start = (long)i * fs;
    if (!v && start >= 0) {
      segs.push_back({start, (long)i * fs});
      start = -1;
    }
  }
  if (start >= 0) segs.push_back({start, n});

  // merge gaps < merge_gap_s (offline_vad.py recover)
  const long gap = (long)(merge_gap_s * sample_rate);
  std::vector<VadSegment> merged;
  for (const auto& s : segs) {
    if (!merged.empty() && s.start - merged.back().end < gap)
      merged.back().end = s.end;
    else
      merged.push_back(s);
  }
  // resplit segments > max_len_s
  const long maxlen = (long)(max_len_s * sample_rate);
  std::vector<VadSegment> out;
  for (const auto& s : merged) {
    long b = s.start;
    while (s.end - b > maxlen) {
      out.push_back({b, b + maxlen});
      b += maxlen;
    }
    out.push_back({b, s.end});
  }
  return out;
}

}  // namespace asr
