// Standalone (no-Python) OnlineVAD inference.
//
// Native counterpart of the reference C++ session's vad.onnx
// (Inference/CppInference/onnx/src/core/asr_session.cpp:38-76
// VadInference) for OUR model: loads the raw-tensor artifact written by
// tensorflowasr_tpu/export/native_export.py::export_native_vad and
// re-implements the causal CNN (models/vad.py::OnlineVAD — Dense embed ->
// Dense+relu -> causal Conv1D(2d, k=3) -> relu -> Dense+relu -> causal
// Conv1D -> relu -> Dense+relu -> Dense(1) logit) in float32, parity
// asserted in tests/test_native_vad.py.
//
// Also carries the serving-side helpers the reference session implements
// around the model: 2x downsample for the 8 kHz VAD on 16 kHz input, a
// per-window voiced vote, and offline segment extraction with
// merge-short-gaps / resplit-long-segments (OfflineVAD.recover,
// vad/offline_vad.py:139-178).
#pragma once

#include <string>
#include <vector>

#include "native_model.h"  // asr::Tensor

namespace asr {

struct VadNativeConfig {
  int dmodel = 32;
  int frame_input = 80;  // samples per 10 ms frame at 8 kHz
};

struct VadSegment {
  long start;  // sample offsets in the ORIGINAL (pre-downsample) signal
  long end;
};

class VadNativeModel {
 public:
  bool Load(const std::string& dir);
  const VadNativeConfig& config() const { return cfg_; }

  // frames [n_frames, frame_input] -> per-frame voice PROBABILITIES.
  std::vector<float> Infer(const float* frames, int n_frames) const;

  // Serving helper: 16 kHz samples -> downsample by `downsample`, frame,
  // infer; true when >= `min_voiced` of the last `window` frame probs
  // exceed `threshold` (reference VadInference vote).
  bool Voiced(const float* samples, long n, int downsample = 2,
              float threshold = 0.5f) const;

  // Offline segmentation of a whole 16 kHz signal (OfflineVAD.recover
  // semantics): threshold frame probs, merge gaps < merge_gap_s, resplit
  // segments > max_len_s. Returned offsets index the ORIGINAL signal.
  std::vector<VadSegment> Segments(const float* samples, long n,
                                   int sample_rate, int downsample = 2,
                                   float threshold = 0.5f,
                                   float merge_gap_s = 0.1f,
                                   float max_len_s = 15.0f) const;

 private:
  const Tensor& get(const std::string& name) const;

  VadNativeConfig cfg_;
  std::map<std::string, Tensor> tensors_;
};

}  // namespace asr
