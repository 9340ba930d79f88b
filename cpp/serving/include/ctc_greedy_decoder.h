// Header-only CTC greedy decoder: per-frame argmax -> collapse adjacent
// repeats -> drop blank. Native equivalent of the reference
// Inference/CppInference/onnx/src/core/ctc_greedy_decoder.h:5-44.
#pragma once

#include <vector>

namespace asr {

// logits: row-major [n_frames, n_classes].
inline std::vector<int> CtcGreedyDecode(const float* logits, int n_frames,
                                        int n_classes, int blank_id) {
  std::vector<int> out;
  int prev = -1;
  for (int t = 0; t < n_frames; ++t) {
    const float* row = logits + static_cast<long>(t) * n_classes;
    int best = 0;
    float best_v = row[0];
    for (int c = 1; c < n_classes; ++c) {
      if (row[c] > best_v) {
        best_v = row[c];
        best = c;
      }
    }
    if (best != prev && best != blank_id) out.push_back(best);
    prev = best;
  }
  return out;
}

}  // namespace asr
