// Standalone (no-Python) STREAMING ChunkConformer inference engine.
//
// Goes beyond the reference's native path (Inference/CppInference runs
// only the offline 3-graph model chunk-wise): this engine executes the
// real SMLTA2 chunk-streaming pipeline — 'valid' causal log-mel +
// subsampling with a mel tail, banded-attention stacks with win_front
// rings, the CTC feature picker, and the lookahead char decoder — in
// portable C++ from the raw-tensor artifact written by
// tensorflowasr_tpu/export/native_export.py::export_native_chunk.
// Numerics mirror models/chunk_conformer.py in float32; streaming output
// is checked against the JAX ChunkStreamSession token-for-token in
// tests/test_native_chunk.py.
#pragma once

#include <map>
#include <string>
#include <vector>

#include "native_model.h"  // asr::Tensor

namespace asr {

struct ChunkStackCfg {
  int dmodel = 144;
  int num_blocks = 1;
  int head_size = 36;
  int num_heads = 4;
  int kernel_size = 32;
  float fc_factor = 0.5f;
  int win_front = 36;
  int win_back = 0;

  // EXACT streaming delay: per-block attention reaches win_back frames
  // ahead, so the stack's receptive cone is num_blocks * win_back (see
  // ChunkStackConfig.lookahead in models/chunk_conformer.py).
  int lookahead() const { return num_blocks * win_back; }
};

struct ChunkNativeConfig {
  int dmodel = 144;
  int reduction_factor = 4;
  int sample_rate = 16000;
  int n_mels = 80;
  int stride_ms = 10;
  int chunk_num = 16;
  int n_fft = 1024;
  int num_phone_classes = 0;
  int num_char_classes = 0;
  ChunkStackCfg enc, pk, dec, hlp;

  int hop() const { return sample_rate * stride_ms / 1000; }
  int chunk_samples() const { return chunk_num * hop(); }
  int sub_length() const { return chunk_num / reduction_factor; }
};

// Per-stack streaming state, per block: POST-projection attention K/V
// rings [win_front, num_heads*head_size] and a POST-GLU conv activation
// ring [kernel_size, d], plus the shared fill counter. Caching after the
// row-local ops (LayerNorm, Q/K/V projection, pointwise conv + GLU are
// all per-row) is bit-identical to re-projecting the window every step
// (what models/chunk_conformer.py ChunkStack.stream_call does on TPU,
// where the re-projection fuses into the step's big GEMMs for free) but
// cuts the per-chunk GEMM work ~2.5x on CPU: only the t new rows are
// projected instead of the whole win_front+t window.
struct StackState {
  std::vector<Tensor> key;
  std::vector<Tensor> val;
  std::vector<Tensor> cnn;
  int fill = 0;
};

struct ChunkStreamState {
  std::vector<float> wav;  // [chunk_samples] tail
  Tensor sub;              // [sub_length, n_mels] mel tail
  StackState enc, pk, hlp, dec;
  // Input rings hold frames still awaiting full lookahead, sized by each
  // stack's lookahead() (= num_blocks * win_back); re-fed next step so
  // streaming equals offline exactly at any stack depth.
  Tensor enc_ring;         // [enc.lookahead(), d] encoder lookahead ring
  int enc_ring_fill = 0;
  Tensor pk_ring;          // [pk.lookahead(), d] picker lookahead ring
  int pk_ring_fill = 0;
  Tensor hlp_ring;         // [hlp.lookahead(), d] helper lookahead ring
  int hlp_ring_fill = 0;
  Tensor dec_ring;         // [dec.lookahead(), d] decoder lookahead ring
  int dec_ring_fill = 0;
};

struct ChunkStepResult {
  std::vector<int> phone_ids;    // sub_length argmax ids (incl. blanks);
  int n_final = 0;               // ... of which the LAST n_final are real
  std::vector<int> char_ids;     // final chars emitted this step
  std::vector<int> provisional;  // live lookahead chars (replace previous
                                 // when picked_any)
  bool picked_any = false;
};

class ChunkNativeModel {
 public:
  // Loads manifest.txt (kind chunk) + weights.bin from `artifact_dir`.
  // store selects large-2-D weight storage: the streaming step is
  // DRAM-bound on weight traffic, so kBf16 halves streamed bytes (~2x)
  // and kInt8 halves them again (per-output-column symmetric scales,
  // Int8Tensor). Activations/accumulation stay f32; in kInt8 mode the
  // precision-sensitive frontend DFT/mel bases stay bf16. Decoded tokens
  // are unchanged on all parity fixtures in both modes.
  bool Load(const std::string& dir, WeightStore store = WeightStore::kF32);
  bool Load(const std::string& dir, bool bf16) {
    return Load(dir, bf16 ? WeightStore::kBf16 : WeightStore::kF32);
  }
  const ChunkNativeConfig& config() const { return cfg_; }

  ChunkStreamState InitState() const;
  // Process exactly chunk_samples() samples. live=false skips the
  // provisional-row char logits (display-only lookahead text), leaving
  // only the committed-row decode — cheaper when no live text is shown.
  ChunkStepResult Step(ChunkStreamState* st, const float* chunk,
                       bool live = true) const;

 private:
  const Tensor& get(const std::string& name) const;
  // Dense through `base`/kernel + `base`/bias, dispatching on storage
  // (bf16 if converted at load, else f32).
  Tensor DenseByName(const Tensor& x, const std::string& base) const;
  Tensor FrontStep(ChunkStreamState* st, const float* chunk) const;
  Tensor StackStream(const std::string& prefix, const ChunkStackCfg& c,
                     StackState* st, const Tensor& x, int skip) const;
  void BlockStream(const std::string& prefix, const ChunkStackCfg& c,
                   Tensor* x, Tensor* key_cache, Tensor* val_cache,
                   Tensor* g_cache, int fill, int skip, int n_keep) const;

  std::map<std::string, Tensor> tensors_;
  std::map<std::string, Bf16Tensor> bf16_;
  std::map<std::string, Int8Tensor> int8_;
  ChunkNativeConfig cfg_;
  // FFT frontend fast path (see native_model.h FftPlan): replaces the
  // per-chunk [chunk_num, n_fft] x [n_fft, 2*n_freq] DFT GEMM — both its
  // FLOPs and its 2-4 MB/chunk basis weight stream — when the stored
  // basis verifies against the analytic hann-windowed form at Load.
  bool fft_frontend_ = false;
  FftPlan fft_plan_;
  std::vector<float> fft_window_;
};

}  // namespace asr
