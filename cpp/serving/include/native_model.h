// Standalone (no-Python) offline ConformerCTC inference engine.
//
// Native counterpart of the reference's onnxruntime C++ session
// (Inference/CppInference/onnx/src/core/asr_session.cpp) for OUR model:
// loads the raw-tensor artifact written by
// tensorflowasr_tpu/export/native_export.py and re-implements the exact
// offline pipeline in portable C++:
//   wav -> log-mel (framed DFT + Slaney mel, dB max-norm)
//       -> ConvSubsampling -> N ConformerBlocks
//       -> CTCDecoder -> greedy collapse
//       -> Translator (phone embedding + cross-attention RBlocks)
// Numerics mirror models/conformer.py + ops/frontend.py in float32
// (parity asserted in tests/test_native_engine.py against the JAX
// pipeline).
#pragma once

#include <map>
#include <string>
#include <vector>

namespace asr {

struct Tensor {
  std::vector<int> shape;
  std::vector<float> data;

  int dim(int i) const { return shape[i]; }
  long size() const {
    long n = 1;
    for (int d : shape) n *= d;
    return n;
  }
};

// bf16-stored weight matrix (see native_math.h WVal): activations and
// accumulation stay f32; only the streamed weight bytes are halved.
struct Bf16Tensor {
  std::vector<int> shape;
  std::vector<unsigned short> data;

  int dim(int i) const { return shape[i]; }
};

// int8-stored weight matrix with per-output-column symmetric scales:
// w[p,j] == data[p*n+j] * scale[j]. The matmul accumulates the raw int8
// values in f32 and applies scale[j] (fused with the bias add) at
// writeback, so the inner loop stays the same SIMD form as bf16 with
// half the streamed bytes again. Engines keep precision-sensitive bases
// (frontend DFT/mel) in bf16 even in int8 mode.
struct Int8Tensor {
  std::vector<int> shape;
  std::vector<signed char> data;
  std::vector<float> scale;  // [shape.back()]
  // AVX-512 VNNI fast path (filled at load only when the CPU supports
  // vpdpbusd): weights repacked p4-interleaved — byte (p%4) of lane j of
  // group p/4 — so one 64-byte load feeds _mm512_dpbusd_epi32 for 16
  // output columns x 4 reduction rows; plus per-column weight sums for
  // the unsigned-activation (+128) correction term.
  std::vector<signed char> packed;  // [(k4/4) * n16 * 4]
  std::vector<int> colsum;          // [shape.back()]

  int dim(int i) const { return shape[i]; }
};

// Weight storage mode for the standalone engines (Load argument).
enum class WeightStore { kF32, kBf16, kInt8 };

// Radix-2 FFT plan (bit-reversal + per-stage twiddles). Built at Load
// when the artifact's DFT basis is the analytic hann-windowed Fourier
// basis, replacing the [frames, n_fft] x [n_fft, 2*n_freq] frontend GEMM
// (~25% of offline decode) with ~40x fewer ops. Helpers in native_math.h.
struct FftPlan {
  int n = 0;
  std::vector<int> rev;          // bit-reversal permutation
  std::vector<float> wre, wim;   // per-stage twiddles, concatenated
};

struct NativeConfig {
  int dmodel = 144;
  int reduction_factor = 4;
  int num_blocks = 13;
  int head_size = 36;
  int num_heads = 4;
  int kernel_size = 32;
  float fc_factor = 0.5f;
  int ctcdecoder_num_blocks = 1;
  int ctcdecoder_kernel_size = 32;
  float ctcdecoder_fc_factor = 0.5f;
  int translator_num_blocks = 2;
  int translator_kernel_size = 32;
  float translator_fc_factor = 0.5f;
  int sample_rate = 16000;
  int n_mels = 80;
  int stride_ms = 10;
  int n_fft = 1024;
  int num_phone_classes = 0;
  int num_char_classes = 0;
  std::string mel_layer_type = "Melspectrogram";
};

class NativeModel {
 public:
  // Loads manifest.txt + weights.bin from `artifact_dir`. store selects
  // large-2-D weight storage (see ReencodeWeights in native_math.h):
  // kBf16 halves weight bytes, kInt8 runs the GEMMs — the offline
  // pipeline's dominant FLOPs — on AVX-512 VNNI where available.
  bool Load(const std::string& artifact_dir,
            WeightStore store = WeightStore::kF32);

  const NativeConfig& config() const { return cfg_; }

  // wav [T] float32 (normalized to peak 1 by caller, matching the AM
  // dataloader) -> encoder output [frames, dmodel].
  Tensor Encode(const std::vector<float>& wav) const;

  // encoder output -> phone logits [frames, num_phone_classes].
  Tensor CtcLogits(const Tensor& enc) const;

  // greedy CTC collapse (blank = num_phone_classes - 1).
  std::vector<int> GreedyPhones(const Tensor& phone_logits) const;

  // phone ids (will be padded with 10 zeros, as the serving pipeline
  // does) + encoder output -> char ids [len(phone_ids) + 10].
  std::vector<int> Translate(const std::vector<int>& phone_ids,
                             const Tensor& enc) const;

  bool has(const std::string& name) const {
    return tensors_.count(name) > 0;
  }
  const Tensor& get(const std::string& name) const;

 private:
  Tensor LogMel(const std::vector<float>& wav) const;
  Tensor ConvSubsampling(const Tensor& mel) const;
  // 3x3 SAME conv + relu as im2col GEMM through DenseByName (kernels are
  // flattened to [9*cin, cout] at Load, so bf16/int8 modes cover them).
  Tensor Conv2dGemmRelu(const Tensor& x, const std::string& base, int st,
                        int sf) const;
  // in-place conformer block under param prefix (params/<prefix>/...).
  void ConformerBlockFwd(Tensor* x, const std::string& prefix,
                         int kernel_size, float fc_factor,
                         const Tensor* cross_enc) const;
  // Dense through `base`/kernel + `base`/bias, dispatching on storage.
  Tensor DenseByName(const Tensor& x, const std::string& base) const;

  NativeConfig cfg_;
  std::map<std::string, Tensor> tensors_;
  std::map<std::string, Bf16Tensor> bf16_;
  std::map<std::string, Int8Tensor> int8_;
  // FFT frontend fast path (set at Load if the stored basis verifies
  // against the analytic hann-windowed form; else LogMel falls back to
  // the basis GEMM — e.g. a custom/trained basis)
  bool fft_frontend_ = false;
  FftPlan fft_plan_;
  std::vector<float> fft_window_;
};

}  // namespace asr
