// Streaming ASR session — native re-design of the reference ASR::Session
// (Inference/CppInference/onnx/src/core/asr_session.h:54-102 in
// Z-yq/TensorflowASR): feed wav chunks via Parase(); the session runs VAD
// every 0.1 s on a 0.2 s trailing buffer, starts on voice, ends after
// `sil_checks` consecutive silent checks, then runs
// encode -> CTC greedy (native) -> translate -> argmax (native) to hanzi.
//
// Tensor ops go through the model server (see model_client.h); vocab
// mapping and decoding are native.
#pragma once

#include <memory>
#include <string>
#include <vector>

#include "model_client.h"
#include "tokener.h"

namespace asr {

enum class ParseState { kIdle = 0, kStarted = 1, kEnded = 2 };

class Session {
 public:
  struct Options {
    std::string endpoint;          // model server unix path or host:port
    std::string phone_vocab;
    std::string char_vocab;
    int sample_rate = 16000;
    int chunk_samples = 8000;      // 0.5 s encoder chunk
    int vad_frame_input = 80;      // 8 kHz VAD frame
    int vad_downsample = 2;        // 16 kHz input -> 8 kHz VAD
    int sil_checks = 5;            // consecutive silent checks to end
    float vad_threshold = 0.0f;    // logit threshold
  };

  bool Initial(const Options& opts);

  // Feed one wav chunk (float [-1,1]); 0.1 s cadence recommended.
  ParseState Parase(const float* data, int n);

  // Force end-of-stream decode of whatever is buffered.
  ParseState Finish();

  // Valid after kEnded.
  const std::string& Get_Asr_Result() const { return result_; }

 private:
  bool VadVoiced();
  bool DecodeUtterance();

  Options opts_;
  ModelClient client_;
  Tokener phones_;
  Tokener chars_;
  std::vector<float> vad_buf_;     // trailing 0.2 s
  std::vector<float> utt_buf_;     // current utterance audio
  std::vector<Tensor> enc_cache_;  // per-chunk encoder outputs
  int enc_consumed_ = 0;           // samples already encoded
  int silent_checks_ = 0;
  bool started_ = false;
  std::string result_;
};

}  // namespace asr
