#include "asr_session.h"

#include <algorithm>
#include <cstring>

#include "ctc_greedy_decoder.h"

namespace asr {

bool Session::Initial(const Options& opts) {
  opts_ = opts;
  if (!phones_.Load(opts.phone_vocab, /*blank_at_zero=*/false)) return false;
  if (!chars_.Load(opts.char_vocab, /*blank_at_zero=*/false)) return false;
  if (!client_.Connect(opts.endpoint)) return false;
  // the server knows the model's chunk quantum; an unquantized local
  // guess would lose the remainder of every chunk
  std::vector<Tensor> out;
  if (client_.Call("info", {}, &out) && !out.empty() &&
      !out[0].i32.empty() && out[0].i32[0] > 0) {
    opts_.chunk_samples = out[0].i32[0];
  }
  return true;
}

bool Session::VadVoiced() {
  // Downsample the trailing buffer for the 8 kHz VAD
  // (reference asr_session.cpp:38-76 VadInference).
  std::vector<float> ds;
  ds.reserve(vad_buf_.size() / opts_.vad_downsample);
  for (size_t i = 0; i < vad_buf_.size(); i += opts_.vad_downsample)
    ds.push_back(vad_buf_[i]);
  int n_frames = static_cast<int>(ds.size()) / opts_.vad_frame_input;
  if (n_frames == 0) return false;
  Tensor in;
  in.dims = {1, static_cast<uint32_t>(n_frames),
             static_cast<uint32_t>(opts_.vad_frame_input)};
  in.f32.assign(ds.begin(),
                ds.begin() + static_cast<long>(n_frames) *
                                 opts_.vad_frame_input);
  std::vector<Tensor> out;
  if (!client_.Call("vad", {in}, &out) || out.empty()) return false;
  int voiced = 0;
  for (float v : out[0].f32)
    if (v >= opts_.vad_threshold) ++voiced;
  return voiced * 2 >= static_cast<int>(out[0].f32.size());
}

ParseState Session::Parase(const float* data, int n) {
  vad_buf_.insert(vad_buf_.end(), data, data + n);
  int keep = opts_.sample_rate / 5;  // trailing 0.2 s
  if (static_cast<int>(vad_buf_.size()) > keep)
    vad_buf_.erase(vad_buf_.begin(),
                   vad_buf_.end() - keep);
  if (started_) utt_buf_.insert(utt_buf_.end(), data, data + n);

  bool voiced = VadVoiced();
  if (!started_) {
    if (voiced) {
      started_ = true;
      silent_checks_ = 0;
      // seed the utterance with the trailing buffer (captures the onset)
      utt_buf_.assign(vad_buf_.begin(), vad_buf_.end());
      return ParseState::kStarted;
    }
    return ParseState::kIdle;
  }

  // started: encode whenever a full chunk is pending
  while (static_cast<int>(utt_buf_.size()) - enc_consumed_ >=
         opts_.chunk_samples) {
    Tensor in;
    in.dims = {1, static_cast<uint32_t>(opts_.chunk_samples)};
    in.f32.assign(utt_buf_.begin() + enc_consumed_,
                  utt_buf_.begin() + enc_consumed_ + opts_.chunk_samples);
    std::vector<Tensor> out;
    if (client_.Call("encode", {in}, &out) && !out.empty())
      enc_cache_.push_back(std::move(out[0]));
    enc_consumed_ += opts_.chunk_samples;
  }

  if (voiced) {
    silent_checks_ = 0;
  } else if (++silent_checks_ >= opts_.sil_checks) {
    bool ok = DecodeUtterance();
    started_ = false;
    silent_checks_ = 0;
    utt_buf_.clear();
    enc_cache_.clear();
    enc_consumed_ = 0;
    return ok ? ParseState::kEnded : ParseState::kIdle;
  }
  return ParseState::kIdle;
}

ParseState Session::Finish() {
  if (!started_ || utt_buf_.empty()) return ParseState::kIdle;
  bool ok = DecodeUtterance();
  started_ = false;
  utt_buf_.clear();
  enc_cache_.clear();
  enc_consumed_ = 0;
  return ok ? ParseState::kEnded : ParseState::kIdle;
}

bool Session::DecodeUtterance() {
  // Encode the residual tail (padded to a full chunk server-side).
  int tail = static_cast<int>(utt_buf_.size()) - enc_consumed_;
  if (tail > 400) {
    Tensor in;
    in.dims = {1, static_cast<uint32_t>(tail)};
    in.f32.assign(utt_buf_.begin() + enc_consumed_, utt_buf_.end());
    std::vector<Tensor> out;
    if (client_.Call("encode", {in}, &out) && !out.empty())
      enc_cache_.push_back(std::move(out[0]));
  }
  if (enc_cache_.empty()) return false;

  // Concatenate encoder outputs [T, d].
  uint32_t d = enc_cache_[0].dims[1];
  uint32_t total_t = 0;
  for (const auto& e : enc_cache_) total_t += e.dims[0];
  Tensor enc;
  enc.dims = {1, total_t, d};
  enc.f32.reserve(static_cast<size_t>(total_t) * d);
  for (const auto& e : enc_cache_)
    enc.f32.insert(enc.f32.end(), e.f32.begin(), e.f32.end());

  // CTC logits from the server; greedy decode natively.
  std::vector<Tensor> out;
  if (!client_.Call("ctc_logits", {enc}, &out) || out.empty()) return false;
  const Tensor& logits = out[0];
  int t = logits.dims[0], v = logits.dims[1];
  std::vector<int> phone_ids =
      CtcGreedyDecode(logits.f32.data(), t, v, phones_.Blank());
  if (phone_ids.empty()) {
    result_.clear();
    return true;
  }

  // Translate: phone ids (+10 zero pad, asr.py:63-94) -> char logits;
  // argmax + stop at </S> natively (asr_session.cpp:171-261).
  Tensor ids;
  ids.is_int = true;
  ids.dims = {1, static_cast<uint32_t>(phone_ids.size() + 10)};
  ids.i32.assign(phone_ids.begin(), phone_ids.end());
  ids.i32.resize(phone_ids.size() + 10, 0);
  std::vector<Tensor> tout;
  if (!client_.Call("translate", {ids, enc}, &tout) || tout.empty())
    return false;
  const Tensor& cl = tout[0];
  int u = cl.dims[0], vc = cl.dims[1];
  int end_id = chars_.EndId();
  result_.clear();
  for (int i = 0; i < u; ++i) {
    const float* row = cl.f32.data() + static_cast<long>(i) * vc;
    int best = 0;
    float best_v = row[0];
    for (int c = 1; c < vc; ++c)
      if (row[c] > best_v) {
        best_v = row[c];
        best = c;
      }
    if (best == 0 || best == end_id) break;
    if (best == chars_.Blank()) continue;  // never emit the CTC blank
    result_ += chars_.Token(best);
  }
  return true;
}

}  // namespace asr
