// Standalone offline decode: NO model server, NO Python — the native
// engine loads the raw-tensor artifact and runs the whole pipeline
// in-process (the capability of the reference's
// Inference/CppInference/onnx runner, re-hosted on our native engine).
//
// Usage: asr_offline <artifact_dir> <wav> [--dump <logits.bin>]
//                    [--vad <vad_artifact_dir>]
//   artifact_dir: output of tensorflowasr_tpu.export.native_export
//                 (weights.bin + manifest.txt [+ phones.txt chars.txt])
//   --dump:       also write phone logits as int32 t,v header + float32
//                 payload (used by tests/test_native_engine.py parity)
//   --vad:        native OnlineVAD artifact (export_native_vad): segment
//                 the wav first (merge gaps < 0.1 s, resplit > 15 s —
//                 OfflineVAD semantics) and decode per segment, like the
//                 reference offline session (offline_asr_session.py:15-98)
#include <chrono>
#include <cmath>
#include <cstdio>
#include <cstring>
#include <fstream>
#include <string>
#include <vector>

#include "native_model.h"
#include "tokener.h"
#include "vad_native_model.h"
#include "wav_reader.h"

int main(int argc, char** argv) {
  if (argc < 3) {
    std::fprintf(stderr,
                 "usage: %s <artifact_dir> <wav> [--dump <logits.bin>]"
                 " [--vad <vad_artifact_dir>] [--bf16|--int8]\n",
                 argv[0]);
    return 2;
  }
  const std::string dir = argv[1];
  std::string dump_path, vad_dir;
  bool timings = false;
  asr::WeightStore store = asr::WeightStore::kF32;
  for (int i = 3; i < argc; ++i) {
    if (std::strcmp(argv[i], "--dump") == 0 && i + 1 < argc)
      dump_path = argv[i + 1];
    if (std::strcmp(argv[i], "--vad") == 0 && i + 1 < argc)
      vad_dir = argv[i + 1];
    if (std::strcmp(argv[i], "--bf16") == 0)
      store = asr::WeightStore::kBf16;
    if (std::strcmp(argv[i], "--int8") == 0)
      store = asr::WeightStore::kInt8;
    if (std::strcmp(argv[i], "--timings") == 0) timings = true;
  }

  asr::NativeModel model;
  if (!model.Load(dir, store)) {
    std::fprintf(stderr, "failed to load artifact %s\n", dir.c_str());
    return 1;
  }
  asr::WavData wav;
  if (!asr::ReadWav(argv[2], &wav)) {
    std::fprintf(stderr, "failed to read wav %s\n", argv[2]);
    return 1;
  }
  if (wav.sample_rate != model.config().sample_rate) {
    std::fprintf(stderr, "wav rate %d != model rate %d\n", wav.sample_rate,
                 model.config().sample_rate);
    return 1;
  }
  // peak normalization, as the AM dataloader does before inference
  float peak = 0.0f;
  for (float v : wav.samples) peak = std::max(peak, std::fabs(v));
  if (peak > 0)
    for (float& v : wav.samples) v /= peak;

  if (!vad_dir.empty()) {
    // segment-then-decode, the reference offline session's flow
    asr::VadNativeModel vad;
    if (!vad.Load(vad_dir)) {
      std::fprintf(stderr, "failed to load vad artifact %s\n",
                   vad_dir.c_str());
      return 1;
    }
    const auto segs = vad.Segments(wav.samples.data(),
                                   (long)wav.samples.size(),
                                   wav.sample_rate);
    asr::Tokener char_tok;
    const bool have_chars = char_tok.Load(dir + "/chars.txt", false);
    std::string all_text;
    for (size_t si = 0; si < segs.size(); ++si) {
      std::vector<float> seg(wav.samples.begin() + segs[si].start,
                             wav.samples.begin() + segs[si].end);
      asr::Tensor enc = model.Encode(seg);
      asr::Tensor logits = model.CtcLogits(enc);
      std::vector<int> phones = model.GreedyPhones(logits);
      std::vector<int> chars = model.Translate(phones, enc);
      std::printf("segment %zu [%.2f, %.2f]s:", si,
                  segs[si].start / (double)wav.sample_rate,
                  segs[si].end / (double)wav.sample_rate);
      std::string text;
      if (have_chars) {
        const int end_id = char_tok.EndId();
        for (size_t i = 0; i < phones.size() && i < chars.size(); ++i) {
          if (chars[i] == end_id) break;
          text += char_tok.Token(chars[i]);
        }
        std::printf(" %s", text.c_str());
      } else {
        for (size_t i = 0; i < phones.size(); ++i)
          std::printf(" %d", phones[i]);
      }
      std::printf("\n");
      all_text += text;
    }
    std::printf("text: %s\n", all_text.c_str());
    return 0;
  }

  const auto t_decode0 = std::chrono::steady_clock::now();
  auto lap = [last = t_decode0]() mutable {
    const auto now = std::chrono::steady_clock::now();
    const double s = std::chrono::duration<double>(now - last).count();
    last = now;
    return s;
  };
  asr::Tensor enc = model.Encode(wav.samples);
  if (timings) std::printf("stage_encode: %.4f\n", lap());
  asr::Tensor logits = model.CtcLogits(enc);
  if (timings) std::printf("stage_ctc: %.4f\n", lap());
  if (!dump_path.empty()) {
    std::ofstream f(dump_path, std::ios::binary);
    int hdr[2] = {logits.dim(0), logits.dim(1)};
    f.write(reinterpret_cast<char*>(hdr), sizeof(hdr));
    f.write(reinterpret_cast<const char*>(logits.data.data()),
            logits.size() * sizeof(float));
  }
  std::vector<int> phones = model.GreedyPhones(logits);
  if (timings) std::printf("stage_greedy: %.4f\n", lap());
  std::vector<int> chars = model.Translate(phones, enc);
  if (timings) std::printf("stage_translate: %.4f\n", lap());
  // decode-only wall time (excludes weight load/re-encode and wav IO) —
  // what bench.py uses for honest per-audio-second RTF
  const double decode_s =
      std::chrono::duration<double>(std::chrono::steady_clock::now() -
                                    t_decode0)
          .count();
  std::printf("decode_seconds: %.6f\n", decode_s);
  std::printf("audio_seconds: %.6f\n",
              (double)wav.samples.size() / model.config().sample_rate);

  std::printf("phone_ids:");
  for (int id : phones) std::printf(" %d", id);
  std::printf("\n");
  std::printf("char_ids:");
  for (int id : chars) std::printf(" %d", id);
  std::printf("\n");

  asr::Tokener phone_tok, char_tok;
  if (phone_tok.Load(dir + "/phones.txt", false)) {
    std::printf("phones:");
    for (int id : phones) std::printf(" %s", phone_tok.Token(id).c_str());
    std::printf("\n");
  }
  if (char_tok.Load(dir + "/chars.txt", false)) {
    std::string text;
    const int end_id = char_tok.EndId();
    for (size_t i = 0; i < phones.size() && i < chars.size(); ++i) {
      if (chars[i] == end_id) break;
      text += char_tok.Token(chars[i]);
    }
    std::printf("text: %s\n", text.c_str());
  }
  return 0;
}
