// Standalone native CHUNK-STREAMING decoder: no server, no Python.
// Streams a wav through the C++ ChunkConformer engine chunk by chunk,
// printing live text; [final] equals the JAX ChunkStreamSession decode
// (tests/test_native_chunk.py).
//
// Usage: asr_chunk <artifact_dir> <wav> [--quiet] [--bf16|--int8]
//                  [--vad <vad_dir>]
//   --bf16: store large weight matrices as bfloat16 (the streaming step is
//           weight-bandwidth-bound -> ~2x faster; f32 accumulation)
//   --int8: per-column symmetric int8 weights (frontend bases stay bf16)
//           — halves streamed weight bytes again over --bf16
//   artifact_dir: export_native_chunk output (weights.bin, manifest.txt,
//                 phones.txt / chars.txt vocab copies)
//   --vad: native OnlineVAD artifact (export_native_vad) — gate decoding
//          on voice activity like the reference C++ session
//          (asr_session.cpp:171-261): start on a voiced check, finalize
//          the sentence after 5 consecutive silent checks, and skip model
//          compute entirely during silence.
#include <chrono>
#include <cstdio>
#include <cstring>
#include <string>
#include <vector>

#include "chunk_native_model.h"
#include "tokener.h"
#include "vad_native_model.h"
#include "wav_reader.h"

namespace {

std::vector<int> Collapse(const std::vector<int>& ids, int blank) {
  std::vector<int> out;
  int prev = -1;
  for (int i : ids) {
    if (i != prev && i != blank) out.push_back(i);
    prev = i;
  }
  return out;
}

}  // namespace

int main(int argc, char** argv) {
  if (argc < 3) {
    std::fprintf(stderr, "usage: %s <artifact_dir> <wav> [--quiet]\n",
                 argv[0]);
    return 2;
  }
  bool quiet = false;
  asr::WeightStore store = asr::WeightStore::kF32;
  std::string vad_dir;
  for (int i = 3; i < argc; ++i) {
    if (std::strcmp(argv[i], "--quiet") == 0) quiet = true;
    if (std::strcmp(argv[i], "--bf16") == 0) store = asr::WeightStore::kBf16;
    if (std::strcmp(argv[i], "--int8") == 0) store = asr::WeightStore::kInt8;
    if (std::strcmp(argv[i], "--vad") == 0 && i + 1 < argc)
      vad_dir = argv[++i];
  }
  const std::string dir = argv[1];

  asr::ChunkNativeModel model;
  if (!model.Load(dir, store)) {
    std::fprintf(stderr, "failed to load chunk artifact %s\n", dir.c_str());
    return 1;
  }
  const auto& cfg = model.config();

  asr::Tokener phones, chars;
  const bool have_phones = phones.Load(dir + "/phones.txt", false);
  const bool have_chars = chars.Load(dir + "/chars.txt", false);

  asr::WavData wav;
  if (!asr::ReadWav(argv[2], &wav)) {
    std::fprintf(stderr, "failed to read wav %s\n", argv[2]);
    return 1;
  }
  if (wav.sample_rate != cfg.sample_rate) {
    std::fprintf(stderr, "wav rate %d != model rate %d\n", wav.sample_rate,
                 cfg.sample_rate);
    return 1;
  }

  const int cs = cfg.chunk_samples();
  const int phone_blank = cfg.num_phone_classes - 1;
  const int char_blank = cfg.num_char_classes - 1;

  asr::VadNativeModel vad;
  const bool use_vad = !vad_dir.empty();
  if (use_vad && !vad.Load(vad_dir)) {
    std::fprintf(stderr, "failed to load vad artifact %s\n",
                 vad_dir.c_str());
    return 1;
  }
  // VAD state (reference asr_session.cpp:171-261): trailing 0.2 s vote
  // buffer, start on voiced, finalize after kEndSilChecks silent checks
  const long vad_keep = cfg.sample_rate / 5;
  constexpr int kEndSilChecks = 5;
  std::vector<float> vad_buf;
  bool in_utt = !use_vad;  // without --vad every chunk is decoded
  int sil_checks = 0;

  auto state = model.InitState();
  std::vector<int> phone_acc, char_acc, provisional;
  std::vector<float> buf(cs, 0.0f);
  std::string live;

  auto sentence_text = [&](void) {
    std::vector<int> all = char_acc;
    all.insert(all.end(), provisional.begin(), provisional.end());
    std::string text;
    for (int id : Collapse(all, char_blank)) {
      const std::string& tok = chars.Token(id);
      if (tok != "<S>" && tok != "</S>") text += tok;
    }
    return text;
  };

  const size_t n_chunks = (wav.samples.size() + cs - 1) / cs;
  const auto t_decode0 = std::chrono::steady_clock::now();
  for (size_t ci = 0; ci < n_chunks; ++ci) {
    const size_t pos = ci * cs;
    const size_t n = std::min((size_t)cs, wav.samples.size() - pos);
    std::fill(buf.begin(), buf.end(), 0.0f);
    std::copy(wav.samples.begin() + pos, wav.samples.begin() + pos + n,
              buf.begin());
    if (use_vad) {
      vad_buf.insert(vad_buf.end(), buf.begin(), buf.end());
      if ((long)vad_buf.size() > vad_keep)
        vad_buf.erase(vad_buf.begin(), vad_buf.end() - vad_keep);
      const bool voiced =
          vad.Voiced(vad_buf.data(), (long)vad_buf.size());
      if (!in_utt) {
        if (!voiced) continue;  // silence: no model compute at all
        in_utt = true;
        sil_checks = 0;
      } else if (!voiced) {
        if (++sil_checks >= kEndSilChecks) {
          // sentence end: flush and reset for the next utterance
          if (have_chars)
            std::printf("[sentence] %s\n", sentence_text().c_str());
          state = model.InitState();
          phone_acc.clear();
          char_acc.clear();
          provisional.clear();
          live.clear();
          in_utt = false;
          sil_checks = 0;
          continue;
        }
      } else {
        sil_checks = 0;
      }
    }
    // live text (provisional rows) is only decoded when it is shown
    auto res = model.Step(&state, buf.data(), /*live=*/!quiet);
    if (res.n_final > 0) {
      const int t = (int)res.phone_ids.size();
      for (int f = t - res.n_final; f < t; ++f)
        phone_acc.push_back(res.phone_ids[f]);
      for (int id : res.char_ids) char_acc.push_back(id);
      if (res.picked_any) provisional = res.provisional;
    }
    if (!quiet && have_chars) {
      std::vector<int> all = char_acc;
      all.insert(all.end(), provisional.begin(), provisional.end());
      std::string text;
      for (int id : Collapse(all, char_blank)) {
        const std::string& tok = chars.Token(id);
        if (tok != "<S>" && tok != "</S>") text += tok;
      }
      if (text != live) {
        live = text;
        std::printf("[live] %s\n", live.c_str());
        std::fflush(stdout);
      }
    }
  }

  // decode-only wall time (excludes weight load/repack and wav IO) —
  // what bench.py uses for honest per-audio-second RTF
  const double decode_s =
      std::chrono::duration<double>(std::chrono::steady_clock::now() -
                                    t_decode0)
          .count();
  std::printf("[decode_seconds] %.6f\n", decode_s);
  std::printf("[audio_seconds] %.6f\n",
              (double)wav.samples.size() / cfg.sample_rate);

  // final outputs: collapsed phone ids + chars (incl. provisional tail)
  std::vector<int> phone_seq = Collapse(phone_acc, phone_blank);
  std::vector<int> all_chars = char_acc;
  all_chars.insert(all_chars.end(), provisional.begin(), provisional.end());
  std::vector<int> char_seq = Collapse(all_chars, char_blank);

  std::printf("[phones]");
  for (int id : phone_seq) {
    if (have_phones)
      std::printf(" %s", phones.Token(id).c_str());
    else
      std::printf(" %d", id);
  }
  std::printf("\n[chars]");
  for (int id : char_seq) std::printf(" %d", id);
  std::printf("\n[final] ");
  if (have_chars) {
    for (int id : char_seq) {
      const std::string& tok = chars.Token(id);
      if (tok != "<S>" && tok != "</S>") std::printf("%s", tok.c_str());
    }
  }
  std::printf("\n");
  return 0;
}
