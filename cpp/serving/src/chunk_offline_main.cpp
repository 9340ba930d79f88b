// Standalone native CHUNK-STREAMING decoder: no server, no Python.
// Streams a wav through the C++ ChunkConformer engine chunk by chunk,
// printing live text; [final] equals the JAX ChunkStreamSession decode
// (tests/test_native_chunk.py).
//
// Usage: asr_chunk <artifact_dir> <wav> [--quiet]
//   artifact_dir: export_native_chunk output (weights.bin, manifest.txt,
//                 phones.txt / chars.txt vocab copies)
#include <cstdio>
#include <string>
#include <vector>

#include "chunk_native_model.h"
#include "tokener.h"
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
  const bool quiet = argc > 3 && std::string(argv[3]) == "--quiet";
  const std::string dir = argv[1];

  asr::ChunkNativeModel model;
  if (!model.Load(dir)) {
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

  auto state = model.InitState();
  std::vector<int> phone_acc, char_acc, provisional;
  std::vector<float> buf(cs, 0.0f);
  std::string live;

  const size_t n_chunks = (wav.samples.size() + cs - 1) / cs;
  for (size_t ci = 0; ci < n_chunks; ++ci) {
    const size_t pos = ci * cs;
    const size_t n = std::min((size_t)cs, wav.samples.size() - pos);
    std::fill(buf.begin(), buf.end(), 0.0f);
    std::copy(wav.samples.begin() + pos, wav.samples.begin() + pos + n,
              buf.begin());
    auto res = model.Step(&state, buf.data());
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
