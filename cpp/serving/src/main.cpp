// Demo host: stream a wav file through the session in 0.1 s chunks
// (reference CppInference.cpp:11-65 feed loop).
//
// Usage: asr_client <endpoint> <phone_vocab> <char_vocab> <wav>
#include <cstdio>
#include <string>
#include <vector>

#include "asr_session.h"
#include "wav_reader.h"

int main(int argc, char** argv) {
  if (argc < 5) {
    std::fprintf(stderr,
                 "usage: %s <endpoint> <phone_vocab> <char_vocab> <wav>\n",
                 argv[0]);
    return 2;
  }
  asr::WavData wav;
  if (!asr::ReadWav(argv[4], &wav)) {
    std::fprintf(stderr, "failed to read wav %s\n", argv[4]);
    return 1;
  }
  std::fprintf(stderr, "wav: %zu samples @ %d Hz\n", wav.samples.size(),
               wav.sample_rate);

  asr::Session session;
  asr::Session::Options opts;
  opts.endpoint = argv[1];
  opts.phone_vocab = argv[2];
  opts.char_vocab = argv[3];
  opts.sample_rate = wav.sample_rate;
  opts.chunk_samples = wav.sample_rate / 2;
  opts.vad_downsample = wav.sample_rate > 8000 ? wav.sample_rate / 8000 : 1;
  if (!session.Initial(opts)) {
    std::fprintf(stderr, "session init failed\n");
    return 1;
  }

  int feed = wav.sample_rate / 10;  // 0.1 s
  for (size_t pos = 0; pos + feed <= wav.samples.size(); pos += feed) {
    auto state = session.Parase(wav.samples.data() + pos, feed);
    if (state == asr::ParseState::kStarted) {
      std::printf("[start]\n");
    } else if (state == asr::ParseState::kEnded) {
      std::printf("[end] %s\n", session.Get_Asr_Result().c_str());
    }
  }
  if (session.Finish() == asr::ParseState::kEnded)
    std::printf("[final] %s\n", session.Get_Asr_Result().c_str());
  return 0;
}
