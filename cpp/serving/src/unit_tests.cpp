// Minimal native unit tests (no framework): tokener, greedy decoder, wav
// round trip. Exits non-zero on failure.
#include <cmath>
#include <cstdio>
#include <cstdlib>
#include <fstream>
#include <vector>

#include "ctc_greedy_decoder.h"
#include "tokener.h"
#include "wav_reader.h"

#define CHECK(cond)                                                     \
  do {                                                                  \
    if (!(cond)) {                                                      \
      std::fprintf(stderr, "CHECK failed at %s:%d: %s\n", __FILE__,     \
                   __LINE__, #cond);                                    \
      std::exit(1);                                                     \
    }                                                                   \
  } while (0)

static void TestTokener() {
  const char* path = "/tmp/asr_test_vocab.txt";
  {
    std::ofstream out(path);
    out << "<S>\n</S>\nni3\nhao3\n";
  }
  asr::Tokener t;
  CHECK(t.Load(path, /*blank_at_zero=*/false));
  CHECK(t.NumClasses() == 5);  // 4 tokens + appended blank
  CHECK(t.Blank() == 4);
  CHECK(t.Id("ni3") == 2);
  CHECK(t.Token(3) == "hao3");
  CHECK(t.StartId() == 0 && t.EndId() == 1);
  CHECK(t.Id("absent") == -1);

  asr::Tokener t0;
  CHECK(t0.Load(path, /*blank_at_zero=*/true));
  CHECK(t0.Blank() == 0);
  CHECK(t0.Id("ni3") == 3);
}

static void TestGreedyDecoder() {
  // 6 frames, 3 classes, blank=2: argmax seq = [0,0,2,1,1,0] -> [0,1,0]
  std::vector<float> logits = {
      9, 0, 0,  9, 0, 0,  0, 0, 9,
      0, 9, 0,  0, 9, 0,  9, 0, 0,
  };
  auto out = asr::CtcGreedyDecode(logits.data(), 6, 3, 2);
  CHECK(out.size() == 3);
  CHECK(out[0] == 0 && out[1] == 1 && out[2] == 0);
}

static void TestWavRoundTrip() {
  const char* path = "/tmp/asr_test_tone.wav";
  const int sr = 16000, n = 1600;
  std::vector<int16_t> pcm(n);
  for (int i = 0; i < n; ++i)
    pcm[i] = static_cast<int16_t>(
        20000 * std::sin(2.0 * 3.14159265 * 440.0 * i / sr));
  {
    std::ofstream out(path, std::ios::binary);
    auto w32 = [&](uint32_t v) { out.write(reinterpret_cast<char*>(&v), 4); };
    auto w16 = [&](uint16_t v) { out.write(reinterpret_cast<char*>(&v), 2); };
    out.write("RIFF", 4);
    w32(36 + n * 2);
    out.write("WAVE", 4);
    out.write("fmt ", 4);
    w32(16);
    w16(1);   // PCM
    w16(1);   // mono
    w32(sr);
    w32(sr * 2);
    w16(2);
    w16(16);
    out.write("data", 4);
    w32(n * 2);
    out.write(reinterpret_cast<char*>(pcm.data()), n * 2);
  }
  asr::WavData wav;
  CHECK(asr::ReadWav(path, &wav));
  CHECK(wav.sample_rate == sr);
  CHECK(static_cast<int>(wav.samples.size()) == n);
  CHECK(std::fabs(wav.samples[0]) < 1e-4);
  float maxv = 0;
  for (float v : wav.samples) maxv = std::max(maxv, std::fabs(v));
  CHECK(maxv > 0.55f && maxv < 0.65f);  // 20000/32768
}

int main() {
  TestTokener();
  TestGreedyDecoder();
  TestWavRoundTrip();
  std::printf("all native tests passed\n");
  return 0;
}
