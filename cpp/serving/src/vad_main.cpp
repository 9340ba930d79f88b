// Standalone native VAD: per-frame voice probabilities + offline
// segmentation (OfflineVAD merge/resplit semantics) with no Python.
//
// Usage: asr_vad <vad_artifact_dir> <wav> [--dump <probs.bin>]
//               [--threshold p] [--downsample n]
//   vad_artifact_dir: export_native_vad output
//   --dump: write per-frame probs (int32 n header + float32 payload) —
//           used by tests/test_native_vad.py for JAX parity
#include <cstdio>
#include <cstring>
#include <fstream>
#include <string>
#include <vector>

#include "vad_native_model.h"
#include "wav_reader.h"

int main(int argc, char** argv) {
  if (argc < 3) {
    std::fprintf(stderr,
                 "usage: %s <vad_artifact_dir> <wav> [--dump <probs.bin>]"
                 " [--threshold p] [--downsample n]\n",
                 argv[0]);
    return 2;
  }
  std::string dump_path;
  float threshold = 0.5f;
  int downsample = 2;
  for (int i = 3; i + 1 < argc; ++i) {
    if (std::strcmp(argv[i], "--dump") == 0) dump_path = argv[i + 1];
    if (std::strcmp(argv[i], "--threshold") == 0)
      threshold = std::stof(argv[i + 1]);
    if (std::strcmp(argv[i], "--downsample") == 0)
      downsample = std::stoi(argv[i + 1]);
  }

  asr::VadNativeModel vad;
  if (!vad.Load(argv[1])) {
    std::fprintf(stderr, "failed to load vad artifact %s\n", argv[1]);
    return 1;
  }
  asr::WavData wav;
  if (!asr::ReadWav(argv[2], &wav)) {
    std::fprintf(stderr, "failed to read wav %s\n", argv[2]);
    return 1;
  }

  // per-frame probs on the downsampled signal
  std::vector<float> ds;
  for (size_t i = 0; i < wav.samples.size(); i += downsample)
    ds.push_back(wav.samples[i]);
  const int fi = vad.config().frame_input;
  const int n_frames = (int)(ds.size() / fi);
  const auto probs = vad.Infer(ds.data(), n_frames);

  if (!dump_path.empty()) {
    std::ofstream f(dump_path, std::ios::binary);
    int n = n_frames;
    f.write(reinterpret_cast<char*>(&n), sizeof(n));
    f.write(reinterpret_cast<const char*>(probs.data()),
            (long)n_frames * sizeof(float));
  }

  int voiced = 0;
  for (float p : probs)
    if (p >= threshold) ++voiced;
  std::printf("voiced_frames: %d/%d\n", voiced, n_frames);

  const auto segs =
      vad.Segments(wav.samples.data(), (long)wav.samples.size(),
                   wav.sample_rate, downsample, threshold);
  std::printf("segments:");
  for (const auto& s : segs)
    std::printf(" %.3f-%.3f", s.start / (double)wav.sample_rate,
                s.end / (double)wav.sample_rate);
  std::printf("\n");
  return 0;
}
