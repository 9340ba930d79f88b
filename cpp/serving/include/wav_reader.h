// Minimal RIFF/WAVE reader (PCM16 / PCM32 / float32; mono or averaged
// stereo). Clean-room replacement for the reference's vendored
// ext/AudioFile.hpp (Inference/CppInference).
#pragma once

#include <cstdint>
#include <string>
#include <vector>

namespace asr {

struct WavData {
  std::vector<float> samples;  // mono, [-1, 1]
  int sample_rate = 0;
};

// Returns false on parse failure.
bool ReadWav(const std::string& path, WavData* out);

}  // namespace asr
