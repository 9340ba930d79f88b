#include "wav_reader.h"

#include <cstring>
#include <fstream>

namespace asr {
namespace {

uint32_t ReadU32(const uint8_t* p) {
  return static_cast<uint32_t>(p[0]) | (static_cast<uint32_t>(p[1]) << 8) |
         (static_cast<uint32_t>(p[2]) << 16) |
         (static_cast<uint32_t>(p[3]) << 24);
}

uint16_t ReadU16(const uint8_t* p) {
  return static_cast<uint16_t>(p[0]) | (static_cast<uint16_t>(p[1]) << 8);
}

}  // namespace

bool ReadWav(const std::string& path, WavData* out) {
  std::ifstream in(path, std::ios::binary);
  if (!in.good()) return false;
  std::vector<uint8_t> buf((std::istreambuf_iterator<char>(in)),
                           std::istreambuf_iterator<char>());
  if (buf.size() < 44) return false;
  if (std::memcmp(buf.data(), "RIFF", 4) != 0 ||
      std::memcmp(buf.data() + 8, "WAVE", 4) != 0)
    return false;

  uint16_t format = 0, channels = 0, bits = 0;
  uint32_t sample_rate = 0;
  size_t data_off = 0, data_len = 0;
  size_t pos = 12;
  while (pos + 8 <= buf.size()) {
    const uint8_t* chunk = buf.data() + pos;
    uint32_t size = ReadU32(chunk + 4);
    if (std::memcmp(chunk, "fmt ", 4) == 0 && pos + 8 + 16 <= buf.size()) {
      format = ReadU16(chunk + 8);
      channels = ReadU16(chunk + 10);
      sample_rate = ReadU32(chunk + 12);
      bits = ReadU16(chunk + 22);
    } else if (std::memcmp(chunk, "data", 4) == 0) {
      data_off = pos + 8;
      data_len = std::min<size_t>(size, buf.size() - data_off);
    }
    pos += 8 + size + (size & 1);  // chunks are word aligned
  }
  if (channels == 0 || sample_rate == 0 || data_len == 0) return false;
  // 1 = PCM int, 3 = IEEE float
  if (format != 1 && format != 3) return false;
  if (bits < 8 || bits % 8 != 0) return false;  // malformed fmt chunk

  const uint8_t* d = buf.data() + data_off;
  size_t bytes_per = bits / 8;
  size_t n_frames = data_len / (bytes_per * channels);
  out->samples.resize(n_frames);
  out->sample_rate = static_cast<int>(sample_rate);
  for (size_t i = 0; i < n_frames; ++i) {
    float acc = 0.f;
    for (int c = 0; c < channels; ++c) {
      const uint8_t* s = d + (i * channels + c) * bytes_per;
      float v = 0.f;
      if (format == 1 && bits == 16) {
        int16_t raw;
        std::memcpy(&raw, s, 2);
        v = static_cast<float>(raw) / 32768.f;
      } else if (format == 1 && bits == 32) {
        int32_t raw;
        std::memcpy(&raw, s, 4);
        v = static_cast<float>(raw) / 2147483648.f;
      } else if (format == 3 && bits == 32) {
        std::memcpy(&v, s, 4);
      } else {
        return false;
      }
      acc += v;
    }
    out->samples[i] = acc / channels;
  }
  return true;
}

}  // namespace asr
