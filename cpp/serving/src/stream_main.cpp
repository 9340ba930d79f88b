// Native multi-stream client: streams a wav through the model server's
// chunk-streaming slot pool (stream_open/feed/close ops served by
// tensorflowasr_tpu/serve/multi_session.py). Many of these clients can
// run concurrently against one server — the server coalesces their
// chunks into one batched TPU dispatch per tick.
//
// Usage: asr_stream <endpoint> <char_vocab> <wav> [realtime]
//   realtime: pace feeds at 1 chunk per chunk-duration (live mic
//   simulation); default feeds as fast as the server accepts.
#include <chrono>
#include <cstdio>
#include <string>
#include <thread>
#include <vector>

#include "model_client.h"
#include "tokener.h"
#include "wav_reader.h"

int main(int argc, char** argv) {
  if (argc < 4) {
    std::fprintf(stderr,
                 "usage: %s <endpoint> <char_vocab> <wav> [realtime]\n",
                 argv[0]);
    return 2;
  }
  const bool realtime = argc > 4 && std::string(argv[4]) == "realtime";

  asr::WavData wav;
  if (!asr::ReadWav(argv[3], &wav)) {
    std::fprintf(stderr, "failed to read wav %s\n", argv[3]);
    return 1;
  }
  asr::Tokener tokener;
  if (!tokener.Load(argv[2], /*blank_at_zero=*/false)) {
    std::fprintf(stderr, "failed to load vocab %s\n", argv[2]);
    return 1;
  }

  asr::ModelClient client;
  if (!client.Connect(argv[1])) {
    std::fprintf(stderr, "connect failed: %s\n",
                 client.last_error().c_str());
    return 1;
  }

  std::vector<asr::Tensor> out;
  if (!client.Call("stream_info", {}, &out) || out.empty() ||
      out[0].i32.size() < 2) {
    std::fprintf(stderr, "stream_info failed: %s\n",
                 client.last_error().c_str());
    return 1;
  }
  const int chunk_samples = out[0].i32[0];
  const int sample_rate = out[0].i32[1];

  if (!client.Call("stream_open", {}, &out) || out.empty() ||
      out[0].i32.empty()) {
    std::fprintf(stderr, "stream_open failed: %s\n",
                 client.last_error().c_str());
    return 1;
  }
  asr::Tensor slot = out[0];

  auto decode = [&](const asr::Tensor& ids) {
    std::string text;
    for (int32_t id : ids.i32) {
      const std::string& tok = tokener.Token(id);
      if (tok == "<S>" || tok == "</S>") continue;
      text += tok;
    }
    return text;
  };

  const auto chunk_ms =
      std::chrono::milliseconds(1000 * chunk_samples / sample_rate);
  std::string live;
  for (size_t pos = 0; pos < wav.samples.size();
       pos += static_cast<size_t>(chunk_samples)) {
    auto t0 = std::chrono::steady_clock::now();
    size_t n = std::min(static_cast<size_t>(chunk_samples),
                        wav.samples.size() - pos);
    asr::Tensor chunk;
    chunk.dims = {static_cast<uint32_t>(n)};
    chunk.f32.assign(wav.samples.begin() + pos,
                     wav.samples.begin() + pos + n);
    if (!client.Call("stream_feed", {slot, chunk}, &out) ||
        out.size() < 2) {
      std::fprintf(stderr, "stream_feed failed: %s\n",
                   client.last_error().c_str());
      return 1;
    }
    std::string text = decode(out[1]);
    if (text != live) {
      live = text;
      std::printf("[live] %s\n", live.c_str());
      std::fflush(stdout);
    }
    if (realtime) std::this_thread::sleep_until(t0 + chunk_ms);
  }

  if (!client.Call("stream_close", {slot}, &out) || out.size() < 2) {
    std::fprintf(stderr, "stream_close failed: %s\n",
                 client.last_error().c_str());
    return 1;
  }
  std::printf("[final] %s\n", decode(out[1]).c_str());
  return 0;
}
