// Socket client for the JAX model server
// (tensorflowasr_tpu/serve/model_server.py). The TPU-native equivalent of
// the reference's in-process onnxruntime sessions: the C++ host owns wav
// IO, VAD state, tokenization and CTC decoding; tensor ops run in the
// model server process (which owns the TPU).
//
// Wire protocol (little endian):
//   request  = u32 op_len | op | u32 n_tensors | tensor*
//   tensor   = u8 dtype (0=f32, 1=i32) | u32 ndim | u32 dims[] | payload
//   response = u32 status | u32 n_tensors | tensor* [| u32 msg_len | msg]
#pragma once

#include <cstdint>
#include <string>
#include <vector>

namespace asr {

struct Tensor {
  std::vector<uint32_t> dims;
  std::vector<float> f32;   // used when is_int == false
  std::vector<int32_t> i32;  // used when is_int == true
  bool is_int = false;

  int64_t NumElements() const {
    int64_t n = 1;
    for (auto d : dims) n *= d;
    return n;
  }
};

class ModelClient {
 public:
  ~ModelClient();
  // Connect to a unix socket path (contains '/') or "host:port".
  bool Connect(const std::string& endpoint);
  // Returns false on transport/server error; error message in last_error().
  bool Call(const std::string& op, const std::vector<Tensor>& inputs,
            std::vector<Tensor>* outputs);
  const std::string& last_error() const { return error_; }

 private:
  bool ReadExact(void* buf, size_t n);
  bool WriteAll(const void* buf, size_t n);
  int fd_ = -1;
  std::string error_;
};

}  // namespace asr
