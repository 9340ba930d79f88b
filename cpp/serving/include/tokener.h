// Vocab loader: id <-> UTF-8 token maps.
// Native re-design of the reference Tokener
// (Inference/CppInference/onnx/src/core/asr_session.cpp:4-35 in
// Z-yq/TensorflowASR): one token per line; "[SPACE]" maps to " ";
// blank_at_zero controls whether the CTC blank is id 0 or appended last.
#pragma once

#include <string>
#include <unordered_map>
#include <vector>

namespace asr {

class Tokener {
 public:
  // Returns false on IO failure.
  bool Load(const std::string& vocab_path, bool blank_at_zero = false);

  const std::string& Token(int id) const;
  int Id(const std::string& token) const;  // -1 if absent
  int NumClasses() const { return num_classes_; }
  int Blank() const { return blank_; }
  int StartId() const { return Id("<S>"); }
  int EndId() const { return Id("</S>"); }

 private:
  std::vector<std::string> tokens_;
  std::unordered_map<std::string, int> index_;
  int num_classes_ = 0;
  int blank_ = 0;
  std::string empty_;
};

}  // namespace asr
