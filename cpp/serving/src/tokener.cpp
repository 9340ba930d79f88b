#include "tokener.h"

#include <fstream>

namespace asr {

bool Tokener::Load(const std::string& vocab_path, bool blank_at_zero) {
  std::ifstream in(vocab_path);
  if (!in.good()) return false;
  tokens_.clear();
  index_.clear();
  int index = 0;
  if (blank_at_zero) {
    blank_ = 0;
    tokens_.push_back("<blank>");
    index = 1;
  }
  std::string line;
  while (std::getline(in, line)) {
    while (!line.empty() && (line.back() == '\r' || line.back() == '\n' ||
                             line.back() == ' '))
      line.pop_back();
    if (line.empty() || line[0] == '#') continue;
    if (line == "[SPACE]") line = " ";
    index_[line] = index;
    tokens_.push_back(line);
    ++index;
  }
  num_classes_ = index;
  if (!blank_at_zero) {
    blank_ = index;
    tokens_.push_back("<blank>");
    ++num_classes_;
  }
  return true;
}

const std::string& Tokener::Token(int id) const {
  if (id < 0 || id >= static_cast<int>(tokens_.size())) return empty_;
  return tokens_[id];
}

int Tokener::Id(const std::string& token) const {
  auto it = index_.find(token);
  return it == index_.end() ? -1 : it->second;
}

}  // namespace asr
