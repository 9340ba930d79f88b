#include "model_client.h"

#include <arpa/inet.h>
#include <netinet/in.h>
#include <sys/socket.h>
#include <sys/un.h>
#include <unistd.h>

#include <cstring>

namespace asr {

ModelClient::~ModelClient() {
  if (fd_ >= 0) close(fd_);
}

bool ModelClient::Connect(const std::string& endpoint) {
  if (endpoint.find('/') != std::string::npos) {
    fd_ = socket(AF_UNIX, SOCK_STREAM, 0);
    if (fd_ < 0) return false;
    sockaddr_un addr{};
    addr.sun_family = AF_UNIX;
    std::strncpy(addr.sun_path, endpoint.c_str(),
                 sizeof(addr.sun_path) - 1);
    if (connect(fd_, reinterpret_cast<sockaddr*>(&addr), sizeof(addr)) != 0) {
      error_ = "connect failed: " + endpoint;
      close(fd_);
      fd_ = -1;
      return false;
    }
    return true;
  }
  auto colon = endpoint.rfind(':');
  if (colon == std::string::npos) {
    error_ = "endpoint must be unix path or host:port";
    return false;
  }
  std::string host = endpoint.substr(0, colon);
  if (host == "localhost") host = "127.0.0.1";
  int port = 0;
  try {
    port = std::stoi(endpoint.substr(colon + 1));
  } catch (const std::exception&) {
    error_ = "invalid port in endpoint: " + endpoint;
    return false;
  }
  fd_ = socket(AF_INET, SOCK_STREAM, 0);
  if (fd_ < 0) return false;
  sockaddr_in addr{};
  addr.sin_family = AF_INET;
  addr.sin_port = htons(static_cast<uint16_t>(port));
  if (inet_pton(AF_INET, host.c_str(), &addr.sin_addr) != 1) {
    error_ = "invalid IPv4 address: " + host +
             " (hostnames are not resolved; use an IP)";
    close(fd_);
    fd_ = -1;
    return false;
  }
  if (connect(fd_, reinterpret_cast<sockaddr*>(&addr), sizeof(addr)) != 0) {
    error_ = "connect failed: " + endpoint;
    close(fd_);
    fd_ = -1;
    return false;
  }
  return true;
}

bool ModelClient::ReadExact(void* buf, size_t n) {
  auto* p = static_cast<uint8_t*>(buf);
  size_t got = 0;
  while (got < n) {
    ssize_t r = read(fd_, p + got, n - got);
    if (r <= 0) {
      error_ = "read failed";
      return false;
    }
    got += static_cast<size_t>(r);
  }
  return true;
}

bool ModelClient::WriteAll(const void* buf, size_t n) {
  const auto* p = static_cast<const uint8_t*>(buf);
  size_t sent = 0;
  while (sent < n) {
    ssize_t r = write(fd_, p + sent, n - sent);
    if (r <= 0) {
      error_ = "write failed";
      return false;
    }
    sent += static_cast<size_t>(r);
  }
  return true;
}

bool ModelClient::Call(const std::string& op,
                       const std::vector<Tensor>& inputs,
                       std::vector<Tensor>* outputs) {
  if (fd_ < 0) {
    error_ = "not connected";
    return false;
  }
  uint32_t op_len = static_cast<uint32_t>(op.size());
  if (!WriteAll(&op_len, 4) || !WriteAll(op.data(), op.size())) return false;
  uint32_t n = static_cast<uint32_t>(inputs.size());
  if (!WriteAll(&n, 4)) return false;
  for (const auto& t : inputs) {
    uint8_t code = t.is_int ? 1 : 0;
    uint32_t ndim = static_cast<uint32_t>(t.dims.size());
    if (!WriteAll(&code, 1) || !WriteAll(&ndim, 4)) return false;
    if (ndim && !WriteAll(t.dims.data(), 4 * ndim)) return false;
    if (t.is_int) {
      if (!WriteAll(t.i32.data(), t.i32.size() * 4)) return false;
    } else {
      if (!WriteAll(t.f32.data(), t.f32.size() * 4)) return false;
    }
  }

  uint32_t status = 0, n_out = 0;
  if (!ReadExact(&status, 4) || !ReadExact(&n_out, 4)) return false;
  outputs->clear();
  for (uint32_t i = 0; i < n_out; ++i) {
    Tensor t;
    uint8_t code = 0;
    uint32_t ndim = 0;
    if (!ReadExact(&code, 1) || !ReadExact(&ndim, 4)) return false;
    t.dims.resize(ndim);
    if (ndim && !ReadExact(t.dims.data(), 4 * ndim)) return false;
    t.is_int = code == 1;
    int64_t count = t.NumElements();
    if (t.is_int) {
      t.i32.resize(count);
      if (count && !ReadExact(t.i32.data(), count * 4)) return false;
    } else {
      t.f32.resize(count);
      if (count && !ReadExact(t.f32.data(), count * 4)) return false;
    }
    outputs->push_back(std::move(t));
  }
  if (status != 0) {
    uint32_t msg_len = 0;
    if (!ReadExact(&msg_len, 4)) return false;
    std::string msg(msg_len, '\0');
    if (msg_len && !ReadExact(msg.data(), msg_len)) return false;
    error_ = "server error: " + msg;
    return false;
  }
  return true;
}

}  // namespace asr
