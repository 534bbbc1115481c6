// Network SDR device: client side of the rtl_tcp wire protocol
// (rtl_tcp.c / tools/sdr_server.cc). Connects to "host:port", reads the
// 12-byte "RTL0" header, then streams interleaved u8 I/Q; control calls
// (set_center_freq / set_sample_rate / set_tuner_gain_db / set_agc) are
// sent as 5-byte commands (u8 opcode + u32 big-endian argument) on the
// same socket — the reference ships the server half of this protocol
// but no consumer; pairing the client Device closes the loop, so the
// whole 2-frequency capture engine (retunes included) runs against a
// networked dongle exactly as against local hardware, and the stack is
// integration-testable end-to-end over localhost with no hardware.
#include "sdrcap/device.h"
#include "sdrcap/ring.h"

#include <arpa/inet.h>
#include <netdb.h>
#include <netinet/in.h>
#include <netinet/tcp.h>
#include <sys/socket.h>
#include <unistd.h>

#include <atomic>
#include <cstdio>
#include <cstring>
#include <mutex>
#include <string>
#include <thread>

namespace sdrcap {
namespace {

constexpr uint8_t kCmdSetFreq = 0x01;
constexpr uint8_t kCmdSetRate = 0x02;
constexpr uint8_t kCmdSetGainMode = 0x03;  // 0 = auto, 1 = manual
constexpr uint8_t kCmdSetGain = 0x04;
constexpr uint8_t kCmdSetPpm = 0x05;
constexpr uint8_t kCmdSetAgc = 0x08;
constexpr uint8_t kCmdSetDirect = 0x09;
constexpr uint8_t kCmdSetOffset = 0x0a;

class TcpDevice final : public Device {
 public:
  TcpDevice(const std::string& host, int port) {
    addrinfo hints{};
    hints.ai_family = AF_INET;
    hints.ai_socktype = SOCK_STREAM;
    addrinfo* res = nullptr;
    if (getaddrinfo(host.c_str(), std::to_string(port).c_str(), &hints,
                    &res) != 0 ||
        res == nullptr) {
      return;
    }
    fd_ = socket(res->ai_family, res->ai_socktype, res->ai_protocol);
    if (fd_ >= 0 && connect(fd_, res->ai_addr, res->ai_addrlen) != 0) {
      close(fd_);
      fd_ = -1;
    }
    freeaddrinfo(res);
    if (fd_ < 0) return;
    int one = 1;
    setsockopt(fd_, IPPROTO_TCP, TCP_NODELAY, &one, sizeof(one));
    // "RTL0" magic + tuner type + gain count (rtl_tcp.c dongle_info).
    uint8_t header[12];
    if (!recv_all(header, sizeof(header)) ||
        std::memcmp(header, "RTL0", 4) != 0) {
      close(fd_);
      fd_ = -1;
    }
  }

  ~TcpDevice() override {
    if (fd_ >= 0) close(fd_);
  }

  bool ok() const { return fd_ >= 0; }

  bool set_sample_rate(uint32_t rate_hz) override {
    sample_rate_.store(rate_hz, std::memory_order_relaxed);
    return send_cmd(kCmdSetRate, rate_hz);
  }
  bool set_center_freq(uint32_t freq_hz) override {
    center_freq_.store(freq_hz);
    return send_cmd(kCmdSetFreq, freq_hz);
  }
  bool set_tuner_gain_db(double gain_db) override {
    // Real rtl_tcp applies SET_GAIN only in manual gain mode; without
    // the 0x03 command first, a genuine daemon silently ignores every
    // gain we send and captures run under AGC.
    if (!gain_mode_manual_) {
      if (!send_cmd(kCmdSetGainMode, 1)) return false;
      gain_mode_manual_ = true;
    }
    // Wire unit is tenths of dB (rtl_tcp.c SET_GAIN).
    return send_cmd(kCmdSetGain,
                    (uint32_t)(NearestGainDb(gain_db) * 10.0 + 0.5));
  }
  bool set_agc(bool enabled) override {
    return send_cmd(kCmdSetAgc, enabled ? 1 : 0);
  }
  bool set_freq_correction_ppm(int ppm) override {
    return send_cmd(kCmdSetPpm, (uint32_t)ppm);
  }
  bool set_direct_sampling(int mode) override {
    return send_cmd(kCmdSetDirect, (uint32_t)mode);
  }
  bool set_offset_tuning(bool enabled) override {
    return send_cmd(kCmdSetOffset, enabled ? 1 : 0);
  }
  uint32_t center_freq() const override { return center_freq_.load(); }
  uint32_t sample_rate() const override {
    return sample_rate_.load(std::memory_order_relaxed);
  }

  bool read_sync(uint8_t* out, size_t len) override {
    return recv_all(out, len);
  }

  bool read_async(const StreamCallback& cb, size_t buf_len,
                  size_t num_buffers) override {
    cancel_.store(false);
    OrderedTransferQueue q(num_buffers, buf_len);
    std::thread producer([&] {
      while (!cancel_.load(std::memory_order_acquire)) {
        Transfer* t = q.acquire_free();
        if (!t) break;
        if (!recv_all(t->data.data(), t->data.size())) {
          ++errors_;
          break;
        }
        t->len = t->data.size();
        q.submit_filled(t);
      }
      q.shutdown();
    });
    while (Transfer* t = q.pop_in_order()) {
      cb(t->data.data(), t->len);
      q.release(t);
      if (cancel_.load(std::memory_order_acquire)) break;
    }
    q.shutdown();
    // Unblock a recv() parked inside the producer.
    if (cancel_.load(std::memory_order_acquire) && fd_ >= 0)
      shutdown(fd_, SHUT_RD);
    producer.join();
    return true;
  }

  void cancel_async() override { cancel_.store(true); }

  uint64_t transfer_errors() const override { return errors_.load(); }

 private:
  bool recv_all(uint8_t* out, size_t len) {
    size_t got = 0;
    while (got < len) {
      ssize_t n = recv(fd_, out + got, len - got, 0);
      if (n <= 0) return false;
      got += (size_t)n;
    }
    return true;
  }

  bool send_cmd(uint8_t cmd, uint32_t param) {
    if (fd_ < 0) return false;
    uint8_t buf[5];
    buf[0] = cmd;
    const uint32_t be = htonl(param);
    std::memcpy(buf + 1, &be, 4);
    std::lock_guard<std::mutex> lock(send_mu_);
    return send(fd_, buf, sizeof(buf), MSG_NOSIGNAL) == (ssize_t)sizeof(buf);
  }

  int fd_ = -1;
  // Written by control threads (e.g. the rtl_tcp command channel)
  // while the stream thread reads it.
  std::atomic<uint32_t> sample_rate_{2'000'000};
  std::atomic<uint32_t> center_freq_{100'000'000};
  std::atomic<bool> cancel_{false};
  std::atomic<uint64_t> errors_{0};
  std::atomic<bool> gain_mode_manual_{false};
  std::mutex send_mu_;  // retunes may race the initial config commands
};

}  // namespace

std::unique_ptr<Device> MakeTcpDevice(const std::string& host, int port) {
  auto dev = std::make_unique<TcpDevice>(host, port);
  if (!dev->ok()) return nullptr;
  return dev;
}

}  // namespace sdrcap
