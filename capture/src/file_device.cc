// File-replay SDR device: streams interleaved u8 I/Q from a file as if
// it were live hardware (loops at EOF). The third Device backend next to
// the simulator and (future) USB hardware — lets the whole capture stack
// and its tools replay recorded spectrum deterministically.
#include "sdrcap/device.h"
#include "sdrcap/ring.h"

#include <atomic>
#include <cstdio>
#include <cstring>
#include <string>
#include <thread>

namespace sdrcap {
namespace {

class FileDevice final : public Device {
 public:
  explicit FileDevice(const std::string& path) : path_(path) {
    f_ = std::fopen(path.c_str(), "rb");
  }
  ~FileDevice() override {
    if (f_) std::fclose(f_);
  }
  bool ok() const { return f_ != nullptr; }

  bool set_sample_rate(uint32_t rate_hz) override {
    sample_rate_.store(rate_hz, std::memory_order_relaxed);
    return true;
  }
  bool set_center_freq(uint32_t freq_hz) override {
    center_freq_.store(freq_hz);
    return true;
  }
  bool set_tuner_gain_db(double) override { return true; }
  bool set_agc(bool) override { return true; }
  uint32_t center_freq() const override { return center_freq_.load(); }
  uint32_t sample_rate() const override {
    return sample_rate_.load(std::memory_order_relaxed);
  }

  bool read_sync(uint8_t* out, size_t len) override {
    size_t got = 0;
    bool rewound = false;
    while (got < len) {
      size_t n = std::fread(out + got, 1, len - got, f_);
      if (n == 0) {
        if (std::feof(f_)) {
          // An empty file would loop rewind→EOF forever: fail instead
          // if a rewind produced no bytes.
          if (rewound) return false;
          std::rewind(f_);
          rewound = true;
          continue;
        }
        return false;
      }
      rewound = false;
      got += n;
    }
    return true;
  }

  bool read_async(const StreamCallback& cb, size_t buf_len,
                  size_t num_buffers) override {
    cancel_.store(false);
    OrderedTransferQueue q(num_buffers, buf_len);
    std::thread producer([&] {
      while (!cancel_.load(std::memory_order_acquire)) {
        Transfer* t = q.acquire_free();
        if (!t) break;
        if (!read_sync(t->data.data(), t->data.size())) break;
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
    producer.join();
    return true;
  }

  void cancel_async() override { cancel_.store(true); }

 private:
  std::string path_;
  FILE* f_ = nullptr;
  // Written by control threads (e.g. the rtl_tcp command channel)
  // while the stream thread reads it.
  std::atomic<uint32_t> sample_rate_{2'000'000};
  std::atomic<uint32_t> center_freq_{100'000'000};
  std::atomic<bool> cancel_{false};
};

}  // namespace

std::unique_ptr<Device> MakeFileDevice(const std::string& path) {
  auto dev = std::make_unique<FileDevice>(path);
  if (!dev->ok()) return nullptr;
  return dev;
}

}  // namespace sdrcap
