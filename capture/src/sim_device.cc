// Hardware-free SDR device: a deterministic synthetic front-end.
//
// Stands in for the USB RTL-SDR so the whole capture stack (ordered
// async engine, retune logic, gain handling, CLI tools) is exercisable
// and testable in CI, mirroring how the reference system leans on its
// simulators for hardware-free validation (SURVEY.md §4.2). The signal
// model responds to tuner state: a narrowband FM-like tone whose
// baseband offset derives from the tuned frequency and whose amplitude
// follows gain — so a retune or gain change mid-stream visibly changes
// the output, which is exactly what the block-boundary tests assert.
#include "sdrcap/args.h"
#include "sdrcap/device.h"
#include "sdrcap/ring.h"

#include <atomic>
#include <chrono>
#include <cmath>
#include <cstring>
#include <random>
#include <thread>
#include <vector>

namespace sdrcap {
namespace {

class SimDevice final : public Device {
 public:
  explicit SimDevice(uint64_t seed, bool realtime)
      : realtime_(realtime), rng_(seed) {
    // Opt-in frequency-selective mode: SDRCAP_SIM_STATIONS is a comma-
    // separated list of absolute transmitter frequencies (k/M/G
    // suffixes allowed). When set, signal exists only where a station
    // falls inside the tuned passband — which is what makes squelch-
    // driven scanning (sdr_fm's multi-frequency mode) observable
    // without hardware. Unset → the always-present tone below.
    if (const char* env = std::getenv("SDRCAP_SIM_STATIONS")) {
      std::string s(env);
      size_t pos = 0;
      while (pos <= s.size()) {
        const size_t comma = s.find(',', pos);
        const std::string tok =
            s.substr(pos, comma == std::string::npos ? std::string::npos
                                                     : comma - pos);
        if (!tok.empty()) {
          const double f = ParseFreq(tok);
          if (f > 0) stations_hz_.push_back(f);
        }
        if (comma == std::string::npos) break;
        pos = comma + 1;
      }
    }
  }

  bool set_sample_rate(uint32_t rate_hz) override {
    sample_rate_.store(rate_hz, std::memory_order_relaxed);
    return true;
  }
  bool set_center_freq(uint32_t freq_hz) override {
    center_freq_.store(freq_hz, std::memory_order_relaxed);
    return true;
  }
  bool set_tuner_gain_db(double gain_db) override {
    // Real tuners have a discrete gain ladder; snap like the reference's
    // nearest_gain so calibration sees hardware-faithful quantization.
    gain_db_.store(NearestGainDb(gain_db), std::memory_order_relaxed);
    return true;
  }
  bool set_agc(bool enabled) override {
    agc_ = enabled;
    return true;
  }
  bool set_freq_correction_ppm(int ppm) override {
    ppm_.store(ppm, std::memory_order_relaxed);
    return true;
  }
  uint32_t center_freq() const override {
    return center_freq_.load(std::memory_order_relaxed);
  }
  uint32_t sample_rate() const override {
    return sample_rate_.load(std::memory_order_relaxed);
  }
  const char* tuner_name() const override { return "R820T (simulated)"; }

  bool read_sync(uint8_t* out, size_t len) override {
    generate(out, len);
    return true;
  }

  bool read_async(const StreamCallback& cb, size_t buf_len,
                  size_t num_buffers) override {
    cancel_.store(false);
    OrderedTransferQueue q(num_buffers, buf_len);

    // Producer: fills buffers the way the USB bulk endpoint would.
    std::thread producer([&] {
      while (!cancel_.load(std::memory_order_acquire)) {
        Transfer* t = q.acquire_free();
        if (!t) break;
        generate(t->data.data(), t->data.size());
        t->len = t->data.size();
        q.submit_filled(t);
      }
      q.shutdown();
    });

    // Dispatcher (this thread): strictly in-order serialized callbacks;
    // the callback may call set_center_freq / set_tuner_gain_db /
    // cancel_async, mirroring rtl_sdr.c's boundary retunes.
    while (Transfer* t = q.pop_in_order()) {
      cb(t->data.data(), t->len);
      q.release(t);
      if (cancel_.load(std::memory_order_acquire)) break;
    }
    q.shutdown();
    producer.join();
    return true;
  }

  void cancel_async() override {
    cancel_.store(true, std::memory_order_release);
  }

 private:
  void generate(uint8_t* out, size_t len) {
    const double fs = sample_rate_.load(std::memory_order_relaxed);
    const uint32_t fc = center_freq();
    const double gain = gain_db_.load(std::memory_order_relaxed);
    // Signal: tone at an offset derived from the tuned frequency
    // (so "what station am I hearing" tracks retunes), amplitude from
    // gain relative to 40 dB full scale; plus white noise.
    // Crystal error shifts the effective LO by fc·ppm/1e6, so the
    // baseband tone moves by the same amount — ppm correction is
    // observable in the spectrum like on real hardware.
    const double lo_shift =
        (double)fc * ppm_.load(std::memory_order_relaxed) * 1e-6;
    double off_hz = 50e3 + (fc % 997) * 37.0 - lo_shift;
    double amp = std::min(0.9, 0.5 * std::pow(10.0, (gain - 40.0) / 20.0));
    if (!stations_hz_.empty()) {
      // Frequency-selective mode: the nearest in-band station sets the
      // baseband offset; out of band → noise only.
      amp = 0.0;
      for (double st : stations_hz_) {
        const double off = st - (double)fc - lo_shift;
        if (std::abs(off) < 0.45 * fs) {
          off_hz = off;
          amp = std::min(0.9, 0.5 * std::pow(10.0, (gain - 40.0) / 20.0));
          break;
        }
      }
    }
    const double noise = 0.02;
    std::normal_distribution<double> nd(0.0, noise);
    const double w = 2.0 * M_PI * off_hz / fs;
    for (size_t i = 0; i + 1 < len; i += 2) {
      const double ph = phase_;
      phase_ += w;
      if (phase_ > 2.0 * M_PI) phase_ -= 2.0 * M_PI;
      if (phase_ < -2.0 * M_PI) phase_ += 2.0 * M_PI;
      const double iv = amp * std::cos(ph) + nd(rng_);
      const double qv = amp * std::sin(ph) + nd(rng_);
      out[i] = clamp_u8(iv * 127.5 + 127.5);
      out[i + 1] = clamp_u8(qv * 127.5 + 127.5);
    }
    if (realtime_) pace(len / 2, fs);
  }

  // Hold generation to the configured sample rate, the way the USB bulk
  // endpoint is held to the ADC clock. Without this, a consumer with
  // buffering between itself and the device (e.g. sdr_server's TCP
  // socket) sees the whole capture generated before its first control
  // command arrives, and mid-stream retunes/gain changes never land.
  void pace(size_t samples, double fs) {
    using clock = std::chrono::steady_clock;
    if (paced_samples_ == 0) pace_start_ = clock::now();
    paced_samples_ += samples;
    const auto target =
        pace_start_ + std::chrono::duration_cast<clock::duration>(
                          std::chrono::duration<double>(paced_samples_ / fs));
    std::this_thread::sleep_until(target);
  }

  static uint8_t clamp_u8(double v) {
    if (v < 0.0) return 0;
    if (v > 255.0) return 255;
    return static_cast<uint8_t>(v + 0.5);
  }

  // Written by control threads (e.g. the rtl_tcp command channel)
  // while the stream thread reads it.
  std::atomic<uint32_t> sample_rate_{2'000'000};
  std::atomic<uint32_t> center_freq_{100'000'000};
  std::atomic<double> gain_db_{28.0};
  std::atomic<int> ppm_{0};
  bool agc_ = false;
  std::atomic<bool> cancel_{false};
  const bool realtime_;
  uint64_t paced_samples_ = 0;
  std::chrono::steady_clock::time_point pace_start_;
  double phase_ = 0.0;
  std::mt19937_64 rng_;
  std::vector<double> stations_hz_;
};

}  // namespace

double NearestGainDb(double requested_db) {
  // R820T gain steps in dB (tenths in the hardware API).
  static const double kGains[] = {
      0.0, 0.9, 1.4, 2.7, 3.7, 7.7, 8.7, 12.5, 14.4, 15.7, 16.6, 19.7,
      20.7, 22.9, 25.4, 28.0, 29.7, 32.8, 33.8, 36.4, 37.2, 38.6, 40.2,
      42.1, 43.4, 43.9, 44.5, 48.0, 49.6};
  double best = kGains[0];
  double err = 1e9;
  for (double g : kGains) {
    const double e = std::abs(g - requested_db);
    if (e < err) {
      err = e;
      best = g;
    }
  }
  return best;
}

std::unique_ptr<Device> MakeSimDevice(uint64_t seed, bool realtime) {
  return std::make_unique<SimDevice>(seed, realtime);
}

}  // namespace sdrcap
