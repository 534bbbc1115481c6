// Two-frequency capture engine: the rtl_sdr.c (2-freq fork) capability.
//
// Captures exactly 3×n samples as [REF | TGT | REF]: n at freq1, n at
// freq2, n at freq1 again, retuning and re-gaining inline at block
// boundaries detected by cumulative byte count (rtl_sdr.c:103-146),
// with zero sample loss (guaranteed by the ordered dispatch queue).
#pragma once

#include <cstdint>
#include <functional>
#include <string>

#include "sdrcap/device.h"

namespace sdrcap {

struct CaptureConfig {
  uint32_t freq1_hz = 0;       // reference frequency
  uint32_t freq2_hz = 0;       // target frequency
  uint32_t sample_rate = 2'000'000;
  double gain1_db = 28.0;      // per-frequency gains, both mandatory
  double gain2_db = 28.0;      //   (rtl_sdr.c:213-217)
  uint64_t samples_per_freq = 0;  // n: samples per block
  int ppm = 0;                 // crystal correction (rtl_sdr.c -p)
  bool sync_mode = false;      // force blocking reads (rtl_sdr.c -S,
                               //   sync fallback at rtl_sdr.c:295-321)
  size_t buf_len = 262'144;    // bytes per transfer (lib default)
  size_t num_buffers = 15;     // in-flight transfers (lib default)
};

struct CaptureStats {
  uint64_t bytes_written = 0;
  uint64_t retunes = 0;
  uint64_t transfer_errors = 0;
  bool completed = false;
  std::string error;
};

// Sink for captured bytes; returns false to abort (short-write abort,
// rtl_sdr.c:141-144).
using ByteSink = std::function<bool(const uint8_t* data, size_t len)>;

CaptureStats RunTwoFreqCapture(Device& dev, const CaptureConfig& cfg,
                               const ByteSink& sink);

// Convenience: capture straight to a .dat file.
CaptureStats CaptureToFile(Device& dev, const CaptureConfig& cfg,
                           const std::string& path);

}  // namespace sdrcap
