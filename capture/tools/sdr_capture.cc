// 2-frequency capture CLI — rtl_sdr.c (2-freq fork) argument contract:
//   sdr_capture -f freq1 -h freq2 [-s rate] -1 gain1 -2 gain2
//               -n samples_per_freq [--sim-seed N] out.dat
// Both per-frequency gains are mandatory (rtl_sdr.c:213-217).
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <memory>
#include <string>

#include "sdrcap/args.h"
#include "sdrcap/backend.h"
#include "sdrcap/capture_engine.h"
#include "sdrcap/device.h"

namespace {

void usage() {
  std::fprintf(
      stderr,
      "Usage: sdr_capture -f freq1_hz -h freq2_hz -1 gain1_db -2 gain2_db\n"
      "                   -n samples_per_freq [-s sample_rate] [-p ppm]\n"
      "                   [-b block_size_bytes] [-S] [-d device_index]\n"
      "                   [--usb] [--sim-seed N] [--replay file.iq]\n"
      "                   [--tcp host:port] output.dat\n"
      "Captures 3*n interleaved u8 I/Q samples as [F1 | F2 | F1] blocks\n"
      "with seamless retuning (dual-frequency .dat contract).\n"
      "--usb drives a real RTL2832U dongle over libusb (device -d N);\n"
      "default backend is the deterministic simulator.\n"
      "-S forces blocking sync reads; '-' as output writes to stdout.\n");
}

}  // namespace

int main(int argc, char** argv) {
  sdrcap::CaptureConfig cfg;
  sdrcap::BackendOptions backend;
  std::string out;
  bool have_g1 = false, have_g2 = false;

  for (int i = 1; i < argc; ++i) {
    std::string a = argv[i];
    auto next = [&]() -> const char* {
      if (i + 1 >= argc) {
        usage();
        std::exit(2);
      }
      return argv[++i];
    };
    // Frequencies/rates accept k/M/G suffixes like the reference's
    // atofs-parsed flags (convenience.c:39-64).
    if (a == "-f") cfg.freq1_hz = (uint32_t)sdrcap::ParseFreq(next());
    else if (a == "-h") cfg.freq2_hz = (uint32_t)sdrcap::ParseFreq(next());
    else if (a == "-s") cfg.sample_rate = (uint32_t)sdrcap::ParseFreq(next());
    else if (a == "-1") { cfg.gain1_db = std::atof(next()); have_g1 = true; }
    else if (a == "-2") { cfg.gain2_db = std::atof(next()); have_g2 = true; }
    else if (a == "-n") cfg.samples_per_freq = std::strtoull(next(), nullptr, 10);
    else if (a == "-p") cfg.ppm = std::atoi(next());
    else if (a == "-b") cfg.buf_len = std::strtoull(next(), nullptr, 10);
    else if (a == "-S") cfg.sync_mode = true;
    else if (sdrcap::ParseBackendFlag(a, next, &backend)) {}
    else if (a == "--help") { usage(); return 0; }
    else if (a == "-" || a[0] != '-') out = a;  // '-' = stdout
    else { usage(); return 2; }
  }
  if (out.empty() || cfg.freq1_hz == 0 || cfg.freq2_hz == 0 ||
      cfg.samples_per_freq == 0 || !have_g1 || !have_g2) {
    usage();
    return 2;
  }

  std::unique_ptr<sdrcap::Device> dev = sdrcap::OpenBackend(backend);
  if (!dev) return 1;
  std::fprintf(stderr,
               "Capturing 3 x %llu samples: %u Hz (g=%.1f) / %u Hz (g=%.1f) "
               "at %u sps -> %s\n",
               (unsigned long long)cfg.samples_per_freq, cfg.freq1_hz,
               cfg.gain1_db, cfg.freq2_hz, cfg.gain2_db, cfg.sample_rate,
               out.c_str());
  sdrcap::CaptureStats stats;
  if (out == "-") {
    stats = sdrcap::RunTwoFreqCapture(
        *dev, cfg, [](const uint8_t* d, size_t n) {
          return std::fwrite(d, 1, n, stdout) == n;
        });
  } else {
    stats = sdrcap::CaptureToFile(*dev, cfg, out);
  }
  if (!stats.completed) {
    std::fprintf(stderr, "capture failed: %s (wrote %llu bytes)\n",
                 stats.error.c_str(), (unsigned long long)stats.bytes_written);
    return 1;
  }
  std::fprintf(stderr, "done: %llu bytes, %llu retunes, %llu errors\n",
               (unsigned long long)stats.bytes_written,
               (unsigned long long)stats.retunes,
               (unsigned long long)stats.transfer_errors);
  return 0;
}
