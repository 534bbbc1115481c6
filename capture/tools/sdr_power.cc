// Wideband power-spectrum scanner — rtl_power.c capability and CSV
// contract: step the tuner across [low, high], FFT each capture, emit
//   date, time, hz_low, hz_high, hz_bin, samples, dB, dB, ...
// one line per tuning. Uses a real radix-2 FFT (double) instead of the
// reference's integer fix_fft (rtl_power.c:260).
//
//   sdr_power -f low:high:bin_hz [-i crop_ignored] [-n samples] [out.csv]
#include <cmath>
#include <complex>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <ctime>
#include <string>
#include <vector>

#include "sdrcap/device.h"

namespace {

// In-place iterative radix-2 FFT.
void fft(std::vector<std::complex<double>>& a) {
  const size_t n = a.size();
  for (size_t i = 1, j = 0; i < n; ++i) {
    size_t bit = n >> 1;
    for (; j & bit; bit >>= 1) j ^= bit;
    j ^= bit;
    if (i < j) std::swap(a[i], a[j]);
  }
  for (size_t len = 2; len <= n; len <<= 1) {
    const double ang = -2.0 * M_PI / (double)len;
    const std::complex<double> wl(std::cos(ang), std::sin(ang));
    for (size_t i = 0; i < n; i += len) {
      std::complex<double> w(1.0);
      for (size_t k = 0; k < len / 2; ++k) {
        auto u = a[i + k], v = a[i + k + len / 2] * w;
        a[i + k] = u + v;
        a[i + k + len / 2] = u - v;
        w *= wl;
      }
    }
  }
}

}  // namespace

int main(int argc, char** argv) {
  double f_low = 0, f_high = 0, bin_hz = 10000;
  size_t samples = 16384;
  uint64_t seed = 1;
  std::string out_path;
  for (int i = 1; i < argc; ++i) {
    std::string a = argv[i];
    if (a == "-f" && i + 1 < argc) {
      if (std::sscanf(argv[++i], "%lf:%lf:%lf", &f_low, &f_high, &bin_hz) != 3) {
        std::fprintf(stderr, "bad -f spec (want low:high:bin)\n");
        return 2;
      }
    } else if (a == "-n" && i + 1 < argc) samples = std::strtoull(argv[++i], nullptr, 10);
    // rtl_power's integration-interval flag: accepted for CLI
    // compatibility, unused here (one pass per tuning).
    else if (a == "-i" && i + 1 < argc) ++i;
    else if (a == "--sim-seed" && i + 1 < argc) seed = std::strtoull(argv[++i], nullptr, 10);
    else if (a == "--help") {
      std::fprintf(stderr, "Usage: sdr_power -f low:high:bin_hz [-n samples] [out.csv]\n");
      return 0;
    } else if (a[0] != '-') out_path = a;
  }
  if (f_low <= 0 || f_high <= f_low) {
    std::fprintf(stderr, "Usage: sdr_power -f low:high:bin_hz [-n samples] [out.csv]\n");
    return 2;
  }

  FILE* out = out_path.empty() ? stdout : std::fopen(out_path.c_str(), "w");
  if (!out) { std::perror("open"); return 1; }

  auto dev = sdrcap::MakeSimDevice(seed);
  const uint32_t rate = 2'048'000;
  dev->set_sample_rate(rate);

  // FFT size: enough bins of bin_hz across one tuning's bandwidth.
  size_t fft_n = 1;
  while ((double)rate / (double)fft_n > bin_hz && fft_n < 65536) fft_n <<= 1;
  if (samples < fft_n) samples = fft_n;

  std::vector<uint8_t> buf(samples * 2);
  std::vector<std::complex<double>> x(fft_n);
  std::vector<double> psd(fft_n);

  const time_t now = time(nullptr);
  char datebuf[32], timebuf[32];
  struct tm tmv;
  gmtime_r(&now, &tmv);
  strftime(datebuf, sizeof(datebuf), "%Y-%m-%d", &tmv);
  strftime(timebuf, sizeof(timebuf), "%H:%M:%S", &tmv);

  for (double fc = f_low + rate / 2.0; fc - rate / 2.0 < f_high; fc += rate) {
    dev->set_center_freq((uint32_t)fc);
    dev->read_sync(buf.data(), buf.size());
    std::fill(psd.begin(), psd.end(), 0.0);
    size_t n_ffts = 0;
    for (size_t off = 0; off + fft_n * 2 <= buf.size(); off += fft_n * 2) {
      for (size_t k = 0; k < fft_n; ++k) {
        const double w = 0.5 - 0.5 * std::cos(2.0 * M_PI * k / (fft_n - 1));
        x[k] = {w * (buf[off + 2 * k] - 127.5) / 127.5,
                w * (buf[off + 2 * k + 1] - 127.5) / 127.5};
      }
      fft(x);
      for (size_t k = 0; k < fft_n; ++k) psd[k] += std::norm(x[k]);
      ++n_ffts;
    }
    std::fprintf(out, "%s, %s, %.0f, %.0f, %.2f, %zu",
                 datebuf, timebuf, fc - rate / 2.0, fc + rate / 2.0,
                 (double)rate / fft_n, n_ffts * fft_n);
    // fftshift order: negative freqs first (low edge of the tuning).
    for (size_t k = 0; k < fft_n; ++k) {
      const size_t idx = (k + fft_n / 2) % fft_n;
      const double p = psd[idx] / std::max<size_t>(n_ffts, 1) / fft_n;
      std::fprintf(out, ", %.2f", 10.0 * std::log10(p + 1e-20));
    }
    std::fprintf(out, "\n");
  }
  if (out != stdout) std::fclose(out);
  return 0;
}
