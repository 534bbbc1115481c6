// Wideband power-spectrum scanner — rtl_power.c capability and CSV
// contract: step the tuner across [low, high], FFT each capture, emit
//   date, time, hz_low, hz_high, hz_bin, samples, dB, dB, ...
// one line per tuning per sweep. Uses a real radix-2 FFT (double)
// instead of the reference's integer fix_fft (rtl_power.c:260).
//
// Option surface follows rtl_power.c:121-167: -f low:high:bin (k/M/G
// suffixes), -i integration interval (s/m/h suffixes), -1 single-shot,
// -e exit timer, -c crop% (edge-bin discard with overlapped tunings),
// -w window, -P peak hold, -g gain, -p ppm, -d device index.
// Time is virtual (sample count / rate) so offline runs are
// deterministic; a sweep's dwell per tuning is interval/n_tunings,
// exactly the scheduling rtl_power.c:322-346 computes.
//
//   sdr_power -f low:high:bin_hz [-i interval] [-1] [-e timer]
//             [-c crop%] [-w window] [-P] [-g db] [-p ppm] [out.csv]
#include <cmath>
#include <complex>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <ctime>
#include <string>
#include <vector>

#include "sdrcap/args.h"
#include "sdrcap/backend.h"
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

// The rtl_power window menu (rtl_power.c:141 + window_fn selection).
std::vector<double> MakeWindow(const std::string& name, size_t n) {
  static const char* kNames[] = {"rectangle", "hamming", "hann", "blackman",
                                 "blackman-harris", "hann-poisson",
                                 "bartlett", "youssef"};
  bool known = false;
  for (const char* nm : kNames) known = known || name == nm;
  if (!known) return {};
  std::vector<double> w(n, 1.0);
  if (n < 2) return w;  // single-bin FFT: every window degenerates to 1
  const double N = (double)(n - 1);
  for (size_t k = 0; k < n; ++k) {
    const double x = (double)k / N;           // 0..1
    const double t = 2.0 * M_PI * x;
    if (name == "rectangle") w[k] = 1.0;
    else if (name == "hamming") w[k] = 0.54 - 0.46 * std::cos(t);
    else if (name == "hann") w[k] = 0.5 - 0.5 * std::cos(t);
    else if (name == "blackman")
      w[k] = 0.42 - 0.5 * std::cos(t) + 0.08 * std::cos(2 * t);
    else if (name == "blackman-harris")
      w[k] = 0.35875 - 0.48829 * std::cos(t) + 0.14128 * std::cos(2 * t) -
             0.01168 * std::cos(3 * t);
    else if (name == "hann-poisson")
      w[k] = (0.5 - 0.5 * std::cos(t)) *
             std::exp(-2.0 * std::abs((double)k - N / 2.0) / (N / 2.0));
    else if (name == "bartlett")
      w[k] = 1.0 - std::abs(((double)k - N / 2.0) / (N / 2.0));
    else if (name == "youssef") {
      // Kaiser-Bessel-derived flat-top approximation rtl_power credits
      // to Youssef; a cosine-series flat-top is the same capability.
      w[k] = 1.0 - 1.93 * std::cos(t) + 1.29 * std::cos(2 * t) -
             0.388 * std::cos(3 * t) + 0.028 * std::cos(4 * t);
    }
  }
  return w;
}

}  // namespace

int main(int argc, char** argv) {
  double f_low = 0, f_high = 0, bin_hz = 10000;
  size_t samples = 16384;
  sdrcap::BackendOptions backend;
  double interval_s = 10.0, exit_s = 0.0, crop = 0.0;
  bool single_shot = false, peak_hold = false, have_n = false;
  double gain_db = 0.0;
  int ppm = 0;
  std::string window_name = "rectangle", out_path;
  for (int i = 1; i < argc; ++i) {
    std::string a = argv[i];
    auto nextc = sdrcap::MakeNext(argc, argv, &i);
    auto next = [&]() { return std::string(nextc()); };
    if (a == "-f" && i + 1 < argc) {
      const std::string spec = next();
      const size_t c1 = spec.find(':'), c2 = spec.rfind(':');
      if (c1 == std::string::npos || c2 == c1) {
        std::fprintf(stderr, "bad -f spec (want low:high:bin)\n");
        return 2;
      }
      f_low = sdrcap::ParseFreq(spec.substr(0, c1));
      f_high = sdrcap::ParseFreq(spec.substr(c1 + 1, c2 - c1 - 1));
      bin_hz = sdrcap::ParseFreq(spec.substr(c2 + 1));
    } else if (a == "-n" && i + 1 < argc) {
      samples = std::strtoull(argv[++i], nullptr, 10);
      have_n = true;
    }
    else if (a == "-i" && i + 1 < argc) interval_s = sdrcap::ParseTime(next());
    else if (a == "-e" && i + 1 < argc) exit_s = sdrcap::ParseTime(next());
    else if (a == "-c" && i + 1 < argc) {
      std::string c = next();
      if (!c.empty() && c.back() == '%') c.pop_back();
      crop = std::atof(c.c_str()) / 100.0;
      if (crop < 0.0 || crop >= 1.0) {
        std::fprintf(stderr, "crop must be in [0%%, 100%%)\n");
        return 2;
      }
    } else if (a == "-w" && i + 1 < argc) window_name = next();
    else if (a == "-1") single_shot = true;
    else if (a == "-P") peak_hold = true;
    else if (a == "-g" && i + 1 < argc) gain_db = std::atof(argv[++i]);
    else if (a == "-p" && i + 1 < argc) ppm = std::atoi(argv[++i]);
    else if (a == "-F" && i + 1 < argc) ++i;  // fir_size: accepted, N/A
    else if (sdrcap::ParseBackendFlag(a, nextc, &backend)) {}
    else if (a == "--help") {
      std::fprintf(stderr,
                   "Usage: sdr_power -f low:high:bin_hz [-i interval] [-1] "
                   "[-e exit_timer] [-c crop%%] [-w window] [-P] [-g db] "
                   "[-p ppm] [-n samples] [out.csv]\n"
                   "  windows: rectangle hamming hann blackman "
                   "blackman-harris hann-poisson bartlett youssef\n%s",
                   sdrcap::BackendUsage());
      return 0;
    } else if (a[0] != '-') out_path = a;
    else {
      std::fprintf(stderr, "bad or incomplete option '%s' (see --help)\n",
                   a.c_str());
      return 2;
    }
  }
  if (f_low <= 0 || f_high <= f_low) {
    std::fprintf(stderr, "Usage: sdr_power -f low:high:bin_hz [options] [out.csv]\n");
    return 2;
  }

  FILE* out = out_path.empty() ? stdout : std::fopen(out_path.c_str(), "w");
  if (!out) { std::perror("open"); return 1; }

  auto dev = sdrcap::OpenBackend(backend);
  if (!dev) return 1;
  const uint32_t rate = 2'048'000;
  dev->set_sample_rate(rate);
  if (gain_db > 0) dev->set_tuner_gain_db(gain_db);
  if (ppm != 0) dev->set_freq_correction_ppm(ppm);

  // FFT size: enough bins of bin_hz across one tuning's bandwidth.
  size_t fft_n = 1;
  while ((double)rate / (double)fft_n > bin_hz && fft_n < 65536) fft_n <<= 1;
  if (samples < fft_n) samples = fft_n;

  const std::vector<double> window = MakeWindow(window_name, fft_n);
  if (window.empty()) {
    std::fprintf(stderr, "unknown window '%s'\n", window_name.c_str());
    return 2;
  }
  // Window power normalization keeps dB levels comparable across
  // windows (incoherent gain, rtl_power normalizes similarly).
  double wpow = 0.0;
  for (double w : window) wpow += w * w;
  wpow /= (double)fft_n;

  // Tuning plan: each tuning keeps the central (1-crop) of its span and
  // steps by the kept width, so cropped edges still give contiguous
  // coverage (rtl_power.c frequency planning).
  const double kept_bw = (double)rate * (1.0 - crop);
  const size_t drop_lo = (size_t)((double)fft_n * crop / 2.0);
  const size_t keep_n = fft_n - 2 * drop_lo;
  // The kept band of tuning t is [f_low + t·kept_bw, f_low + (t+1)·kept_bw);
  // the tuner centers on the middle of that band (the cropped edges
  // extend rate/2 either side of it).
  std::vector<double> centers;
  for (double lo = f_low; lo < f_high; lo += kept_bw)
    centers.push_back(lo + kept_bw / 2.0);

  // Dwell per tuning per sweep: split the integration interval across
  // tunings, at least one FFT frame each.
  size_t ffts_per_tuning =
      (size_t)(interval_s * (double)rate /
               ((double)centers.size() * (double)fft_n));
  if (ffts_per_tuning < 1) ffts_per_tuning = 1;
  // An explicit -n caps the dwell per tuning; without it the -i
  // interval alone sets the integration depth.
  if (have_n) {
    const size_t cap = samples / fft_n ? samples / fft_n : 1;
    if (ffts_per_tuning > cap) ffts_per_tuning = cap;
  }

  std::vector<uint8_t> buf(fft_n * 2);
  std::vector<std::complex<double>> x(fft_n);
  std::vector<double> psd(fft_n);
  uint64_t total_samples = 0;  // virtual clock across the whole run

  bool done = false;
  while (!done) {
    const time_t now = time(nullptr);
    char datebuf[32], timebuf[32];
    struct tm tmv;
    gmtime_r(&now, &tmv);
    strftime(datebuf, sizeof(datebuf), "%Y-%m-%d", &tmv);
    strftime(timebuf, sizeof(timebuf), "%H:%M:%S", &tmv);

    for (double fc : centers) {
      dev->set_center_freq((uint32_t)fc);
      std::fill(psd.begin(), psd.end(), peak_hold ? -1.0 : 0.0);
      for (size_t rep = 0; rep < ffts_per_tuning; ++rep) {
        dev->read_sync(buf.data(), buf.size());
        total_samples += fft_n;
        for (size_t k = 0; k < fft_n; ++k)
          x[k] = {window[k] * (buf[2 * k] - 127.5) / 127.5,
                  window[k] * (buf[2 * k + 1] - 127.5) / 127.5};
        fft(x);
        if (peak_hold) {
          for (size_t k = 0; k < fft_n; ++k)
            psd[k] = std::max(psd[k], std::norm(x[k]));
        } else {
          for (size_t k = 0; k < fft_n; ++k) psd[k] += std::norm(x[k]);
        }
      }
      // Report the range the kept bins actually cover (drop_lo floors,
      // so this can be slightly wider than kept_bw — tunings then
      // overlap a little rather than leave gaps).
      const double bin_w = (double)rate / fft_n;
      const double lo_kept = fc - bin_w * (double)keep_n / 2.0;
      std::fprintf(out, "%s, %s, %.0f, %.0f, %.2f, %zu",
                   datebuf, timebuf, lo_kept, lo_kept + bin_w * (double)keep_n,
                   (double)rate / fft_n, ffts_per_tuning * fft_n);
      // fftshift order (negative freqs first), then drop cropped edges.
      for (size_t k = drop_lo; k < drop_lo + keep_n; ++k) {
        const size_t idx = (k + fft_n / 2) % fft_n;
        const double p =
            (peak_hold ? psd[idx]
                       : psd[idx] / (double)ffts_per_tuning) /
            ((double)fft_n * wpow);
        std::fprintf(out, ", %.2f", 10.0 * std::log10(p + 1e-20));
      }
      std::fprintf(out, "\n");
    }
    const double virtual_t = (double)total_samples / (double)rate;
    if (single_shot) done = true;
    else if (exit_s > 0) done = virtual_t >= exit_s;
    else done = true;  // offline default: one sweep (no operator Ctrl-C)
  }
  if (out != stdout) std::fclose(out);
  return 0;
}
