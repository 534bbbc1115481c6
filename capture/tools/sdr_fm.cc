// Host-side demodulator — rtl_fm.c capability: stream (or read a file
// of) u8 IQ, demodulate (FM discriminator, AM envelope, USB/LSB phasing,
// or raw passthrough), decimate, de-emphasize, and write s16 audio. The
// accelerator path (tdoa_tpu.dsp.fm / the Pallas kernel) is the
// production demod; this tool covers the reference's standalone-
// listening use and gives the capture stack a pure-native smoke path.
// Pipeline mirrors rtl_fm's stages: polar_discriminant (rtl_fm.c:427-434)
// / am_demod (546-561) / usb_demod+lsb_demod phasing sums (563-587) →
// low-pass decimation (302-322) → de-emphasis (596) → DC block (613).
//
// Squelch + scanning (rtl_fm.c:186-189, 1262-1282): multiple -f
// arguments (ranges "low:high:step" supported, k/M/G suffixes) build a
// scan list; when the squelch (-l, RMS in u8 counts) stays closed for
// -t consecutive blocks the tool retunes to the next list entry.
// Negative -t exits on squelch instead (rtl_fm.c:1087-1093).
// -M wbfm expands to "-s 170k -r 32k -l 0 -E deemp" (rtl_fm.c:1123-1137).
//
//   sdr_fm [-M fm|wbfm|am|usb|lsb|raw] [-s rate] [-r audio_rate]
//          [-d deemph_us] [-l squelch] [-t squelch_delay] [-g gain_db]
//          [-p ppm] [-E edge|dc|deemp|direct|offset]
//          (-i in.iq | --live seconds) [-f freq_or_range]... out.raw
#include <cmath>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <string>
#include <vector>

#include "sdrcap/args.h"
#include "sdrcap/backend.h"
#include "sdrcap/device.h"

namespace {

enum class Mode { kFm, kAm, kUsb, kLsb, kRaw };

struct Demod {
  Mode mode = Mode::kFm;
  double prev_re = 1.0, prev_im = 0.0;
  double deemph_state = 0.0, dc_avg = 0.0;
  double deemph_alpha = 0.0;
  int decim = 16;
  int acc_n = 0;
  double acc_v = 0.0, acc_re = 0.0, acc_im = 0.0;
  // SSB phasing-method state: Hilbert FIR over decimated Q, with I
  // delayed to the filter's group-delay center. Length scales with the
  // audio rate so rejection holds down to ~150 Hz at any decimation.
  int hilbert_taps = 255;
  std::vector<double> htaps;
  std::vector<double> ssb_i, ssb_q;  // rings, size hilbert_taps
  uint64_t ssb_n = 0;

  void configure(Mode mode_, double fs, int decim_, double deemph_us) {
    mode = mode_;
    decim = decim_;
    deemph_alpha =
        deemph_us > 0 ? 1.0 - std::exp(-1.0 / (fs / decim * deemph_us * 1e-6))
                      : 0.0;
    if (mode == Mode::kUsb || mode == Mode::kLsb) {
      // Transition band of the Hann-windowed transformer ≈ 4·fs/T;
      // target ~150 Hz at the audio rate, clamped odd in [255, 4095].
      const double fs_audio = fs / decim;
      int t = (int)(4.0 * fs_audio / 150.0);
      t = std::max(255, std::min(4095, t)) | 1;
      hilbert_taps = t;
      htaps.assign(hilbert_taps, 0.0);
      ssb_i.assign(hilbert_taps, 0.0);
      ssb_q.assign(hilbert_taps, 0.0);
      // Hann-windowed ideal Hilbert transformer: h[m]=2/(pi m), odd m.
      const int c = (hilbert_taps - 1) / 2;
      for (int k = 0; k < hilbert_taps; ++k) {
        const int m = k - c;
        if (m % 2 != 0) {
          const double w =
              0.5 - 0.5 * std::cos(2.0 * M_PI * k / (hilbert_taps - 1));
          htaps[k] = 2.0 / (M_PI * m) * w;
        }
      }
    }
  }

  // Clear stream state across a scan retune so the discriminator and
  // filters don't splice two unrelated signals together.
  void reset() {
    prev_re = 1.0;
    prev_im = 0.0;
    deemph_state = dc_avg = 0.0;
    acc_n = 0;
    acc_v = acc_re = acc_im = 0.0;
    std::fill(ssb_i.begin(), ssb_i.end(), 0.0);
    std::fill(ssb_q.begin(), ssb_q.end(), 0.0);
    ssb_n = 0;
  }

  // Consume one IQ sample; returns true + fills `out` when an audio
  // sample is ready.
  bool push(double re, double im, int16_t* out) {
    if (mode == Mode::kFm) {
      // Discriminator: angle of x[n] * conj(x[n-1]).
      const double pr = re * prev_re + im * prev_im;
      const double pi = im * prev_re - re * prev_im;
      prev_re = re;
      prev_im = im;
      // Boxcar decimation (rtl_fm low_pass parity).
      acc_v += std::atan2(pi, pr);  // [-pi, pi] rad/sample
    } else {
      // AM/SSB demodulate the *decimated* complex signal
      // (rtl_fm runs low_pass before mode_demod, rtl_fm.c:762).
      acc_re += re;
      acc_im += im;
    }
    if (++acc_n < decim) return false;
    double a;
    const double dre = acc_re / decim, dim = acc_im / decim;
    switch (mode) {
      case Mode::kFm:
        a = acc_v / decim / M_PI;
        break;
      case Mode::kAm:  // envelope (am_demod, rtl_fm.c:546-561)
        a = std::sqrt(dre * dre + dim * dim);
        break;
      default: {  // kUsb/kLsb: true phasing method, I ∓ H{Q}. The
        // reference's I±Q (usb_demod/lsb_demod, rtl_fm.c:563-587) is a
        // 45° approximation with no opposite-sideband rejection.
        const int slot = (int)(ssb_n % hilbert_taps);
        ssb_i[slot] = dre;
        ssb_q[slot] = dim;
        ++ssb_n;
        double hq = 0.0;
        for (int k = 0; k < hilbert_taps; ++k) {
          // q[n-k] lives k slots behind the just-written one.
          const int idx = (slot - k + 2 * hilbert_taps) % hilbert_taps;
          hq += htaps[k] * ssb_q[idx];
        }
        const double i_delayed =
            ssb_i[(slot - (hilbert_taps - 1) / 2 + hilbert_taps) %
                  hilbert_taps];
        a = 0.5 * (mode == Mode::kUsb ? i_delayed - hq : i_delayed + hq);
        break;
      }
    }
    acc_v = acc_re = acc_im = 0.0;
    acc_n = 0;
    // De-emphasis single-pole IIR.
    if (deemph_alpha > 0.0) {
      deemph_state += deemph_alpha * (a - deemph_state);
      a = deemph_state;
    }
    // DC block (strips the AM carrier level / FM tuning offset).
    dc_avg = 0.999 * dc_avg + 0.001 * a;
    a -= dc_avg;
    const double s = a * 32767.0;
    *out = (int16_t)std::max(-32767.0, std::min(32767.0, s));
    return true;
  }
};

}  // namespace

int main(int argc, char** argv) {
  std::string mode = "fm", in_path, out_path;
  double rate = 2'000'000, live_seconds = 0, deemph_us = 75.0;
  double audio_rate = 0;  // resolved to a decim after parsing (-r/-s
                          // must not be order-dependent)
  std::vector<double> freqs;
  int audio_decim = 16;
  double squelch_level = 0.0;  // RMS threshold in u8 counts (0 = off)
  int squelch_delay = 10;      // + = mute/scan blocks, - = exit
  double gain_db = 0.0;        // 0 = leave the device default
  int ppm = 0;
  bool have_rate = false, have_audio = false;
  bool opt_dc = false, opt_deemp = false, opt_direct = false,
       opt_offset = false, opt_edge = false;
  sdrcap::BackendOptions backend;
  backend.sim_seed = 3;
  for (int i = 1; i < argc; ++i) {
    std::string a = argv[i];
    auto next = sdrcap::MakeNext(argc, argv, &i);
    if (a == "-M") mode = next();
    else if (a == "-s") { rate = sdrcap::ParseFreq(next()); have_rate = true; }
    else if (a == "-r") { audio_rate = sdrcap::ParseFreq(next()); have_audio = true; }
    else if (a == "-d") deemph_us = std::atof(next());
    else if (a == "-i") in_path = next();
    else if (a == "-f") {
      if (!sdrcap::ParseFreqSpec(next(), &freqs)) {
        std::fprintf(stderr, "bad -f spec (want hz or low:high:step)\n");
        return 2;
      }
    } else if (a == "-l") squelch_level = std::atof(next());
    else if (a == "-t") squelch_delay = std::atoi(next());
    else if (a == "-g") gain_db = std::atof(next());
    else if (a == "-p") ppm = std::atoi(next());
    else if (a == "-E") {
      std::string opt = next();
      if (opt == "dc") opt_dc = true;
      else if (opt == "deemp") opt_deemp = true;
      else if (opt == "direct") opt_direct = true;
      else if (opt == "offset") opt_offset = true;
      else if (opt == "edge") opt_edge = true;
      else { std::fprintf(stderr, "unknown -E option '%s'\n", opt.c_str()); return 2; }
    }
    else if (a == "--live") live_seconds = std::atof(next());
    else if (sdrcap::ParseBackendFlag(a, next, &backend)) {}
    else if (a == "--help") {
      std::fprintf(stderr,
                   "Usage: sdr_fm [-M fm|wbfm|am|usb|lsb|raw] [-s rate] "
                   "[-r audio_rate] [-d deemph_us] [-l squelch] "
                   "[-t squelch_delay] [-g gain_db] [-p ppm] "
                   "[-E edge|dc|deemp|direct|offset] "
                   "(-i in.iq | --live sec) [-f hz|lo:hi:step]... out.raw\n"
                   "  multiple -f with -l scans; -t<0 exits on squelch\n%s", sdrcap::BackendUsage());
      return 0;
    } else if (a[0] != '-') out_path = a;
  }
  if (mode == "wbfm") {  // rtl_fm.c:1130-1137 preset
    mode = "fm";
    if (!have_rate) rate = 170'000;
    if (!have_audio) audio_rate = 32'000;
    opt_deemp = true;
  }
  Mode m = Mode::kFm;
  if (mode == "am") m = Mode::kAm;
  else if (mode == "usb") m = Mode::kUsb;
  else if (mode == "lsb") m = Mode::kLsb;
  else if (mode == "raw") m = Mode::kRaw;
  else if (mode != "fm") {
    std::fprintf(stderr, "unknown mode '%s'\n", mode.c_str());
    return 2;
  }
  if (out_path.empty() || (in_path.empty() && live_seconds <= 0)) {
    std::fprintf(stderr, "need an input (-i or --live) and an output file\n");
    return 2;
  }
  if (freqs.empty()) freqs.push_back(100e6);
  if (freqs.size() > 1 && !in_path.empty()) {
    std::fprintf(stderr, "scanning needs a live device; using first -f only\n");
    freqs.resize(1);
  }
  const bool scanning = freqs.size() > 1;
  if (scanning && squelch_level <= 0.0) {
    std::fprintf(stderr, "scanning requires a squelch (-l)\n");  // rtl_fm.c:1166
    return 2;
  }
  FILE* out = std::fopen(out_path.c_str(), "wb");
  if (!out) { std::perror("open out"); return 1; }

  Demod dm;
  if (audio_rate > 0) audio_decim = (int)(rate / audio_rate);
  if (audio_decim < 1) audio_decim = 1;
  dm.configure(m, rate, audio_decim,
               m == Mode::kFm && (opt_deemp || deemph_us > 0) ? deemph_us : 0.0);
  uint64_t audio_samples = 0;
  // Demod's DC block is always on (it strips the AM carrier level and
  // FM tuning offset); -E dc is accepted for rtl_fm CLI parity.
  (void)opt_dc;

  // Squelch/scan state. Blocks are rtl_fm-sized (16384 bytes ≈ 4 ms at
  // 2 Msps) so scan hops have the reference's responsiveness regardless
  // of the I/O chunking above (rtl_fm.c DEFAULT_BUF_LENGTH).
  constexpr size_t kSquelchBlock = 16384;
  size_t freq_idx = 0;
  int squelch_hits = 0;
  bool exit_requested = false;
  sdrcap::Device* live_dev = nullptr;
  // Lower-edge tuning offsets the LO by rate/4 (rtl_fm.c:958-966).
  const double edge_off = opt_edge ? rate / 4.0 : 0.0;
  // When scanning, stream in squelch-block-sized device buffers and,
  // after each hop, discard the buffers the producer may have generated
  // BEFORE the retune landed (the async engine legally runs
  // num_buffers ahead — librtlsdr-style transfer queue). Without this,
  // hop decisions are made on stale-frequency data and the scanner's
  // behavior depends on a producer/consumer scheduler race.
  const size_t live_buf_len = scanning ? kSquelchBlock : 262144;
  const size_t live_num_bufs = scanning ? 2 : 8;
  int settle_blocks = 0;  // blocks to mute + skip squelch after a hop

  // Demodulate one block, writing real or (squelched) zeroed audio.
  auto demod_block = [&](const uint8_t* data, size_t len, bool mute) {
    int16_t s;
    for (size_t k = 0; k + 1 < len; k += 2) {
      const double re = (data[k] - 127.5) / 127.5;
      const double im = (data[k + 1] - 127.5) / 127.5;
      if (m == Mode::kRaw) {
        const int16_t pair[2] = {(int16_t)(re * 32767), (int16_t)(im * 32767)};
        std::fwrite(pair, sizeof(pair), 1, out);
        ++audio_samples;
      } else if (dm.push(re, im, &s)) {
        const int16_t v = mute ? 0 : s;
        std::fwrite(&v, sizeof(v), 1, out);
        ++audio_samples;
      }
    }
  };

  auto process = [&](const uint8_t* data, size_t len) {
    for (size_t off = 0; off < len && !exit_requested;
         off += kSquelchBlock) {
      const size_t n = std::min(kSquelchBlock, len - off);
      bool mute = false;
      if (settle_blocks > 0) {
        --settle_blocks;
        demod_block(data + off, n, /*mute=*/true);
        continue;
      }
      if (squelch_level > 0.0 && m != Mode::kRaw) {
        // RMS of the raw block in u8 counts (127.5-centered), the same
        // scale rtl_fm's rms() sees (rtl_fm.c:589-611).
        double acc = 0.0;
        for (size_t k = 0; k < n; ++k) {
          const double d = data[off + k] - 127.5;
          acc += d * d;
        }
        const double rms = std::sqrt(acc / (double)n);
        if (rms < squelch_level) {
          mute = true;
          ++squelch_hits;
          if (squelch_delay < 0 && squelch_hits >= -squelch_delay) {
            exit_requested = true;  // rtl_fm.c:1087-1093 (-t negative)
          } else if (scanning && live_dev && squelch_hits >= squelch_delay) {
            freq_idx = (freq_idx + 1) % freqs.size();
            live_dev->set_center_freq((uint32_t)(freqs[freq_idx] + edge_off));
            std::fprintf(stderr, "scan: hopping to %.0f Hz\n",
                         freqs[freq_idx]);
            dm.reset();
            squelch_hits = 0;
            settle_blocks = (int)live_num_bufs + 1;
            return;  // drop the rest of this chunk; it predates the hop
          }
        } else {
          squelch_hits = 0;
        }
      }
      demod_block(data + off, n, mute);
    }
  };

  if (!in_path.empty()) {
    FILE* in = std::fopen(in_path.c_str(), "rb");
    if (!in) { std::perror("open in"); return 1; }
    std::vector<uint8_t> buf(1 << 16);
    size_t n;
    while ((n = std::fread(buf.data(), 1, buf.size(), in)) > 0 &&
           !exit_requested)
      process(buf.data(), n);
    std::fclose(in);
  } else {
    auto dev = sdrcap::OpenBackend(backend);
    if (!dev) return 1;
    live_dev = dev.get();
    // Real RTL2832U silicon rejects demod rates like wbfm's 170 kHz
    // (resampler constraint: (225k,300k] or (900k,3.2M]). Like rtl_fm,
    // capture at an integer multiple and boxcar-decimate back to the
    // demod rate (rtl_fm.c's capture_rate/downsample).
    int bump = 1;
    if (!dev->set_sample_rate((uint32_t)rate)) {
      uint64_t cap = (uint64_t)rate;
      while (cap <= 900'000 && bump < 64) {
        ++bump;
        cap = (uint64_t)rate * bump;
      }
      if (cap > 3'200'000 || !dev->set_sample_rate((uint32_t)cap)) {
        std::fprintf(stderr,
                     "device cannot reach %.0f Hz (tried %.0f x%d)\n",
                     rate, (double)cap, bump);
        return 1;
      }
      std::fprintf(stderr, "capturing at %.0f Hz, decimating x%d\n",
                   (double)cap, bump);
    }
    if (!dev->set_center_freq((uint32_t)(freqs[0] + edge_off))) {
      std::fprintf(stderr, "tune to %.0f Hz failed\n", freqs[0] + edge_off);
      return 1;
    }
    if (gain_db > 0) dev->set_tuner_gain_db(gain_db);
    if (ppm != 0) dev->set_freq_correction_ppm(ppm);
    if (opt_direct) dev->set_direct_sampling(2);
    if (opt_offset) dev->set_offset_tuning(true);
    // Boxcar complex decimator (averages `bump` consecutive IQ pairs),
    // carrying partial groups across chunks.
    std::vector<uint8_t> dec_buf;
    uint32_t carry_i = 0, carry_q = 0;
    int carry_n = 0;
    const uint64_t want_bytes = (uint64_t)(live_seconds * rate) * 2;
    uint64_t got = 0;
    dev->read_async(
        [&](const uint8_t* d, size_t len) {
          if (bump > 1) {
            dec_buf.clear();
            dec_buf.reserve(len / bump + 2);
            for (size_t k = 0; k + 1 < len; k += 2) {
              carry_i += d[k];
              carry_q += d[k + 1];
              if (++carry_n == bump) {
                dec_buf.push_back((uint8_t)(carry_i / (uint32_t)bump));
                dec_buf.push_back((uint8_t)(carry_q / (uint32_t)bump));
                carry_i = carry_q = 0;
                carry_n = 0;
              }
            }
            if (!dec_buf.empty()) process(dec_buf.data(), dec_buf.size());
            got += dec_buf.size();
          } else {
            process(d, len);
            got += len;
          }
          if (got >= want_bytes || exit_requested) dev->cancel_async();
        },
        live_buf_len, live_num_bufs);
    if (scanning)
      std::fprintf(stderr, "scan: final frequency %.0f Hz\n", freqs[freq_idx]);
  }
  std::fclose(out);
  std::fprintf(stderr, "wrote %llu audio samples at %.0f Hz\n",
               (unsigned long long)audio_samples, rate / audio_decim);
  return 0;
}
