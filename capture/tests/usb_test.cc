// USB protocol-stack tests against the mock transport: the RTL2832U
// driver + R82xx tuner + ordered async engine, end to end, without
// hardware. Run under TSAN/ASAN in CI — the concurrency claims
// (out-of-order completions reordered, graceful cancel, device-lost)
// are sanitizer-proven, which the reference never did (SURVEY.md §5:
// "race detection: none configured").
#include <cmath>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <memory>
#include <vector>

#define CHECK(cond)                                                     \
  do {                                                                  \
    if (!(cond)) {                                                      \
      std::fprintf(stderr, "CHECK failed: %s (%s:%d)\n", #cond,         \
                   __FILE__, __LINE__);                                 \
      std::abort();                                                     \
    }                                                                   \
  } while (0)

#include "sdrcap/capture_engine.h"
#include "sdrcap/device.h"
#include "sdrcap/usb.h"

using namespace sdrcap;

namespace {

struct Rig {
  std::shared_ptr<MockRtlState> state;
  std::unique_ptr<Device> dev;
};

Rig make_rig(MockUsbOptions opts = {}) {
  Rig r;
  r.state = std::make_shared<MockRtlState>();
  r.dev = MakeUsbDevice(MakeMockUsbTransport(opts, r.state));
  CHECK(r.dev != nullptr);
  return r;
}

// Mirror of MockUsbTransport::MockByte (the mock's stream generator).
uint8_t mock_byte(uint64_t n, uint32_t freq_tag, uint32_t gain_tag,
                  uint64_t seed) {
  uint64_t h = n * 0x9e3779b97f4a7c15ull ^ (uint64_t)freq_tag << 32 ^
               (uint64_t)gain_tag << 17 ^ seed;
  h ^= h >> 29;
  return (uint8_t)(h & 0xff);
}

}  // namespace

// Open must run the full bring-up: baseband powered, FIR programmed,
// R828D probed — with zero I2C-repeater violations.
static void test_open_initializes_baseband_and_tuner() {
  Rig r = make_rig();
  CHECK(r.state->baseband_on.load());
  CHECK(std::strcmp(r.dev->tuner_name(), "Rafael Micro R828D") == 0);
  CHECK(r.state->fir_writes.load() >= 20);
  CHECK(r.state->repeater_violations.load() == 0);
  CHECK(!r.state->repeater_on.load());  // repeater released after init
  CHECK(r.state->control_transfers.load() > 50);
  std::puts("open_initializes OK");
}

// The PLL registers the driver programs must decode back to the LO the
// silicon would synthesize: RF + 3.57 MHz IF, within the sigma-delta
// quantization (xtal/65536 per LSB ≈ 244 Hz at 16 MHz).
static void test_tuner_pll_roundtrip() {
  Rig r = make_rig();
  for (uint32_t freq : {101'900'000u, 162'400'000u, 433'920'000u,
                        915'000'000u, 1'090'000'000u}) {
    CHECK(r.dev->set_center_freq(freq));
    CHECK(r.dev->center_freq() == freq);
    const double lo = (double)r.state->tuner_lo_hz.load();
    const double want = (double)freq + 3'570'000.0;
    CHECK(std::fabs(lo - want) < 1000.0);
  }
  CHECK(r.state->repeater_violations.load() == 0);
  std::puts("tuner_pll_roundtrip OK");
}

// Gain programming: manual mode with LNA+mixer indices whose measured
// step sums reach the requested gain (tuner_r82xx.c:995-1074).
static void test_tuner_gain_programming() {
  static constexpr int kLna[16] = {0, 9,  13, 40, 38, 13, 31, 22,
                                   26, 31, 26, 14, 19, 5,  35, 13};
  static constexpr int kMix[16] = {0,  5,  10, 10, 19, 9, 10, 25,
                                   17, 10, 8,  16, 13, 6, 3,  -8};
  Rig r = make_rig();
  for (double gain_db : {0.9, 16.6, 28.0, 49.6}) {
    CHECK(r.dev->set_tuner_gain_db(gain_db));
    CHECK(r.state->tuner_manual_gain.load());
    int total = 0;
    for (uint32_t i = 1; i <= r.state->lna_index.load(); ++i)
      total += kLna[i];
    for (uint32_t i = 1; i <= r.state->mixer_index.load(); ++i)
      total += kMix[i];
    // Sum of selected steps must reach the snapped gain (tenths dB)
    // without overshooting by more than one step (~4 dB).
    const int want = (int)(NearestGainDb(gain_db) * 10.0 + 0.5);
    CHECK(total >= want);
    CHECK(total - want <= 40);
  }
  std::puts("tuner_gain OK");
}

// Demod config: resampler ratio and DDC IF register must encode the
// requested rate and the R82xx low-IF (librtlsdr.c:686-714, 1062-1126).
static void test_demod_rate_and_if() {
  Rig r = make_rig();
  CHECK(r.dev->set_sample_rate(2'000'000));
  const uint32_t ratio = r.state->rsamp_ratio.load() & 0x0ffffffc;
  const double real_rate = 28'800'000.0 * 4194304.0 /
                           (double)(ratio | ((ratio & 0x08000000) << 1));
  CHECK(std::fabs(real_rate - 2'000'000.0) < 200.0);
  CHECK(r.dev->sample_rate() >= 1'999'000 && r.dev->sample_rate() <= 2'001'000);
  // IF register: -(3.57e6 * 2^22 / 28.8e6), a negative 22-bit value.
  const int32_t want = -(int32_t)((3'570'000ull << 22) / 28'800'000ull);
  const int32_t got = r.state->if_freq_reg.load();
  CHECK(std::abs(got - want) <= 1);
  // Invalid rates rejected (librtlsdr.c:1086-1090).
  CHECK(!r.dev->set_sample_rate(100'000));
  CHECK(!r.dev->set_sample_rate(500'000));
  std::puts("demod_rate_if OK");
}

// AGC control writes the documented demod register values.
static void test_agc_toggle() {
  Rig r = make_rig();
  CHECK(r.dev->set_agc(true));
  CHECK(r.state->agc_on.load());
  CHECK(r.dev->set_agc(false));
  CHECK(!r.state->agc_on.load());
  std::puts("agc_toggle OK");
}

// The core end-to-end property: a 2-frequency capture through the USB
// engine delivers EXACTLY 3*n samples, loss-free and in order, even
// though the mock completes bulk transfers out of submission order.
// Every byte is checked against the mock's generator: a byte-counter
// mismatch anywhere would cascade into mismatches everywhere after it.
static void test_async_capture_ordered_lossfree() {
  Rig r = make_rig();
  CaptureConfig cfg;
  cfg.freq1_hz = 162'400'000;
  cfg.freq2_hz = 101'900'000;
  cfg.gain1_db = 30.0;
  cfg.gain2_db = 10.0;
  cfg.samples_per_freq = 100'000;
  cfg.buf_len = 16'384;
  cfg.num_buffers = 8;

  std::vector<uint8_t> out;
  out.reserve(3 * 2 * cfg.samples_per_freq);
  CaptureStats st = RunTwoFreqCapture(
      *r.dev, cfg, [&](const uint8_t* d, size_t n) {
        out.insert(out.end(), d, d + n);
        return true;
      });
  CHECK(st.completed);
  CHECK(st.retunes == 2);
  CHECK(out.size() == 3 * 2 * cfg.samples_per_freq);

  // Reconstruct the two (freq,gain) tag pairs the mock stamped.
  auto tags = [&](uint32_t freq, double gain) {
    r.dev->set_tuner_gain_db(gain);
    r.dev->set_center_freq(freq);
    uint32_t ft = r.state->tuner_lo_hz.load() / 1000u;
    uint32_t gt = r.state->lna_index.load() * 16u +
                  r.state->mixer_index.load();
    return std::make_pair(ft, gt);
  };
  auto [f1t, g1t] = tags(cfg.freq1_hz, cfg.gain1_db);
  auto [f2t, g2t] = tags(cfg.freq2_hz, cfg.gain2_db);

  // Each byte must equal the generator's output for ITS OWN counter
  // position under one of the two tunings (transfers in flight across
  // a retune legitimately carry the old tag). Any drop, duplicate, or
  // reorder shifts the counter and fails almost every later byte.
  size_t mismatch = 0;
  for (size_t n = 0; n < out.size(); ++n) {
    const uint8_t a = mock_byte(n, f1t, g1t, 1);
    const uint8_t b = mock_byte(n, f2t, g2t, 1);
    if (out[n] != a && out[n] != b) ++mismatch;
  }
  CHECK(mismatch == 0);

  // The middle of block 2 must carry the second tuning (the retune
  // actually happened), and block 1/3 middles the first.
  const size_t bs = 2 * cfg.samples_per_freq;
  CHECK(out[bs / 2] == mock_byte(bs / 2, f1t, g1t, 1));
  CHECK(out[bs + bs / 2] == mock_byte(bs + bs / 2, f2t, g2t, 1));
  CHECK(out[2 * bs + bs / 2] == mock_byte(2 * bs + bs / 2, f1t, g1t, 1));
  std::puts("async_capture OK");
}

// A second capture on the same device must work: cancel only reaps the
// transfers in flight at cancel time (libusb semantics), it must not
// poison later submissions.
static void test_capture_restartable() {
  Rig r = make_rig();
  CaptureConfig cfg;
  cfg.freq1_hz = 162'400'000;
  cfg.freq2_hz = 101'900'000;
  cfg.gain1_db = 25.0;
  cfg.gain2_db = 25.0;
  cfg.samples_per_freq = 20'000;
  cfg.buf_len = 8'192;
  cfg.num_buffers = 4;
  for (int run = 0; run < 2; ++run) {
    size_t total = 0;
    CaptureStats st = RunTwoFreqCapture(
        *r.dev, cfg, [&](const uint8_t*, size_t n) {
          total += n;
          return true;
        });
    CHECK(st.completed);
    CHECK(total == 3 * 2 * cfg.samples_per_freq);
  }
  std::puts("capture_restartable OK");
}

// Direct sampling: tuner parked in standby, DDC carries the "center
// frequency", and leaving the mode restores the R82xx low-IF config.
static void test_direct_sampling() {
  Rig r = make_rig();
  CHECK(r.dev->set_direct_sampling(1));
  CHECK(r.dev->set_center_freq(7'200'000));  // 40 m band, no tuner PLL
  // DDC register now encodes 7.2 MHz (negative 22-bit value).
  const int32_t want = -(int32_t)((7'200'000ull << 22) / 28'800'000ull);
  CHECK(std::abs(r.state->if_freq_reg.load() - want) <= 1);
  // Leaving direct mode retunes to the last center frequency, so move
  // back into the tuner's range first (7.2 MHz has no valid PLL
  // divider — the reference's restore fails identically there,
  // librtlsdr.c:1210).
  CHECK(r.dev->set_center_freq(101'900'000));
  CHECK(r.dev->set_direct_sampling(0));
  // Back in tuner mode: the PLL programs again.
  const double lo = (double)r.state->tuner_lo_hz.load();
  CHECK(std::fabs(lo - (101'900'000.0 + 3'570'000.0)) < 1000.0);
  // Offset tuning is an E4000 feature: must refuse, not fake success.
  CHECK(!r.dev->set_offset_tuning(true));
  CHECK(r.state->repeater_violations.load() == 0);
  std::puts("direct_sampling OK");
}

// Sync-mode fallback reads through the same transport.
static void test_sync_capture() {
  Rig r = make_rig();
  CaptureConfig cfg;
  cfg.freq1_hz = 162'400'000;
  cfg.freq2_hz = 101'900'000;
  cfg.gain1_db = 25.0;
  cfg.gain2_db = 25.0;
  cfg.samples_per_freq = 20'000;
  cfg.sync_mode = true;
  size_t total = 0;
  CaptureStats st = RunTwoFreqCapture(
      *r.dev, cfg, [&](const uint8_t*, size_t n) {
        total += n;
        return true;
      });
  CHECK(st.completed);
  CHECK(total == 3 * 2 * cfg.samples_per_freq);
  std::puts("sync_capture OK");
}

// Unplugging mid-stream must end the capture with an error, not hang
// or lose the engine (librtlsdr.c:1694-1703 dev_lost semantics).
static void test_device_lost_mid_stream() {
  MockUsbOptions opts;
  opts.lose_device_after = 6;
  Rig r = make_rig(opts);
  CaptureConfig cfg;
  cfg.freq1_hz = 162'400'000;
  cfg.freq2_hz = 101'900'000;
  cfg.gain1_db = 25.0;
  cfg.gain2_db = 25.0;
  cfg.samples_per_freq = 10'000'000;  // far more than 6 transfers
  cfg.buf_len = 16'384;
  cfg.num_buffers = 4;
  CaptureStats st = RunTwoFreqCapture(
      *r.dev, cfg, [](const uint8_t*, size_t) { return true; });
  CHECK(!st.completed);
  CHECK(st.transfer_errors > 0);
  std::puts("device_lost OK");
}

// A sink abort (disk full) must cancel gracefully: engine returns, all
// transfers reaped.
static void test_sink_abort_cancels() {
  Rig r = make_rig();
  CaptureConfig cfg;
  cfg.freq1_hz = 162'400'000;
  cfg.freq2_hz = 101'900'000;
  cfg.gain1_db = 25.0;
  cfg.gain2_db = 25.0;
  cfg.samples_per_freq = 10'000'000;
  cfg.buf_len = 16'384;
  cfg.num_buffers = 4;
  int calls = 0;
  CaptureStats st = RunTwoFreqCapture(
      *r.dev, cfg,
      [&](const uint8_t*, size_t) { return ++calls < 3; });
  CHECK(!st.completed);
  CHECK(st.error == "sink write failed");
  std::puts("sink_abort OK");
}

// EEPROM over USB: pointer-read protocol + compare-then-write with
// read-back verification (librtlsdr.c:1000-1062).
static void test_eeprom_roundtrip() {
  Rig r = make_rig();
  uint8_t hdr[6] = {};
  CHECK(r.dev->read_eeprom(hdr, 0, sizeof(hdr)) == (int)sizeof(hdr));
  CHECK(hdr[0] == 0x28 && hdr[1] == 0x32);  // RTL28xx header
  CHECK(hdr[2] == 0xda && hdr[3] == 0x0b);  // VID 0x0bda little-endian
  CHECK(r.state->eeprom_reads.load() > 0);
  const uint8_t payload[4] = {0xde, 0xad, 0xbe, 0xef};
  CHECK(r.dev->write_eeprom(payload, 0x40, 4) == 4);
  uint8_t back[4] = {};
  CHECK(r.dev->read_eeprom(back, 0x40, 4) == 4);
  CHECK(std::memcmp(back, payload, 4) == 0);
  // Out-of-range access refused (256-byte part).
  CHECK(r.dev->read_eeprom(back, 0xfe, 4) < 0);
  std::puts("eeprom_roundtrip OK");
}

// --- E4000 (zero-IF) tuner --------------------------------------------
// The probe must find the E4000 at 0xc8 (chip id 0x40 at reg 2,
// librtlsdr.c:1504-1508) and leave the demod in the zero-IF datapath:
// DDC at 0, both ADCs — unlike the R82xx's 3.57 MHz low-IF.
static void test_e4k_probe_and_zero_if() {
  MockUsbOptions opts;
  opts.tuner = MockTunerModel::kE4000;
  Rig r = make_rig(opts);
  CHECK(r.state->baseband_on.load());
  CHECK(std::strcmp(r.dev->tuner_name(), "Elonics E4000") == 0);
  CHECK(r.state->repeater_violations.load() == 0);
  CHECK(r.state->if_freq_reg.load() == 0);  // zero-IF
  std::puts("e4k_probe OK");
}

// Zero-IF PLL: the synthesized LO must sit ON the target frequency,
// within the 16-bit fractional quantization (fosc / 65536 / R — under
// 120 Hz everywhere). Above the 1.2 GHz R-divider table the tune must
// fail (tuner_e4k.c:359-370).
static void test_e4k_pll_roundtrip() {
  MockUsbOptions opts;
  opts.tuner = MockTunerModel::kE4000;
  Rig r = make_rig(opts);
  for (uint32_t freq : {52'000'000u, 101'900'000u, 162'400'000u,
                        433'920'000u, 915'000'000u, 1'090'000'000u}) {
    CHECK(r.dev->set_center_freq(freq));
    const double lo = (double)r.state->tuner_lo_hz.load();
    CHECK(std::fabs(lo - (double)freq) < 500.0);
  }
  CHECK(!r.dev->set_center_freq(1'250'000'000u));
  CHECK(r.state->repeater_violations.load() == 0);
  std::puts("e4k_pll_roundtrip OK");
}

// Gain split per librtlsdr.c:175-191: mixer takes 12 dB above 34 dB
// total (GAIN2 bit 0), else 4 dB, and the LNA register index comes
// from the tuner_e4k.c:645-659 dB map.
static void test_e4k_gain_ladder() {
  MockUsbOptions opts;
  opts.tuner = MockTunerModel::kE4000;
  Rig r = make_rig(opts);
  struct Case {
    double db;
    uint32_t lna_idx, mix_idx;
  };
  // 42.0 -> mixer 12 dB + LNA 30.0 dB (idx 14); 1.5 -> mixer 4 dB +
  // LNA -2.5 dB (idx 1); 33.5 snaps to 34.0 -> mixer 4 dB + LNA 30.0.
  for (const Case& c : {Case{42.0, 14, 1}, Case{1.5, 1, 0},
                        Case{33.5, 14, 0}, Case{-5.0, 0, 0}}) {
    CHECK(r.dev->set_tuner_gain_db(c.db));
    CHECK(r.state->tuner_manual_gain.load());
    CHECK(r.state->lna_index.load() == c.lna_idx);
    CHECK(r.state->mixer_index.load() == c.mix_idx);
  }
  CHECK(r.state->repeater_violations.load() == 0);
  std::puts("e4k_gain_ladder OK");
}

// Offset tuning (librtlsdr.c:1222-1251, E4000-only): the DDC shifts by
// 1.7x Nyquist, the LO drops below the target by the same amount, and
// disabling restores both.
static void test_e4k_offset_tuning() {
  MockUsbOptions opts;
  opts.tuner = MockTunerModel::kE4000;
  Rig r = make_rig(opts);
  CHECK(r.dev->set_sample_rate(2'400'000));
  CHECK(r.dev->set_center_freq(100'000'000));
  CHECK(r.state->if_freq_reg.load() == 0);
  CHECK(r.dev->set_offset_tuning(true));
  const uint32_t offs = (r.dev->sample_rate() / 2) * 170 / 100;
  const int32_t want_if = -(int32_t)(((uint64_t)offs << 22) / 28'800'000ull);
  CHECK(std::abs(r.state->if_freq_reg.load() - want_if) <= 1);
  const double lo = (double)r.state->tuner_lo_hz.load();
  CHECK(std::fabs(lo - (100'000'000.0 - (double)offs)) < 500.0);
  CHECK(r.dev->set_offset_tuning(false));
  CHECK(r.state->if_freq_reg.load() == 0);
  CHECK(std::fabs((double)r.state->tuner_lo_hz.load() - 100'000'000.0) <
        500.0);
  std::puts("e4k_offset_tuning OK");
}

// Offset tuning must survive a direct-sampling round trip: leaving
// direct mode re-runs tuner init (which resets the IF filters to
// narrowest), so the driver must re-apply the full offset
// configuration — DDC shift back in place, LO back below the target.
static void test_e4k_offset_tuning_survives_direct_sampling() {
  MockUsbOptions opts;
  opts.tuner = MockTunerModel::kE4000;
  Rig r = make_rig(opts);
  CHECK(r.dev->set_sample_rate(2'400'000));
  CHECK(r.dev->set_center_freq(100'000'000));
  CHECK(r.dev->set_offset_tuning(true));
  const uint32_t offs = (r.dev->sample_rate() / 2) * 170 / 100;
  const int32_t want_if = -(int32_t)(((uint64_t)offs << 22) / 28'800'000ull);
  CHECK(r.dev->set_direct_sampling(1));
  CHECK(r.dev->set_direct_sampling(0));
  CHECK(std::abs(r.state->if_freq_reg.load() - want_if) <= 1);
  const double lo = (double)r.state->tuner_lo_hz.load();
  CHECK(std::fabs(lo - (100'000'000.0 - (double)offs)) < 500.0);
  std::puts("e4k_offset_direct_roundtrip OK");
}

// The full 2-frequency capture engine must run unchanged on the
// zero-IF chip: exactly 3*n bytes, both retunes landed on the PLL.
static void test_e4k_two_freq_capture() {
  MockUsbOptions opts;
  opts.tuner = MockTunerModel::kE4000;
  Rig r = make_rig(opts);
  CaptureConfig cfg;
  cfg.freq1_hz = 162'400'000;
  cfg.freq2_hz = 101'900'000;
  cfg.gain1_db = 29.0;
  cfg.gain2_db = 9.0;
  cfg.samples_per_freq = 50'000;
  cfg.buf_len = 16'384;
  cfg.num_buffers = 4;
  std::vector<uint8_t> out;
  CaptureStats st = RunTwoFreqCapture(
      *r.dev, cfg, [&](const uint8_t* d, size_t n) {
        out.insert(out.end(), d, d + n);
        return true;
      });
  CHECK(st.completed);
  CHECK(st.retunes == 2);
  CHECK(out.size() == 3 * 2 * cfg.samples_per_freq);
  // Block middles carry the right tunings (zero-IF: tag = freq/1000).
  auto tags = [&](uint32_t freq, double gain) {
    r.dev->set_tuner_gain_db(gain);
    r.dev->set_center_freq(freq);
    uint32_t ft = r.state->tuner_lo_hz.load() / 1000u;
    uint32_t gt = r.state->lna_index.load() * 16u +
                  r.state->mixer_index.load();
    return std::make_pair(ft, gt);
  };
  auto [f1t, g1t] = tags(cfg.freq1_hz, cfg.gain1_db);
  auto [f2t, g2t] = tags(cfg.freq2_hz, cfg.gain2_db);
  const size_t bs = 2 * cfg.samples_per_freq;
  CHECK(out[bs / 2] == mock_byte(bs / 2, f1t, g1t, 1));
  CHECK(out[bs + bs / 2] == mock_byte(bs + bs / 2, f2t, g2t, 1));
  CHECK(out[2 * bs + bs / 2] == mock_byte(2 * bs + bs / 2, f1t, g1t, 1));
  std::puts("e4k_two_freq_capture OK");
}

// --- Fitipower FC0013 (zero-IF, Fitipower sigma-delta PLL) ------------
// The probe must find the FC0013 at 0xc6 (chip id 0xa3 at reg 0,
// librtlsdr.c:1511-1515) and keep the default zero-IF datapath. The
// PLL registers must decode back to the target frequency within the
// synth's own quantization (XIN LSB = xtal/2/32768 ≈ 439 Hz in the VCO
// domain, shrunk by the band divider, plus the driver's kHz rounding).
static void test_fc0013_probe_and_pll() {
  MockUsbOptions opts;
  opts.tuner = MockTunerModel::kFc0013;
  Rig r = make_rig(opts);
  CHECK(r.state->baseband_on.load());
  CHECK(r.state->if_freq_reg.load() == 0);  // zero-IF
  CHECK(std::strcmp(r.dev->tuner_name(), "Fitipower FC0013") == 0);
  // One frequency per divider rung: multi 96 / 64 / 24 / 16 / 8 / 4
  // / 2. 45 MHz exercises the multi-64 band whose VCO divider bit
  // (reg 0x11 bit 2) must be set before calibration
  // (tuner_fc0013.c:375-383); the mock counts a divider violation if
  // the calibration pulse fires with the bit wrong in EITHER
  // direction, so the later rungs also prove the bit gets cleared.
  for (uint32_t freq : {28'000'000u, 45'000'000u, 120'000'000u,
                        162'400'000u, 433'920'000u, 860'000'000u,
                        1'575'420'000u}) {
    CHECK(r.dev->set_center_freq(freq));
    const double lo = (double)r.state->tuner_lo_hz.load();
    CHECK(std::fabs(lo - (double)freq) < 2000.0);
  }
  // Above the synth's reach no AM/PM split exists
  // (tuner_fc0013.c:335-340) — the tune must fail, not lie.
  CHECK(!r.dev->set_center_freq(1'900'000'000u));
  CHECK(r.state->repeater_violations.load() == 0);
  CHECK(r.state->vco_divider_violations.load() == 0);
  // The 300 MHz boundary: the track chain and the RF-path switch must
  // agree — at exactly 300 MHz both take the UHF side, so the track
  // code is the UHF/GPS default 0x1c (fc0013_set_vhf_track uses
  // freq < 300 MHz for the VHF chain), not the top VHF rung 0x04.
  CHECK(r.dev->set_center_freq(300'000'000u));
  CHECK(r.state->fc_track_code.load() == 0x1c);
  CHECK(r.dev->set_center_freq(250'000'000u));  // VHF top rung
  CHECK(r.state->fc_track_code.load() == 0x04);
  std::puts("fc0013_probe_pll OK");
}

// LNA ladder programming (tuner_fc0013.c:449-500): manual-mode bit on
// reg 0x0d, and the first table entry at or above the snapped gain.
static void test_fc0013_lna_gain() {
  MockUsbOptions opts;
  opts.tuner = MockTunerModel::kFc0013;
  Rig r = make_rig(opts);
  struct Case {
    double db;
    uint32_t code;
  };
  // 19.7 dB is the ladder top (code 0x10); 7.1 dB mid (0x08);
  // -6.3 dB low (0x04); 30 dB snaps down to 19.7.
  for (const Case& c : {Case{19.7, 0x10}, Case{7.1, 0x08},
                        Case{-6.3, 0x04}, Case{30.0, 0x10}}) {
    CHECK(r.dev->set_tuner_gain_db(c.db));
    CHECK(r.state->tuner_manual_gain.load());
    CHECK(r.state->lna_index.load() == c.code);
  }
  CHECK(r.state->repeater_violations.load() == 0);
  std::puts("fc0013_lna_gain OK");
}

// --- Fitipower FC0012 --------------------------------------------------
// Probed LAST (librtlsdr.c:1546-1551) — the FC0013 check at the same
// I2C address must miss first (different chip id). GPIO6 must be
// configured as an output and steer the VHF/UHF antenna switch at
// 300 MHz (librtlsdr.c:203-206).
static void test_fc0012_probe_pll_and_gpio6() {
  MockUsbOptions opts;
  opts.tuner = MockTunerModel::kFc0012;
  Rig r = make_rig(opts);
  CHECK(r.state->if_freq_reg.load() == 0);
  CHECK(std::strcmp(r.dev->tuner_name(), "Fitipower FC0012") == 0);
  CHECK((r.state->gpio_oe.load() & (1u << 6)) != 0);
  CHECK(r.dev->set_center_freq(162'400'000));
  CHECK((r.state->gpio_out.load() & (1u << 6)) == 0);  // VHF side
  CHECK(std::fabs((double)r.state->tuner_lo_hz.load() - 162'400'000.0) <
        2000.0);
  CHECK(r.dev->set_center_freq(433'920'000));
  CHECK((r.state->gpio_out.load() & (1u << 6)) != 0);  // UHF side
  CHECK(std::fabs((double)r.state->tuner_lo_hz.load() - 433'920'000.0) <
        2000.0);
  // The FC0012 ladder ends at multi 4 (tuner_fc0012.c:190-196): the
  // GPS band the FC0013 reaches is out of range here.
  CHECK(!r.dev->set_center_freq(1'575'420'000u));
  // Gain codes on reg 0x13 (tuner_fc0012.c:314-345).
  CHECK(r.dev->set_tuner_gain_db(19.2));
  CHECK(r.state->lna_index.load() == 0x10);
  CHECK(r.dev->set_tuner_gain_db(-4.0));
  CHECK(r.state->lna_index.load() == 0x00);
  CHECK(r.dev->set_tuner_gain_db(7.1));
  CHECK(r.state->lna_index.load() == 0x08);
  CHECK(r.state->repeater_violations.load() == 0);
  std::puts("fc0012_probe_pll_gpio6 OK");
}

// --- FCI FC2580 ---------------------------------------------------------
// Found only after the GPIO5 tuner-reset pulse (librtlsdr.c:1532-1543,
// chip id masked 0x7f). Runs off its OWN 16.384 MHz crystal; the
// 20-bit fractional-N synth must round-trip in all three bands within
// its quantization (2*f_comp/2^20 ≈ 31 Hz) plus the driver's kHz
// rounding.
static void test_fc2580_probe_and_pll() {
  MockUsbOptions opts;
  opts.tuner = MockTunerModel::kFc2580;
  Rig r = make_rig(opts);
  CHECK(r.state->if_freq_reg.load() == 0);
  CHECK(std::strcmp(r.dev->tuner_name(), "FCI FC2580") == 0);
  CHECK((r.state->gpio_oe.load() & (1u << 5)) != 0);  // reset pin driven
  CHECK((r.state->gpio_out.load() & (1u << 5)) == 0);  // and released
  for (uint32_t freq : {162'400'000u,    // VHF (x12)
                        500'000'000u,    // UHF (x4)
                        1'575'420'000u}) {  // L-band (x2)
    CHECK(r.dev->set_center_freq(freq));
    const double lo = (double)r.state->tuner_lo_hz.load();
    CHECK(std::fabs(lo - (double)freq) < 1500.0);
  }
  // No gain control exists on this chip (librtlsdr.c:226,969): the
  // call must succeed as a no-op rather than fail the capture setup.
  CHECK(r.dev->set_tuner_gain_db(30.0));
  CHECK(r.state->repeater_violations.load() == 0);
  std::puts("fc2580_probe_pll OK");
}

// The 2-frequency capture engine must run unchanged on a Fitipower
// chip: exactly 3*n bytes, in order, with both retunes landed.
static void test_fc0013_two_freq_capture() {
  MockUsbOptions opts;
  opts.tuner = MockTunerModel::kFc0013;
  Rig r = make_rig(opts);
  CaptureConfig cfg;
  cfg.freq1_hz = 162'400'000;
  cfg.freq2_hz = 101'900'000;
  cfg.gain1_db = 19.7;
  cfg.gain2_db = 7.1;
  cfg.samples_per_freq = 50'000;
  cfg.buf_len = 16'384;
  cfg.num_buffers = 4;
  std::vector<uint8_t> out;
  CaptureStats st = RunTwoFreqCapture(
      *r.dev, cfg, [&](const uint8_t* d, size_t n) {
        out.insert(out.end(), d, d + n);
        return true;
      });
  CHECK(st.completed);
  CHECK(st.retunes == 2);
  CHECK(out.size() == 3 * 2 * cfg.samples_per_freq);
  auto tags = [&](uint32_t freq, double gain) {
    r.dev->set_tuner_gain_db(gain);
    r.dev->set_center_freq(freq);
    uint32_t ft = r.state->tuner_lo_hz.load() / 1000u;
    uint32_t gt = r.state->lna_index.load() * 16u +
                  r.state->mixer_index.load();
    return std::make_pair(ft, gt);
  };
  auto [f1t, g1t] = tags(cfg.freq1_hz, cfg.gain1_db);
  auto [f2t, g2t] = tags(cfg.freq2_hz, cfg.gain2_db);
  const size_t bs = 2 * cfg.samples_per_freq;
  CHECK(out[bs / 2] == mock_byte(bs / 2, f1t, g1t, 1));
  CHECK(out[bs + bs / 2] == mock_byte(bs + bs / 2, f2t, g2t, 1));
  CHECK(out[2 * bs + bs / 2] == mock_byte(2 * bs + bs / 2, f1t, g1t, 1));
  std::puts("fc0013_two_freq_capture OK");
}

// The libusb factory must never crash: with no dongle (CI) it returns
// nullptr cleanly; on a station with real hardware attached it may
// legitimately open the device — don't assert either way, and don't
// perturb a stick an operator may be using.
static void test_libusb_factory_graceful() {
  if (std::getenv("SDRCAP_SKIP_LIBUSB_PROBE")) {
    std::puts("libusb_factory SKIPPED");
    return;
  }
  auto dev = MakeUsbDeviceByIndex(0);
  if (dev) {
    std::puts("libusb_factory OK (real dongle present)");
    return;
  }
  std::puts("libusb_factory OK");
}

int main() {
  test_open_initializes_baseband_and_tuner();
  test_tuner_pll_roundtrip();
  test_tuner_gain_programming();
  test_demod_rate_and_if();
  test_agc_toggle();
  test_async_capture_ordered_lossfree();
  test_capture_restartable();
  test_direct_sampling();
  test_sync_capture();
  test_device_lost_mid_stream();
  test_sink_abort_cancels();
  test_eeprom_roundtrip();
  test_e4k_probe_and_zero_if();
  test_e4k_pll_roundtrip();
  test_e4k_gain_ladder();
  test_e4k_offset_tuning();
  test_e4k_offset_tuning_survives_direct_sampling();
  test_e4k_two_freq_capture();
  test_fc0013_probe_and_pll();
  test_fc0013_lna_gain();
  test_fc0012_probe_pll_and_gpio6();
  test_fc2580_probe_and_pll();
  test_fc0013_two_freq_capture();
  test_libusb_factory_graceful();
  std::puts("ALL USB TESTS PASSED");
  return 0;
}
