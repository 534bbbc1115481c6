// RTL2832U protocol driver: implements Device on a UsbTransport.
//
// Behavior contracts from the reference's librtlsdr fork (cited per
// function below): register blocks + vendor-control encoding
// (librtlsdr.c:399-434), demod page registers (librtlsdr.c:515-556),
// baseband bring-up (librtlsdr.c:585-674), IF/DDC and resampler math
// (librtlsdr.c:686-714, 1062-1126), tuner probe + R82xx-specific demod
// config (librtlsdr.c:1407-1580), graceful async cancel and
// device-lost tracking (librtlsdr.c:1655-1914). Tuner programming is
// capability-level for all five reference chips: R82xx
// (tuner_r82xx.c — the R820T/R828D the project deploys, README.md:37),
// the Elonics E4000 (tuner_e4k.c — zero-IF, offset tuning,
// librtlsdr.c:1222), the Fitipower FC0012/FC0013 (tuner_fc0012.c /
// tuner_fc0013.c — shared sigma-delta PLL, GPIO6 antenna switch), and
// the FCI FC2580 (tuner_fc2580.c — own crystal, banded fractional-N
// synth, no gain control).
//
// Provenance: the engine/transport/class architecture (Device backend
// seam, TunerChip abstraction, shadow register state,
// OrderedTransferQueue) is an original C++ design. The tuner DRIVERS
// are hardware-dictated derivations: their register init tables, band
// tables, and gain ladders are the chips' silicon calibration
// constants (identical to tuner_r82xx.c:41-223, tuner_e4k.c:151-370,
// tuner_fc*.c — the only way to program the parts), and the
// programming SEQUENCES (PLL/synth math, VCO calibration, band
// switching) follow the reference drivers' register-write order
// because fixed silicon admits exactly one correct sequence. Each such
// function cites its reference source.
#include "sdrcap/usb.h"

#include <algorithm>
#include <atomic>
#include <cmath>
#include <chrono>
#include <cstdio>
#include <cstring>
#include <memory>
#include <mutex>
#include <thread>
#include <vector>

#include "sdrcap/ring.h"

namespace sdrcap {
namespace {

// --- RTL2832U register map (librtlsdr.c:372-407) ---------------------
enum Block : uint8_t {
  kDemod = 0,
  kUsb = 1,
  kSys = 2,
  kTun = 3,
  kRom = 4,
  kIr = 5,
  kIic = 6,
};

constexpr uint16_t kUsbSysctl = 0x2000;
constexpr uint16_t kUsbEpaCtl = 0x2148;
constexpr uint16_t kUsbEpaMaxpkt = 0x2158;
constexpr uint16_t kSysDemodCtl = 0x3000;
constexpr uint16_t kSysDemodCtl1 = 0x300b;

constexpr uint32_t kRtlXtalHz = 28'800'000;  // DEF_RTL_XTAL_FREQ
constexpr uint32_t kR828dXtalHz = 16'000'000;
constexpr uint32_t kR82xxIfHz = 3'570'000;  // R82XX_IF_FREQ
constexpr uint8_t kR820tI2cAddr = 0x34;
constexpr uint8_t kR828dI2cAddr = 0x74;
constexpr uint16_t kEepromAddr = 0xa0;  // EEPROM_ADDR, librtlsdr.c:370
constexpr uint8_t kR82xxCheckVal = 0x69;  // chip id at reg 0

// Default DVB-T FIR (librtlsdr.c:76-94): 8 x int8 + 8 x int12.
constexpr int kFirDefault[16] = {
    -54, -36, -41, -40, -32, -14, 14,  53,
    101, 156, 215, 273, 327, 372, 404, 421,
};

// --- low-level register access (librtlsdr.c:409-556) -----------------

class RegIo {
 public:
  explicit RegIo(UsbTransport* t) : t_(t) {}

  int read_array(uint8_t block, uint16_t addr, uint8_t* data, uint16_t len) {
    return t_->control_transfer(true, addr, (uint16_t)(block << 8), data,
                                len);
  }
  int write_array(uint8_t block, uint16_t addr, const uint8_t* data,
                  uint16_t len) {
    return t_->control_transfer(false, addr, (uint16_t)((block << 8) | 0x10),
                                const_cast<uint8_t*>(data), len);
  }

  uint16_t read_reg(uint8_t block, uint16_t addr, uint8_t len) {
    uint8_t data[2] = {0, 0};
    read_array(block, addr, data, len);
    return (uint16_t)((data[1] << 8) | data[0]);
  }
  int write_reg(uint8_t block, uint16_t addr, uint16_t val, uint8_t len) {
    uint8_t data[2];
    if (len == 1) data[0] = val & 0xff;
    else data[0] = val >> 8;
    data[1] = val & 0xff;
    return write_array(block, addr, data, len);
  }

  // Demod page registers ride a distinct addressing scheme:
  // wValue = (addr << 8) | 0x20, wIndex = page (| 0x10 for writes), and
  // every write is followed by a dummy status read — the chip-required
  // settling access (librtlsdr.c:515-556).
  uint16_t demod_read(uint8_t page, uint16_t addr, uint8_t len) {
    uint8_t data[2] = {0, 0};
    t_->control_transfer(true, (uint16_t)((addr << 8) | 0x20), page, data,
                         len);
    return (uint16_t)((data[1] << 8) | data[0]);
  }
  int demod_write(uint8_t page, uint16_t addr, uint16_t val, uint8_t len) {
    uint8_t data[2];
    if (len == 1) data[0] = val & 0xff;
    else data[0] = val >> 8;
    data[1] = val & 0xff;
    int r = t_->control_transfer(false, (uint16_t)((addr << 8) | 0x20),
                                 (uint16_t)(0x10 | page), data, len);
    demod_read(0x0a, 0x01, 1);
    return (r == len) ? 0 : -1;
  }

  // I2C rides the IIC block with the 7-bit address in wValue
  // (librtlsdr.c:435-473).
  int i2c_write(uint8_t i2c_addr, const uint8_t* buf, int len) {
    return write_array(kIic, i2c_addr, buf, (uint16_t)len);
  }
  int i2c_read(uint8_t i2c_addr, uint8_t* buf, int len) {
    return read_array(kIic, i2c_addr, buf, (uint16_t)len);
  }
  uint8_t i2c_read_reg(uint8_t i2c_addr, uint8_t reg) {
    uint8_t data = 0;
    write_array(kIic, i2c_addr, &reg, 1);
    read_array(kIic, i2c_addr, &data, 1);
    return data;
  }

  // I2C repeater gates tuner access through the demod
  // (librtlsdr.c:579-582); a scope guard keeps the discipline that the
  // reference maintains by hand at every call site.
  void set_repeater(bool on) { demod_write(1, 0x01, on ? 0x18 : 0x10, 1); }

 private:
  UsbTransport* t_;
};

class RepeaterScope {
 public:
  explicit RepeaterScope(RegIo& io) : io_(io) { io_.set_repeater(true); }
  ~RepeaterScope() { io_.set_repeater(false); }

 private:
  RegIo& io_;
};

// RTL2832U GPIO pins (SYS block GPO/GPOE/GPD, librtlsdr.c:558-578):
// the FC2580 probe pulses GPIO5 as a tuner reset, the FC0012 driver
// steers a VHF/UHF antenna switch on GPIO6.
constexpr uint16_t kSysGpo = 0x3001;
constexpr uint16_t kSysGpoe = 0x3003;
constexpr uint16_t kSysGpd = 0x3004;

void SetGpioBit(RegIo& io, uint8_t pin, bool val) {
  const uint8_t mask = (uint8_t)(1u << pin);
  uint16_t r = io.read_reg(kSys, kSysGpo, 1);
  r = val ? (uint16_t)(r | mask) : (uint16_t)(r & ~mask);
  io.write_reg(kSys, kSysGpo, r, 1);
}

void SetGpioOutput(RegIo& io, uint8_t pin) {
  const uint8_t mask = (uint8_t)(1u << pin);
  uint16_t r = io.read_reg(kSys, kSysGpd, 1);
  io.write_reg(kSys, kSysGpo, (uint16_t)(r & ~mask), 1);
  r = io.read_reg(kSys, kSysGpoe, 1);
  io.write_reg(kSys, kSysGpoe, (uint16_t)(r | mask), 1);
}

// --- tuner abstraction ------------------------------------------------
// The reference dispatches tuner ops through a function table
// (librtlsdr.c:269-312). Here each chip implements TunerChip; the
// device driver consults if_freq_hz() to pick the demod datapath
// (low-IF single-ADC for R82xx, zero-IF dual-ADC for E4000 —
// librtlsdr.c:1556-1580 vs the init_baseband defaults).

class TunerChip {
 public:
  virtual ~TunerChip() = default;
  virtual const char* name() const = 0;
  virtual bool init() = 0;
  virtual bool set_freq(uint32_t freq_hz) = 0;
  virtual bool set_gain_manual(int tenth_db) = 0;
  virtual bool standby() = 0;
  virtual void set_xtal(uint32_t hz) = 0;
  // 0 means zero-IF (tuner LO sits on the target frequency).
  virtual uint32_t if_freq_hz() const = 0;
  // Snap to the chip's discrete gain ladder (convenience.c:112-137).
  virtual double nearest_gain_db(double requested_db) const = 0;
  // E4000-only (librtlsdr.c:1222-1232 returns -2 on R82xx).
  virtual bool supports_offset_tuning() const { return false; }
  // Offset tuning re-centers the IF filters (librtlsdr.c:1240-1245).
  virtual bool set_bandwidth(uint32_t bw_hz) {
    (void)bw_hz;
    return true;
  }
};

// --- R82xx tuner (tuner_r82xx.c, capability level) -------------------

// Chip register init values (tuner_r82xx.c:41-49) and per-band RF mux
// settings (tuner_r82xx.c:52-223) — hardware calibration constants, the
// only way to program the silicon.
constexpr uint8_t kR82xxInit[27] = {
    0x83, 0x32, 0x75, 0xc0, 0x40, 0xd6, 0x6c, 0xf5, 0x63, 0x75,
    0x68, 0x6c, 0x83, 0x80, 0x00, 0x0f, 0x00, 0xc0, 0x30, 0x48,
    0xcc, 0x60, 0x00, 0x54, 0xae, 0x4a, 0xc0};
static_assert(sizeof(kR82xxInit) == 0x1f - 0x05 + 1, "regs 0x05..0x1f");

struct FreqRange {
  uint32_t mhz;
  uint8_t open_d, rf_mux_ploy, tf_c;
};
constexpr FreqRange kRanges[] = {
    {0, 0x08, 0x02, 0xdf},   {50, 0x08, 0x02, 0xbe},
    {55, 0x08, 0x02, 0x8b},  {60, 0x08, 0x02, 0x7b},
    {65, 0x08, 0x02, 0x69},  {70, 0x08, 0x02, 0x58},
    {75, 0x00, 0x02, 0x44},  {90, 0x00, 0x02, 0x34},
    {110, 0x00, 0x02, 0x24}, {140, 0x00, 0x02, 0x14},
    {180, 0x00, 0x02, 0x13}, {250, 0x00, 0x02, 0x11},
    {280, 0x00, 0x02, 0x00}, {310, 0x00, 0x41, 0x00},
    {450, 0x00, 0x41, 0x00}, {588, 0x00, 0x40, 0x00},
    {650, 0x00, 0x40, 0x00}};

// Measured per-step gains in tenths of dB (tuner_r82xx.c:995-1005).
constexpr int kLnaSteps[16] = {0, 9,  13, 40, 38, 13, 31, 22,
                               26, 31, 26, 14, 19, 5,  35, 13};
constexpr int kMixerSteps[16] = {0,  5,  10, 10, 19, 9, 10, 25,
                                 17, 10, 8,  16, 13, 6, 3,  -8};

class R82xxTuner final : public TunerChip {
 public:
  R82xxTuner(RegIo& io, uint8_t i2c_addr, uint32_t xtal_hz, bool is_828d)
      : io_(io), i2c_addr_(i2c_addr), xtal_hz_(xtal_hz), is_828d_(is_828d) {}

  const char* name() const override {
    return is_828d_ ? "Rafael Micro R828D" : "Rafael Micro R820T";
  }

  uint32_t if_freq_hz() const override { return kR82xxIfHz; }
  void set_xtal(uint32_t hz) override { xtal_hz_ = hz; }
  double nearest_gain_db(double requested_db) const override {
    return NearestGainDb(requested_db);  // R820T ladder
  }

  // tuner_r82xx.c:1221-1243: register init + digital-TV standard
  // (filter calibration) + system frequency selection.
  bool init() override {
    std::memcpy(shadow_, kR82xxInit, sizeof(kR82xxInit));
    if (write(0x05, kR82xxInit, sizeof(kR82xxInit)) < 0) return false;
    if (!set_tv_standard()) return false;
    return sysfreq_sel();
  }

  // tuner_r82xx.c:1076-1110: LO = RF + IF, band mux, then PLL.
  bool set_freq(uint32_t freq_hz) override {
    uint32_t lo = freq_hz + kR82xxIfHz;
    if (!set_mux(lo) || !set_pll(lo)) return false;
    if (is_828d_) {
      // Air-In below 345 MHz, Cable1 above (tuner_r82xx.c:1090-1102).
      uint8_t in = (freq_hz > 345'000'000) ? 0x00 : 0x60;
      if (in != input_) {
        input_ = in;
        if (write_mask(0x05, in, 0x60) < 0) return false;
      }
    }
    return has_lock_;
  }

  // tuner_r82xx.c:1007-1074: manual gain splits across LNA and mixer
  // steps; VGA pinned at a fixed index.
  bool set_gain_manual(int tenth_db) override {
    if (write_mask(0x05, 0x10, 0x10) < 0) return false;  // LNA auto off
    if (write_mask(0x07, 0x00, 0x10) < 0) return false;  // mixer auto off
    if (write_mask(0x0c, 0x08, 0x9f) < 0) return false;  // VGA 16.3 dB
    int total = 0;
    uint8_t lna = 0, mix = 0;
    for (int i = 0; i < 15; ++i) {
      if (total >= tenth_db) break;
      total += kLnaSteps[++lna];
      if (total >= tenth_db) break;
      total += kMixerSteps[++mix];
    }
    if (write_mask(0x05, lna, 0x0f) < 0) return false;
    return write_mask(0x07, mix, 0x0f) >= 0;
  }
  bool set_gain_auto() {
    if (write_mask(0x05, 0x00, 0x10) < 0) return false;
    if (write_mask(0x07, 0x10, 0x10) < 0) return false;
    return write_mask(0x0c, 0x0b, 0x9f) >= 0;  // VGA 26.5 dB
  }

  // tuner_r82xx.c:1112-1153.
  bool standby() override {
    static constexpr uint8_t kRegs[][2] = {
        {0x06, 0xb1}, {0x05, 0x03}, {0x07, 0x3a}, {0x08, 0x40},
        {0x09, 0xc0}, {0x0a, 0x36}, {0x0c, 0x35}, {0x0f, 0x68},
        {0x11, 0x03}, {0x17, 0xf4}, {0x19, 0x0c}};
    for (auto& rv : kRegs)
      if (write_reg(rv[0], rv[1]) < 0) return false;
    return true;
  }

 private:
  static constexpr int kShadowBase = 0x05;
  static constexpr int kMaxI2cMsg = 8;

  // Shadow-register write with I2C chunking (tuner_r82xx.c:252-287).
  int write(uint8_t reg, const uint8_t* val, int len) {
    int r = reg - kShadowBase;
    if (r >= 0) {
      int n = std::min<int>(len, (int)sizeof(shadow_) - r);
      if (n > 0) std::memcpy(shadow_ + r, val, n);
    }
    int pos = 0;
    while (len > 0) {
      int size = std::min(len, kMaxI2cMsg - 1);
      uint8_t buf[kMaxI2cMsg];
      buf[0] = reg;
      std::memcpy(buf + 1, val + pos, size);
      if (io_.i2c_write(i2c_addr_, buf, size + 1) != size + 1) return -1;
      reg = (uint8_t)(reg + size);
      len -= size;
      pos += size;
    }
    return 0;
  }
  int write_reg(uint8_t reg, uint8_t val) { return write(reg, &val, 1); }
  int write_mask(uint8_t reg, uint8_t val, uint8_t mask) {
    int r = reg - kShadowBase;
    if (r < 0 || r >= (int)sizeof(shadow_)) return -1;
    uint8_t merged = (uint8_t)((shadow_[r] & ~mask) | (val & mask));
    return write(reg, &merged, 1);
  }

  // Chip returns registers bit-reversed on I2C reads
  // (tuner_r82xx.c:317-343).
  static uint8_t bitrev(uint8_t b) {
    b = (uint8_t)(((b & 0xf0) >> 4) | ((b & 0x0f) << 4));
    b = (uint8_t)(((b & 0xcc) >> 2) | ((b & 0x33) << 2));
    return (uint8_t)(((b & 0xaa) >> 1) | ((b & 0x55) << 1));
  }
  int read(uint8_t reg, uint8_t* out, int len) {
    if (io_.i2c_write(i2c_addr_, &reg, 1) < 1) return -1;
    if (io_.i2c_read(i2c_addr_, out, len) != len) return -1;
    for (int i = 0; i < len; ++i) out[i] = bitrev(out[i]);
    return 0;
  }

  // tuner_r82xx.c:357-415: band-dependent RF mux / tracking filter.
  bool set_mux(uint32_t lo_hz) {
    uint32_t mhz = lo_hz / 1'000'000;
    const FreqRange* range = &kRanges[0];
    for (const auto& fr : kRanges)
      if (mhz >= fr.mhz) range = &fr;
    if (write_mask(0x17, range->open_d, 0x08) < 0) return false;
    if (write_mask(0x1a, range->rf_mux_ploy, 0xc3) < 0) return false;
    if (write_reg(0x1b, range->tf_c) < 0) return false;
    // XTAL_HIGH_CAP_0P (the init default, tuner_r82xx.c:1224).
    if (write_mask(0x10, 0x00, 0x0b) < 0) return false;
    if (write_mask(0x08, 0x00, 0x3f) < 0) return false;
    return write_mask(0x09, 0x00, 0x3f) >= 0;
  }

  // tuner_r82xx.c:417-560: integer-N + sigma-delta fractional PLL.
  bool set_pll(uint32_t freq_hz) {
    const uint32_t vco_min_khz = 1'770'000;
    const uint32_t vco_max_khz = 2 * vco_min_khz;
    uint32_t freq_khz = (freq_hz + 500) / 1000;
    uint32_t pll_ref = xtal_hz_;
    uint32_t pll_ref_khz = (xtal_hz_ + 500) / 1000;

    if (write_mask(0x10, 0x00, 0x10) < 0) return false;  // refdiv2 off
    if (write_mask(0x1a, 0x00, 0x0c) < 0) return false;  // autotune 128k
    if (write_mask(0x12, 0x80, 0xe0) < 0) return false;  // VCO current

    uint8_t mix_div = 2, div_num = 0;
    while (mix_div <= 64) {
      if (freq_khz * mix_div >= vco_min_khz &&
          freq_khz * mix_div < vco_max_khz) {
        uint8_t db = mix_div;
        while (db > 2) {
          db >>= 1;
          ++div_num;
        }
        break;
      }
      mix_div <<= 1;
    }
    if (mix_div > 64) return false;

    uint8_t data[5];
    if (read(0x00, data, sizeof(data)) < 0) return false;
    uint8_t vco_power_ref = is_828d_ ? 1 : 2;
    uint8_t fine = (data[4] & 0x30) >> 4;
    if (fine > vco_power_ref) div_num = (uint8_t)(div_num - 1);
    else if (fine < vco_power_ref) div_num = (uint8_t)(div_num + 1);
    if (write_mask(0x10, (uint8_t)(div_num << 5), 0xe0) < 0) return false;

    uint64_t vco = (uint64_t)freq_hz * mix_div;
    uint8_t nint = (uint8_t)(vco / (2ull * pll_ref));
    uint32_t vco_fra = (uint32_t)((vco - 2ull * pll_ref * nint) / 1000);
    if (nint > 128 / vco_power_ref - 1) return false;
    uint8_t ni = (uint8_t)((nint - 13) / 4);
    uint8_t si = (uint8_t)(nint - 4 * ni - 13);
    if (write_reg(0x14, (uint8_t)(ni + (si << 6))) < 0) return false;
    if (write_mask(0x12, vco_fra ? 0x00 : 0x08, 0x08) < 0) return false;

    // Sigma-delta modulator value (tuner_r82xx.c:508-521).
    uint16_t sdm = 0, n_sdm = 2;
    while (vco_fra > 1) {
      if (vco_fra > 2 * pll_ref_khz / n_sdm) {
        sdm = (uint16_t)(sdm + 32768 / (n_sdm / 2));
        vco_fra -= 2 * pll_ref_khz / n_sdm;
        if (n_sdm >= 0x8000) break;
      }
      n_sdm <<= 1;
    }
    if (write_reg(0x16, (uint8_t)(sdm >> 8)) < 0) return false;
    if (write_reg(0x15, (uint8_t)(sdm & 0xff)) < 0) return false;

    has_lock_ = false;
    for (int i = 0; i < 2; ++i) {
      if (read(0x00, data, 3) < 0) return false;
      if (data[2] & 0x40) {
        has_lock_ = true;
        break;
      }
      // Didn't lock: raise VCO current (tuner_r82xx.c:540-545).
      if (i == 0 && write_mask(0x12, 0x60, 0xe0) < 0) return false;
    }
    if (!has_lock_) return false;
    return write_mask(0x1a, 0x08, 0x08) >= 0;  // autotune 8 kHz
  }

  // Condensed r82xx_set_tv_standard (tuner_r82xx.c:761-975) for the
  // one standard rtlsdr uses (digital TV, bw<=6: IF 3.57 MHz): filter
  // calibration at 56 MHz, then the fixed register program.
  bool set_tv_standard() {
    const uint8_t hp_cor = 0x6b, filt_q = 0x10;
    if (write_mask(0x0c, 0x00, 0x0f) < 0) return false;
    if (write_mask(0x13, 49, 0x3f) < 0) return false;  // VER_NUM
    if (write_mask(0x1d, 0x00, 0x38) < 0) return false;

    uint8_t fil_cal = 0;
    for (int i = 0; i < 2; ++i) {
      if (write_mask(0x0b, hp_cor, 0x60) < 0) return false;
      if (write_mask(0x0f, 0x04, 0x04) < 0) return false;  // cali clk on
      if (write_mask(0x10, 0x00, 0x03) < 0) return false;
      if (!set_pll(56'000'000)) return false;  // filt_cal_lo
      if (write_mask(0x0b, 0x10, 0x10) < 0) return false;  // trigger
      if (write_mask(0x0b, 0x00, 0x10) < 0) return false;
      if (write_mask(0x0f, 0x00, 0x04) < 0) return false;  // cali clk off
      uint8_t data[5];
      if (read(0x00, data, sizeof(data)) < 0) return false;
      fil_cal = data[4] & 0x0f;
      if (fil_cal && fil_cal != 0x0f) break;
    }
    if (fil_cal == 0x0f) fil_cal = 0;

    if (write_mask(0x0a, (uint8_t)(filt_q | fil_cal), 0x1f) < 0)
      return false;
    if (write_mask(0x0b, hp_cor, 0xef) < 0) return false;
    if (write_mask(0x07, 0x00, 0x80) < 0) return false;  // img_r
    if (write_mask(0x06, 0x10, 0x30) < 0) return false;  // filt_gain
    if (write_mask(0x1e, 0x60, 0x60) < 0) return false;  // ext enable
    if (write_mask(0x05, 0x00, 0x80) < 0) return false;  // loop through
    if (write_mask(0x1f, 0x00, 0x80) < 0) return false;  // lt att
    if (write_mask(0x0f, 0x00, 0x80) < 0) return false;  // flt_ext_widest
    return write_mask(0x19, 0x60, 0x60) >= 0;  // polyfil min
  }

  // Condensed r82xx_sysfreq_sel (tuner_r82xx.c:562-758), generic DVB-T
  // values (mixer_top 0x24, lna_top 0xe5, cp_cur auto).
  bool sysfreq_sel() {
    if (write_reg(0x0d, 0x53) < 0) return false;  // lna vth/vtl
    if (write_reg(0x0e, 0x75) < 0) return false;  // mixer vth/vtl
    input_ = 0x00;
    if (write_mask(0x05, input_, 0x60) < 0) return false;
    if (write_mask(0x06, 0x00, 0x08) < 0) return false;
    if (write_mask(0x11, 0x38, 0x38) < 0) return false;  // cp_cur auto
    if (write_mask(0x17, 0x30, 0x30) < 0) return false;
    if (write_mask(0x0a, 0x40, 0x60) < 0) return false;  // filter_cur
    // Digital-TV LNA sequence (tuner_r82xx.c:677-723).
    if (write_mask(0x1d, 0x00, 0x38) < 0) return false;
    if (write_mask(0x1c, 0x00, 0x04) < 0) return false;
    if (write_mask(0x06, 0x00, 0x40) < 0) return false;  // PRE_DECT off
    if (write_mask(0x1a, 0x30, 0x30) < 0) return false;  // agc clk 250hz
    if (write_mask(0x1d, 0x18, 0x38) < 0) return false;  // LNA TOP 3
    if (write_mask(0x1c, 0x24, 0x04) < 0) return false;
    if (write_mask(0x1e, 14, 0x1f) < 0) return false;  // lna discharge
    return write_mask(0x1a, 0x20, 0x30) >= 0;  // agc clk 60hz
  }

  RegIo& io_;
  uint8_t i2c_addr_;
  uint32_t xtal_hz_;
  bool is_828d_;
  bool has_lock_ = false;
  uint8_t input_ = 0x00;
  uint8_t shadow_[27] = {};  // regs 0x05..0x1f
};

// --- E4000 tuner (tuner_e4k.c, capability level) ----------------------
// Zero-IF chip: the LO sits directly on the target frequency
// (librtlsdr.c:1556-1580 leaves the init_baseband zero-IF datapath in
// place for it). Programmed: PLL (R-divider band table + integer-Z +
// 16-bit fractional-X synth, tuner_e4k.c:359-370, 481-560), band/bias
// + RF tracking filter (tuner_e4k.c:448-472, 151-221), LNA/mixer
// manual gain (tuner_e4k.c:645-770, librtlsdr.c:175-191), IF filter
// bandwidths (tuner_e4k.c:230-303), standby (tuner_e4k.c:895-901).

constexpr uint8_t kE4kI2cAddr = 0xc8;   // E4K_I2C_ADDR
constexpr uint8_t kE4kCheckReg = 0x02;  // E4K_CHECK_ADDR
constexpr uint8_t kE4kCheckVal = 0x40;  // E4K_CHECK_VAL

// PLL R-divider selection: below each frequency, the SYNTH7 register
// value and the total VCO multiplier (tuner_e4k.c:359-370; bit 3 of
// SYNTH7 = 3-phase mixing below 350 MHz).
struct E4kPllVar {
  uint32_t below_hz;
  uint8_t reg_synth7;
  uint8_t mult;
};
constexpr E4kPllVar kE4kPllVars[] = {
    {72'400'000, (1 << 3) | 7, 48}, {81'200'000, (1 << 3) | 6, 40},
    {108'300'000, (1 << 3) | 5, 32}, {162'500'000, (1 << 3) | 4, 24},
    {216'600'000, (1 << 3) | 3, 16}, {325'000'000, (1 << 3) | 2, 12},
    {350'000'000, (1 << 3) | 1, 8},  {432'000'000, 3, 8},
    {667'000'000, 2, 6},             {1'200'000'000, 1, 4}};

// Manual gain ladder in tenths of dB (librtlsdr.c:963-964) and the
// LNA dB -> register-index map (tuner_e4k.c:645-659).
constexpr int kE4kGainsTenthDb[] = {-10, 15,  40,  65,  90,  115, 140,
                                    165, 190, 215, 240, 290, 340, 420};
struct E4kLnaStep {
  int tenth_db;
  uint8_t index;
};
constexpr E4kLnaStep kE4kLnaSteps[] = {
    {-50, 0}, {-25, 1}, {0, 4},    {25, 5},   {50, 6},   {75, 7},
    {100, 8}, {125, 9}, {150, 10}, {175, 11}, {200, 12}, {250, 13},
    {300, 14}};

// RF tracking-filter band centers (tuner_e4k.c:151-164).
constexpr uint32_t kE4kUhfFiltMhz[] = {360, 380, 405, 425, 450, 475,
                                       505, 540, 575, 615, 670, 720,
                                       760, 840, 890, 970};
constexpr uint32_t kE4kLFiltMhz[] = {1300, 1320, 1360, 1410, 1445, 1460,
                                     1490, 1530, 1560, 1590, 1640, 1660,
                                     1680, 1700, 1720, 1750};

// IF filter bandwidth tables in kHz (tuner_e4k.c:223-249): mixer
// (FILT2[7:4]), RC (FILT2[3:0]), channel (FILT3[4:0]).
constexpr uint32_t kE4kMixBwKhz[] = {27000, 27000, 27000, 27000, 27000,
                                     27000, 27000, 27000, 4600,  4200,
                                     3800,  3400,  3300,  2700,  2300,
                                     1900};
constexpr uint32_t kE4kRcBwKhz[] = {21400, 21000, 17600, 14700, 12400,
                                    10600, 9000,  7700,  6400,  5300,
                                    4400,  3400,  2600,  1800,  1200,
                                    1000};
constexpr uint32_t kE4kChanBwKhz[] = {
    5500, 5300, 5000, 4800, 4600, 4400, 4300, 4100, 3900, 3800, 3700,
    3600, 3400, 3300, 3200, 3100, 3000, 2950, 2900, 2800, 2750, 2700,
    2600, 2550, 2500, 2450, 2400, 2300, 2280, 2240, 2200, 2150};

class E4kTuner final : public TunerChip {
 public:
  E4kTuner(RegIo& io, uint32_t xtal_hz) : io_(io), fosc_(xtal_hz) {}

  const char* name() const override { return "Elonics E4000"; }

  uint32_t if_freq_hz() const override { return 0; }  // zero-IF
  void set_xtal(uint32_t hz) override { fosc_ = hz; }
  bool supports_offset_tuning() const override { return true; }

  double nearest_gain_db(double requested_db) const override {
    double best = kE4kGainsTenthDb[0] / 10.0, err = 1e18;
    for (int g : kE4kGainsTenthDb) {
      double e = std::abs(requested_db - g / 10.0);
      if (e < err) {
        err = e;
        best = g / 10.0;
      }
    }
    return best;
  }

  // e4k_init (tuner_e4k.c:922-1002), same op order as the reference:
  // reset + POR clear, clock config, the documented "magic" analog
  // block, AGC thresholds, mode plumbing (serial LNA / manual mixer —
  // immediately superseded by the auto-gain default below, exactly as
  // e4k_init itself does at :961-976), moderate IF gains, narrowest
  // IF filters, time-variant DC correction off.
  bool init() override {
    uint8_t scratch;
    read(0x00, &scratch, 1);  // dummy access, not ACKed on silicon
    if (write_reg(0x00, 0x07) < 0) return false;  // MASTER1: reset|stby|por
    write_reg(0x05, 0x00);  // CLK_INP
    write_reg(0x06, 0x00);  // REF_CLK
    write_reg(0x7a, 0x96);  // CLKOUT_PWDN
    // magic_init (tuner_e4k.c:906-919).
    write_reg(0x7e, 0x01);
    write_reg(0x7f, 0xfe);
    write_reg(0x82, 0x00);
    write_reg(0x86, 0x50);
    write_reg(0x87, 0x20);
    write_reg(0x88, 0x01);
    write_reg(0x9f, 0x7f);
    write_reg(0xa0, 0x07);
    write_reg(0x1d, 0x10);  // AGC4 high threshold
    write_reg(0x1e, 0x04);  // AGC5 low threshold
    write_reg(0x1f, 0x1a);  // AGC6 LNA calib + loop rate
    if (set_mask(0x1a, 0x0f, 0x00) < 0) return false;  // LNA AGC serial
    if (set_mask(0x20, 0x01, 0x00) < 0) return false;  // mixer manual
    set_gain_auto();
    // Moderate IF gains: stage1 +6 dB, stage5/6 +9 dB
    // (tuner_e4k.c:979-984; GAIN3/GAIN4 fields at :632-640).
    set_mask(0x16, 0x7f, 0x01);
    set_mask(0x17, 0x3f, (uint8_t)((2 << 3) | 2));
    // Narrowest IF filters: mix 1.9 MHz, RC 1.0 MHz, chan 2.15 MHz
    // (tuner_e4k.c:994-998) + channel filter enabled.
    set_bandwidth_khz(1900, 1000, 2150);
    set_mask(0x12, 0x20, 0x00);  // FILT3 chan-filter disable bit off
    // Time-variant DC correction + LUT off (tuner_e4k.c:999-1001).
    set_mask(0x2d, 0x03, 0x00);
    set_mask(0x70, 0x03, 0x00);
    return set_mask(0x71, 0x03, 0x00) >= 0;
  }

  // e4k_tune_freq (tuner_e4k.c:572-600): compute the R-divider, the
  // integer Z and fractional X (Y = 65536), program SYNTH3/4/5/7,
  // verify PLL lock (SYNTH1 bit 0), then band + RF filter.
  bool set_freq(uint32_t freq_hz) override {
    const E4kPllVar* var = nullptr;
    for (const auto& v : kE4kPllVars) {
      if (freq_hz < v.below_hz) {
        var = &v;
        break;
      }
    }
    if (var == nullptr) return false;  // above 1.2 GHz synth range
    const uint64_t fvco = (uint64_t)freq_hz * var->mult;
    const uint8_t z = (uint8_t)(fvco / fosc_);
    const uint64_t remainder = fvco - (uint64_t)fosc_ * z;
    const uint16_t x = (uint16_t)((remainder * 65536) / fosc_);
    if (write_reg(0x0d, var->reg_synth7) < 0) return false;  // SYNTH7
    write_reg(0x09, z);                       // SYNTH3
    write_reg(0x0a, (uint8_t)(x & 0xff));     // SYNTH4
    write_reg(0x0b, (uint8_t)(x >> 8));       // SYNTH5
    // PLL lock check (tuner_e4k.c:592-597).
    uint8_t synth1 = 0;
    if (read(0x07, &synth1, 1) < 0 || !(synth1 & 0x01)) return false;
    // Band + bias (tuner_e4k.c:448-472), with the 325-350 MHz gap
    // workaround: clear the band field before setting it.
    uint8_t band;  // E4K_BAND_*: VHF2 0, VHF3 1, UHF 2, L 3
    if (freq_hz < 140'000'000) band = 0;
    else if (freq_hz < 350'000'000) band = 1;
    else if (freq_hz < 1'135'000'000) band = 2;
    else band = 3;
    write_reg(0x78, band == 3 ? 0x00 : 0x03);  // BIAS
    set_mask(0x07, 0x06, 0x00);
    set_mask(0x07, 0x06, (uint8_t)(band << 1));
    // RF tracking filter (tuner_e4k.c:184-221): FILT1[3:0].
    uint8_t filt = 0;
    const uint32_t mhz = freq_hz / 1'000'000;
    if (band == 2) filt = closest_idx(kE4kUhfFiltMhz, 16, mhz);
    else if (band == 3) filt = closest_idx(kE4kLFiltMhz, 16, mhz);
    return set_mask(0x10, 0x0f, filt) >= 0;
  }

  // librtlsdr.c:175-191 e4000_set_gain: mixer takes 12 dB above
  // 34 dB total, else 4 dB; the LNA absorbs the rest.
  bool set_gain_manual(int tenth_db) override {
    // Manual modes on (e4k_enable_manual_gain, tuner_e4k.c:695-713).
    if (set_mask(0x1a, 0x0f, 0x00) < 0) return false;
    if (set_mask(0x20, 0x01, 0x00) < 0) return false;
    set_mask(0x24, 0x07, 0x00);  // AGC11: LNA gain enhancement off
    const int mixgain = (tenth_db > 340) ? 12 : 4;
    const int lna = std::min(300, tenth_db - mixgain * 10);
    uint8_t lna_idx = 0;
    for (const auto& s : kE4kLnaSteps)
      if (s.tenth_db <= lna) lna_idx = s.index;
    if (set_mask(0x14, 0x0f, lna_idx) < 0) return false;  // GAIN1
    // e4k_mixer_gain_set (tuner_e4k.c:754-770): GAIN2 bit 0.
    return set_mask(0x15, 0x01, mixgain == 12 ? 0x01 : 0x00) >= 0;
  }

  bool set_gain_auto() {
    // e4k_enable_manual_gain(0): LNA AGC autonomous + IF serial,
    // mixer AGC on (tuner_e4k.c:703-711).
    if (set_mask(0x1a, 0x0f, 0x09) < 0) return false;
    if (set_mask(0x20, 0x01, 0x01) < 0) return false;
    return set_mask(0x24, 0x07, 0x00) >= 0;
  }

  // Offset tuning widens/narrows all three IF filters around the
  // shifted IF (librtlsdr.c:1240-1245 -> e4000_set_bw).
  bool set_bandwidth(uint32_t bw_hz) override {
    const uint32_t khz = bw_hz / 1000;
    return set_bandwidth_khz(khz, khz, khz);
  }

  // e4k_standby (tuner_e4k.c:895-901): clear MASTER1 NORM_STBY.
  bool standby() override { return set_mask(0x00, 0x02, 0x00) >= 0; }

 private:
  static uint8_t closest_idx(const uint32_t* arr, int n, uint32_t v) {
    int best = 0;
    uint32_t best_d = ~0u;
    for (int i = 0; i < n; ++i) {
      uint32_t d = arr[i] > v ? arr[i] - v : v - arr[i];
      if (d < best_d) {
        best_d = d;
        best = i;
      }
    }
    return (uint8_t)best;
  }

  bool set_bandwidth_khz(uint32_t mix, uint32_t rc, uint32_t chan) {
    const uint8_t mi = closest_idx(kE4kMixBwKhz, 16, mix);
    const uint8_t ri = closest_idx(kE4kRcBwKhz, 16, rc);
    const uint8_t ci = closest_idx(kE4kChanBwKhz, 32, chan);
    if (set_mask(0x11, 0xf0, (uint8_t)(mi << 4)) < 0) return false;
    if (set_mask(0x11, 0x0f, ri) < 0) return false;
    return set_mask(0x12, 0x1f, ci) >= 0;
  }

  // E4K register access: plain [reg, value] writes, pointer reads —
  // no bit-reversal (that is an R82xx quirk). tuner_e4k.c:57-77.
  int write_reg(uint8_t reg, uint8_t val) {
    uint8_t buf[2] = {reg, val};
    return io_.i2c_write(kE4kI2cAddr, buf, 2) == 2 ? 0 : -1;
  }
  int read(uint8_t reg, uint8_t* out, int len) {
    if (io_.i2c_write(kE4kI2cAddr, &reg, 1) < 1) return -1;
    return io_.i2c_read(kE4kI2cAddr, out, len) == len ? 0 : -1;
  }
  int set_mask(uint8_t reg, uint8_t mask, uint8_t val) {
    uint8_t cur = 0;
    if (read(reg, &cur, 1) < 0) return -1;
    return write_reg(reg, (uint8_t)((cur & ~mask) | (val & mask)));
  }

  RegIo& io_;
  uint32_t fosc_;
};

// --- Fitipower FC0012 / FC0013 (tuner_fc0012.c / tuner_fc0013.c) ------
// Both chips share one I2C address (0xc6), the plain [reg, val] write /
// pointer-read protocol (tuner_fc0012.c:30-55), and the same
// integer+sigma-delta PLL: a band table picks the VCO multiplier and
// output divider, XDIV = round(f_vco / (xtal/2)) splits into count-to-8
// and count-to-9 cycles (AM/PM), and XIN is a signed 16-bit fractional
// correction (tuner_fc0012.c:148-280, tuner_fc0013.c:193-424). Both are
// zero-IF on the RTL2832U (the default init_baseband datapath stays —
// librtlsdr.c:1556-1580 only special-cases the R82xx).

constexpr uint8_t kFcI2cAddr = 0xc6;      // FC0012/FC0013_I2C_ADDR
constexpr uint8_t kFc0012CheckVal = 0xa1;  // chip id at reg 0
constexpr uint8_t kFc0013CheckVal = 0xa3;

struct FcPllBand {
  uint32_t below_hz;
  uint8_t multi, reg5, reg6;
};

// tuner_fc0012.c:160-200: divider ladder ends at multi 4 (≲1 GHz).
constexpr FcPllBand kFc0012Bands[] = {
    {37'084'000, 96, 0x82, 0x00}, {55'625'000, 64, 0x82, 0x02},
    {74'167'000, 48, 0x42, 0x00}, {111'250'000, 32, 0x42, 0x02},
    {148'334'000, 24, 0x22, 0x00}, {222'500'000, 16, 0x22, 0x02},
    {296'667'000, 12, 0x12, 0x00}, {445'000'000, 8, 0x12, 0x02},
    {593'334'000, 6, 0x0a, 0x00},  {0xffffffff, 4, 0x0a, 0x02}};

// tuner_fc0013.c:260-305: same ladder shape, different mux codes, and
// two extra rungs (multi 4 to 950 MHz, multi 2 above — L-band GPS).
constexpr FcPllBand kFc0013Bands[] = {
    {37'084'000, 96, 0x82, 0x00}, {55'625'000, 64, 0x02, 0x02},
    {74'167'000, 48, 0x42, 0x00}, {111'250'000, 32, 0x82, 0x02},
    {148'334'000, 24, 0x22, 0x00}, {222'500'000, 16, 0x42, 0x02},
    {296'667'000, 12, 0x12, 0x00}, {445'000'000, 8, 0x22, 0x02},
    {593'334'000, 6, 0x0a, 0x00},  {950'000'000, 4, 0x12, 0x02},
    {0xffffffff, 2, 0x0a, 0x02}};

class FcTunerBase : public TunerChip {
 public:
  explicit FcTunerBase(RegIo& io, uint32_t xtal_hz)
      : io_(io), xtal_hz_(xtal_hz) {}

  uint32_t if_freq_hz() const override { return 0; }  // zero-IF
  void set_xtal(uint32_t hz) override { xtal_hz_ = hz; }
  // fc0012_exit/fc0013_exit are no-ops (librtlsdr.c:202,213).
  bool standby() override { return true; }
  // Offset tuning is allowed on every non-R82xx chip
  // (librtlsdr.c:1222-1232); the FC001x set_bw hooks are no-ops
  // (librtlsdr.c:208,217), so the IF filters stay put.
  bool supports_offset_tuning() const override { return true; }

 protected:
  int write_reg(uint8_t reg, uint8_t val) {
    uint8_t buf[2] = {reg, val};
    return io_.i2c_write(kFcI2cAddr, buf, 2) == 2 ? 0 : -1;
  }
  int read_reg(uint8_t reg, uint8_t* out) {
    if (io_.i2c_write(kFcI2cAddr, &reg, 1) < 1) return -1;
    return io_.i2c_read(kFcI2cAddr, out, 1) == 1 ? 0 : -1;
  }
  int modify_reg(uint8_t reg, uint8_t clear_mask, uint8_t set_bits) {
    uint8_t cur = 0;
    if (read_reg(reg, &cur) < 0) return -1;
    return write_reg(reg, (uint8_t)((cur & clear_mask) | set_bits));
  }

  // Hook between the PLL register writes and the VCO calibration —
  // FC0013 flips reg 0x11 bit 2 for the multi-64 band there
  // (tuner_fc0013.c:375-383).
  virtual bool pre_vco_cal(uint8_t multi) {
    (void)multi;
    return true;
  }

  // The shared synthesizer program (tuner_fc0012.c:148-280 ==
  // tuner_fc0013.c:255-424 modulo the band table). Bandwidth fixed at
  // 6 MHz, as the librtlsdr wrappers do (librtlsdr.c:203-215).
  bool set_pll(uint32_t freq_hz, const FcPllBand* bands, size_t n_bands) {
    const FcPllBand* band = &bands[n_bands - 1];
    for (size_t i = 0; i < n_bands; ++i) {
      if (freq_hz < bands[i].below_hz) {
        band = &bands[i];
        break;
      }
    }
    const uint32_t xtal_2 = xtal_hz_ / 2;
    const uint64_t f_vco = (uint64_t)freq_hz * band->multi;
    uint8_t reg6 = band->reg6;
    bool vco_select = false;
    if (f_vco >= 3'060'000'000ull) {
      reg6 |= 0x08;  // high VCO range
      vco_select = true;
    }
    uint32_t xdiv = (uint32_t)(f_vco / xtal_2);
    if (f_vco - (uint64_t)xdiv * xtal_2 >= xtal_2 / 2) ++xdiv;
    int pm = (int)(xdiv / 8), am = (int)(xdiv - 8 * pm);
    if (am < 2) {
      am += 8;
      --pm;
    }
    uint8_t reg1, reg2;
    if (pm > 31) {
      reg1 = (uint8_t)(am + 8 * (pm - 31));
      reg2 = 31;
    } else {
      reg1 = (uint8_t)am;
      reg2 = (uint8_t)pm;
    }
    if (reg1 > 15 || reg2 < 0x0b) return false;  // no valid combination
    reg6 |= 0x20;  // fix clock out
    // Signed 16-bit fractional part: bit 15 set marks "one below the
    // rounded-up XDIV" (tuner_fc0012.c:235-241).
    uint32_t xin =
        (uint32_t)((f_vco - (f_vco / xtal_2) * xtal_2) / 1000);
    xin = (xin << 15) / (xtal_2 / 1000);
    if (xin >= 16384) xin += 32768;
    reg6 = (uint8_t)((reg6 & 0x3f) | 0x80);  // bandwidth 6 MHz
    const uint8_t reg5 = (uint8_t)(band->reg5 | 0x07);  // Realtek demod
    if (write_reg(0x01, reg1) < 0) return false;
    if (write_reg(0x02, reg2) < 0) return false;
    if (write_reg(0x03, (uint8_t)(xin >> 8)) < 0) return false;
    if (write_reg(0x04, (uint8_t)(xin & 0xff)) < 0) return false;
    if (write_reg(0x05, reg5) < 0) return false;
    if (write_reg(0x06, reg6) < 0) return false;
    if (!pre_vco_cal(band->multi)) return false;
    // VCO calibration pulse + re-calibration when the control voltage
    // pins at a rail (tuner_fc0012.c:256-280).
    if (write_reg(0x0e, 0x80) < 0) return false;
    if (write_reg(0x0e, 0x00) < 0) return false;
    if (write_reg(0x0e, 0x00) < 0) return false;
    uint8_t v = 0;
    if (read_reg(0x0e, &v) < 0) return false;
    v &= 0x3f;
    if (vco_select ? (v > 0x3c) : (v < 0x02)) {
      reg6 ^= 0x08;
      if (write_reg(0x06, reg6) < 0) return false;
      if (write_reg(0x0e, 0x80) < 0) return false;
      if (write_reg(0x0e, 0x00) < 0) return false;
    }
    return true;
  }

  RegIo& io_;
  uint32_t xtal_hz_;
};

class Fc0012Tuner final : public FcTunerBase {
 public:
  using FcTunerBase::FcTunerBase;

  const char* name() const override { return "Fitipower FC0012"; }

  // tuner_fc0012.c:91-146 register program (28.8 MHz xtal: reg 0x07
  // bit 5; dual-master: reg 0x0c bit 1).
  bool init() override {
    static constexpr uint8_t kRegs[] = {
        0x05, 0x10, 0x00, 0x00, 0x0f, 0x00, 0x20, 0xff, 0x6e, 0xb8,
        0x82, 0xfe, 0x02, 0x00, 0x00, 0x00, 0x00, 0x1f, 0x08, 0x00,
        0x04};
    for (size_t i = 0; i < sizeof(kRegs); ++i)
      if (write_reg((uint8_t)(i + 1), kRegs[i]) < 0) return false;
    return true;
  }

  // librtlsdr.c:203-206: GPIO6 steers the VHF/UHF antenna switch, then
  // the synth programs at 6 MHz bandwidth.
  bool set_freq(uint32_t freq_hz) override {
    SetGpioBit(io_, 6, freq_hz > 300'000'000);
    return set_pll(freq_hz, kFc0012Bands,
                   sizeof(kFc0012Bands) / sizeof(kFc0012Bands[0]));
  }

  // Discrete LNA codes on reg 0x13 (tuner_fc0012.c:314-345); the
  // published ladder is librtlsdr.c:965.
  double nearest_gain_db(double requested_db) const override {
    static constexpr int kTenths[] = {-99, -40, 71, 179, 192};
    double best = kTenths[0] / 10.0, err = 1e18;
    for (int g : kTenths) {
      const double e = std::abs(requested_db - g / 10.0);
      if (e < err) {
        err = e;
        best = g / 10.0;
      }
    }
    return best;
  }

  bool set_gain_manual(int tenth_db) override {
    uint8_t code = 0x10;  // 19.2 dB, the reference's default case
    if (tenth_db <= -99) code = 0x02;
    else if (tenth_db <= -40) code = 0x00;
    else if (tenth_db <= 71) code = 0x08;
    else if (tenth_db <= 179) code = 0x17;
    return modify_reg(0x13, 0xe0, code) >= 0;
  }
};

class Fc0013Tuner final : public FcTunerBase {
 public:
  using FcTunerBase::FcTunerBase;

  const char* name() const override { return "Fitipower FC0013"; }

  // tuner_fc0013.c:61-113 (28.8 MHz xtal + dual-master bits applied,
  // as the reference's commented-out switch resolves to).
  bool init() override {
    static constexpr uint8_t kRegs[] = {
        0x09, 0x16, 0x00, 0x00, 0x17, 0x02, 0x2a, 0xff, 0x6e, 0xb8,
        0x82, 0xfe, 0x01, 0x00, 0x00, 0x00, 0x00, 0x00, 0x00, 0x50,
        0x01};
    for (size_t i = 0; i < sizeof(kRegs); ++i)
      if (write_reg((uint8_t)(i + 1), kRegs[i]) < 0) return false;
    return true;
  }

  // tuner_fc0013.c:375-383: reg 0x11 bit 2 selects the low-band VCO
  // divider before calibration — set for the multi-64 band
  // (37.084–55.625 MHz), cleared everywhere else.
  bool pre_vco_cal(uint8_t multi) override {
    return modify_reg(0x11, 0xfb, multi == 64 ? 0x04 : 0x00) >= 0;
  }

  // tuner_fc0013.c:193-253: VHF tracking-filter step, then the
  // VHF/UHF/GPS RF path switches, then the shared synth.
  bool set_freq(uint32_t freq_hz) override {
    uint8_t track = 0x1c;  // <=177.5 MHz and the UHF/GPS default
    // >= so the track boundary matches the RF-path boundary below
    // (fc0013_set_vhf_track: freq < 300 MHz selects the VHF chain).
    if (freq_hz >= 300'000'000) track = 0x1c;
    else if (freq_hz > 219'500'000) track = 0x04;
    else if (freq_hz > 205'500'000) track = 0x08;
    else if (freq_hz > 198'500'000) track = 0x0c;
    else if (freq_hz > 191'500'000) track = 0x10;
    else if (freq_hz > 184'500'000) track = 0x14;
    else if (freq_hz > 177'500'000) track = 0x18;
    if (modify_reg(0x1d, 0xe3, track) < 0) return false;
    if (freq_hz < 300'000'000) {
      // VHF filter on, UHF + GPS paths off.
      if (modify_reg(0x07, 0xff, 0x10) < 0) return false;
      if (modify_reg(0x14, 0x1f, 0x00) < 0) return false;
    } else if (freq_hz <= 862'000'000) {
      if (modify_reg(0x07, 0xef, 0x00) < 0) return false;
      if (modify_reg(0x14, 0x1f, 0x40) < 0) return false;
    } else {
      if (modify_reg(0x07, 0xef, 0x00) < 0) return false;
      if (modify_reg(0x14, 0x1f, 0x20) < 0) return false;  // GPS
    }
    return set_pll(freq_hz, kFc0013Bands,
                   sizeof(kFc0013Bands) / sizeof(kFc0013Bands[0]));
  }

  double nearest_gain_db(double requested_db) const override {
    double best = kLnaSteps13[0].tenth_db / 10.0, err = 1e18;
    for (const auto& s : kLnaSteps13) {
      const double e = std::abs(requested_db - s.tenth_db / 10.0);
      if (e < err) {
        err = e;
        best = s.tenth_db / 10.0;
      }
    }
    return best;
  }

  // tuner_fc0013.c:429-500: manual mode bit + fixed IF gain, then the
  // first LNA ladder entry at or above the request.
  bool set_gain_manual(int tenth_db) override {
    if (modify_reg(0x0d, 0xff, 0x08) < 0) return false;
    if (write_reg(0x13, 0x0a) < 0) return false;
    uint8_t code = kLnaSteps13[kLnaCount13 - 1].code;
    for (size_t i = 0; i < kLnaCount13; ++i) {
      if (kLnaSteps13[i].tenth_db >= tenth_db) {
        code = kLnaSteps13[i].code;
        break;
      }
    }
    return modify_reg(0x14, 0xe0, code) >= 0;
  }

 private:
  struct LnaStep {
    int tenth_db;
    uint8_t code;
  };
  // tuner_fc0013.c:449-474 (the duplicate -63 dB row collapses to its
  // first-match code 0x04, which is what the reference's linear scan
  // selects).
  static constexpr LnaStep kLnaSteps13[] = {
      {-99, 0x02}, {-73, 0x03}, {-65, 0x05}, {-63, 0x04}, {-60, 0x07},
      {-58, 0x01}, {-54, 0x06}, {58, 0x0f},  {61, 0x0e},  {63, 0x0d},
      {65, 0x0c},  {67, 0x0b},  {68, 0x0a},  {70, 0x09},  {71, 0x08},
      {179, 0x17}, {181, 0x16}, {182, 0x15}, {184, 0x14}, {186, 0x13},
      {188, 0x12}, {191, 0x11}, {197, 0x10}};
  static constexpr size_t kLnaCount13 =
      sizeof(kLnaSteps13) / sizeof(kLnaSteps13[0]);
};

// --- FCI FC2580 (tuner_fc2580.c) --------------------------------------
// Zero-IF, own 16.384 MHz crystal (tuner_fc2580.c:15 — the reference
// never routes the RTL ppm correction into it), three RF bands
// (VHF ≤400 MHz ×12, UHF ≤1 GHz ×4, L-band ×2), a 20-bit fractional-N
// synth, and NO gain control (librtlsdr.c:226,969: the gain table is
// empty and set_gain is a stub). All math runs in kHz like the
// reference (fc2580_set_freq, tuner_fc2580.c:195-355).

constexpr uint8_t kFc2580I2cAddr = 0xac;
constexpr uint8_t kFc2580CheckVal = 0x56;  // reg 1, masked 0x7f
constexpr uint32_t kFc2580XtalKhz = 16'384;

class Fc2580Tuner final : public TunerChip {
 public:
  explicit Fc2580Tuner(RegIo& io) : io_(io) {}

  const char* name() const override { return "FCI FC2580"; }

  uint32_t if_freq_hz() const override { return 0; }  // zero-IF
  // The chip runs off its own crystal; the reference's ppm path only
  // updates the E4K/R82xx structs (librtlsdr.c:930-934).
  void set_xtal(uint32_t) override {}
  double nearest_gain_db(double) const override { return 0.0; }
  // fc2580_set_gain is a stub (librtlsdr.c:226) — AGC owns the chain.
  bool set_gain_manual(int) override { return true; }
  bool standby() override { return true; }  // fc2580_exit is a no-op
  bool supports_offset_tuning() const override { return true; }

  // fc2580_set_init (tuner_fc2580.c:146-177), external-AGC mode (the
  // resolved value of the reference's AgcMode, tuner_fc2580.c:53-59),
  // then the widest channel filter.
  bool init() override {
    static constexpr uint8_t kInit[][2] = {
        {0x00, 0x00}, {0x12, 0x86}, {0x14, 0x5c}, {0x16, 0x3c},
        {0x1f, 0xd2}, {0x09, 0xd7}, {0x0b, 0xd5}, {0x0c, 0x32},
        {0x0e, 0x43}, {0x21, 0x0a}, {0x22, 0x82}, {0x45, 0x20},
        {0x4c, 0x02}, {0x3f, 0x88}, {0x02, 0x0e}, {0x58, 0x14}};
    for (const auto& rv : kInit)
      if (write_reg(rv[0], rv[1]) < 0) return false;
    return set_filter(8);
  }

  // fc2580_set_freq (tuner_fc2580.c:195-355): band mux registers, VCO
  // band select at 2.6 GHz, R divider, integer N + 20-bit K.
  bool set_freq(uint32_t freq_hz) override {
    const uint32_t f_lo = (freq_hz + 500) / 1000;  // kHz
    const int band = (f_lo > 1'000'000) ? 2 : (f_lo > 400'000) ? 1 : 0;
    const uint32_t f_vco =
        (band == 1) ? f_lo * 4 : (band == 2) ? f_lo * 2 : f_lo * 12;
    const uint32_t r_val = (f_vco >= 2u * 76 * kFc2580XtalKhz) ? 1
                           : (f_vco >= 76 * kFc2580XtalKhz)    ? 2
                                                               : 4;
    const uint32_t f_comp = kFc2580XtalKhz / r_val;
    const uint32_t n_val = (f_vco / 2) / f_comp;
    const uint32_t f_diff = f_vco - 2 * f_comp * n_val;
    const uint32_t f_diff_shifted = f_diff << 16;  // 20 - pre_shift(4)
    uint32_t k_val = f_diff_shifted / ((2 * f_comp) >> 4);
    if (f_diff_shifted - k_val * ((2 * f_comp) >> 4) >= (f_comp >> 4))
      ++k_val;
    uint8_t data02 = 0x0e;  // USE_EXT_CLK = 0
    if (f_vco >= 2'600'000) data02 |= 0x08;  // BORDER_FREQ: high VCO
    bool ok = true;
    if (band == 1) {  // UHF
      data02 &= 0x3f;
      ok &= write_reg(0x25, 0xf0) == 0 && write_reg(0x27, 0x77) == 0 &&
            write_reg(0x28, 0x53) == 0 && write_reg(0x29, 0x60) == 0 &&
            write_reg(0x30, 0x09) == 0 && write_reg(0x50, 0x8c) == 0 &&
            write_reg(0x53, 0x50) == 0;
      ok &= write_reg(0x5f, f_lo < 538'000 ? 0x13 : 0x15) == 0;
      if (f_lo < 538'000) {
        static constexpr uint8_t kT[][2] = {{0x61, 0x07}, {0x62, 0x06},
                                            {0x67, 0x06}, {0x68, 0x08},
                                            {0x69, 0x10}, {0x6a, 0x12}};
        for (const auto& rv : kT) ok &= write_reg(rv[0], rv[1]) == 0;
      } else if (f_lo < 794'000) {
        static constexpr uint8_t kT[][2] = {{0x61, 0x03}, {0x62, 0x03},
                                            {0x67, 0x03}, {0x68, 0x05},
                                            {0x69, 0x0c}, {0x6a, 0x0e}};
        for (const auto& rv : kT) ok &= write_reg(rv[0], rv[1]) == 0;
      } else {
        static constexpr uint8_t kT[][2] = {{0x61, 0x07}, {0x62, 0x06},
                                            {0x67, 0x07}, {0x68, 0x09},
                                            {0x69, 0x10}, {0x6a, 0x12}};
        for (const auto& rv : kT) ok &= write_reg(rv[0], rv[1]) == 0;
      }
      static constexpr uint8_t kTail[][2] = {{0x63, 0x15}, {0x6b, 0x0b},
                                             {0x6c, 0x0c}, {0x6d, 0x78},
                                             {0x6e, 0x32}, {0x6f, 0x14}};
      for (const auto& rv : kTail) ok &= write_reg(rv[0], rv[1]) == 0;
      ok &= set_filter(8);
    } else if (band == 0) {  // VHF
      data02 = (uint8_t)((data02 & 0x3f) | 0x80);
      static constexpr uint8_t kT[][2] = {
          {0x27, 0x77}, {0x28, 0x33}, {0x29, 0x40}, {0x30, 0x09},
          {0x50, 0x8c}, {0x53, 0x50}, {0x5f, 0x0f}, {0x61, 0x07},
          {0x62, 0x00}, {0x63, 0x15}, {0x67, 0x03}, {0x68, 0x05},
          {0x69, 0x10}, {0x6a, 0x12}, {0x6b, 0x08}, {0x6c, 0x0a},
          {0x6d, 0x78}, {0x6e, 0x32}, {0x6f, 0x54}};
      for (const auto& rv : kT) ok &= write_reg(rv[0], rv[1]) == 0;
      ok &= set_filter(7);
    } else {  // L-band
      data02 = (uint8_t)((data02 & 0x3f) | 0x40);
      static constexpr uint8_t kT[][2] = {
          {0x2b, 0x70}, {0x2c, 0x37}, {0x2d, 0xe7}, {0x30, 0x09},
          {0x44, 0x20}, {0x50, 0x8c}, {0x53, 0x50}, {0x5f, 0x0f},
          {0x61, 0x0f}, {0x62, 0x00}, {0x63, 0x13}, {0x67, 0x00},
          {0x68, 0x02}, {0x69, 0x0c}, {0x6a, 0x0e}, {0x6b, 0x08},
          {0x6c, 0x0a}, {0x6d, 0xa0}, {0x6e, 0x50}, {0x6f, 0x14}};
      for (const auto& rv : kT) ok &= write_reg(rv[0], rv[1]) == 0;
      ok &= set_filter(1);
    }
    // (xtal 16.384 MHz < 28 MHz, so the AGC-clock pre-divide write at
    // tuner_fc2580.c:336-337 is skipped.)
    ok &= write_reg(0x02, data02) == 0;
    const uint8_t r_code =
        (r_val == 1) ? 0x00 : (r_val == 2) ? 0x10 : 0x20;
    ok &= write_reg(0x18, (uint8_t)(r_code + (k_val >> 16))) == 0;
    ok &= write_reg(0x1a, (uint8_t)(k_val >> 8)) == 0;
    ok &= write_reg(0x1b, (uint8_t)k_val) == 0;
    ok &= write_reg(0x1c, (uint8_t)n_val) == 0;
    if (band == 1)
      ok &= write_reg(0x2d, f_lo <= 794'000 ? 0x9f : 0x8f) == 0;
    return ok;
  }

  // The reference's rtlsdr set_bw hook pins mode 1 (1.53 MHz) whatever
  // the rate (librtlsdr.c:225); here the closest of the chip's four
  // calibrated modes is selected instead — offset tuning needs the
  // filter to actually follow the shifted band.
  bool set_bandwidth(uint32_t bw_hz) override {
    const uint8_t mode = (bw_hz <= 2'000'000)   ? 1
                         : (bw_hz <= 6'200'000) ? 6
                         : (bw_hz <= 7'200'000) ? 7
                                                : 8;
    return set_filter(mode);
  }

 private:
  int write_reg(uint8_t reg, uint8_t val) {
    uint8_t buf[2] = {reg, val};
    return io_.i2c_write(kFc2580I2cAddr, buf, 2) == 2 ? 0 : -1;
  }
  int read_reg(uint8_t reg, uint8_t* out) {
    if (io_.i2c_write(kFc2580I2cAddr, &reg, 1) < 1) return -1;
    return io_.i2c_read(kFc2580I2cAddr, out, 1) == 1 ? 0 : -1;
  }

  // fc2580_set_filter (tuner_fc2580.c:370-430): per-mode CSF
  // coefficients scaled by the crystal, then the calibration monitor
  // loop re-pulsing 0x2E until cal_mon reports done.
  bool set_filter(uint8_t mode) {
    uint8_t r36 = 0x18, r39 = 0x80;
    uint32_t coef = 3300;
    if (mode == 1) {
      r36 = 0x1c;
      coef = 4151;
      r39 = 0x00;
    } else if (mode == 6) {
      coef = 4400;
      r39 = 0x00;
    } else if (mode == 7) {
      coef = 3910;
    }
    bool ok = write_reg(0x36, r36) == 0;
    ok &= write_reg(0x37, (uint8_t)(coef * kFc2580XtalKhz / 1'000'000)) == 0;
    ok &= write_reg(0x39, r39) == 0;
    ok &= write_reg(0x2e, 0x09) == 0;
    for (int i = 0; i < 5; ++i) {
      uint8_t cal = 0;
      if (read_reg(0x2f, &cal) < 0) return false;
      if ((cal & 0xc0) == 0xc0) break;
      ok &= write_reg(0x2e, 0x01) == 0;
      ok &= write_reg(0x2e, 0x09) == 0;
    }
    ok &= write_reg(0x2e, 0x01) == 0;
    return ok;
  }

  RegIo& io_;
};

// --- the Device implementation ---------------------------------------

class RtlUsbDevice final : public Device {
 public:
  explicit RtlUsbDevice(std::unique_ptr<UsbTransport> t)
      : transport_(std::move(t)), io_(transport_.get()) {}

  ~RtlUsbDevice() override {
    if (!transport_->device_lost() && tuner_) {
      RepeaterScope rep(io_);
      tuner_->standby();
    }
    if (!transport_->device_lost()) {
      // Power off demod + ADCs (librtlsdr.c:668-674).
      io_.write_reg(kSys, kSysDemodCtl, 0x20, 1);
    }
  }

  // Open-time bring-up (librtlsdr.c:1445-1580): dummy write, baseband
  // init, tuner probe (E4000 first, then R820T/R828D — the reference's
  // order, librtlsdr.c:1500-1530), per-chip demod datapath, tuner init.
  bool init() {
    // Dummy write probes liveness (librtlsdr.c:1500-1504).
    if (io_.write_reg(kUsb, kUsbSysctl, 0x09, 1) < 0) return false;
    init_baseband();

    {
      // Probe order mirrors librtlsdr.c:1500-1551: E4000, FC0013,
      // R820T, R828D, then (after a GPIO5 tuner-reset pulse) FC2580,
      // and FC0012 last. All five reference chips are supported.
      RepeaterScope rep(io_);
      if (io_.i2c_read_reg(kE4kI2cAddr, kE4kCheckReg) == kE4kCheckVal) {
        tuner_xtal_ = kRtlXtalHz;  // E4000 runs off the RTL crystal
        tuner_.reset(new E4kTuner(io_, tuner_xtal_));
      } else if (io_.i2c_read_reg(kFcI2cAddr, 0x00) == kFc0013CheckVal) {
        tuner_xtal_ = kRtlXtalHz;
        tuner_.reset(new Fc0013Tuner(io_, tuner_xtal_));
      } else if (io_.i2c_read_reg(kR820tI2cAddr, 0x00) == kR82xxCheckVal) {
        tuner_xtal_ = kRtlXtalHz;
        tuner_.reset(
            new R82xxTuner(io_, kR820tI2cAddr, tuner_xtal_, false));
      } else if (io_.i2c_read_reg(kR828dI2cAddr, 0x00) == kR82xxCheckVal) {
        tuner_xtal_ = kR828dXtalHz;  // R828D's own crystal
        tuner_.reset(
            new R82xxTuner(io_, kR828dI2cAddr, tuner_xtal_, true));
      } else {
        // Reset the remaining candidates via GPIO5 before probing
        // (librtlsdr.c:1532-1537).
        SetGpioOutput(io_, 5);
        SetGpioBit(io_, 5, true);
        SetGpioBit(io_, 5, false);
        if ((io_.i2c_read_reg(kFc2580I2cAddr, 0x01) & 0x7f) ==
            kFc2580CheckVal) {
          tuner_.reset(new Fc2580Tuner(io_));  // own 16.384 MHz xtal
        } else if (io_.i2c_read_reg(kFcI2cAddr, 0x00) ==
                   kFc0012CheckVal) {
          tuner_xtal_ = kRtlXtalHz;
          // The FC0012's antenna switch rides GPIO6
          // (librtlsdr.c:1547-1549, 203-206).
          SetGpioOutput(io_, 6);
          tuner_.reset(new Fc0012Tuner(io_, tuner_xtal_));
        } else {
          std::fprintf(stderr, "sdrcap-usb: no supported tuner found\n");
          return false;
        }
      }
      std::fprintf(stderr, "sdrcap-usb: found %s tuner\n",
                   tuner_->name());
      apply_tuner_datapath();
      if (!tuner_->init()) return false;
    }
    return true;
  }

  bool set_sample_rate(uint32_t rate_hz) override {
    // Resampler constraint (librtlsdr.c:1086-1090).
    if (rate_hz <= 225'000 || rate_hz > 3'200'000 ||
        (rate_hz > 300'000 && rate_hz <= 900'000)) {
      std::fprintf(stderr, "sdrcap-usb: invalid sample rate %u\n", rate_hz);
      return false;
    }
    uint32_t ratio =
        (uint32_t)(((uint64_t)kRtlXtalHz << 22) / rate_hz) & 0x0ffffffc;
    uint32_t real_ratio = ratio | ((ratio & 0x08000000) << 1);
    rate_ = (uint32_t)(((uint64_t)kRtlXtalHz << 22) / real_ratio);
    io_.demod_write(1, 0x9f, (uint16_t)(ratio >> 16), 2);
    io_.demod_write(1, 0xa1, (uint16_t)(ratio & 0xffff), 2);
    set_sample_freq_correction(ppm_);
    // Soft reset (librtlsdr.c:1116-1118).
    io_.demod_write(1, 0x01, 0x14, 1);
    io_.demod_write(1, 0x01, 0x10, 1);
    // The offset-tuning shift is derived from the rate; recompute it
    // (librtlsdr.c:1120-1123).
    if (offs_freq_) return set_offset_tuning(true);
    return true;
  }

  bool set_center_freq(uint32_t freq_hz) override {
    if (direct_sampling_) {
      set_if_freq(freq_hz);
      freq_ = freq_hz;
      return true;
    }
    // With offset tuning active the LO sits offs_freq below the target
    // and the DDC shifts it back (librtlsdr.c:897-901).
    RepeaterScope rep(io_);
    if (!tuner_->set_freq(freq_hz - offs_freq_)) {
      freq_ = 0;
      return false;
    }
    freq_ = freq_hz;
    return true;
  }

  bool set_tuner_gain_db(double gain_db) override {
    int tenth = (int)std::lround(tuner_->nearest_gain_db(gain_db) * 10.0);
    RepeaterScope rep(io_);
    return tuner_->set_gain_manual(tenth);
  }

  bool set_agc(bool enabled) override {
    // RTL2832 digital AGC (librtlsdr.c:1144-1150).
    return io_.demod_write(0, 0x19, enabled ? 0x25 : 0x05, 1) == 0;
  }

  bool set_freq_correction_ppm(int ppm) override {
    if (ppm == ppm_) return true;
    ppm_ = ppm;
    set_sample_freq_correction(ppm);
    // Apply the corrected crystal to the tuner and retune
    // (librtlsdr.c:1017-1038).
    tuner_->set_xtal(
        (uint32_t)(tuner_xtal_ * (1.0 + ppm / 1e6)));
    if (freq_) return set_center_freq(freq_);
    return true;
  }

  // HF direct sampling (librtlsdr.c:1151-1220): bypass the tuner and
  // feed the ADC straight (mode 1 = I input, 2 = Q input). In direct
  // mode the "center frequency" programs the demod DDC instead of the
  // tuner PLL (librtlsdr.c:888-905).
  bool set_direct_sampling(int mode) override {
    if (mode < 0 || mode > 2) return false;
    if (mode) {
      {
        RepeaterScope rep(io_);
        tuner_->standby();
      }
      io_.demod_write(1, 0xb1, 0x1a, 1);  // Zero-IF off
      io_.demod_write(1, 0x15, 0x00, 1);  // spectrum inversion off
      io_.demod_write(0, 0x08, 0x4d, 1);  // in-phase ADC only
      io_.demod_write(0, 0x06, mode > 1 ? 0x90 : 0x80, 1);  // I/Q swap
      direct_sampling_ = mode;
    } else {
      {
        RepeaterScope rep(io_);
        if (!tuner_->init()) return false;
      }
      // Back to the tuner's own datapath (librtlsdr.c:1186-1199).
      apply_tuner_datapath();
      io_.demod_write(0, 0x06, 0x80, 1);
      direct_sampling_ = 0;
      // tuner_->init() reset the IF filters to their narrowest; with
      // offset tuning active the wanted band sits offs_freq away from
      // the LO and would be filtered out — re-apply the full offset
      // configuration (DDC + widened filters + retune), like
      // set_sample_rate does.
      if (offs_freq_) return set_offset_tuning(true);
    }
    if (freq_) return set_center_freq(freq_);
    return true;
  }

  // E4000-only feature (librtlsdr.c:1222-1251; R82xx returns -2):
  // shift the LO below the target by 1.7x the Nyquist band — based on
  // keenerd's 1/f noise measurements — and DDC back, so the zero-IF
  // chip's DC spike/1-over-f noise lands out of band; the tuner's IF
  // filters widen to pass the shifted band.
  bool set_offset_tuning(bool enabled) override {
    if (!tuner_->supports_offset_tuning()) return !enabled;
    if (direct_sampling_) return false;
    offs_freq_ = enabled ? (rate_ / 2) * 170 / 100 : 0;
    set_if_freq(offs_freq_);
    {
      RepeaterScope rep(io_);
      tuner_->set_bandwidth(enabled ? 2 * offs_freq_ : rate_);
    }
    if (freq_ > offs_freq_) return set_center_freq(freq_);
    return true;
  }

  uint32_t center_freq() const override { return freq_; }
  uint32_t sample_rate() const override { return rate_; }
  const char* tuner_name() const override { return tuner_->name(); }

  // librtlsdr.c:1040-1060: set the read pointer, then byte reads.
  int read_eeprom(uint8_t* data, uint8_t offset, uint16_t len) override {
    if ((int)len + offset > 256) return -2;
    if (io_.write_array(kIic, kEepromAddr, &offset, 1) < 0) return -3;
    for (int i = 0; i < len; ++i)
      if (io_.read_array(kIic, kEepromAddr, data + i, 1) < 0) return -3;
    return len;
  }

  // librtlsdr.c:1000-1038: per-byte read-compare-write with the
  // inter-write settle delay some EEPROM chips need.
  int write_eeprom(const uint8_t* data, uint8_t offset,
                   uint16_t len) override {
    if ((int)len + offset > 256) return -2;
    for (int i = 0; i < len; ++i) {
      uint8_t cmd[2] = {(uint8_t)(offset + i), 0};
      io_.write_array(kIic, kEepromAddr, cmd, 1);
      io_.read_array(kIic, kEepromAddr, &cmd[1], 1);
      if (cmd[1] == data[i]) continue;  // only write changed bytes
      cmd[1] = data[i];
      if (io_.write_array(kIic, kEepromAddr, cmd, 2) != 2) return -3;
      std::this_thread::sleep_for(std::chrono::milliseconds(5));
    }
    return len;
  }

  bool read_sync(uint8_t* out, size_t len) override {
    reset_buffer();
    size_t got = 0;
    while (got < len) {
      int n = transport_->bulk_read_sync(out + got, (int)(len - got), 3000);
      if (n <= 0) return false;
      got += (size_t)n;
    }
    return true;
  }

  // The ordered async engine. Completions (possibly out of order, from
  // the event thread) land in the OrderedTransferQueue; this thread
  // drains strictly in sequence, runs the user callback (which may
  // retune — serialized against nothing else, exactly the fork's
  // guarantee, librtlsdr.c:1826-1894), then refills and resubmits.
  bool read_async(const StreamCallback& cb, size_t buf_len,
                  size_t num_buffers) override {
    cancel_.store(false, std::memory_order_release);
    reset_buffer();
    OrderedTransferQueue q(num_buffers, buf_len);
    std::atomic<size_t> in_flight{0};
    std::atomic<bool> stream_error{false};

    // UsbBulkTransfer slots recycle through a free stack: a completed
    // slot is parked BEFORE its queue transfer is published, so by the
    // time the dispatcher sees the data a slot is always available for
    // resubmission (completion order need not match slot order).
    std::vector<UsbBulkTransfer> bulk(num_buffers);
    std::mutex bt_mu;
    std::vector<UsbBulkTransfer*> bt_free;
    auto park = [&](UsbBulkTransfer* bt) {
      std::lock_guard<std::mutex> lk(bt_mu);
      bt_free.push_back(bt);
    };
    auto take = [&]() -> UsbBulkTransfer* {
      std::lock_guard<std::mutex> lk(bt_mu);
      if (bt_free.empty()) return nullptr;
      UsbBulkTransfer* bt = bt_free.back();
      bt_free.pop_back();
      return bt;
    };
    for (auto& bt : bulk) park(&bt);

    auto on_complete = [&, this](UsbBulkTransfer* bt) {
      Transfer* t = static_cast<Transfer*>(bt->user_data);
      UsbStatus status = bt->status;
      int actual = bt->actual_length;
      park(bt);
      switch (status) {
        case UsbStatus::kCompleted:
          t->len = (size_t)actual;
          q.submit_filled(t);
          break;
        case UsbStatus::kCancelled:
          q.release(t);
          break;
        case UsbStatus::kError:
          // Transient transfer error: deliver an EMPTY in-order
          // completion rather than releasing — a released sequence
          // number would stall pop_in_order forever (the dispatcher
          // waits for exactly that sequence). Matches the reference's
          // count-and-continue policy (librtlsdr.c:1684-1692).
          ++errors_;
          t->len = 0;
          q.submit_filled(t);
          break;
        case UsbStatus::kNoDevice:
          ++errors_;
          stream_error.store(true, std::memory_order_release);
          q.release(t);
          break;
      }
      in_flight.fetch_sub(1, std::memory_order_acq_rel);
    };

    auto submit_one = [&, this]() -> bool {
      UsbBulkTransfer* bt = take();
      if (bt == nullptr) return false;
      Transfer* t = q.acquire_free();
      if (t == nullptr) {
        park(bt);
        return false;
      }
      bt->buffer = t->data.data();
      bt->length = (int)t->data.size();
      bt->user_data = t;
      in_flight.fetch_add(1, std::memory_order_acq_rel);
      if (!transport_->submit_bulk(bt, on_complete)) {
        in_flight.fetch_sub(1, std::memory_order_acq_rel);
        q.release(t);
        park(bt);
        ++errors_;
        return false;
      }
      return true;
    };

    for (size_t i = 0; i < num_buffers; ++i) {
      if (!submit_one()) {
        stream_error.store(true, std::memory_order_release);
        break;
      }
    }

    // Event thread: pumps transport completions until the stream winds
    // down (the libusb_handle_events loop of librtlsdr.c:1830-1843).
    // It may only EXIT once the dispatcher has stopped submitting
    // (dispatcher_done): a cancel/error can land between the
    // dispatcher's check and its next submit, and that last transfer
    // must still be reaped here — otherwise its completion callback
    // would fire after this frame's locals are gone.
    std::atomic<bool> dispatcher_done{false};
    std::thread events([&, this] {
      while (true) {
        int r = transport_->handle_events(100);
        if (r < 0) {
          ++errors_;
          stream_error.store(true, std::memory_order_release);
        }
        const bool draining =
            cancel_.load(std::memory_order_acquire) ||
            stream_error.load(std::memory_order_acquire) ||
            dispatcher_done.load(std::memory_order_acquire);
        if (draining &&
            in_flight.load(std::memory_order_acquire) == 0) {
          // Unblock a dispatcher parked in pop_in_order...
          q.shutdown();
          // ...but keep pumping until it has provably stopped
          // submitting.
          if (dispatcher_done.load(std::memory_order_acquire)) return;
        }
      }
    });

    while (Transfer* t = q.pop_in_order()) {
      cb(t->data.data(), t->len);
      q.release(t);
      if (cancel_.load(std::memory_order_acquire) ||
          stream_error.load(std::memory_order_acquire)) {
        break;
      }
      // Keep the pipe full: one resubmission per dispatch.
      submit_one();
    }
    // Graceful cancel: reap everything in flight, then join
    // (librtlsdr.c:1896-1914).
    transport_->cancel_all();
    dispatcher_done.store(true, std::memory_order_release);
    q.shutdown();
    events.join();
    return !stream_error.load(std::memory_order_acquire);
  }

  void cancel_async() override {
    cancel_.store(true, std::memory_order_release);
    transport_->cancel_all();
  }

  uint64_t transfer_errors() const override { return errors_.load(); }

 private:
  // Per-chip demod datapath (librtlsdr.c:1556-1580): R82xx runs low-IF
  // — Zero-IF off, I-ADC only, IF 3.57 MHz, spectrum inversion; the
  // E4000 runs zero-IF — both ADCs, DDC at 0 (or the offset-tuning
  // shift), Zero-IF mode on, no inversion.
  void apply_tuner_datapath() {
    if (tuner_->if_freq_hz() != 0) {
      io_.demod_write(1, 0xb1, 0x1a, 1);
      io_.demod_write(0, 0x08, 0x4d, 1);
      set_if_freq(tuner_->if_freq_hz());
      io_.demod_write(1, 0x15, 0x01, 1);
    } else {
      io_.demod_write(1, 0xb1, 0x1b, 1);
      io_.demod_write(0, 0x08, 0xcd, 1);
      set_if_freq(offs_freq_);
      io_.demod_write(1, 0x15, 0x00, 1);
    }
  }

  // librtlsdr.c:585-674 bring-up sequence.
  void init_baseband() {
    io_.write_reg(kUsb, kUsbSysctl, 0x09, 1);
    io_.write_reg(kUsb, kUsbEpaMaxpkt, 0x0002, 2);
    io_.write_reg(kUsb, kUsbEpaCtl, 0x1002, 2);
    io_.write_reg(kSys, kSysDemodCtl1, 0x22, 1);
    io_.write_reg(kSys, kSysDemodCtl, 0xe8, 1);
    io_.demod_write(1, 0x01, 0x14, 1);  // soft reset
    io_.demod_write(1, 0x01, 0x10, 1);
    io_.demod_write(1, 0x15, 0x00, 1);
    io_.demod_write(1, 0x16, 0x0000, 2);
    for (int i = 0; i < 6; ++i) io_.demod_write(1, (uint16_t)(0x16 + i), 0x00, 1);
    set_fir();
    io_.demod_write(0, 0x19, 0x05, 1);  // SDR mode, DAGC off
    io_.demod_write(1, 0x93, 0xf0, 1);
    io_.demod_write(1, 0x94, 0x0f, 1);
    io_.demod_write(1, 0x11, 0x00, 1);
    io_.demod_write(1, 0x04, 0x00, 1);  // RF/IF AGC loop off
    io_.demod_write(0, 0x61, 0x60, 1);  // PID filter off
    io_.demod_write(0, 0x06, 0x80, 1);
    io_.demod_write(1, 0xb1, 0x1b, 1);  // Zero-IF + DC/IQ estimation
    io_.demod_write(0, 0x0d, 0x83, 1);
  }

  // librtlsdr.c:585-620: pack 8 x int8 + 8 x int12 into 20 bytes.
  void set_fir() {
    uint8_t fir[20];
    for (int i = 0; i < 8; ++i) fir[i] = (uint8_t)kFirDefault[i];
    for (int i = 0; i < 8; i += 2) {
      int v0 = kFirDefault[8 + i], v1 = kFirDefault[8 + i + 1];
      fir[8 + i * 3 / 2] = (uint8_t)(v0 >> 4);
      fir[8 + i * 3 / 2 + 1] = (uint8_t)((v0 << 4) | ((v1 >> 8) & 0x0f));
      fir[8 + i * 3 / 2 + 2] = (uint8_t)v1;
    }
    for (int i = 0; i < 20; ++i)
      io_.demod_write(1, (uint16_t)(0x1c + i), fir[i], 1);
  }

  // librtlsdr.c:686-714: 22-bit DDC value from the corrected crystal.
  void set_if_freq(uint32_t if_hz) {
    uint32_t xtal = (uint32_t)(kRtlXtalHz * (1.0 + ppm_ / 1e6));
    int32_t v = (int32_t)(((int64_t)if_hz << 22) / xtal) * -1;
    io_.demod_write(1, 0x19, (uint16_t)((v >> 16) & 0x3f), 1);
    io_.demod_write(1, 0x1a, (uint16_t)((v >> 8) & 0xff), 1);
    io_.demod_write(1, 0x1b, (uint16_t)(v & 0xff), 1);
  }

  // librtlsdr.c:717-728 (64-bit product: |ppm| >= 128 would overflow
  // 32-bit; the reference dodges this via a double TWO_POW(24)).
  void set_sample_freq_correction(int ppm) {
    int16_t offs = (int16_t)((int64_t)ppm * -1 * (1 << 24) / 1'000'000);
    io_.demod_write(1, 0x3f, (uint16_t)(offs & 0xff), 1);
    io_.demod_write(1, 0x3e, (uint16_t)((offs >> 8) & 0x3f), 1);
  }

  // librtlsdr.c:1641-1650: flush the bulk FIFO before streaming.
  void reset_buffer() {
    io_.write_reg(kUsb, kUsbEpaCtl, 0x1002, 2);
    io_.write_reg(kUsb, kUsbEpaCtl, 0x0000, 2);
  }

  std::unique_ptr<UsbTransport> transport_;
  RegIo io_;
  std::unique_ptr<TunerChip> tuner_;
  uint32_t tuner_xtal_ = kRtlXtalHz;
  uint32_t freq_ = 0;
  uint32_t offs_freq_ = 0;  // offset-tuning DDC shift (E4000)
  uint32_t rate_ = 2'048'000;  // lib default (rtl_sdr.c:45)
  int ppm_ = 0;
  int direct_sampling_ = 0;
  std::atomic<bool> cancel_{false};
  std::atomic<uint64_t> errors_{0};
};

}  // namespace

std::unique_ptr<Device> MakeUsbDevice(std::unique_ptr<UsbTransport> t) {
  if (!t) return nullptr;
  auto dev = std::make_unique<RtlUsbDevice>(std::move(t));
  if (!dev->init()) return nullptr;
  return dev;
}

std::unique_ptr<Device> MakeUsbDeviceByIndex(uint32_t index) {
  return MakeUsbDevice(MakeLibusbTransport(index));
}

}  // namespace sdrcap
