// Mock USB transport: a register-level model of an RTL2832U + R828D
// dongle behind the UsbTransport seam, for testing the full protocol
// stack (usb_device.cc) without hardware.
//
// Models the behavior contracts the real chip enforces:
//  - vendor-control register map: block/demod-page/I2C encodings
//    (librtlsdr.c:409-556);
//  - R82xx I2C semantics: auto-incrementing register writes, reads
//    starting at reg 0 returning BIT-REVERSED bytes, chip id 0x69,
//    PLL-lock and filter-calibration status bits
//    (tuner_r82xx.c:236-343);
//  - I2C-repeater discipline: tuner traffic with the repeater off is
//    counted as a violation (it would silently fail on silicon);
//  - EEPROM pointer reads at address 0xa0 (librtlsdr.c:1040-1060);
//  - bulk IQ stream: bytes are a deterministic function of a global
//    byte counter plus the CURRENT tuned LO and gain, filled at
//    submission (wire order = data order) while completions can be
//    delivered OUT OF SUBMISSION ORDER — the exact condition the
//    ordered dispatch engine exists to handle (librtlsdr.c:1661-1894).
//
// The mock also decodes the PLL and gain registers back into physical
// units (MockRtlState.tuner_lo_hz, lna/mixer indices) so tests close
// the loop: program a frequency through the driver, read back what the
// silicon would synthesize.
#include "sdrcap/usb.h"

#include <cstring>
#include <deque>
#include <map>
#include <mutex>
#include <thread>
#include <vector>

namespace sdrcap {
namespace {

constexpr uint8_t kR828dI2cAddr = 0x74;
constexpr uint8_t kE4kI2cAddr = 0xc8;
constexpr uint8_t kFcI2cAddr = 0xc6;      // FC0012 + FC0013
constexpr uint8_t kFc2580I2cAddr = 0xac;
constexpr uint8_t kEepromAddr = 0xa0;
constexpr uint32_t kR828dXtalHz = 16'000'000;
constexpr uint32_t kRtlXtalHz = 28'800'000;  // E4000 + FC001x run off this
constexpr uint32_t kFc2580XtalKhz = 16'384;  // its own crystal

uint8_t bitrev(uint8_t b) {
  b = (uint8_t)(((b & 0xf0) >> 4) | ((b & 0x0f) << 4));
  b = (uint8_t)(((b & 0xcc) >> 2) | ((b & 0x33) << 2));
  return (uint8_t)(((b & 0xaa) >> 1) | ((b & 0x55) << 1));
}

class MockUsbTransport final : public UsbTransport {
 public:
  MockUsbTransport(const MockUsbOptions& opts,
                   std::shared_ptr<MockRtlState> state)
      : opts_(opts), state_(std::move(state)) {
    // EEPROM: RTL2832U header (0x28 0x32) + VID/PID like a real stick.
    eeprom_.assign(256, 0xff);
    eeprom_[0] = 0x28;
    eeprom_[1] = 0x32;
    eeprom_[2] = 0xda;
    eeprom_[3] = 0x0b;
    eeprom_[4] = 0x38;
    eeprom_[5] = 0x28;
    // Tuner status register file (logical values; the wire bit-reverses
    // them). data[2] bit6 = PLL lock, data[4] low nibble = filter
    // calibration code, data[4] bits 4:5 = VCO fine tune (1 keeps the
    // R828D divider unchanged, tuner_r82xx.c:475-481).
    tuner_status_[0] = bitrev(0x69);  // so the RAW probe read is 0x69
    tuner_status_[2] = 0x40;
    tuner_status_[4] = (uint8_t)((1 << 4) | 0x04);
    // E4000 register file: chip id 0x40 at reg 2 (E4K_CHECK_ADDR/VAL),
    // PLL lock bit in SYNTH1 bit 0 (tuner_e4k.c:592-597) — band writes
    // read-modify only bits 1-2, so the lock indication persists.
    e4k_regs_[0x02] = 0x40;
    e4k_regs_[0x07] = 0x01;
    // FC0012/FC0013: chip id at reg 0 (tuner_fc001x.h CHECK_VAL).
    fc_regs_[0x00] = (opts_.tuner == MockTunerModel::kFc0012)
                         ? 0xa1
                         : 0xa3;
    // FC2580: id 0x56 at reg 1 (wire may set bit 7, hence the 0x7f
    // mask in the probe); CSF cal_mon (reg 0x2f) reports calibrated.
    fc2580_regs_[0x01] = 0xd6;
    fc2580_regs_[0x2f] = 0xc0;
  }

  int control_transfer(bool in, uint16_t value, uint16_t index,
                       uint8_t* data, uint16_t len) override {
    std::lock_guard<std::mutex> lk(mu_);
    if (lost_) return -4;  // LIBUSB_ERROR_NO_DEVICE
    state_->control_transfers.fetch_add(1);
    const bool is_write = (index & 0x10) != 0;
    if (in == is_write) return -1;  // direction/index mismatch
    const uint8_t block = (uint8_t)(index >> 8);
    if (block != 0) return block_xfer(in, block, value, data, len);
    // Demod page access: wValue = (addr << 8) | 0x20, wIndex = page.
    if ((value & 0xff) != 0x20) return -1;
    return demod_xfer(in, (uint8_t)(index & 0x0f), (uint16_t)(value >> 8),
                      data, len);
  }

  bool submit_bulk(UsbBulkTransfer* t, UsbBulkCallback cb) override {
    std::lock_guard<std::mutex> lk(mu_);
    if (lost_) return false;
    // Fill at submission: USB data order is submission order even when
    // completion callbacks fire out of order.
    fill_iq(t->buffer, t->length);
    t->actual_length = t->length;
    t->status = UsbStatus::kCompleted;
    pending_.push_back({t, std::move(cb)});
    return true;
  }

  int handle_events(int timeout_ms) override {
    std::vector<Pending> ready;
    {
      std::lock_guard<std::mutex> lk(mu_);
      if (lost_ && pending_.empty() && reaped_.empty()) return -4;
      // Cancelled transfers complete first (status already stamped).
      for (auto& p : reaped_) ready.push_back(std::move(p));
      reaped_.clear();
      if (!pending_.empty()) {
        if (lost_) {
          for (auto& p : pending_) {
            p.t->status = UsbStatus::kNoDevice;
            p.t->actual_length = 0;
            ready.push_back(std::move(p));
          }
          pending_.clear();
        } else if (opts_.out_of_order && pending_.size() >= 2) {
          // Deliver the SECOND submission first — the out-of-order
          // completion real libusb permits.
          ready.push_back(std::move(pending_[1]));
          ready.push_back(std::move(pending_[0]));
          pending_.erase(pending_.begin(), pending_.begin() + 2);
        } else {
          ready.push_back(std::move(pending_.front()));
          pending_.pop_front();
        }
      }
      for (auto& p : ready) {
        if (p.t->status == UsbStatus::kCompleted) {
          uint64_t n = state_->bulk_transfers.fetch_add(1) + 1;
          if (opts_.lose_device_after && n >= opts_.lose_device_after)
            lost_ = true;
        }
      }
    }
    if (ready.empty() && timeout_ms > 0) {
      // Nothing pending: emulate the blocking poll without burning CPU.
      std::this_thread::sleep_for(std::chrono::microseconds(200));
    }
    for (auto& p : ready) p.cb(p.t);  // outside the lock, like libusb
    return (int)ready.size();
  }

  // Like libusb_cancel_transfer over the active set: only transfers in
  // flight NOW are cancelled; later submissions proceed normally (a
  // second read_async on the same device must work).
  void cancel_all() override {
    std::lock_guard<std::mutex> lk(mu_);
    for (auto& p : pending_) {
      p.t->status = UsbStatus::kCancelled;
      p.t->actual_length = 0;
      reaped_.push_back(std::move(p));
    }
    pending_.clear();
  }

  int bulk_read_sync(uint8_t* data, int len, int) override {
    std::lock_guard<std::mutex> lk(mu_);
    if (lost_) return -4;
    fill_iq(data, len);
    state_->bulk_transfers.fetch_add(1);
    return len;
  }

  bool device_lost() const override {
    std::lock_guard<std::mutex> lk(mu_);
    return lost_;
  }

 private:
  struct Pending {
    UsbBulkTransfer* t;
    UsbBulkCallback cb;
  };

  int block_xfer(bool in, uint8_t block, uint16_t addr, uint8_t* data,
                 uint16_t len) {
    if (block == 6) return i2c_xfer(in, (uint8_t)addr, data, len);
    auto key = [&](int i) { return (uint32_t)(block << 16) | (addr + i); };
    if (in) {
      for (int i = 0; i < len; ++i) data[i] = regs_[key(i)];
    } else {
      for (int i = 0; i < len; ++i) regs_[key(i)] = data[i];
      // SYS DEMOD_CTL power-on (librtlsdr.c:630).
      if (block == 2 && addr == 0x3000)
        state_->baseband_on.store(data[0] == 0xe8);
      // GPIO output / direction (librtlsdr.c:558-578).
      if (block == 2 && addr == 0x3001) state_->gpio_out.store(data[0]);
      if (block == 2 && addr == 0x3003) state_->gpio_oe.store(data[0]);
    }
    return len;
  }

  int demod_xfer(bool in, uint8_t page, uint16_t addr, uint8_t* data,
                 uint16_t len) {
    if (in) {
      for (int i = 0; i < len; ++i)
        data[i] = demod_[(uint32_t)(page << 16) | (addr + i)];
      return len;
    }
    for (int i = 0; i < len; ++i)
      demod_[(uint32_t)(page << 16) | (addr + i)] = data[i];
    // Multi-byte demod writes send MSB first (librtlsdr.c:534-543):
    // the VALUE at addr is data[0]<<8|data[1] for len 2.
    const uint16_t val = (len == 2) ? (uint16_t)((data[0] << 8) | data[1])
                                    : data[0];
    if (page == 1 && addr == 0x01)
      state_->repeater_on.store(val == 0x18);
    if (page == 0 && addr == 0x19) state_->agc_on.store(val == 0x25);
    if (page == 1 && addr >= 0x1c && addr <= 0x2f)
      state_->fir_writes.fetch_add(1);
    if (page == 1 && (addr == 0x9f || addr == 0xa1) && len == 2) {
      uint32_t r = state_->rsamp_ratio.load();
      if (addr == 0x9f) r = (r & 0x0000ffff) | ((uint32_t)val << 16);
      else r = (r & 0xffff0000) | val;
      state_->rsamp_ratio.store(r);
    }
    if (page == 1 && addr >= 0x19 && addr <= 0x1b && len == 1) {
      if_bytes_[addr - 0x19] = (uint8_t)val;
      int32_t v = ((if_bytes_[0] & 0x3f) << 16) | (if_bytes_[1] << 8) |
                  if_bytes_[2];
      if (v & 0x200000) v -= 0x400000;  // sign-extend 22 bits
      state_->if_freq_reg.store(v);
    }
    return len;
  }

  int i2c_xfer(bool in, uint8_t i2c_addr, uint8_t* data, uint16_t len) {
    if (i2c_addr == kEepromAddr) {
      if (!in) {
        if (len >= 1) eeprom_ptr_ = data[0];
        if (len >= 2) eeprom_[eeprom_ptr_] = data[1];
        return len;
      }
      state_->eeprom_reads.fetch_add(1);
      for (int i = 0; i < len; ++i)
        data[i] = eeprom_[(eeprom_ptr_++) & 0xff];
      return len;
    }
    // Route to the one chip this dongle carries; every other address
    // floats (reads 0, writes vanish) — how the real bus answers the
    // probes for absent tuners.
    switch (opts_.tuner) {
      case MockTunerModel::kE4000:
        if (i2c_addr == kE4kI2cAddr) return e4k_xfer(in, data, len);
        break;
      case MockTunerModel::kFc0012:
      case MockTunerModel::kFc0013:
        if (i2c_addr == kFcI2cAddr) return fc_xfer(in, data, len);
        break;
      case MockTunerModel::kFc2580:
        if (i2c_addr == kFc2580I2cAddr)
          return fc2580_xfer(in, data, len);
        break;
      case MockTunerModel::kR828d:
        break;
    }
    if (i2c_addr != kR828dI2cAddr ||
        opts_.tuner != MockTunerModel::kR828d) {
      if (in) std::memset(data, 0, len);
      return len;
    }
    if (!state_->repeater_on.load())
      state_->repeater_violations.fetch_add(1);
    if (!in) {
      // [start_reg, values...] with auto-increment (tuner_r82xx.c:270).
      if (len >= 1) tuner_ptr_ = data[0];
      for (int i = 1; i < len; ++i)
        tuner_regs_[(tuner_ptr_ + i - 1) & 0xff] = data[i];
      if (len > 1) decode_tuner();
      return len;
    }
    // Reads start at reg 0 and return bit-reversed bytes
    // (tuner_r82xx.c:317-343).
    for (int i = 0; i < len; ++i) {
      uint8_t logical = (i < (int)sizeof(tuner_status_))
                            ? tuner_status_[i]
                            : tuner_regs_[i & 0xff];
      data[i] = bitrev(logical);
    }
    return len;
  }

  // E4000 I2C semantics (tuner_e4k.c:57-101): writes are
  // [start_reg, values...] with auto-increment; a 1-byte write sets the
  // read pointer; reads return plain (NOT bit-reversed) register
  // values from the pointer onward.
  int e4k_xfer(bool in, uint8_t* data, uint16_t len) {
    if (!state_->repeater_on.load())
      state_->repeater_violations.fetch_add(1);
    if (!in) {
      if (len >= 1) e4k_ptr_ = data[0];
      for (int i = 1; i < len; ++i)
        e4k_regs_[(e4k_ptr_ + i - 1) & 0xff] = data[i];
      if (len > 1) decode_e4k();
      return len;
    }
    for (int i = 0; i < len; ++i) data[i] = e4k_regs_[(e4k_ptr_++) & 0xff];
    return len;
  }

  // Invert the E4000 synth programming (tuner_e4k.c:481-560) back to
  // the LO: flo = fosc * (Z + X/65536) / R, with R from the SYNTH7
  // band value (tuner_e4k.c:359-370).
  void decode_e4k() {
    uint32_t mult = 0;
    switch (e4k_regs_[0x0d]) {  // SYNTH7
      case (1 << 3) | 7: mult = 48; break;
      case (1 << 3) | 6: mult = 40; break;
      case (1 << 3) | 5: mult = 32; break;
      case (1 << 3) | 4: mult = 24; break;
      case (1 << 3) | 3: mult = 16; break;
      case (1 << 3) | 2: mult = 12; break;
      case (1 << 3) | 1: mult = 8; break;
      case 3: mult = 8; break;
      case 2: mult = 6; break;
      case 1: mult = 4; break;
      default: mult = 0; break;
    }
    if (mult) {
      const uint8_t z = e4k_regs_[0x09];
      const uint32_t x =
          (uint32_t)e4k_regs_[0x0a] | ((uint32_t)e4k_regs_[0x0b] << 8);
      const double fvco = (double)kRtlXtalHz * (z + x / 65536.0);
      state_->tuner_lo_hz.store((uint32_t)(fvco / mult + 0.5));
    }
    state_->lna_index.store(e4k_regs_[0x14] & 0x0f);        // GAIN1
    state_->mixer_index.store(e4k_regs_[0x15] & 0x01);      // GAIN2
    // AGC1 mod field 0x0 = serial (manual), 0x9 = LNA autonomous.
    state_->tuner_manual_gain.store((e4k_regs_[0x1a] & 0x0f) == 0x00);
  }

  // FC0012/FC0013 I2C semantics (tuner_fc0012.c:30-55): writes are
  // plain [reg, val] pairs, reads are pointer-then-read, no
  // auto-increment games and no bit reversal.
  int fc_xfer(bool in, uint8_t* data, uint16_t len) {
    if (!state_->repeater_on.load())
      state_->repeater_violations.fetch_add(1);
    if (!in) {
      if (len >= 1) fc_ptr_ = data[0];
      if (len >= 2) {
        fc_regs_[fc_ptr_] = data[1];
        // Silicon discipline: the FC0013's low-band VCO divider
        // (reg 0x11 bit 2) must be set for the multi-64 band and
        // cleared otherwise BY the calibration pulse
        // (tuner_fc0013.c:375-383) — check at the pulse itself.
        if (opts_.tuner == MockTunerModel::kFc0013 && fc_ptr_ == 0x0e &&
            data[1] == 0x80 && fc_multi_ != 0 &&
            ((fc_multi_ == 64) != ((fc_regs_[0x11] & 0x04) != 0)))
          state_->vco_divider_violations.fetch_add(1);
        decode_fc(fc_ptr_, data[1]);
      }
      return len;
    }
    for (int i = 0; i < len; ++i) {
      // The VCO control voltage (reg 0x0e) reads back mid-range so
      // the driver's re-calibration branch (tuner_fc0012.c:256-280)
      // stays quiet — a rail reading would flip the VCO-speed bit.
      data[i] = (fc_ptr_ == 0x0e) ? 0x20 : fc_regs_[fc_ptr_];
      ++fc_ptr_;
    }
    return len;
  }

  // Invert the shared Fitipower synth (tuner_fc0012.c:148-280) back to
  // the LO: XDIV = AM + 8*PM (the pm>31 overflow fold preserves the
  // sum), XIN is a SIGNED 16-bit fraction of xtal/2 relative to the
  // rounded XDIV, and the band multiplier comes from the RF mux codes
  // in regs 5/6 — which differ between the two chips.
  void decode_fc(uint8_t reg, uint8_t val) {
    if (reg == 0x13 && opts_.tuner == MockTunerModel::kFc0012) {
      state_->lna_index.store(val & 0x1f);
      state_->tuner_manual_gain.store(true);
      return;
    }
    if (opts_.tuner == MockTunerModel::kFc0013) {
      if (reg == 0x14) state_->lna_index.store(val & 0x1f);
      if (reg == 0x0d) state_->tuner_manual_gain.store((val & 0x08) != 0);
      // VHF tracking-filter code (reg 0x1d bits 4:2) — exposed so the
      // 300 MHz track/RF-path boundary agreement is testable.
      if (reg == 0x1d) state_->fc_track_code.store(val & 0x1c);
      if (reg == 0x14 || reg == 0x0d || reg == 0x1d) return;
    }
    if (reg != 0x06) return;  // regs 1..6 are written in order
    const uint8_t mux = fc_regs_[0x05] & 0xf8;
    const uint8_t r6 = (uint8_t)(val & 0x02);
    uint32_t multi = 0;
    if (opts_.tuner == MockTunerModel::kFc0012) {
      if (mux == 0x80) multi = r6 ? 64 : 96;
      else if (mux == 0x40) multi = r6 ? 32 : 48;
      else if (mux == 0x20) multi = r6 ? 16 : 24;
      else if (mux == 0x10) multi = r6 ? 8 : 12;
      else if (mux == 0x08) multi = r6 ? 4 : 6;
    } else {
      if (mux == 0x80) multi = r6 ? 32 : 96;
      else if (mux == 0x00) multi = r6 ? 64 : 0;
      else if (mux == 0x40) multi = r6 ? 16 : 48;
      else if (mux == 0x20) multi = r6 ? 8 : 24;
      else if (mux == 0x10) multi = r6 ? 4 : 12;
      else if (mux == 0x08) multi = r6 ? 2 : 6;
    }
    if (multi == 0) return;
    fc_multi_ = multi;  // remembered for the VCO-cal divider check
    const double xtal_2 = kRtlXtalHz / 2.0;
    const uint32_t xdiv =
        (uint32_t)fc_regs_[0x01] + 8u * fc_regs_[0x02];
    const uint16_t raw = (uint16_t)((fc_regs_[0x03] << 8) | fc_regs_[0x04]);
    const double frac = (int16_t)raw * (xtal_2 / 1000.0) * 1000.0 / 32768.0;
    const double f_vco = xdiv * xtal_2 + frac;
    state_->tuner_lo_hz.store((uint32_t)(f_vco / multi + 0.5));
  }

  // FC2580: same plain [reg, val] / pointer-read protocol.
  int fc2580_xfer(bool in, uint8_t* data, uint16_t len) {
    if (!state_->repeater_on.load())
      state_->repeater_violations.fetch_add(1);
    if (!in) {
      if (len >= 1) fc2580_ptr_ = data[0];
      if (len >= 2) {
        fc2580_regs_[fc2580_ptr_] = data[1];
        if (fc2580_ptr_ == 0x1c) decode_fc2580();
      }
      return len;
    }
    for (int i = 0; i < len; ++i) data[i] = fc2580_regs_[fc2580_ptr_++];
    return len;
  }

  // Invert the FC2580 fractional-N program (tuner_fc2580.c:195-355):
  // f_vco = 2*(xtal/R)*(N + K/2^20), band multiplier from the reg 0x02
  // band field (VHF x12 / UHF x4 / L x2), all in kHz like the driver.
  void decode_fc2580() {
    const uint8_t band = fc2580_regs_[0x02] & 0xc0;
    const uint32_t mult = (band == 0x80) ? 12 : (band == 0x40) ? 2 : 4;
    const uint8_t r18 = fc2580_regs_[0x18];
    const uint32_t r_val =
        ((r18 & 0x30) == 0x00) ? 1 : ((r18 & 0x30) == 0x10) ? 2 : 4;
    const uint32_t k = ((uint32_t)(r18 & 0x0f) << 16) |
                       ((uint32_t)fc2580_regs_[0x1a] << 8) |
                       fc2580_regs_[0x1b];
    const double f_comp = (double)kFc2580XtalKhz / r_val;
    const double f_vco_khz =
        2.0 * f_comp * ((double)fc2580_regs_[0x1c] + k / 1048576.0);
    state_->tuner_lo_hz.store((uint32_t)(f_vco_khz / mult * 1000.0 + 0.5));
  }

  // Invert the R82xx PLL programming (tuner_r82xx.c:417-527) back into
  // the LO the silicon would synthesize.
  void decode_tuner() {
    const uint8_t div_num = (uint8_t)((tuner_regs_[0x10] >> 5) & 0x07);
    const uint32_t mix_div = 2u << div_num;
    const uint8_t r14 = tuner_regs_[0x14];
    const uint32_t nint = 4u * (r14 & 0x3f) + (uint8_t)(r14 >> 6) + 13;
    const bool sdm_off = (tuner_regs_[0x12] & 0x08) != 0;
    const uint32_t sdm =
        sdm_off ? 0u
                : (uint32_t)((tuner_regs_[0x16] << 8) | tuner_regs_[0x15]);
    const double vco =
        2.0 * kR828dXtalHz * ((double)nint + (double)sdm / 65536.0);
    state_->tuner_lo_hz.store((uint32_t)(vco / mix_div + 0.5));
    state_->lna_index.store(tuner_regs_[0x05] & 0x0f);
    state_->mixer_index.store(tuner_regs_[0x07] & 0x0f);
    state_->tuner_manual_gain.store((tuner_regs_[0x05] & 0x10) != 0);
  }

  // Deterministic IQ: every byte depends on the global byte counter and
  // the tuning/gain at fill time, so retune boundaries and loss/
  // reordering are all visible in the captured stream.
  void fill_iq(uint8_t* buf, int len) {
    const uint32_t freq_tag = state_->tuner_lo_hz.load() / 1000u;
    const uint32_t gain_tag = state_->lna_index.load() * 16u +
                              state_->mixer_index.load();
    for (int i = 0; i < len; ++i) {
      buf[i] = MockByte(byte_counter_++, freq_tag, gain_tag, opts_.seed);
    }
  }

 public:
  static uint8_t MockByte(uint64_t n, uint32_t freq_tag, uint32_t gain_tag,
                          uint64_t seed) {
    uint64_t h = n * 0x9e3779b97f4a7c15ull ^ (uint64_t)freq_tag << 32 ^
                 (uint64_t)gain_tag << 17 ^ seed;
    h ^= h >> 29;
    return (uint8_t)(h & 0xff);
  }

 private:
  MockUsbOptions opts_;
  std::shared_ptr<MockRtlState> state_;
  mutable std::mutex mu_;
  std::map<uint32_t, uint8_t> regs_;   // (block, addr) registers
  std::map<uint32_t, uint8_t> demod_;  // (page, addr) registers
  uint8_t if_bytes_[3] = {0, 0, 0};
  std::vector<uint8_t> eeprom_;
  uint8_t eeprom_ptr_ = 0;
  uint8_t tuner_regs_[256] = {};
  uint8_t tuner_ptr_ = 0;
  uint8_t tuner_status_[5] = {};
  uint8_t e4k_regs_[256] = {};
  uint8_t e4k_ptr_ = 0;
  uint8_t fc_regs_[256] = {};      // FC0012/FC0013 (I2C 0xc6)
  uint8_t fc_ptr_ = 0;
  uint32_t fc_multi_ = 0;          // last decoded band multiplier
  uint8_t fc2580_regs_[256] = {};  // FC2580 (I2C 0xac)
  uint8_t fc2580_ptr_ = 0;
  std::deque<Pending> pending_;
  std::deque<Pending> reaped_;  // cancelled, awaiting delivery
  uint64_t byte_counter_ = 0;
  bool lost_ = false;
};

}  // namespace

std::unique_ptr<UsbTransport> MakeMockUsbTransport(
    const MockUsbOptions& opts, std::shared_ptr<MockRtlState> state) {
  return std::make_unique<MockUsbTransport>(opts, std::move(state));
}

}  // namespace sdrcap
