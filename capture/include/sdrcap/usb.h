// USB transport seam + RTL2832U device backend.
//
// The reference's L0 is a libusb driver (librtlsdr-2freq/src/librtlsdr.c):
// vendor control transfers carry register/I2C/EEPROM traffic
// (librtlsdr.c:409-434), IQ samples stream over bulk endpoint 0x81
// (librtlsdr.c:1655-1659), and the fork's restructured async engine
// serializes out-of-order libusb completions into in-order user
// callbacks (librtlsdr.c:1661-1894).
//
// This rebuild splits that into two layers:
//  - UsbTransport: the raw USB pipe (control transfers + async bulk) —
//    the exact seam libusb occupies. Two implementations:
//      MakeLibusbTransport  — real hardware via dlopen("libusb-1.0.so.0")
//                             (no build-time libusb dependency);
//      MakeMockUsbTransport — a register-level RTL2832U + R828D model
//                             with out-of-order bulk completions, so the
//                             whole protocol stack is testable (and
//                             sanitizer-provable) without hardware.
//  - MakeUsbDevice: the RTL2832U protocol driver implementing Device on
//    top of any UsbTransport: baseband init, demod register writes,
//    I2C-repeater discipline, tuner programming (R82xx low-IF and
//    E4000 zero-IF: PLL, gain, filters, offset tuning), EEPROM access,
//    and the ordered async bulk engine built on OrderedTransferQueue.
#pragma once

#include <atomic>
#include <cstdint>
#include <functional>
#include <memory>

#include "sdrcap/device.h"

namespace sdrcap {

enum class UsbStatus : uint8_t {
  kCompleted,  // full buffer delivered
  kCancelled,  // cancel_all() reaped it
  kError,      // transfer-level failure (librtlsdr.c:1684 xfer_errors)
  kNoDevice,   // device unplugged (librtlsdr.c:1694 dev_lost)
};

// One in-flight bulk IN transfer on the IQ endpoint (EP 0x81).
struct UsbBulkTransfer {
  uint8_t* buffer = nullptr;
  int length = 0;        // requested bytes
  int actual_length = 0; // delivered bytes (set at completion)
  UsbStatus status = UsbStatus::kCompleted;
  void* user_data = nullptr;
};

using UsbBulkCallback = std::function<void(UsbBulkTransfer*)>;

// The libusb-shaped seam. Completions run on the thread inside
// handle_events() and may arrive OUT OF SUBMISSION ORDER — re-ordering
// is the UsbDevice engine's job (exactly the reference's split:
// librtlsdr.c:1661-1677 list-append vs 1844-1858 in-order drain).
// submit_bulk/cancel_all must be callable concurrently with
// handle_events (libusb guarantees this for its counterparts).
class UsbTransport {
 public:
  virtual ~UsbTransport() = default;

  // Vendor control transfer. in=false: host->device (bmRequestType
  // 0x40); in=true: device->host (0xC0). wValue/wIndex encode the
  // register block and address (librtlsdr.c:409-434). Returns bytes
  // transferred, or <0 on error.
  virtual int control_transfer(bool in, uint16_t value, uint16_t index,
                               uint8_t* data, uint16_t len) = 0;

  // Queue an async bulk IN transfer; cb fires from handle_events().
  virtual bool submit_bulk(UsbBulkTransfer* t, UsbBulkCallback cb) = 0;

  // Process pending completions on the calling thread. Returns <0 when
  // the device is lost, else the number of completions delivered.
  virtual int handle_events(int timeout_ms) = 0;

  // Cancel every in-flight bulk transfer; each still completes (with
  // kCancelled) through handle_events — the graceful-cancel contract of
  // librtlsdr.c:1896-1914.
  virtual void cancel_all() = 0;

  // Blocking bulk read (rtlsdr_read_sync path, librtlsdr.c:1653-1659).
  virtual int bulk_read_sync(uint8_t* data, int len, int timeout_ms) = 0;

  virtual bool device_lost() const = 0;
};

// RTL2832U protocol driver on any transport. Returns nullptr when the
// probe handshake fails (no RTL2832U / no supported tuner).
std::unique_ptr<Device> MakeUsbDevice(std::unique_ptr<UsbTransport> t);

// Real hardware: open the index-th known RTL dongle via libusb (loaded
// at runtime; no libusb at build time). nullptr when libusb or the
// device is absent.
std::unique_ptr<UsbTransport> MakeLibusbTransport(uint32_t index);

// Convenience: MakeUsbDevice(MakeLibusbTransport(index)).
std::unique_ptr<Device> MakeUsbDeviceByIndex(uint32_t index);

// ---------------------------------------------------------------------
// Mock transport (tests / CI — this environment has no SDR hardware).

// Which tuner chip the mock dongle carries. The probe order and
// per-chip protocol differ (librtlsdr.c:1500-1551): R82xx answers
// 0x69 at reg 0 with bit-reversed reads; the E4000 answers 0x40 at
// reg 2 with plain pointer reads; the Fitipower FC0013/FC0012 share
// I2C address 0xc6 and answer 0xa3/0xa1 at reg 0; the FCI FC2580
// answers 0x56 (masked 0x7f) at reg 1 after a GPIO5 reset pulse.
enum class MockTunerModel : uint8_t {
  kR828d,
  kE4000,
  kFc0012,
  kFc0013,
  kFc2580,
};

struct MockUsbOptions {
  uint64_t seed = 1;
  MockTunerModel tuner = MockTunerModel::kR828d;
  // Complete bulk transfers out of submission order (pairwise swap) to
  // exercise the engine's re-ordering. The byte stream itself stays in
  // logical order — exactly how real USB behaves: data is ordered on
  // the wire, completion *callbacks* are not.
  bool out_of_order = true;
  // After this many bulk completions, simulate an unplug (0 = never).
  uint64_t lose_device_after = 0;
};

// Observable state the mock derives from register traffic, for tests.
struct MockRtlState {
  std::atomic<uint64_t> control_transfers{0};
  std::atomic<uint64_t> bulk_transfers{0};
  // Protocol-discipline violations: tuner I2C traffic with the I2C
  // repeater off (would silently fail on real silicon).
  std::atomic<uint64_t> repeater_violations{0};
  std::atomic<bool> repeater_on{false};
  // Demod state decoded from register writes.
  std::atomic<uint32_t> rsamp_ratio{0};
  std::atomic<int32_t> if_freq_reg{0};   // 22-bit signed DDC value
  std::atomic<bool> agc_on{false};
  std::atomic<uint64_t> fir_writes{0};
  std::atomic<bool> baseband_on{false};
  // Tuner state decoded from R82xx register writes (bit-reversed wire).
  std::atomic<uint32_t> tuner_lo_hz{0};  // from PLL nint/sdm/div
  std::atomic<uint32_t> lna_index{0};
  std::atomic<uint32_t> mixer_index{0};
  std::atomic<bool> tuner_manual_gain{false};
  std::atomic<uint64_t> eeprom_reads{0};
  // GPIO state decoded from SYS-block writes (GPO 0x3001 / GPOE
  // 0x3003, librtlsdr.c:558-578): FC2580 probing pulses GPIO5, the
  // FC0012 driver steers its VHF/UHF antenna switch on GPIO6.
  std::atomic<uint32_t> gpio_out{0};
  std::atomic<uint32_t> gpio_oe{0};
  // FC0013 low-band VCO-divider discipline: at each VCO calibration
  // pulse, reg 0x11 bit 2 must be set iff the programmed band
  // multiplier is 64 (tuner_fc0013.c:375-383) — a mismatch means the
  // VCO would fail to lock on real silicon.
  std::atomic<uint64_t> vco_divider_violations{0};
  // FC0013 VHF tracking-filter code (reg 0x1d bits 4:2).
  std::atomic<uint32_t> fc_track_code{0};
};

// The state object outlives the transport (shared with the test).
std::unique_ptr<UsbTransport> MakeMockUsbTransport(
    const MockUsbOptions& opts, std::shared_ptr<MockRtlState> state);

}  // namespace sdrcap
