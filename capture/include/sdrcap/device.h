// SDR device abstraction for the capture engine.
//
// Plays the role of the librtlsdr C API surface the reference capture
// stack is built on (librtlsdr-2freq/include/rtl-sdr.h: rtlsdr_open,
// set_center_freq, set_sample_rate, set_tuner_gain, read_async,
// cancel_async), reduced to the contract the 2-frequency capture engine
// actually needs. Implementations:
//  - SimDevice (sim_device.cc): hardware-free deterministic source whose
//    output responds to frequency and gain, so retune/gain logic is
//    observable in tests;
//  - a real USB RTL-SDR backend would slot in here unchanged.
#pragma once

#include <cstdint>
#include <functional>
#include <memory>
#include <string>

namespace sdrcap {

// Asynchronous delivery callback: a contiguous, in-order run of
// interleaved u8 I/Q bytes. Called from the engine's dispatch context,
// strictly serialized (see ring.h) — callbacks may retune the device,
// exactly like the reference's restructured event loop
// (librtlsdr-2freq/src/librtlsdr.c:1826-1894).
using StreamCallback = std::function<void(const uint8_t* data, size_t len)>;

class Device {
 public:
  virtual ~Device() = default;

  virtual bool set_sample_rate(uint32_t rate_hz) = 0;
  virtual bool set_center_freq(uint32_t freq_hz) = 0;
  virtual bool set_tuner_gain_db(double gain_db) = 0;
  virtual bool set_agc(bool enabled) = 0;
  // Crystal frequency correction (rtlsdr_set_freq_correction parity,
  // rtl_sdr.c's -p flag). Default: accepted but inert.
  virtual bool set_freq_correction_ppm(int ppm) {
    (void)ppm;
    return true;
  }
  // HF direct-sampling mode 0/1/2 (rtlsdr_set_direct_sampling,
  // librtlsdr.c:1151) and E4000 offset tuning
  // (rtlsdr_set_offset_tuning, librtlsdr.c:1222). Defaults inert —
  // tuner-specific features a USB backend would implement.
  virtual bool set_direct_sampling(int mode) {
    (void)mode;
    return true;
  }
  virtual bool set_offset_tuning(bool enabled) {
    (void)enabled;
    return true;
  }
  virtual uint32_t center_freq() const = 0;
  virtual uint32_t sample_rate() const = 0;

  // Human-readable tuner chip name, for operator diagnostics (the
  // reference announces the probed chip at open, librtlsdr.c:1505-1548).
  virtual const char* tuner_name() const { return "unknown"; }

  // Synchronous read of exactly `len` bytes (rtlsdr_read_sync parity).
  virtual bool read_sync(uint8_t* out, size_t len) = 0;

  // Start streaming; `cb` receives in-order byte runs until cancel_async.
  // Blocks until streaming ends (like rtlsdr_read_async).
  virtual bool read_async(const StreamCallback& cb, size_t buf_len,
                          size_t num_buffers) = 0;

  // Request streaming stop; safe from within the callback.
  virtual void cancel_async() = 0;

  // Diagnostics (librtlsdr.c:1684-1703 xfer_errors parity).
  virtual uint64_t transfer_errors() const { return 0; }

  // Configuration EEPROM access (rtlsdr_read_eeprom/write_eeprom,
  // librtlsdr.c:1000-1062). Returns bytes handled, <0 when the backend
  // has no EEPROM (sim/file/tcp default).
  virtual int read_eeprom(uint8_t* data, uint8_t offset, uint16_t len) {
    (void)data; (void)offset; (void)len;
    return -1;
  }
  virtual int write_eeprom(const uint8_t* data, uint8_t offset,
                           uint16_t len) {
    (void)data; (void)offset; (void)len;
    return -1;
  }
};

// Snap a requested gain to the tuner's discrete gain table — the
// convenience.c:112-137 nearest_gain behavior. The default table is the
// R820T/R828D ladder (the tuner in RTL-SDR V4, README.md:37).
double NearestGainDb(double requested_db);

// `realtime` paces generation to the configured sample rate (what real
// hardware does); off by default so offline captures run at CPU speed.
std::unique_ptr<Device> MakeSimDevice(uint64_t seed, bool realtime = false);

// Replays interleaved u8 I/Q from a file (loops at EOF); nullptr when
// the file cannot be opened.
std::unique_ptr<Device> MakeFileDevice(const std::string& path);

// Client of the rtl_tcp wire protocol (rtl_tcp.c / tools/sdr_server.cc):
// control commands and IQ stream over one TCP socket, so the capture
// engine drives a networked dongle exactly like local hardware. nullptr
// when the connection or RTL0 handshake fails.
std::unique_ptr<Device> MakeTcpDevice(const std::string& host, int port);

}  // namespace sdrcap
