// Shared device-backend selection for the capture tools.
//
// The reference tools all open real hardware through
// verbose_device_search (convenience.c:250-309); here every tool takes
// the same backend flags and the same resolution order:
//
//   --usb [-d N]      real RTL2832U dongle N over libusb (usb.h)
//   --tcp host:port   rtl_tcp-protocol server (tcp_device.cc)
//   --replay file     raw interleaved u8 I/Q file, looped (file_device)
//   --sim-seed N      deterministic simulator (default; -d also selects
//                     a distinct simulated dongle when --usb is absent)
#pragma once

#include <cstdio>
#include <cstdlib>
#include <functional>
#include <memory>
#include <string>

#include "sdrcap/device.h"
#include "sdrcap/usb.h"

namespace sdrcap {

struct BackendOptions {
  bool usb = false;
  uint32_t usb_index = 0;
  std::string tcp;     // host:port
  std::string replay;  // file path
  uint64_t sim_seed = 1;
  bool sim_realtime = false;
};

// Consume one backend flag from a tool's argument loop. `next` yields
// the flag's value argument (advancing the loop index). Returns true
// when `a` was a backend flag (consumed).
inline bool ParseBackendFlag(const std::string& a,
                             const std::function<const char*()>& next,
                             BackendOptions* o) {
  if (a == "--usb") {
    o->usb = true;
    return true;
  }
  // --device = alias for tools whose -d is taken (sdr_fm's de-emphasis).
  if (a == "-d" || a == "--device") {
    o->usb_index = (uint32_t)std::strtoul(next(), nullptr, 10);
    o->sim_seed = 1 + o->usb_index;
    return true;
  }
  if (a == "--tcp") {
    o->tcp = next();
    return true;
  }
  if (a == "--replay") {
    o->replay = next();
    return true;
  }
  if (a == "--sim-seed") {
    o->sim_seed = std::strtoull(next(), nullptr, 10);
    return true;
  }
  return false;
}

// Bounds-checked argv value accessor for tool argument loops: exits
// with a consistent message when a flag's value is missing. One home
// for the lambda every tool used to copy.
inline std::function<const char*()> MakeNext(int argc, char** argv,
                                             int* i) {
  return [argc, argv, i]() -> const char* {
    if (*i + 1 >= argc) {
      std::fprintf(stderr, "%s needs a value (see --help)\n", argv[*i]);
      std::exit(2);
    }
    return argv[++*i];
  };
}

inline const char* BackendUsage() {
  return "  backends: --usb [-d N] | --tcp host:port | --replay file |"
         " --sim-seed N (default sim)\n";
}

// Open the selected backend; nullptr (with a message) on failure.
inline std::unique_ptr<Device> OpenBackend(const BackendOptions& o) {
  if (o.usb) {
    auto dev = MakeUsbDeviceByIndex(o.usb_index);
    if (!dev)
      std::fprintf(stderr, "no RTL2832U device at index %u\n", o.usb_index);
    return dev;
  }
  if (!o.tcp.empty()) {
    auto colon = o.tcp.rfind(':');
    if (colon == std::string::npos) {
      std::fprintf(stderr, "--tcp wants host:port, got: %s\n",
                   o.tcp.c_str());
      return nullptr;
    }
    auto dev = MakeTcpDevice(o.tcp.substr(0, colon),
                             std::atoi(o.tcp.c_str() + colon + 1));
    if (!dev)
      std::fprintf(stderr, "cannot connect to rtl_tcp server: %s\n",
                   o.tcp.c_str());
    return dev;
  }
  if (!o.replay.empty()) {
    auto dev = MakeFileDevice(o.replay);
    if (!dev)
      std::fprintf(stderr, "cannot open replay file: %s\n",
                   o.replay.c_str());
    return dev;
  }
  return MakeSimDevice(o.sim_seed, o.sim_realtime);
}

}  // namespace sdrcap
