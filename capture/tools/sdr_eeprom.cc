// Device-configuration tool — rtl_eeprom.c capability on a file-backed
// EEPROM image (the sim stack's persistent device identity): the same
// 256-byte layout real RTL dongles use — VID/PID, config flags, and
// three UTF-16-ish prefixed strings (manufacturer, product, serial).
//
//   sdr_eeprom -I image.bin                 # read & print
//   sdr_eeprom -I image.bin -g              # generate default image
//   sdr_eeprom -I image.bin -m MFG -p PROD -S SERIAL   # write fields
//   sdr_eeprom --usb [-d N] [...]           # same, on a real dongle's
//                                             EEPROM over libusb
#include <algorithm>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <memory>
#include <string>
#include <vector>

#include "sdrcap/backend.h"
#include "sdrcap/device.h"

namespace {

constexpr size_t kEepromSize = 256;

struct Config {
  uint16_t vid = 0x0bda, pid = 0x2838;
  bool have_serial = true, remote_wakeup = false, enable_ir = false;
  std::string manufacturer = "Realtek";
  std::string product = "RTL2838UHIDIR";
  std::string serial = "00000001";
};

// Strings are stored as: len byte (2n+2), 0x03, then n UCS-2LE chars.
// Truncates to what fits both the remaining image space and the 8-bit
// length field (the descriptor format's own hard cap).
size_t put_string(std::vector<uint8_t>& e, size_t pos, const std::string& s) {
  size_t n = s.size();
  const size_t room = e.size() > pos + 2 ? (e.size() - pos - 2) / 2 : 0;
  n = std::min({n, room, (size_t)126});  // 2n+2 must fit in uint8_t
  if (n < s.size())
    std::fprintf(stderr, "warning: string truncated to %zu chars\n", n);
  if (pos + 2 > e.size()) return pos;
  e[pos] = (uint8_t)(n * 2 + 2);
  e[pos + 1] = 0x03;
  for (size_t i = 0; i < n; ++i) {
    e[pos + 2 + 2 * i] = s[i];
    e[pos + 3 + 2 * i] = 0x00;
  }
  return pos + 2 + 2 * n;
}

size_t get_string(const std::vector<uint8_t>& e, size_t pos, std::string* out) {
  if (pos + 2 > e.size() || e[pos + 1] != 0x03) return pos;
  const size_t n = (e[pos] - 2) / 2;
  out->clear();
  for (size_t i = 0; i < n && pos + 3 + 2 * i < e.size(); ++i)
    out->push_back((char)e[pos + 2 + 2 * i]);
  return pos + e[pos];
}

std::vector<uint8_t> serialize(const Config& c) {
  std::vector<uint8_t> e(kEepromSize, 0);
  e[0] = 0x28;
  e[1] = 0x32;
  e[2] = c.vid & 0xff;
  e[3] = c.vid >> 8;
  e[4] = c.pid & 0xff;
  e[5] = c.pid >> 8;
  e[6] = (c.have_serial ? 0xa5 : 0x00);
  e[7] = (c.remote_wakeup ? 0x01 : 0x00) | (c.enable_ir ? 0x02 : 0x00);
  size_t pos = 0x09;
  pos = put_string(e, pos, c.manufacturer);
  pos = put_string(e, pos, c.product);
  put_string(e, pos, c.serial);
  return e;
}

bool parse(const std::vector<uint8_t>& e, Config* c) {
  if (e.size() < kEepromSize || e[0] != 0x28 || e[1] != 0x32) return false;
  c->vid = e[2] | (e[3] << 8);
  c->pid = e[4] | (e[5] << 8);
  c->have_serial = e[6] == 0xa5;
  c->remote_wakeup = e[7] & 0x01;
  c->enable_ir = e[7] & 0x02;
  size_t pos = 0x09;
  pos = get_string(e, pos, &c->manufacturer);
  pos = get_string(e, pos, &c->product);
  get_string(e, pos, &c->serial);
  return true;
}

// Shared between file and device modes: print a parsed config, and
// merge CLI edits into current content (flags left at their defaults
// are treated as unset — the rtl_eeprom.c convention).
void print_config(const Config& cur) {
  std::printf("Vendor ID:\t\t0x%04x\n", cur.vid);
  std::printf("Product ID:\t\t0x%04x\n", cur.pid);
  std::printf("Manufacturer:\t\t%s\n", cur.manufacturer.c_str());
  std::printf("Product:\t\t%s\n", cur.product.c_str());
  std::printf("Serial number:\t\t%s\n", cur.serial.c_str());
  std::printf("Serial number enabled:\t%s\n",
              cur.have_serial ? "yes" : "no");
  std::printf("IR endpoint enabled:\t%s\n",
              cur.enable_ir ? "yes" : "no");
  std::printf("Remote wakeup enabled:\t%s\n",
              cur.remote_wakeup ? "yes" : "no");
}

Config merge_edits(const Config& cur, const Config& edits) {
  Config c = cur;
  if (edits.manufacturer != "Realtek") c.manufacturer = edits.manufacturer;
  if (edits.product != "RTL2838UHIDIR") c.product = edits.product;
  if (edits.serial != "00000001") c.serial = edits.serial;
  return c;
}

// Hardware writes are irreversible (dongle identity): confirm like
// rtl_eeprom.c does before flashing.
bool confirm_device_write() {
  std::fprintf(stderr,
               "Write new configuration into the device EEPROM [y/n]? ");
  int ch = std::getchar();
  return ch == 'y' || ch == 'Y';
}

}  // namespace

int main(int argc, char** argv) {
  std::string image;
  Config c;
  sdrcap::BackendOptions backend;
  bool generate = false, write = false;
  for (int i = 1; i < argc; ++i) {
    std::string a = argv[i];
    auto next = sdrcap::MakeNext(argc, argv, &i);
    if (a == "-I") image = next();
    else if (a == "-g") generate = true;
    else if (a == "-m") { c.manufacturer = next(); write = true; }
    else if (a == "-p") { c.product = next(); write = true; }
    else if (a == "-S") { c.serial = next(); write = true; }
    else if (sdrcap::ParseBackendFlag(a, next, &backend)) {}
    else if (a == "--help" || (image.empty() && !backend.usb)) {
      std::fprintf(stderr,
                   "Usage: sdr_eeprom (-I image.bin | --usb [-d N]) [-g] "
                   "[-m MFG] [-p PROD] [-S SERIAL]\n");
      return a == "--help" ? 0 : 2;
    }
  }

  // Real-dongle mode: the EEPROM bytes come from (and go back to) the
  // device instead of an image file (rtl_eeprom.c's main flow).
  std::unique_ptr<sdrcap::Device> dev;
  if (backend.usb) {
    dev = sdrcap::OpenBackend(backend);
    if (!dev) return 1;
  }

  if (dev) {
    std::vector<uint8_t> e(kEepromSize);
    if (dev->read_eeprom(e.data(), 0, (uint16_t)e.size()) < 0) {
      std::fprintf(stderr, "EEPROM read failed\n");
      return 1;
    }
    Config cur;
    if (!parse(e, &cur)) {
      std::fprintf(stderr, "device EEPROM has no RTL28xx header\n");
      if (!generate) return 1;
    } else if (!write && !generate) {
      print_config(cur);
      return 0;
    } else if (!generate) {
      c = merge_edits(cur, c);
    }
    std::printf("New configuration:\n");
    print_config(c);
    if (!confirm_device_write()) {
      std::fprintf(stderr, "aborted, nothing written\n");
      return 1;
    }
    auto out = serialize(c);
    if (dev->write_eeprom(out.data(), 0, (uint16_t)out.size()) < 0) {
      std::fprintf(stderr, "EEPROM write failed\n");
      return 1;
    }
    std::printf("wrote device EEPROM (%zu bytes)\n", out.size());
    return 0;
  }

  if (!generate) {
    FILE* f = std::fopen(image.c_str(), "rb");
    if (f) {
      std::vector<uint8_t> e(kEepromSize);
      if (std::fread(e.data(), 1, e.size(), f) == kEepromSize) {
        Config cur;
        if (parse(e, &cur)) {
          if (!write) {
            print_config(cur);
            std::fclose(f);
            return 0;
          }
          // Start edits from the current content.
          c = merge_edits(cur, c);
        }
      }
      std::fclose(f);
    } else if (!write) {
      std::fprintf(stderr, "cannot open %s (use -g to generate)\n",
                   image.c_str());
      return 1;
    }
  }

  auto e = serialize(c);
  FILE* f = std::fopen(image.c_str(), "wb");
  if (!f) { std::perror("open image"); return 1; }
  std::fwrite(e.data(), 1, e.size(), f);
  std::fclose(f);
  std::printf("wrote %s (%zu bytes)\n", image.c_str(), e.size());
  return 0;
}
