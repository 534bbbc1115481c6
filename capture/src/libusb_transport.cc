// Real-hardware UsbTransport: libusb-1.0 loaded at runtime via dlopen.
//
// No build-time libusb dependency: the declarations below are the
// minimal, ABI-stable public libusb-1.0 surface this transport needs
// (mirrors <libusb-1.0/libusb.h>; the struct layouts are part of
// libusb's frozen ABI). On systems without the library — or without a
// dongle — MakeLibusbTransport returns nullptr and callers fall back
// to sim/file/tcp backends.
//
// Semantics mirror the reference's USB layer: device discovery against
// the known VID/PID table (librtlsdr.c:314-370), open + kernel-driver
// detach + claim (librtlsdr.c:1407-1516), vendor control transfers for
// register traffic (librtlsdr.c:409-434), async bulk on endpoint 0x81
// with per-transfer status tracking and graceful cancel
// (librtlsdr.c:1655-1914).
#include "sdrcap/usb.h"

#include <dlfcn.h>
#include <sys/types.h>

#include <atomic>
#include <cstdio>
#include <cstring>
#include <mutex>
#include <unordered_map>

namespace sdrcap {
namespace {

// --- minimal libusb-1.0 ABI ------------------------------------------

struct libusb_context;
struct libusb_device;
struct libusb_device_handle;

struct libusb_device_descriptor {
  uint8_t bLength, bDescriptorType;
  uint16_t bcdUSB;
  uint8_t bDeviceClass, bDeviceSubClass, bDeviceProtocol, bMaxPacketSize0;
  uint16_t idVendor, idProduct, bcdDevice;
  uint8_t iManufacturer, iProduct, iSerialNumber, bNumConfigurations;
};

enum libusb_transfer_status {
  LIBUSB_TRANSFER_COMPLETED = 0,
  LIBUSB_TRANSFER_ERROR = 1,
  LIBUSB_TRANSFER_TIMED_OUT = 2,
  LIBUSB_TRANSFER_CANCELLED = 3,
  LIBUSB_TRANSFER_STALL = 4,
  LIBUSB_TRANSFER_NO_DEVICE = 5,
  LIBUSB_TRANSFER_OVERFLOW = 6,
};

struct libusb_transfer;
typedef void (*libusb_transfer_cb_fn)(libusb_transfer*);

struct libusb_transfer {
  libusb_device_handle* dev_handle;
  uint8_t flags;
  unsigned char endpoint;
  unsigned char type;  // 2 = bulk
  unsigned int timeout;
  int status;  // libusb_transfer_status
  int length;
  int actual_length;
  libusb_transfer_cb_fn callback;
  void* user_data;
  unsigned char* buffer;
  int num_iso_packets;
};

struct timeval_abi {
  long tv_sec;
  long tv_usec;
};

struct LibusbApi {
  void* handle = nullptr;
  int (*init)(libusb_context**);
  void (*exit_)(libusb_context*);
  ssize_t (*get_device_list)(libusb_context*, libusb_device***);
  void (*free_device_list)(libusb_device**, int);
  int (*get_device_descriptor)(libusb_device*, libusb_device_descriptor*);
  int (*open)(libusb_device*, libusb_device_handle**);
  void (*close)(libusb_device_handle*);
  int (*claim_interface)(libusb_device_handle*, int);
  int (*release_interface)(libusb_device_handle*, int);
  int (*kernel_driver_active)(libusb_device_handle*, int);
  int (*detach_kernel_driver)(libusb_device_handle*, int);
  int (*attach_kernel_driver)(libusb_device_handle*, int);
  int (*reset_device)(libusb_device_handle*);
  int (*control_transfer)(libusb_device_handle*, uint8_t, uint8_t, uint16_t,
                          uint16_t, unsigned char*, uint16_t, unsigned);
  int (*bulk_transfer)(libusb_device_handle*, unsigned char, unsigned char*,
                       int, int*, unsigned);
  libusb_transfer* (*alloc_transfer)(int);
  void (*free_transfer)(libusb_transfer*);
  int (*submit_transfer)(libusb_transfer*);
  int (*cancel_transfer)(libusb_transfer*);
  int (*handle_events_timeout)(libusb_context*, timeval_abi*);

  bool ok() const { return handle != nullptr; }
};

const LibusbApi& Api() {
  static LibusbApi api = [] {
    LibusbApi a{};
    a.handle = dlopen("libusb-1.0.so.0", RTLD_NOW | RTLD_LOCAL);
    if (!a.handle) a.handle = dlopen("libusb-1.0.so", RTLD_NOW | RTLD_LOCAL);
    if (!a.handle) return a;
    auto sym = [&](const char* name) { return dlsym(a.handle, name); };
#define LOAD(field, name)                                   \
  *(void**)(&a.field) = sym(name);                          \
  if (!a.field) {                                           \
    dlclose(a.handle);                                      \
    a.handle = nullptr;                                     \
    return a;                                               \
  }
    LOAD(init, "libusb_init")
    LOAD(exit_, "libusb_exit")
    LOAD(get_device_list, "libusb_get_device_list")
    LOAD(free_device_list, "libusb_free_device_list")
    LOAD(get_device_descriptor, "libusb_get_device_descriptor")
    LOAD(open, "libusb_open")
    LOAD(close, "libusb_close")
    LOAD(claim_interface, "libusb_claim_interface")
    LOAD(release_interface, "libusb_release_interface")
    LOAD(kernel_driver_active, "libusb_kernel_driver_active")
    LOAD(detach_kernel_driver, "libusb_detach_kernel_driver")
    LOAD(attach_kernel_driver, "libusb_attach_kernel_driver")
    LOAD(reset_device, "libusb_reset_device")
    LOAD(control_transfer, "libusb_control_transfer")
    LOAD(bulk_transfer, "libusb_bulk_transfer")
    LOAD(alloc_transfer, "libusb_alloc_transfer")
    LOAD(free_transfer, "libusb_free_transfer")
    LOAD(submit_transfer, "libusb_submit_transfer")
    LOAD(cancel_transfer, "libusb_cancel_transfer")
    LOAD(handle_events_timeout, "libusb_handle_events_timeout")
#undef LOAD
    return a;
  }();
  return api;
}

// Known RTL2832U sticks — the USB IDs of librtlsdr.c:314-370's device
// table (public hardware identifiers; vendor-branded sticks carry their
// own IDs, not Realtek's, so the generic pair is not enough).
constexpr struct {
  uint16_t vid, pid;
} kKnownDevices[] = {
    {0x0bda, 0x2832}, {0x0bda, 0x2838},  // generic RTL2832U / DVB-T
    {0x0413, 0x6680}, {0x0413, 0x6f0f},  // DexatekDK
    {0x0458, 0x707f},                    // Genius TVGo
    {0x0ccd, 0x00a9}, {0x0ccd, 0x00b3}, {0x0ccd, 0x00b4},
    {0x0ccd, 0x00b5}, {0x0ccd, 0x00b7}, {0x0ccd, 0x00b8},
    {0x0ccd, 0x00b9}, {0x0ccd, 0x00c0}, {0x0ccd, 0x00c6},
    {0x0ccd, 0x00d3}, {0x0ccd, 0x00d7}, {0x0ccd, 0x00e0},  // Terratec
    {0x1554, 0x5020},                    // PixelView
    {0x15f4, 0x0131}, {0x15f4, 0x0133},  // Astrometa / HanfTek
    {0x185b, 0x0620}, {0x185b, 0x0650}, {0x185b, 0x0680},  // Compro
    {0x1b80, 0xd393}, {0x1b80, 0xd394}, {0x1b80, 0xd395},
    {0x1b80, 0xd397}, {0x1b80, 0xd398}, {0x1b80, 0xd39d},
    {0x1b80, 0xd3a4}, {0x1b80, 0xd3a8}, {0x1b80, 0xd3af},
    {0x1b80, 0xd3b0},                    // GIGABYTE / ASUS / Sveon
    {0x1d19, 0x1101}, {0x1d19, 0x1102}, {0x1d19, 0x1103},
    {0x1d19, 0x1104},                    // Dexatek-branded
    {0x1f4d, 0xa803}, {0x1f4d, 0xb803}, {0x1f4d, 0xc803},
    {0x1f4d, 0xd286}, {0x1f4d, 0xd803},  // GTek / Lifeview / MyGica
};

constexpr uint8_t kBulkEndpoint = 0x81;
constexpr uint8_t kCtrlIn = 0xc0;   // VENDOR | ENDPOINT_IN
constexpr uint8_t kCtrlOut = 0x40;  // VENDOR | ENDPOINT_OUT
constexpr unsigned kCtrlTimeoutMs = 300;

class LibusbTransport final : public UsbTransport {
 public:
  ~LibusbTransport() override {
    if (devh_) {
      Api().release_interface(devh_, 0);
      // Restore the kernel driver we displaced (librtlsdr.c:1620-1627).
      if (driver_was_active_) Api().attach_kernel_driver(devh_, 0);
      Api().close(devh_);
    }
    if (ctx_) Api().exit_(ctx_);
  }

  bool open(uint32_t index) {
    const LibusbApi& u = Api();
    if (u.init(&ctx_) < 0) return false;
    libusb_device** list = nullptr;
    ssize_t cnt = u.get_device_list(ctx_, &list);
    libusb_device* found = nullptr;
    uint32_t matches = 0;
    for (ssize_t i = 0; i < cnt; ++i) {
      libusb_device_descriptor dd{};
      if (u.get_device_descriptor(list[i], &dd) < 0) continue;
      for (const auto& kd : kKnownDevices) {
        if (dd.idVendor == kd.vid && dd.idProduct == kd.pid) {
          if (matches++ == index) found = list[i];
          break;
        }
      }
      if (found) break;
    }
    if (!found) {
      if (list) u.free_device_list(list, 1);
      std::fprintf(stderr, "sdrcap-usb: no known RTL2832U device "
                           "(index %u, %u found)\n", index, matches);
      return false;
    }
    int r = u.open(found, &devh_);
    if (list) u.free_device_list(list, 1);
    if (r < 0) {
      devh_ = nullptr;
      // Don't let a permissions problem masquerade as "no device"
      // (librtlsdr.c:1449-1453's dedicated hint).
      if (r == -3 /* LIBUSB_ERROR_ACCESS */)
        std::fprintf(stderr, "sdrcap-usb: permission denied opening the "
                             "device — install the rtl-sdr udev rules "
                             "(see deploy.sh) or run as root\n");
      else
        std::fprintf(stderr, "sdrcap-usb: usb_open error %d\n", r);
      return false;
    }
    if (u.kernel_driver_active(devh_, 0) == 1) {
      // dvb_usb_rtl28xxu owns the stick: detach, restore on close
      // (librtlsdr.c:1466-1487, deploy.sh's DETACH_KERNEL_DRIVER=ON).
      if (u.detach_kernel_driver(devh_, 0) == 0) {
        driver_was_active_ = true;
      } else {
        std::fprintf(stderr, "sdrcap-usb: cannot detach kernel driver\n");
        return false;
      }
    }
    if (u.claim_interface(devh_, 0) < 0) {
      std::fprintf(stderr, "sdrcap-usb: claim_interface failed\n");
      return false;
    }
    return true;
  }

  int control_transfer(bool in, uint16_t value, uint16_t index,
                       uint8_t* data, uint16_t len) override {
    int r = Api().control_transfer(devh_, in ? kCtrlIn : kCtrlOut, 0, value,
                                   index, data, len, kCtrlTimeoutMs);
    if (r == -4 /* LIBUSB_ERROR_NO_DEVICE */) lost_.store(true);
    return r;
  }

  bool submit_bulk(UsbBulkTransfer* t, UsbBulkCallback cb) override {
    libusb_transfer* xfer = Api().alloc_transfer(0);
    if (!xfer) return false;
    auto* holder = new Holder{this, t, std::move(cb)};
    xfer->dev_handle = devh_;
    xfer->flags = 0;
    xfer->endpoint = kBulkEndpoint;
    xfer->type = 2;  // LIBUSB_TRANSFER_TYPE_BULK
    xfer->timeout = 0;
    xfer->length = t->length;
    xfer->buffer = t->buffer;
    xfer->callback = &LibusbTransport::OnComplete;
    xfer->user_data = holder;
    xfer->num_iso_packets = 0;
    {
      std::lock_guard<std::mutex> lk(mu_);
      active_[xfer] = holder;
    }
    if (Api().submit_transfer(xfer) < 0) {
      std::lock_guard<std::mutex> lk(mu_);
      active_.erase(xfer);
      delete holder;
      Api().free_transfer(xfer);
      return false;
    }
    return true;
  }

  int handle_events(int timeout_ms) override {
    if (lost_.load()) {
      std::lock_guard<std::mutex> lk(mu_);
      if (active_.empty()) return -1;
    }
    timeval_abi tv{timeout_ms / 1000, (timeout_ms % 1000) * 1000};
    int r = Api().handle_events_timeout(ctx_, &tv);
    // A signal interrupting the poll is not an error — the reference
    // loop explicitly continues on it (librtlsdr.c:1838-1841).
    if (r == -10 /* LIBUSB_ERROR_INTERRUPTED */) return 0;
    if (r < 0) return r;
    return 0;
  }

  void cancel_all() override {
    std::lock_guard<std::mutex> lk(mu_);
    for (auto& [xfer, holder] : active_) {
      (void)holder;
      Api().cancel_transfer(xfer);
    }
  }

  int bulk_read_sync(uint8_t* data, int len, int timeout_ms) override {
    int transferred = 0;
    int r = Api().bulk_transfer(devh_, kBulkEndpoint, data, len,
                                &transferred, (unsigned)timeout_ms);
    if (r == -4) lost_.store(true);
    return r < 0 ? r : transferred;
  }

  bool device_lost() const override { return lost_.load(); }

 private:
  struct Holder {
    LibusbTransport* self;
    UsbBulkTransfer* t;
    UsbBulkCallback cb;
  };

  static void OnComplete(libusb_transfer* xfer) {
    auto* holder = static_cast<Holder*>(xfer->user_data);
    LibusbTransport* self = holder->self;
    UsbBulkTransfer* t = holder->t;
    t->actual_length = xfer->actual_length;
    switch (xfer->status) {
      case LIBUSB_TRANSFER_COMPLETED:
        t->status = UsbStatus::kCompleted;
        break;
      case LIBUSB_TRANSFER_CANCELLED:
        t->status = UsbStatus::kCancelled;
        break;
      case LIBUSB_TRANSFER_NO_DEVICE:
        t->status = UsbStatus::kNoDevice;
        self->lost_.store(true);
        break;
      default:
        t->status = UsbStatus::kError;
        break;
    }
    UsbBulkCallback cb = std::move(holder->cb);
    {
      std::lock_guard<std::mutex> lk(self->mu_);
      self->active_.erase(xfer);
    }
    delete holder;
    Api().free_transfer(xfer);
    cb(t);
  }

  libusb_context* ctx_ = nullptr;
  libusb_device_handle* devh_ = nullptr;
  bool driver_was_active_ = false;
  std::atomic<bool> lost_{false};
  std::mutex mu_;
  std::unordered_map<libusb_transfer*, Holder*> active_;
};

}  // namespace

std::unique_ptr<UsbTransport> MakeLibusbTransport(uint32_t index) {
  if (!Api().ok()) {
    std::fprintf(stderr, "sdrcap-usb: libusb-1.0 not available\n");
    return nullptr;
  }
  auto t = std::make_unique<LibusbTransport>();
  if (!t->open(index)) return nullptr;
  return t;
}

}  // namespace sdrcap
