// Network IQ streaming server — rtl_tcp.c capability, same wire protocol:
// a 12-byte "RTL0" header, then raw interleaved u8 I/Q; the client sends
// 5-byte commands (u8 opcode + u32 big-endian argument) on the same
// socket: 0x01 set frequency, 0x02 set sample rate, 0x04 set gain
// (tenths of dB). Command handling runs on its own thread
// (rtl_tcp.c:277 command_worker parity); streaming uses the ordered
// engine so retunes never tear a buffer.
//
//   sdr_server [-p port] [-a bind_addr] [--sim-seed N]
#include <arpa/inet.h>
#include <netinet/in.h>
#include <sys/socket.h>
#include <unistd.h>

#include <atomic>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <thread>

#include "sdrcap/backend.h"
#include "sdrcap/device.h"

namespace {

struct __attribute__((packed)) Command {
  uint8_t cmd;
  uint32_t param;  // big-endian on the wire
};

void command_worker(int fd, sdrcap::Device* dev, std::atomic<bool>* done) {
  Command c;
  while (!done->load()) {
    ssize_t n = recv(fd, &c, sizeof(c), MSG_WAITALL);
    if (n != sizeof(c)) break;
    const uint32_t param = ntohl(c.param);
    switch (c.cmd) {
      case 0x01:
        std::fprintf(stderr, "set freq %u\n", param);
        dev->set_center_freq(param);
        break;
      case 0x02:
        std::fprintf(stderr, "set sample rate %u\n", param);
        dev->set_sample_rate(param);
        break;
      case 0x04:
        std::fprintf(stderr, "set gain %.1f dB\n", param / 10.0);
        dev->set_tuner_gain_db(param / 10.0);
        break;
      case 0x03:
        // Tuner gain mode (0 auto / 1 manual). The sim device applies
        // manual gains unconditionally; acknowledged for protocol parity
        // with real rtl_tcp clients.
        std::fprintf(stderr, "set gain mode %s\n",
                     param ? "manual" : "auto");
        break;
      case 0x05:
        std::fprintf(stderr, "set ppm %d\n", (int)param);
        dev->set_freq_correction_ppm((int)param);
        break;
      case 0x08:
        dev->set_agc(param != 0);
        break;
      case 0x09:
        std::fprintf(stderr, "set direct sampling %u\n", param);
        dev->set_direct_sampling((int)param);
        break;
      case 0x0a:
        std::fprintf(stderr, "set offset tuning %u\n", param);
        dev->set_offset_tuning(param != 0);
        break;
      default:
        std::fprintf(stderr, "ignoring cmd 0x%02x\n", c.cmd);
    }
  }
  done->store(true);
  dev->cancel_async();
}

}  // namespace

int main(int argc, char** argv) {
  int port = 1234;
  const char* addr = "127.0.0.1";
  sdrcap::BackendOptions backend;
  backend.sim_realtime = true;  // network consumers need paced samples
  int max_clients = -1;  // serve forever by default; tests pass 1
  for (int i = 1; i < argc; ++i) {
    std::string a = argv[i];
    auto nextc = sdrcap::MakeNext(argc, argv, &i);
    if (a == "-p" && i + 1 < argc) port = std::atoi(argv[++i]);
    else if (a == "-a" && i + 1 < argc) addr = argv[++i];
    else if (sdrcap::ParseBackendFlag(a, nextc, &backend)) {}
    else if (a == "--once") max_clients = 1;
    else if (a == "--help") {
      std::fprintf(stderr, "Usage: sdr_server [-p port] [-a addr] [--once]\n%s",
                   sdrcap::BackendUsage());
      return 0;
    }
  }

  int srv = socket(AF_INET, SOCK_STREAM, 0);
  int one = 1;
  setsockopt(srv, SOL_SOCKET, SO_REUSEADDR, &one, sizeof(one));
  sockaddr_in sa{};
  sa.sin_family = AF_INET;
  sa.sin_port = htons(port);
  inet_pton(AF_INET, addr, &sa.sin_addr);
  if (bind(srv, (sockaddr*)&sa, sizeof(sa)) != 0 || listen(srv, 1) != 0) {
    std::perror("bind/listen");
    return 1;
  }
  std::fprintf(stderr, "listening on %s:%d\n", addr, port);

  int served = 0;
  while (max_clients < 0 || served < max_clients) {
    int fd = accept(srv, nullptr, nullptr);
    if (fd < 0) break;
    ++served;
    std::fprintf(stderr, "client connected\n");

    // Realtime pacing (sim backend): a networked consumer's control
    // commands must land mid-stream the way they do against real
    // hardware; without it the sim would generate the client's whole
    // capture before the first retune arrives. --usb serves a REAL
    // dongle over the rtl_tcp protocol.
    auto dev = sdrcap::OpenBackend(backend);
    if (!dev) { close(fd); continue; }
    dev->set_sample_rate(2'048'000);

    // Header: "RTL0", tuner type (5 = R820T), gain-stage count.
    uint8_t header[12] = {'R', 'T', 'L', '0'};
    uint32_t tuner_type = htonl(5), gain_count = htonl(29);
    std::memcpy(header + 4, &tuner_type, 4);
    std::memcpy(header + 8, &gain_count, 4);
    if (send(fd, header, sizeof(header), MSG_NOSIGNAL) != sizeof(header)) {
      close(fd);
      continue;
    }

    std::atomic<bool> done{false};
    std::thread cmd(command_worker, fd, dev.get(), &done);
    dev->read_async(
        [&](const uint8_t* data, size_t len) {
          if (done.load() ||
              send(fd, data, len, MSG_NOSIGNAL) != (ssize_t)len) {
            done.store(true);
            dev->cancel_async();
          }
        },
        // Small transfers bound how many samples are in flight past a
        // control command (rtl_tcp has no sample-accurate retune; this
        // keeps the slop to a few ms at 2 Msps).
        8192, 4);
    done.store(true);
    shutdown(fd, SHUT_RDWR);
    cmd.join();
    close(fd);
    std::fprintf(stderr, "client disconnected\n");
  }
  close(srv);
  return 0;
}
