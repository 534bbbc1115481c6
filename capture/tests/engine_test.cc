// Native-layer unit tests: ordered queue semantics + capture contract.
// No framework (exit 0 = pass), run by ctest/pytest. CHECK always
// evaluates and aborts on failure — assert() would vanish under the
// Release build's NDEBUG and take its side-effecting arguments with it.
#include <cstdio>
#include <cstdlib>

#define CHECK(cond)                                                     \
  do {                                                                  \
    if (!(cond)) {                                                      \
      std::fprintf(stderr, "CHECK failed: %s (%s:%d)\n", #cond,         \
                   __FILE__, __LINE__);                                 \
      std::abort();                                                     \
    }                                                                   \
  } while (0)
#include <cstring>
#include <thread>
#include <vector>

#include "sdrcap/capture_engine.h"
#include "sdrcap/device.h"
#include "sdrcap/ring.h"

using namespace sdrcap;

// Out-of-order completion must not reorder dispatch (the property the
// reference fork's linked-list redesign exists to provide).
static void test_ordered_queue() {
  OrderedTransferQueue q(4, 8);
  Transfer* a = q.acquire_free();  // seq 0
  Transfer* b = q.acquire_free();  // seq 1
  Transfer* c = q.acquire_free();  // seq 2
  b->len = 1;
  c->len = 2;
  a->len = 3;
  q.submit_filled(b);  // completes out of order
  q.submit_filled(c);
  std::thread t([&] {
    std::this_thread::sleep_for(std::chrono::milliseconds(20));
    q.submit_filled(a);
  });
  Transfer* first = q.pop_in_order();  // must block until seq 0 arrives
  CHECK(first == a);
  CHECK(q.pop_in_order() == b);
  CHECK(q.pop_in_order() == c);
  t.join();
  q.release(a); q.release(b); q.release(c);
  std::puts("ordered_queue OK");
}

// Capture must deliver exactly 3*n samples with retunes at block
// boundaries and a visible signal change across them.
static void test_capture_blocks() {
  auto dev = MakeSimDevice(7);
  CaptureConfig cfg;
  cfg.freq1_hz = 162'400'000;
  cfg.freq2_hz = 101'900'000;
  cfg.gain1_db = 30.0;
  cfg.gain2_db = 10.0;  // much lower gain on block 2
  cfg.samples_per_freq = 100'000;
  cfg.buf_len = 16'384;
  cfg.num_buffers = 4;

  std::vector<uint8_t> bytes;
  auto stats = RunTwoFreqCapture(*dev, cfg, [&](const uint8_t* d, size_t n) {
    bytes.insert(bytes.end(), d, d + n);
    return true;
  });
  CHECK(stats.completed);
  CHECK(stats.retunes == 2);
  CHECK(bytes.size() == 3ull * cfg.samples_per_freq * 2);

  // Per-block mean power: gain 10 dB (block 2) must be well below 30 dB.
  auto power = [&](size_t block) {
    const size_t n = cfg.samples_per_freq * 2;
    double acc = 0;
    for (size_t i = block * n; i < (block + 1) * n; ++i) {
      const double v = (bytes[i] - 127.5) / 127.5;
      acc += v * v;
    }
    return acc / n;
  };
  const double p0 = power(0), p1 = power(1), p2 = power(2);
  CHECK(p1 < p0 * 0.5);
  CHECK(p2 > p1);  // back at high gain
  std::printf("capture_blocks OK (powers %.4f / %.4f / %.4f)\n", p0, p1, p2);
}

// Sink failure must abort the capture (short-write abort).
static void test_sink_abort() {
  auto dev = MakeSimDevice(9);
  CaptureConfig cfg;
  cfg.freq1_hz = 1'000'000;
  cfg.freq2_hz = 2'000'000;
  cfg.samples_per_freq = 1'000'000;
  size_t seen = 0;
  auto stats = RunTwoFreqCapture(*dev, cfg, [&](const uint8_t*, size_t n) {
    seen += n;
    return seen < 100'000;  // fail after ~100 kB
  });
  CHECK(!stats.completed);
  CHECK(!stats.error.empty());
  std::puts("sink_abort OK");
}

// Gain requests snap to the tuner's discrete ladder (nearest_gain).
static void test_nearest_gain() {
  CHECK(NearestGainDb(28.0) == 28.0);
  CHECK(NearestGainDb(27.0) == 28.0);  // 27 → nearer to 28.0 than 25.4
  CHECK(NearestGainDb(-5.0) == 0.0);
  CHECK(NearestGainDb(60.0) == 49.6);
  std::puts("nearest_gain OK");
}

// Full 2-frequency capture through the rtl_tcp wire protocol: an
// in-process server (RTL0 handshake, 5-byte command channel, sim-device
// stream) serves a TcpDevice client; the engine's retunes must reach the
// remote device and the byte contract must hold end-to-end.
#include <arpa/inet.h>
#include <netinet/in.h>
#include <sys/socket.h>
#include <unistd.h>

#include <atomic>

static void test_tcp_capture() {
  int srv = socket(AF_INET, SOCK_STREAM, 0);
  int one = 1;
  setsockopt(srv, SOL_SOCKET, SO_REUSEADDR, &one, sizeof(one));
  sockaddr_in sa{};
  sa.sin_family = AF_INET;
  sa.sin_port = 0;  // ephemeral
  inet_pton(AF_INET, "127.0.0.1", &sa.sin_addr);
  CHECK(bind(srv, (sockaddr*)&sa, sizeof(sa)) == 0);
  CHECK(listen(srv, 1) == 0);
  socklen_t slen = sizeof(sa);
  CHECK(getsockname(srv, (sockaddr*)&sa, &slen) == 0);
  const int port = ntohs(sa.sin_port);

  std::atomic<int> server_retunes{0};
  std::thread server([&] {
    int fd = accept(srv, nullptr, nullptr);
    CHECK(fd >= 0);
    uint8_t header[12] = {'R', 'T', 'L', '0'};
    CHECK(send(fd, header, sizeof(header), MSG_NOSIGNAL) ==
           (ssize_t)sizeof(header));
    auto dev = MakeSimDevice(21);
    std::atomic<bool> done{false};
    std::thread cmd([&] {
      uint8_t buf[5];
      while (!done.load()) {
        ssize_t n = recv(fd, buf, sizeof(buf), MSG_WAITALL);
        if (n != (ssize_t)sizeof(buf)) break;
        uint32_t param;
        std::memcpy(&param, buf + 1, 4);
        param = ntohl(param);
        if (buf[0] == 0x01) {
          dev->set_center_freq(param);
          ++server_retunes;
        } else if (buf[0] == 0x02) {
          dev->set_sample_rate(param);
        } else if (buf[0] == 0x04) {
          dev->set_tuner_gain_db(param / 10.0);
        }
      }
      done.store(true);
      dev->cancel_async();
    });
    dev->read_async(
        [&](const uint8_t* d, size_t n) {
          if (done.load() || send(fd, d, n, MSG_NOSIGNAL) != (ssize_t)n) {
            done.store(true);
            dev->cancel_async();
          }
        },
        16384, 4);
    done.store(true);
    shutdown(fd, SHUT_RDWR);
    cmd.join();
    close(fd);
  });

  auto dev = MakeTcpDevice("127.0.0.1", port);
  CHECK(dev != nullptr);
  CaptureConfig cfg;
  cfg.freq1_hz = 162'400'000;
  cfg.freq2_hz = 101'900'000;
  cfg.gain1_db = 30.0;
  cfg.gain2_db = 10.0;
  cfg.samples_per_freq = 50'000;
  cfg.buf_len = 16'384;
  cfg.num_buffers = 4;
  std::vector<uint8_t> bytes;
  auto stats = RunTwoFreqCapture(*dev, cfg, [&](const uint8_t* d, size_t n) {
    bytes.insert(bytes.end(), d, d + n);
    return true;
  });
  CHECK(stats.completed);
  CHECK(stats.retunes == 2);
  CHECK(bytes.size() == 3ull * cfg.samples_per_freq * 2);
  dev.reset();  // closes the socket; server unblocks
  server.join();
  close(srv);
  // Initial tune + 2 in-stream retunes all crossed the wire.
  CHECK(server_retunes.load() >= 3);
  std::puts("tcp_capture OK");
}

int main() {
  test_ordered_queue();
  test_capture_blocks();
  test_sink_abort();
  test_nearest_gain();
  test_tcp_capture();
  std::puts("ALL NATIVE TESTS PASS");
  return 0;
}
