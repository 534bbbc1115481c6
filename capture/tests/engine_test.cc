// Native-layer unit tests: ordered queue semantics + capture contract.
// Plain asserts, no framework (exit 0 = pass), run by ctest/pytest.
#include <cassert>
#include <cstdio>
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
  assert(first == a);
  assert(q.pop_in_order() == b);
  assert(q.pop_in_order() == c);
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
  assert(stats.completed);
  assert(stats.retunes == 2);
  assert(bytes.size() == 3ull * cfg.samples_per_freq * 2);

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
  assert(p1 < p0 * 0.5);
  assert(p2 > p1);  // back at high gain
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
  assert(!stats.completed);
  assert(!stats.error.empty());
  std::puts("sink_abort OK");
}

// Gain requests snap to the tuner's discrete ladder (nearest_gain).
static void test_nearest_gain() {
  assert(NearestGainDb(28.0) == 28.0);
  assert(NearestGainDb(27.0) == 28.0);  // 27 → nearer to 28.0 than 25.4
  assert(NearestGainDb(-5.0) == 0.0);
  assert(NearestGainDb(60.0) == 49.6);
  std::puts("nearest_gain OK");
}

int main() {
  test_ordered_queue();
  test_capture_blocks();
  test_sink_abort();
  test_nearest_gain();
  std::puts("ALL NATIVE TESTS PASS");
  return 0;
}
