// Ordered transfer queue: the load-bearing concurrency design of the
// reference's librtlsdr fork, re-implemented with modern C++.
//
// The fork's key change (SURVEY.md L0): libusb completion callbacks do
// NOT invoke user code; they only append the finished transfer to a
// linked list (librtlsdr.c:96-111, 1661-1677), and the event loop drains
// the list and invokes the user callback serially, in submission order,
// then resubmits each buffer (librtlsdr.c:1826-1870). That ordering is
// what makes mid-stream retunes produce exactly-3xN contiguous blocks
// with zero sample loss.
//
// Here: producer threads (device I/O) push filled buffers; a single
// dispatcher pops in FIFO order, runs the user callback (which may
// retune), and recycles the buffer to the free pool. Bounded, blocking,
// loss-free by construction.
#pragma once

#include <condition_variable>
#include <cstdint>
#include <deque>
#include <mutex>
#include <vector>

namespace sdrcap {

struct Transfer {
  std::vector<uint8_t> data;
  size_t len = 0;        // valid bytes
  uint64_t sequence = 0; // submission order
};

class OrderedTransferQueue {
 public:
  explicit OrderedTransferQueue(size_t num_buffers, size_t buf_len);

  // Producer: take an empty buffer to fill (blocks when all in flight).
  // Returns nullptr after shutdown.
  Transfer* acquire_free();

  // Producer: hand a filled buffer to the dispatcher. Buffers complete
  // in acquisition order; completion may arrive out of order (as USB
  // transfers can) — dispatch still releases strictly by sequence.
  void submit_filled(Transfer* t);

  // Dispatcher: pop the next buffer in sequence order (blocks).
  // Returns nullptr after shutdown.
  Transfer* pop_in_order();

  // Dispatcher: recycle a dispatched buffer into the free pool.
  void release(Transfer* t);

  void shutdown();
  bool is_shutdown() const;

 private:
  mutable std::mutex mu_;
  std::condition_variable free_cv_;
  std::condition_variable filled_cv_;
  std::vector<Transfer> storage_;
  std::deque<Transfer*> free_;
  std::deque<Transfer*> filled_;  // kept sorted by sequence on insert
  uint64_t next_acquire_seq_ = 0;
  uint64_t next_dispatch_seq_ = 0;
  bool shutdown_ = false;
};

}  // namespace sdrcap
