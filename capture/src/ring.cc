#include "sdrcap/ring.h"

#include <algorithm>

namespace sdrcap {

OrderedTransferQueue::OrderedTransferQueue(size_t num_buffers, size_t buf_len)
    : storage_(num_buffers) {
  for (auto& t : storage_) {
    t.data.resize(buf_len);
    free_.push_back(&t);
  }
}

Transfer* OrderedTransferQueue::acquire_free() {
  std::unique_lock<std::mutex> lk(mu_);
  free_cv_.wait(lk, [&] { return shutdown_ || !free_.empty(); });
  if (shutdown_) return nullptr;
  Transfer* t = free_.front();
  free_.pop_front();
  t->sequence = next_acquire_seq_++;
  t->len = 0;
  return t;
}

void OrderedTransferQueue::submit_filled(Transfer* t) {
  std::lock_guard<std::mutex> lk(mu_);
  // Insert keeping the deque sorted by sequence so out-of-order
  // completions (possible with multiple in-flight USB transfers) never
  // reorder dispatch.
  auto it = std::upper_bound(
      filled_.begin(), filled_.end(), t,
      [](const Transfer* a, const Transfer* b) {
        return a->sequence < b->sequence;
      });
  filled_.insert(it, t);
  filled_cv_.notify_all();
}

Transfer* OrderedTransferQueue::pop_in_order() {
  std::unique_lock<std::mutex> lk(mu_);
  filled_cv_.wait(lk, [&] {
    return shutdown_ ||
           (!filled_.empty() &&
            filled_.front()->sequence == next_dispatch_seq_);
  });
  if (shutdown_ && (filled_.empty() ||
                    filled_.front()->sequence != next_dispatch_seq_))
    return nullptr;
  Transfer* t = filled_.front();
  filled_.pop_front();
  ++next_dispatch_seq_;
  return t;
}

void OrderedTransferQueue::release(Transfer* t) {
  std::lock_guard<std::mutex> lk(mu_);
  free_.push_back(t);
  free_cv_.notify_all();
}

void OrderedTransferQueue::shutdown() {
  std::lock_guard<std::mutex> lk(mu_);
  shutdown_ = true;
  free_cv_.notify_all();
  filled_cv_.notify_all();
}

bool OrderedTransferQueue::is_shutdown() const {
  std::lock_guard<std::mutex> lk(mu_);
  return shutdown_;
}

}  // namespace sdrcap
