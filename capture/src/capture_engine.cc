#include "sdrcap/capture_engine.h"

#include <algorithm>
#include <cstdio>
#include <vector>

namespace sdrcap {

CaptureStats RunTwoFreqCapture(Device& dev, const CaptureConfig& cfg,
                               const ByteSink& sink) {
  CaptureStats stats;
  if (cfg.samples_per_freq == 0 || cfg.freq1_hz == 0 || cfg.freq2_hz == 0) {
    stats.error = "freq1, freq2 and samples_per_freq are required";
    return stats;
  }

  // Config failures abort up front: a capture at the wrong rate or
  // frequency is worse than no capture (the USB backend can genuinely
  // fail any of these — invalid resampler rate, PLL no-lock).
  if (!dev.set_sample_rate(cfg.sample_rate)) {
    stats.error = "set_sample_rate failed";
    return stats;
  }
  if (cfg.ppm != 0 && !dev.set_freq_correction_ppm(cfg.ppm)) {
    stats.error = "set_freq_correction_ppm failed";
    return stats;
  }
  // AGC hard-disabled before manual gains (rtl_sdr.c:262-268).
  dev.set_agc(false);
  if (!dev.set_tuner_gain_db(cfg.gain1_db) ||
      !dev.set_center_freq(cfg.freq1_hz)) {
    stats.error = "initial tune/gain failed";
    return stats;
  }

  const uint64_t block_bytes = cfg.samples_per_freq * 2;

  if (cfg.sync_mode) {
    // Blocking-read fallback (rtl_sdr.c:295-321): read each block with
    // read_sync, retuning between blocks. Sample-accurate by
    // construction — every read completes before the next tuning.
    std::vector<uint8_t> buf(std::min<uint64_t>(cfg.buf_len, block_bytes));
    for (int block = 0; block < 3; ++block) {
      if (block > 0) {
        const bool to_second = (block == 1);
        if (!dev.set_tuner_gain_db(to_second ? cfg.gain2_db : cfg.gain1_db) ||
            !dev.set_center_freq(to_second ? cfg.freq2_hz : cfg.freq1_hz)) {
          stats.error = "mid-capture retune failed";
          return stats;
        }
        ++stats.retunes;
      }
      uint64_t remaining = block_bytes;
      while (remaining > 0) {
        const size_t chunk =
            static_cast<size_t>(std::min<uint64_t>(buf.size(), remaining));
        if (!dev.read_sync(buf.data(), chunk)) {
          stats.error = "sync read failed";
          return stats;  // bytes_written already tracks what was sunk
        }
        if (!sink(buf.data(), chunk)) {
          stats.error = "sink write failed";
          return stats;
        }
        remaining -= chunk;
        stats.bytes_written += chunk;
      }
    }
    stats.transfer_errors = dev.transfer_errors();
    stats.completed = true;
    return stats;
  }

  // Samples in flight between generation and dispatch carry the OLD
  // tuning when a boundary retune fires — the transition region every
  // buffered SDR stream has. Cap the in-flight window to a fraction of
  // a block so the region stays negligible even for short captures
  // (with un-paced simulated producers it would otherwise swallow the
  // whole capture).
  size_t buf_len = cfg.buf_len;
  size_t num_buffers = cfg.num_buffers;
  const uint64_t inflight_budget = std::max<uint64_t>(block_bytes / 8, 4096);
  if (buf_len > inflight_budget) {
    buf_len = static_cast<size_t>(inflight_budget / 4096 * 4096);
    if (buf_len < 4096) buf_len = 4096;
  }
  while (num_buffers > 2 && num_buffers * buf_len > inflight_budget)
    --num_buffers;
  const uint64_t total_bytes = 3 * block_bytes;
  uint64_t written = 0;
  bool aborted = false;

  dev.read_async(
      [&](const uint8_t* data, size_t len) {
        size_t off = 0;
        while (off < len && written < total_bytes) {
          const uint64_t block = written / block_bytes;  // 0, 1, 2
          const uint64_t block_end = (block + 1) * block_bytes;
          const size_t chunk = static_cast<size_t>(
              std::min<uint64_t>(len - off, block_end - written));
          if (!sink(data + off, chunk)) {  // short-write abort
            stats.error = "sink write failed";
            aborted = true;
            dev.cancel_async();
            return;
          }
          written += chunk;
          off += chunk;
          if (written == block_end && written < total_bytes) {
            // Block boundary: retune + regain inline, on the dispatch
            // thread — the serialized queue guarantees no samples from
            // the old tuning arrive after this point
            // (rtl_sdr.c:122-135's double gain-set sandwich is folded
            // into one atomic device update here). A failed retune
            // (PLL no-lock) aborts: a wrong-frequency middle block
            // would poison the whole TDOA solve downstream.
            const bool to_second = (written == block_bytes);
            bool ok =
                dev.set_tuner_gain_db(to_second ? cfg.gain2_db
                                                : cfg.gain1_db) &&
                dev.set_center_freq(to_second ? cfg.freq2_hz
                                              : cfg.freq1_hz) &&
                dev.set_tuner_gain_db(to_second ? cfg.gain2_db
                                                : cfg.gain1_db);
            if (!ok) {
              stats.error = "mid-capture retune failed";
              aborted = true;
              dev.cancel_async();
              return;
            }
            ++stats.retunes;
          }
        }
        if (written >= total_bytes) dev.cancel_async();
      },
      buf_len, num_buffers);

  stats.bytes_written = written;
  stats.transfer_errors = dev.transfer_errors();
  stats.completed = !aborted && written == total_bytes;
  if (!stats.completed && stats.error.empty())
    stats.error = "capture ended before reaching 3*n samples";
  return stats;
}

CaptureStats CaptureToFile(Device& dev, const CaptureConfig& cfg,
                           const std::string& path) {
  FILE* f = std::fopen(path.c_str(), "wb");
  if (!f) {
    CaptureStats s;
    s.error = "cannot open output file: " + path;
    return s;
  }
  CaptureStats s = RunTwoFreqCapture(dev, cfg, [&](const uint8_t* d, size_t n) {
    return std::fwrite(d, 1, n, f) == n;
  });
  std::fclose(f);
  return s;
}

}  // namespace sdrcap
