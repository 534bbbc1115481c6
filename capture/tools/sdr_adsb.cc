// 1090 MHz ADS-B frame detector — rtl_adsb.c capability: magnitude
// stream → preamble correlation → PPM bit slicing → hex frames. The sim
// front-end does not emit Mode S, so the tool reads u8 IQ files (and
// has --selftest, which synthesizes a frame, decodes it back, and
// verifies round trip — the hardware-free validation path).
//
//   sdr_adsb -i capture.iq          # decode a file (2 Msps IQ)
//   sdr_adsb --selftest
#include <cmath>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <string>
#include <vector>

namespace {

// At 2 Msps each ADS-B symbol (0.5 us) is one sample; a bit is two
// symbols (PPM: 10 = 1, 01 = 0). Preamble: pulses at symbol 0,2,7,9.
constexpr int kPreambleSyms = 16;
constexpr int kShortBits = 56, kLongBits = 112;

std::vector<uint8_t> decode_frame(const double* mag, int bits) {
  std::vector<uint8_t> bytes((bits + 7) / 8, 0);
  for (int b = 0; b < bits; ++b) {
    const double first = mag[kPreambleSyms + 2 * b];
    const double second = mag[kPreambleSyms + 2 * b + 1];
    if (first > second) bytes[b / 8] |= 0x80 >> (b % 8);
  }
  return bytes;
}

bool preamble_at(const double* mag, double thresh) {
  static const int hi[] = {0, 2, 7, 9};
  static const int lo[] = {1, 3, 4, 5, 6, 8, 10, 11, 12, 13, 14, 15};
  double hi_min = 1e30, lo_max = 0;
  for (int s : hi) hi_min = std::min(hi_min, mag[s]);
  for (int s : lo) lo_max = std::max(lo_max, mag[s]);
  return hi_min > thresh && hi_min > 2.0 * lo_max;
}

void scan(const std::vector<double>& mag, FILE* out, int* count) {
  const size_t need = kPreambleSyms + 2 * kLongBits;
  for (size_t i = 0; i + need < mag.size(); ++i) {
    if (!preamble_at(&mag[i], 0.04)) continue;
    auto frame = decode_frame(&mag[i], kLongBits);
    const int df = frame[0] >> 3;
    const int bits = (df >= 16) ? kLongBits : kShortBits;
    frame.resize((bits + 7) / 8);
    std::fprintf(out, "*");
    for (uint8_t v : frame) std::fprintf(out, "%02x", v);
    std::fprintf(out, ";\n");
    ++*count;
    i += kPreambleSyms + 2 * bits;
  }
}

std::vector<double> synthesize(const std::vector<uint8_t>& frame_bytes) {
  // Quiet air, one frame, quiet air.
  std::vector<double> mag(400, 0.01);
  const size_t start = 100;
  static const int hi[] = {0, 2, 7, 9};
  for (int s : hi) mag[start + s] = 0.8;
  const int bits = (int)frame_bytes.size() * 8;
  for (int b = 0; b < bits; ++b) {
    const bool one = frame_bytes[b / 8] & (0x80 >> (b % 8));
    mag[start + kPreambleSyms + 2 * b] = one ? 0.8 : 0.02;
    mag[start + kPreambleSyms + 2 * b + 1] = one ? 0.02 : 0.8;
  }
  return mag;
}

}  // namespace

int main(int argc, char** argv) {
  std::string in_path;
  bool selftest = false;
  for (int i = 1; i < argc; ++i) {
    std::string a = argv[i];
    if (a == "-i" && i + 1 < argc) in_path = argv[++i];
    else if (a == "--selftest") selftest = true;
    else if (a == "--help") {
      std::fprintf(stderr, "Usage: sdr_adsb (-i file.iq | --selftest)\n");
      return 0;
    }
  }

  if (selftest) {
    // DF17 frame: first byte 0x8d (DF=17), arbitrary payload.
    std::vector<uint8_t> want = {0x8d, 0x48, 0x40, 0xd6, 0x20, 0x2c, 0xc3,
                                 0x71, 0xc3, 0x2c, 0xe0, 0x57, 0x60, 0x98};
    auto mag = synthesize(want);
    char buf[256];
    FILE* mem = fmemopen(buf, sizeof(buf), "w");
    int count = 0;
    scan(mag, mem, &count);
    std::fclose(mem);
    std::string got(buf);
    char expect[64] = "*";
    for (uint8_t v : want) std::sprintf(expect + std::strlen(expect), "%02x", v);
    std::strcat(expect, ";");
    const bool ok = count == 1 && got.find(expect) != std::string::npos;
    std::printf("selftest frame: %s", got.c_str());
    std::printf("%s\n", ok ? "SELFTEST PASS" : "SELFTEST FAIL");
    return ok ? 0 : 1;
  }

  if (in_path.empty()) {
    std::fprintf(stderr, "Usage: sdr_adsb (-i file.iq | --selftest)\n");
    return 2;
  }
  FILE* in = std::fopen(in_path.c_str(), "rb");
  if (!in) { std::perror("open"); return 1; }
  std::vector<uint8_t> raw(1 << 20);
  std::vector<double> mag;
  int count = 0;
  size_t n;
  while ((n = std::fread(raw.data(), 1, raw.size(), in)) > 0) {
    mag.resize(n / 2);
    for (size_t k = 0; k + 1 < n; k += 2) {
      const double re = (raw[k] - 127.5) / 127.5;
      const double im = (raw[k + 1] - 127.5) / 127.5;
      mag[k / 2] = re * re + im * im;
    }
    scan(mag, stdout, &count);
  }
  std::fclose(in);
  std::fprintf(stderr, "%d frames detected\n", count);
  return 0;
}
