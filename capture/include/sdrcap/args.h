// Shared CLI argument parsing for the capture tools.
//
// The reference parses every frequency/rate argument through atofs and
// durations through atoft/atofp (librtlsdr-2freq/src/convenience/
// convenience.c:39-101), so "-f 162.4M", "-s 2M", "-i 15m" work across
// all its tools. These helpers give the sdrcap tools the same surface.
#pragma once

#include <cstdlib>
#include <cstring>
#include <string>
#include <vector>

namespace sdrcap {

// "162.4M" -> 162.4e6; suffixes k/K, m/M, g/G. Plain numbers pass
// through (convenience.c:39-64 atofs parity).
inline double ParseFreq(const std::string& s) {
  if (s.empty()) return 0.0;
  double mult = 1.0;
  switch (s.back()) {
    case 'g': case 'G': mult = 1e9; break;
    case 'm': case 'M': mult = 1e6; break;
    case 'k': case 'K': mult = 1e3; break;
    default: return std::atof(s.c_str());
  }
  return mult * std::atof(s.substr(0, s.size() - 1).c_str());
}

// "15m" -> 900 s; suffixes s (seconds), m (minutes), h (hours), or
// plain seconds (convenience.c:66-87 atoft parity). Note the collision
// with ParseFreq's 'm': duration flags use this parser, frequency
// flags use ParseFreq, exactly like the reference splits atoft/atofs.
inline double ParseTime(const std::string& s) {
  if (s.empty()) return 0.0;
  double mult = 1.0;
  switch (s.back()) {
    case 'h': case 'H': mult = 3600.0; break;
    case 'm': case 'M': mult = 60.0; break;
    case 's': case 'S': mult = 1.0; break;
    default: return std::atof(s.c_str());
  }
  return mult * std::atof(s.substr(0, s.size() - 1).c_str());
}

// Expand one -f argument into tuning frequencies: either a single
// frequency or a "low:high:step" range (rtl_fm.c:1056-1066
// frequency_range parity — endpoints inclusive).
inline bool ParseFreqSpec(const std::string& s, std::vector<double>* out) {
  const size_t c1 = s.find(':');
  if (c1 == std::string::npos) {
    const double f = ParseFreq(s);
    if (f <= 0) return false;
    out->push_back(f);
    return true;
  }
  const size_t c2 = s.find(':', c1 + 1);
  if (c2 == std::string::npos) return false;
  const double lo = ParseFreq(s.substr(0, c1));
  const double hi = ParseFreq(s.substr(c1 + 1, c2 - c1 - 1));
  const double step = ParseFreq(s.substr(c2 + 1));
  if (lo <= 0 || hi < lo || step <= 0) return false;
  for (double f = lo; f <= hi + 0.5; f += step) out->push_back(f);
  return true;
}

}  // namespace sdrcap
