// Native core for the autocorrelation pitch tracker (dsp/pitch.py).
//
// Replaces the per-frame Python loops (candidate peak picking with parabolic
// interpolation, and the Viterbi path search) — the only scalar-loop hot
// spots in offline binarization.  Built as a shared library and called via
// ctypes; dsp/pitch.py falls back to the pure-numpy implementation when the
// library is unavailable.
//
// Algorithm parity: Boersma (1993) as described in dsp/pitch.py.

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <vector>

extern "C" {

// r:         [F, frame_len] normalized autocorrelation
// cand_freq: [F, max_cand]  out, slot 0 left untouched (unvoiced candidate)
// cand_str:  [F, max_cand]  out
void pitch_candidates(
    const double* r, int64_t F, int64_t frame_len,
    int64_t lag_min, int64_t lag_max, int64_t max_cand,
    double octave_cost, double f0_min, double f0_max, double samplerate,
    double* cand_freq, double* cand_str) {
  std::vector<std::pair<double, int64_t>> peaks;
  for (int64_t fi = 0; fi < F; ++fi) {
    const double* row = r + fi * frame_len;
    peaks.clear();
    for (int64_t tau = lag_min; tau <= lag_max; ++tau) {
      const double y1 = row[tau];
      if (y1 > row[tau - 1] && y1 >= row[tau + 1]) {
        peaks.emplace_back(-y1, tau);  // negative for ascending sort
      }
    }
    const int64_t n = std::min<int64_t>((int64_t)peaks.size(), max_cand - 1);
    std::partial_sort(peaks.begin(), peaks.begin() + n, peaks.end());
    double* cf = cand_freq + fi * max_cand;
    double* cs = cand_str + fi * max_cand;
    int64_t ci = 1;
    for (int64_t p = 0; p < n; ++p) {
      const int64_t tau = peaks[p].second;
      const double y0 = row[tau - 1], y1 = row[tau], y2 = row[tau + 1];
      const double denom = y0 - 2.0 * y1 + y2;
      double delta = std::fabs(denom) > 1e-12 ? 0.5 * (y0 - y2) / denom : 0.0;
      delta = std::max(-0.5, std::min(0.5, delta));
      const double lag = (double)tau + delta;
      const double freq = samplerate / lag;
      if (freq < f0_min || freq > f0_max) continue;
      const double strength =
          std::min(y1 + 0.5 * std::fabs(denom) * delta * delta, 1.0);
      cf[ci] = freq;
      cs[ci] = strength - octave_cost * std::log2(f0_min / freq);
      ++ci;
    }
  }
}

// Viterbi over candidates.  cand_freq/cand_str: [F, C]; path: [F] out.
void pitch_viterbi(
    const double* cand_freq, const double* cand_str, int64_t F, int64_t C,
    double octave_jump_cost, double vuv_cost, int32_t* path) {
  std::vector<double> prev_cost(C), cur_cost(C);
  std::vector<int32_t> ptr((size_t)F * C);
  for (int64_t c = 0; c < C; ++c) prev_cost[c] = -cand_str[c];
  for (int64_t fi = 1; fi < F; ++fi) {
    const double* fprev = cand_freq + (fi - 1) * C;
    const double* fcur = cand_freq + fi * C;
    const double* scur = cand_str + fi * C;
    for (int64_t j = 0; j < C; ++j) {
      double best = 1e300;
      int32_t best_i = 0;
      const bool uv_cur = fcur[j] == 0.0;
      for (int64_t i = 0; i < C; ++i) {
        const bool uv_prev = fprev[i] == 0.0;
        double trans = 0.0;
        if (!uv_prev && !uv_cur) {
          trans = octave_jump_cost *
                  std::fabs(std::log2(fprev[i] / std::max(fcur[j], 1e-12)));
        } else if (uv_prev != uv_cur) {
          trans = vuv_cost;
        }
        const double total = prev_cost[i] + trans;
        if (total < best) { best = total; best_i = (int32_t)i; }
      }
      cur_cost[j] = best - scur[j];
      ptr[fi * C + j] = best_i;
    }
    std::swap(prev_cost, cur_cost);
  }
  int32_t best_last = 0;
  double best = 1e300;
  for (int64_t c = 0; c < C; ++c) {
    if (prev_cost[c] < best) { best = prev_cost[c]; best_last = (int32_t)c; }
  }
  path[F - 1] = best_last;
  for (int64_t fi = F - 1; fi > 0; --fi) {
    path[fi - 1] = ptr[fi * C + path[fi]];
  }
}

// Overlap-add iSTFT accumulation core (dsp/hnsep.py istft loop).
// frames: [n_frames, n_fft] windowed time frames; out/norm: [total]
void overlap_add(
    const double* frames, const double* window_sq,
    int64_t n_frames, int64_t n_fft, int64_t hop,
    double* out, double* norm) {
  for (int64_t i = 0; i < n_frames; ++i) {
    const double* fr = frames + i * n_fft;
    double* o = out + i * hop;
    double* nw = norm + i * hop;
    for (int64_t j = 0; j < n_fft; ++j) {
      o[j] += fr[j];
      nw[j] += window_sq[j];
    }
  }
}

}  // extern "C"
