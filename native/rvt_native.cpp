// Native host-side kernels for rvt_tpu (C ABI, loaded via ctypes).
//
// The reference relies on third-party native code for these hot host loops:
//   * detectron2's COCOeval_opt (C++) / pycocotools (C) for mAP matching
//     (utils/evaluation/prophesee/metrics/coco_eval.py:16-22),
//   * numba @jit for the event-time repair loop and torch ATen scatter for
//     voxelization (scripts/genx/preprocess_dataset.py:163-172,
//     data/utils/representations.py:111-117).
// This file provides first-party equivalents:
//   * coco_match_image: greedy detection<->GT matching for one
//     (image, category) pair across all IoU thresholds,
//   * stacked_histogram_u8: event scatter-add voxelizer,
//   * time_running_max: monotonic-time repair.
//
// Build: make -C native   (g++ -O3 -shared -fPIC)

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>

extern "C" {

// Greedy COCO bbox matching, identical semantics to pycocotools evaluateImg:
// detections in descending-score order take the unmatched GT with the
// highest IoU >= threshold; ignored GTs sort last and absorb detections
// without penalty. gts must be ordered non-ignored first.
//
// ious:      [D, G] row-major IoU matrix
// gt_ignore: [G] 0/1
// thrs:      [T] IoU thresholds
// dt_out_of_range: [D] 0/1 (detection area outside the range bucket)
// out_matched: [T, D] 0/1, out_ignored: [T, D] 0/1
void coco_match_image(const double* ious, int D, int G,
                      const uint8_t* gt_ignore, const double* thrs, int T,
                      const uint8_t* dt_out_of_range,
                      uint8_t* out_matched, uint8_t* out_ignored) {
  // gt match slots per threshold
  for (int ti = 0; ti < T; ++ti) {
    double thr = std::min(thrs[ti], 1.0 - 1e-10);
    // -1 = unmatched
    int* gtm = new int[G];
    std::fill(gtm, gtm + G, -1);
    for (int d = 0; d < D; ++d) {
      double best_iou = thr;
      int best_g = -1;
      const double* row = ious + (size_t)d * G;
      for (int g = 0; g < G; ++g) {
        if (gtm[g] >= 0) continue;
        if (best_g > -1 && !gt_ignore[best_g] && gt_ignore[g]) break;
        if (row[g] < best_iou) continue;
        best_iou = row[g];
        best_g = g;
      }
      uint8_t matched = best_g >= 0;
      out_matched[(size_t)ti * D + d] = matched;
      if (matched) {
        gtm[best_g] = d;
        out_ignored[(size_t)ti * D + d] = gt_ignore[best_g];
      } else {
        out_ignored[(size_t)ti * D + d] = dt_out_of_range[d];
      }
    }
    delete[] gtm;
  }
}

// StackedHistogram voxelizer (representations.py:76-121 semantics):
// counts per (polarity, time-bin, y, x) cell.
// fastmode != 0 reproduces the reference default (uint8 accumulation that
// wraps mod 256 on hot pixels, then clamp to count_cutoff) — required for
// bit-parity with reference-preprocessed datasets. fastmode == 0 saturates
// at count_cutoff (reference fastmode=False int16+clip semantics).
// t must be sorted ascending. out: [2*bins*height*width] uint8, zeroed here.
void stacked_histogram_u8(const int32_t* x, const int32_t* y,
                          const int32_t* p, const int64_t* t, int64_t n,
                          int bins, int height, int width, int count_cutoff,
                          int fastmode, uint8_t* out) {
  const int64_t hw = (int64_t)height * width;
  const int64_t total = (int64_t)(2 * bins) * hw;
  std::memset(out, 0, (size_t)total);
  if (n <= 0) return;
  const int64_t t0 = t[0];
  const int64_t dt = std::max<int64_t>(t[n - 1] - t0, 1);
  for (int64_t i = 0; i < n; ++i) {
    int ti = (int)(((double)(t[i] - t0) / (double)dt) * bins);
    ti = std::min(ti, bins - 1);
    const int64_t idx = ((int64_t)p[i] * bins + ti) * hw
                        + (int64_t)y[i] * width + x[i];
    if (fastmode) {
      out[idx] = (uint8_t)(out[idx] + 1);  // wraps like torch uint8 put_
    } else {
      const int v = out[idx];
      if (v < count_cutoff) out[idx] = (uint8_t)(v + 1);
    }
  }
  if (fastmode && count_cutoff < 255) {
    for (int64_t i = 0; i < total; ++i)
      if (out[i] > count_cutoff) out[i] = (uint8_t)count_cutoff;
  }
}

// MixedDensityEventStack voxelizer (representations.py:130-218 semantics):
// log2-spaced time bins, polarity +/-1 accumulated in int8 (wrapping, like
// torch put_ on int8), then per-channel prefix sum computed in int64 and
// wrap-cast back to int8 (torch cumsum_channel assigns an int64 sum into an
// int8 tensor), finally clamped to +/-count_cutoff when cutoff >= 0.
// out: [bins*height*width] int8, zeroed here.
void mixed_density_stack_i8(const int32_t* x, const int32_t* y,
                            const int32_t* p, const int64_t* t, int64_t n,
                            int bins, int height, int width, int count_cutoff,
                            int8_t* out) {
  const int64_t hw = (int64_t)height * width;
  std::memset(out, 0, (size_t)bins * hw);
  if (n <= 0) return;
  const int64_t t0 = t[0];
  const double dt = (double)std::max<int64_t>(t[n - 1] - t0, 1);
  const double log_half = std::log(0.5);
  for (int64_t i = 0; i < n; ++i) {
    double t_norm = (double)(t[i] - t0) / dt;
    t_norm = std::min(std::max(t_norm, 1e-6), 1.0 - 1e-6);
    double bin_f = (double)bins - std::log(t_norm) / log_half;
    if (bin_f < 0.0) bin_f = 0.0;
    int ti = std::min((int)bin_f, bins - 1);
    const int64_t idx = (int64_t)ti * hw + (int64_t)y[i] * width + x[i];
    out[idx] = (int8_t)(out[idx] + (p[i] > 0 ? 1 : -1));
  }
  // reverse-order in-place channel prefix sums over the original values:
  // channel c <- sum(channels 0..c); iterate c descending so sources stay
  // original (matches cumsum_channel, representations.py:124-127).
  for (int c = bins - 1; c >= 0; --c) {
    for (int64_t j = 0; j < hw; ++j) {
      int64_t s = 0;
      for (int k = 0; k <= c; ++k) s += out[(int64_t)k * hw + j];
      out[(int64_t)c * hw + j] = (int8_t)s;  // wrap-cast like torch
    }
  }
  if (count_cutoff >= 0) {
    for (int64_t i = 0; i < (int64_t)bins * hw; ++i) {
      if (out[i] > count_cutoff) out[i] = (int8_t)count_cutoff;
      else if (out[i] < -count_cutoff) out[i] = (int8_t)(-count_cutoff);
    }
  }
}

// Monotonic-time repair: running max in place
// (== scripts/genx/preprocess_dataset.py:163-172).
void time_running_max(int64_t* t, int64_t n) {
  int64_t last = 0;
  for (int64_t i = 0; i < n; ++i) {
    if (t[i] < last) t[i] = last;
    else last = t[i];
  }
}

}  // extern "C"
