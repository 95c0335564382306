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
// counts per (polarity, time-bin, y, x) cell, clipped to count_cutoff.
// t must be sorted ascending. out: [2*bins*height*width] uint8, zeroed here.
void stacked_histogram_u8(const int32_t* x, const int32_t* y,
                          const int32_t* p, const int64_t* t, int64_t n,
                          int bins, int height, int width, int count_cutoff,
                          uint8_t* out) {
  const int64_t hw = (int64_t)height * width;
  std::memset(out, 0, (size_t)(2 * bins) * hw);
  if (n <= 0) return;
  const int64_t t0 = t[0];
  const int64_t dt = std::max<int64_t>(t[n - 1] - t0, 1);
  for (int64_t i = 0; i < n; ++i) {
    int ti = (int)(((double)(t[i] - t0) / (double)dt) * bins);
    ti = std::min(ti, bins - 1);
    const int64_t idx = ((int64_t)p[i] * bins + ti) * hw
                        + (int64_t)y[i] * width + x[i];
    const int v = out[idx];
    if (v < count_cutoff) out[idx] = (uint8_t)(v + 1);
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
