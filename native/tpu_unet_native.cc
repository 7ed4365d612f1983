// Native host kernels for tpu_unet's ingest path.
//
// The reference leans on OpenCV/scipy C++ internals on the host for exact
// Euclidean distance transforms, connected components and morphological
// dilation (reference functions.py:47,58; data.py:206-213 — SURVEY.md §2.13).
// The device (XLA/Pallas) replacements live in tpu_unet/ops; these native
// equivalents serve the host-side ingest path (dataset preprocessing at load
// time) and double as an oracle independent of cv2.
//
// Exposed via a plain C ABI for ctypes (no pybind11 in this toolchain).

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <limits>
#include <vector>

namespace {

constexpr float kInf = std::numeric_limits<float>::infinity();

// Large finite stand-in for +inf: keeps the parabola arithmetic finite
// (the classic dt1d breaks on real infinities). Any value > h^2 + w^2 of the
// largest supported image works; outputs >= kBig/2 are mapped back to inf.
constexpr double kBig = 1e12;

// Felzenszwalb & Huttenlocher 1D squared distance transform (lower envelope
// of parabolas). f: input costs; d: output min_q (p-q)^2 + f[q].
void dt1d(const double* f, int n, double* d, int* v, double* z) {
  int k = 0;
  v[0] = 0;
  z[0] = -kInf;
  z[1] = kInf;
  for (int q = 1; q < n; q++) {
    double s = ((f[q] + static_cast<double>(q) * q) -
                (f[v[k]] + static_cast<double>(v[k]) * v[k])) /
               (2.0 * q - 2.0 * v[k]);
    while (s <= z[k]) {
      k--;
      s = ((f[q] + static_cast<double>(q) * q) -
           (f[v[k]] + static_cast<double>(v[k]) * v[k])) /
          (2.0 * q - 2.0 * v[k]);
    }
    k++;
    v[k] = q;
    z[k] = s;
    z[k + 1] = kInf;
  }
  k = 0;
  for (int q = 0; q < n; q++) {
    while (z[k + 1] < q) k++;
    d[q] = (static_cast<double>(q) - v[k]) * (q - v[k]) + f[v[k]];
  }
}

}  // namespace

extern "C" {

// Exact Euclidean distance from every pixel to the nearest nonzero mask
// pixel (0 on the mask, +inf if the mask is empty). Matches
// cv.distanceTransform(DIST_L2, maskSize=0) on the reference's complement
// encoding and tpu_unet.ops.edt.
void edt_l2(const uint8_t* mask, int h, int w, float* out) {
  std::vector<double> f(h * w);
  for (int i = 0; i < h * w; i++) f[i] = mask[i] ? 0.0 : kBig;

  std::vector<double> col(h), dcol(h), rowbuf(w), drow(w);
  std::vector<int> v(std::max(h, w));
  std::vector<double> z(std::max(h, w) + 1);

  // Column pass.
  for (int x = 0; x < w; x++) {
    for (int y = 0; y < h; y++) col[y] = f[y * w + x];
    dt1d(col.data(), h, dcol.data(), v.data(), z.data());
    for (int y = 0; y < h; y++) f[y * w + x] = dcol[y];
  }
  // Row pass.
  for (int y = 0; y < h; y++) {
    for (int x = 0; x < w; x++) rowbuf[x] = f[y * w + x];
    dt1d(rowbuf.data(), w, drow.data(), v.data(), z.data());
    for (int x = 0; x < w; x++)
      out[y * w + x] = (drow[x] >= kBig / 2)
                           ? kInf
                           : static_cast<float>(std::sqrt(drow[x]));
  }
}

// Two-pass union-find connected components, 4-connectivity.
// labels: 0 for background, 1..K for components (row-major first-pixel
// order, matching cv.connectedComponents numbering). Returns K.
int connected_components4(const uint8_t* fg, int h, int w, int32_t* labels) {
  const int n = h * w;
  std::vector<int32_t> parent(n);
  std::memset(labels, 0, sizeof(int32_t) * n);

  auto find = [&](int32_t x) {
    while (parent[x] != x) {
      parent[x] = parent[parent[x]];
      x = parent[x];
    }
    return x;
  };

  // First pass: provisional labels + unions.
  int32_t next = 0;
  std::vector<int32_t> prov(n, -1);
  for (int y = 0; y < h; y++) {
    for (int x = 0; x < w; x++) {
      int idx = y * w + x;
      if (!fg[idx]) continue;
      int32_t up = (y > 0 && fg[idx - w]) ? prov[idx - w] : -1;
      int32_t left = (x > 0 && fg[idx - 1]) ? prov[idx - 1] : -1;
      if (up < 0 && left < 0) {
        prov[idx] = next;
        parent.resize(std::max<size_t>(parent.size(), next + 1));
        parent[next] = next;
        next++;
      } else if (up >= 0 && left < 0) {
        prov[idx] = up;
      } else if (up < 0 && left >= 0) {
        prov[idx] = left;
      } else {
        int32_t ru = find(up), rl = find(left);
        prov[idx] = std::min(ru, rl);
        parent[std::max(ru, rl)] = std::min(ru, rl);
      }
    }
  }

  // Second pass: compact roots to 1..K in first-appearance order.
  std::vector<int32_t> compact(next, 0);
  int32_t k = 0;
  for (int idx = 0; idx < n; idx++) {
    if (prov[idx] < 0) continue;
    int32_t r = find(prov[idx]);
    if (!compact[r]) compact[r] = ++k;
    labels[idx] = compact[r];
  }
  return k;
}

// Grayscale dilation with a ksize x ksize rectangular structuring element,
// `iters` iterations, zero border (mask semantics; matches ops/morphology).
void dilate_rect(const float* img, int h, int w, int ksize, int iters,
                 float* out) {
  const int pad = ksize / 2;
  std::vector<float> cur(img, img + h * w), tmp(h * w);
  for (int it = 0; it < iters; it++) {
    // Horizontal max.
    for (int y = 0; y < h; y++) {
      for (int x = 0; x < w; x++) {
        float m = 0.0f;
        int x0 = std::max(0, x - pad), x1 = std::min(w - 1, x + pad);
        for (int xx = x0; xx <= x1; xx++) m = std::max(m, cur[y * w + xx]);
        tmp[y * w + x] = m;
      }
    }
    // Vertical max.
    for (int y = 0; y < h; y++) {
      for (int x = 0; x < w; x++) {
        float m = 0.0f;
        int y0 = std::max(0, y - pad), y1 = std::min(h - 1, y + pad);
        for (int yy = y0; yy <= y1; yy++) m = std::max(m, tmp[yy * w + x]);
        cur[y * w + x] = m;
      }
    }
  }
  std::memcpy(out, cur.data(), sizeof(float) * h * w);
}

// Separating-border GT preprocessing (reference data.py:195-221): for each
// instance id, dilate twice with a 5x5 rect kernel and accumulate the edge
// ring; subtract from the labels, clip at 0. instance ids in `img` (int32),
// outputs gt (float32) and edge mask (float32).
void preprocess_gt(const int32_t* img, int h, int w, float* gt, float* edge) {
  const int n = h * w;
  int32_t maxid = 0;
  for (int i = 0; i < n; i++) maxid = std::max(maxid, img[i]);
  std::vector<float> mask(n), dil(n);
  std::fill(edge, edge + n, 0.0f);
  for (int32_t cls = 1; cls <= maxid; cls++) {
    bool any = false;
    for (int i = 0; i < n; i++) {
      mask[i] = (img[i] == cls) ? 255.0f : 0.0f;
      any |= (img[i] == cls);
    }
    if (!any) continue;
    dilate_rect(mask.data(), h, w, 5, 2, dil.data());
    for (int i = 0; i < n; i++) edge[i] += dil[i] - mask[i];
  }
  for (int i = 0; i < n; i++) {
    float g = static_cast<float>(img[i]) - edge[i];
    gt[i] = g < 0.0f ? 0.0f : g;
  }
}

}  // extern "C"
