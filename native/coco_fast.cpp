// coco_fast — native host-side data ops for maskrcnn_tpu.
//
// The reference leans on two C extensions for its host pipeline:
// pycocotools (RLE decode / polygon raster, reference
// chainer_maskrcnn/dataset/coco_dataset.py:6,87) and OpenCV resizes
// (utils/proposal_target_creator.py:103, train.py:33-35). This library
// provides the same primitives as a single dependency-free .so consumed via
// ctypes (maskrcnn_tpu/data/_native.py). With one host core feeding a TPU,
// these loops are the data-path bottleneck — hence C++.
//
// Build: make -C native   (g++ -O3 -shared -fPIC)

#include <cstdint>
#include <cstring>
#include <algorithm>
#include <cmath>
#include <vector>

extern "C" {

// Decode uncompressed COCO RLE counts (column-major runs starting with 0s)
// into a row-major uint8 mask of shape (h, w).
void rle_decode_counts(const int64_t* counts, int64_t n_counts,
                       int64_t h, int64_t w, uint8_t* out) {
  std::memset(out, 0, static_cast<size_t>(h * w));
  int64_t pos = 0;
  uint8_t val = 0;
  for (int64_t i = 0; i < n_counts; ++i) {
    int64_t c = counts[i];
    if (val) {
      for (int64_t k = pos; k < pos + c && k < h * w; ++k) {
        // column-major position k -> (row, col)
        int64_t col = k / h, row = k % h;
        out[row * w + col] = 1;
      }
    }
    pos += c;
    val ^= 1;
  }
}

// Decode pycocotools' compressed LEB128-with-delta string form.
// Returns the number of counts written (<= max_counts), or -1 on overflow.
int64_t rle_string_to_counts(const char* s, int64_t len,
                             int64_t* counts, int64_t max_counts) {
  int64_t m = 0;
  int64_t p = 0;
  while (p < len) {
    int64_t x = 0;
    int k = 0;
    bool more = true;
    while (more) {
      if (p >= len) return -1;
      int64_t c = s[p] - 48;
      x |= (c & 0x1f) << (5 * k);
      more = (c & 0x20) != 0;
      ++p;
      ++k;
      if (!more && (c & 0x10)) x |= -1LL << (5 * k);
    }
    if (m > 2) x += counts[m - 2];
    if (m >= max_counts) return -1;
    counts[m++] = x;
  }
  return m;
}

// Scanline polygon fill (even-odd rule), matching cv2.fillPoly closely
// enough for COCO polygons. pts: (n, 2) float64 as (x, y).
void fill_poly(const double* pts, int64_t n, int64_t h, int64_t w,
               uint8_t* out) {
  if (n < 3) return;
  std::vector<double> xs;
  for (int64_t y = 0; y < h; ++y) {
    double cy = static_cast<double>(y) + 0.5;
    xs.clear();
    for (int64_t i = 0; i < n; ++i) {
      int64_t j = (i + 1) % n;
      double y0 = pts[2 * i + 1], y1 = pts[2 * j + 1];
      double x0 = pts[2 * i], x1 = pts[2 * j];
      if ((y0 <= cy && y1 > cy) || (y1 <= cy && y0 > cy)) {
        double t = (cy - y0) / (y1 - y0);
        xs.push_back(x0 + t * (x1 - x0));
      }
    }
    std::sort(xs.begin(), xs.end());
    for (size_t k = 0; k + 1 < xs.size(); k += 2) {
      int64_t xa = std::max<int64_t>(0, (int64_t)std::ceil(xs[k] - 0.5));
      int64_t xb = std::min<int64_t>(w - 1, (int64_t)std::floor(xs[k + 1] - 0.5));
      for (int64_t x = xa; x <= xb; ++x) out[y * w + x] = 1;
    }
  }
}

// Bilinear resize float32 (h, w) -> (oh, ow), half-pixel centers
// (cv2.INTER_LINEAR convention).
void resize_bilinear_f32(const float* src, int64_t h, int64_t w,
                         float* dst, int64_t oh, int64_t ow) {
  const double sy = static_cast<double>(h) / oh;
  const double sx = static_cast<double>(w) / ow;
  for (int64_t i = 0; i < oh; ++i) {
    double fy = (i + 0.5) * sy - 0.5;
    int64_t y0 = (int64_t)std::floor(fy);
    double ly = fy - y0;
    int64_t y0c = std::clamp<int64_t>(y0, 0, h - 1);
    int64_t y1c = std::clamp<int64_t>(y0 + 1, 0, h - 1);
    for (int64_t j = 0; j < ow; ++j) {
      double fx = (j + 0.5) * sx - 0.5;
      int64_t x0 = (int64_t)std::floor(fx);
      double lx = fx - x0;
      int64_t x0c = std::clamp<int64_t>(x0, 0, w - 1);
      int64_t x1c = std::clamp<int64_t>(x0 + 1, 0, w - 1);
      double v = src[y0c * w + x0c] * (1 - ly) * (1 - lx)
               + src[y0c * w + x1c] * (1 - ly) * lx
               + src[y1c * w + x0c] * ly * (1 - lx)
               + src[y1c * w + x1c] * ly * lx;
      dst[i * ow + j] = static_cast<float>(v);
    }
  }
}

// Crop a uint8 mask to an integer box and resize to (s, s) float32 —
// the GT mask-crop op of the data pipeline (one call instead of
// slice + cv2.resize).
void crop_resize_mask(const uint8_t* mask, int64_t h, int64_t w,
                      int64_t y0, int64_t x0, int64_t y1, int64_t x1,
                      float* out, int64_t s) {
  y0 = std::clamp<int64_t>(y0, 0, h - 1);
  x0 = std::clamp<int64_t>(x0, 0, w - 1);
  y1 = std::clamp<int64_t>(y1, y0 + 1, h);
  x1 = std::clamp<int64_t>(x1, x0 + 1, w);
  const int64_t ch = y1 - y0, cw = x1 - x0;
  std::vector<float> crop(static_cast<size_t>(ch * cw));
  for (int64_t i = 0; i < ch; ++i)
    for (int64_t j = 0; j < cw; ++j)
      crop[i * cw + j] = static_cast<float>(mask[(y0 + i) * w + (x0 + j)]);
  resize_bilinear_f32(crop.data(), ch, cw, out, s, s);
}

}  // extern "C"
