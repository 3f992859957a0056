// Batched INTER_AREA image resize (uint8 HWC), matching OpenCV semantics.
//
// Role: the reference's per-object crop/resize host loop
// (scripts/example.py:301-305, :431-435) is the one hot host-side path when
// many parallel envs feed one TPU policy (survey §2.2: "the one place a
// first-party native component is justified"). This kernel provides that
// loop natively: area-weighted averaging with fractional pixel coverage for
// downscale (OpenCV's resizeArea float path) and bilinear for upscale
// (OpenCV maps INTER_AREA to bilinear when zooming in).
//
// Exposed via a plain C ABI for ctypes (no pybind11 in the image).

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>

namespace {

inline int clampi(int v, int lo, int hi) {
  return v < lo ? lo : (v > hi ? hi : v);
}

// OpenCV-compatible rounding: round half to even.
inline int round_half_even(float v) {
  return static_cast<int>(std::nearbyintf(v));
}

void resize_area_one(const uint8_t* src, int sh, int sw, int c,
                     uint8_t* dst, int dh, int dw) {
  const double scale_y = static_cast<double>(sh) / dh;
  const double scale_x = static_cast<double>(sw) / dw;

  const int iscale_y = static_cast<int>(scale_y);
  const int iscale_x = static_cast<int>(scale_x);
  if (scale_y >= 1.0 && scale_x >= 1.0 &&
      std::abs(scale_y - iscale_y) < 1e-12 && std::abs(scale_x - iscale_x) < 1e-12) {
    // Integer-scale fast path: OpenCV resizeAreaFast rounds half up.
    const int area = iscale_x * iscale_y;
    for (int dy = 0; dy < dh; ++dy) {
      for (int dx = 0; dx < dw; ++dx) {
        for (int ch = 0; ch < c; ++ch) {
          int acc = 0;
          for (int sy = dy * iscale_y; sy < (dy + 1) * iscale_y; ++sy)
            for (int sx = dx * iscale_x; sx < (dx + 1) * iscale_x; ++sx)
              acc += src[(static_cast<size_t>(sy) * sw + sx) * c + ch];
          dst[(static_cast<size_t>(dy) * dw + dx) * c + ch] =
              static_cast<uint8_t>((acc + area / 2) / area);
        }
      }
    }
    return;
  }
  if (scale_y >= 1.0 && scale_x >= 1.0) {
    // True area averaging with fractional coverage.
    const double inv_area = 1.0 / (scale_x * scale_y);
    for (int dy = 0; dy < dh; ++dy) {
      const double fy0 = dy * scale_y;
      const double fy1 = fy0 + scale_y;
      const int y0 = static_cast<int>(fy0);
      const int y1 = std::min(static_cast<int>(std::ceil(fy1)), sh);
      for (int dx = 0; dx < dw; ++dx) {
        const double fx0 = dx * scale_x;
        const double fx1 = fx0 + scale_x;
        const int x0 = static_cast<int>(fx0);
        const int x1 = std::min(static_cast<int>(std::ceil(fx1)), sw);
        for (int ch = 0; ch < c; ++ch) {
          double acc = 0.0;
          for (int sy = y0; sy < y1; ++sy) {
            const double wy =
                std::min(fy1, static_cast<double>(sy + 1)) -
                std::max(fy0, static_cast<double>(sy));
            const uint8_t* row = src + (static_cast<size_t>(sy) * sw) * c;
            for (int sx = x0; sx < x1; ++sx) {
              const double wx =
                  std::min(fx1, static_cast<double>(sx + 1)) -
                  std::max(fx0, static_cast<double>(sx));
              acc += wy * wx * row[sx * c + ch];
            }
          }
          const float val = static_cast<float>(acc * inv_area);
          dst[(static_cast<size_t>(dy) * dw + dx) * c + ch] =
              static_cast<uint8_t>(clampi(round_half_even(val), 0, 255));
        }
      }
    }
    return;
  }

  // Upscale (either axis): OpenCV maps INTER_AREA to bilinear with
  // pixel-area coefficient mapping: sx = floor(dx*scale),
  // fx = (dx+1) - (sx+1)*inv_scale (0 when the output pixel nests fully).
  const double inv_scale_y = 1.0 / scale_y, inv_scale_x = 1.0 / scale_x;
  for (int dy = 0; dy < dh; ++dy) {
    int sy = static_cast<int>(std::floor(dy * scale_y));
    float ay = static_cast<float>((dy + 1) - (sy + 1) * inv_scale_y);
    ay = ay <= 0 ? 0.f : ay - static_cast<float>(std::floor(ay));
    int sy0 = clampi(sy, 0, sh - 1);
    int sy1 = clampi(sy + 1, 0, sh - 1);
    for (int dx = 0; dx < dw; ++dx) {
      int sx = static_cast<int>(std::floor(dx * scale_x));
      float ax = static_cast<float>((dx + 1) - (sx + 1) * inv_scale_x);
      ax = ax <= 0 ? 0.f : ax - static_cast<float>(std::floor(ax));
      int sx0 = clampi(sx, 0, sw - 1);
      int sx1 = clampi(sx + 1, 0, sw - 1);
      for (int ch = 0; ch < c; ++ch) {
        const float v00 = src[(static_cast<size_t>(sy0) * sw + sx0) * c + ch];
        const float v01 = src[(static_cast<size_t>(sy0) * sw + sx1) * c + ch];
        const float v10 = src[(static_cast<size_t>(sy1) * sw + sx0) * c + ch];
        const float v11 = src[(static_cast<size_t>(sy1) * sw + sx1) * c + ch];
        const float v = (1 - ay) * ((1 - ax) * v00 + ax * v01) +
                        ay * ((1 - ax) * v10 + ax * v11);
        dst[(static_cast<size_t>(dy) * dw + dx) * c + ch] =
            static_cast<uint8_t>(clampi(round_half_even(v), 0, 255));
      }
    }
  }
}

}  // namespace

extern "C" {

// Single image: src (sh, sw, c) uint8 HWC -> dst (dh, dw, c).
void resize_inter_area_u8(const uint8_t* src, int sh, int sw, int c,
                          uint8_t* dst, int dh, int dw) {
  resize_area_one(src, sh, sw, c, dst, dh, dw);
}

// Batched crop+pad-square+resize: for each of n boxes on a (3, H, W) CHW
// frame, crop [ymin..ymax]x[xmin..xmax] inclusive, zero-pad to square
// (centered, reference example.py:417-428), resize to (out, out), write
// CHW uint8 into dst[(i, 3, out, out)].
void crop_pad_resize_batch_u8(const uint8_t* frame, int H, int W,
                              const int* boxes,  // (n, 4): ymin ymax xmin xmax
                              int n, int out, uint8_t* dst) {
  std::vector<uint8_t> hwc;
  std::vector<uint8_t> resized(static_cast<size_t>(out) * out * 3);
  for (int i = 0; i < n; ++i) {
    const int ymin = boxes[i * 4 + 0], ymax = boxes[i * 4 + 1];
    const int xmin = boxes[i * 4 + 2], xmax = boxes[i * 4 + 3];
    const int h = ymax - ymin + 1, w = xmax - xmin + 1;
    const int side = std::max(h, w);
    const int py = (side - h) / 2, px = (side - w) / 2;
    hwc.assign(static_cast<size_t>(side) * side * 3, 0);
    for (int y = 0; y < h; ++y) {
      for (int x = 0; x < w; ++x) {
        for (int ch = 0; ch < 3; ++ch) {
          hwc[((static_cast<size_t>(y + py) * side) + (x + px)) * 3 + ch] =
              frame[(static_cast<size_t>(ch) * H + (ymin + y)) * W + (xmin + x)];
        }
      }
    }
    resize_area_one(hwc.data(), side, side, 3, resized.data(), out, out);
    // HWC -> CHW
    uint8_t* d = dst + static_cast<size_t>(i) * 3 * out * out;
    for (int y = 0; y < out; ++y)
      for (int x = 0; x < out; ++x)
        for (int ch = 0; ch < 3; ++ch)
          d[(static_cast<size_t>(ch) * out + y) * out + x] =
              resized[(static_cast<size_t>(y) * out + x) * 3 + ch];
  }
}

}  // extern "C"

extern "C" {

// Per-id bounding boxes over an int32 segmentation map in ONE pass.
// out must hold (max_id + 1) rows of [ymin, ymax, xmin, xmax, count],
// pre-initialized by this function. Ids outside [0, max_id] are ignored
// (callers size max_id from segm.max()). Replaces the numpy
// nonzero/argsort/reduceat pipeline in bridge/obs_prep.segm_bboxes, which
// profiled at ~0.5 ms per frame pair on the single-core host — the
// closed loop runs this per view per env per step.
void segm_bboxes_i32(const int32_t* segm, int h, int w, int max_id,
                     int32_t* out) {
  const int n = max_id + 1;
  for (int i = 0; i < n; ++i) {
    int32_t* r = out + static_cast<size_t>(i) * 5;
    r[0] = h; r[1] = -1; r[2] = w; r[3] = -1; r[4] = 0;
  }
  for (int y = 0; y < h; ++y) {
    const int32_t* row = segm + static_cast<size_t>(y) * w;
    for (int x = 0; x < w; ++x) {
      const int32_t id = row[x];
      if (id <= 0 || id > max_id) continue;
      int32_t* r = out + static_cast<size_t>(id) * 5;
      if (y < r[0]) r[0] = y;
      if (y > r[1]) r[1] = y;
      if (x < r[2]) r[2] = x;
      if (x > r[3]) r[3] = x;
      ++r[4];
    }
  }
}

}  // extern "C"

