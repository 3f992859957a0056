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

namespace {

// One crop: [ymin..ymax]x[xmin..xmax] inclusive from a (3, H, W) CHW
// frame, zero-pad to centered square (reference example.py:417-428),
// INTER_AREA resize to (out, out), write CHW uint8 into dst.
void crop_pad_resize_one(const uint8_t* frame, int H, int W, int ymin,
                         int ymax, int xmin, int xmax, int out, uint8_t* dst,
                         std::vector<uint8_t>& hwc,
                         std::vector<uint8_t>& resized) {
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
  resized.resize(static_cast<size_t>(out) * out * 3);
  resize_area_one(hwc.data(), side, side, 3, resized.data(), out, out);
  for (int y = 0; y < out; ++y)
    for (int x = 0; x < out; ++x)
      for (int ch = 0; ch < 3; ++ch)
        dst[(static_cast<size_t>(ch) * out + y) * out + x] =
            resized[(static_cast<size_t>(y) * out + x) * 3 + ch];
}

}  // namespace

extern "C" {

void segm_bboxes_i32(const int32_t* segm, int h, int w, int max_id,
                     int32_t* out);  // defined below

// Single image: src (sh, sw, c) uint8 HWC -> dst (dh, dw, c).
void resize_inter_area_u8(const uint8_t* src, int sh, int sw, int c,
                          uint8_t* dst, int dh, int dw) {
  resize_area_one(src, sh, sw, c, dst, dh, dw);
}

// Batched crop+pad-square+resize over one frame (see crop_pad_resize_one).
void crop_pad_resize_batch_u8(const uint8_t* frame, int H, int W,
                              const int* boxes,  // (n, 4): ymin ymax xmin xmax
                              int n, int out, uint8_t* dst) {
  std::vector<uint8_t> hwc;
  std::vector<uint8_t> resized;
  for (int i = 0; i < n; ++i) {
    crop_pad_resize_one(frame, H, W, boxes[i * 4 + 0], boxes[i * 4 + 1],
                        boxes[i * 4 + 2], boxes[i * 4 + 3], out,
                        dst + static_cast<size_t>(i) * 3 * out * out, hwc,
                        resized);
  }
}

// The WHOLE host obs-prep pipeline for N (env, view) frames in ONE call:
// per frame, one-pass segm bbox extraction, then — iterating its candidate
// ids in the GIVEN order — objects with >= 2 pixels fill compacted slots
// (bbox features [xc, yc, h, w] with truncating centers, crop + center-pad
// + INTER_AREA resize) up to max_objs. Byte-identical to the Python
// per-env loop in bridge/obs_prep (extract_objects), which at 128 parallel
// envs costs a GIL-bound Python dispatch per env per view per tick.
//
// frames: N pointers to (3, H, W) uint8; segms: N pointers to (H, W)
// int32. ids_flat/ids_start: per-frame candidate id lists (CSR layout,
// ids_start has N+1 entries). Outputs (caller-zeroed):
// crops (N, max_objs, 3, out, out) u8; bboxes (N, max_objs, 4) i32;
// masks (N, max_objs) u8.
void prepare_objects_frames_u8(const uint8_t* const* frames,
                               const int32_t* const* segms, int N, int H,
                               int W, const int32_t* ids_flat,
                               const int32_t* ids_start, int max_objs,
                               int out_res, uint8_t* crops, int32_t* bboxes,
                               uint8_t* masks) {
  std::vector<int32_t> bb;
  std::vector<uint8_t> hwc, resized;
  for (int i = 0; i < N; ++i) {
    const int32_t* ids = ids_flat + ids_start[i];
    const int n_ids = ids_start[i + 1] - ids_start[i];
    int32_t max_id = 0;
    for (int j = 0; j < n_ids; ++j) max_id = std::max(max_id, ids[j]);
    if (max_id <= 0) continue;
    bb.resize(static_cast<size_t>(max_id + 1) * 5);
    segm_bboxes_i32(segms[i], H, W, max_id, bb.data());
    int slot = 0;
    for (int j = 0; j < n_ids && slot < max_objs; ++j) {
      const int32_t id = ids[j];
      if (id <= 0 || id > max_id) continue;
      const int32_t* r = bb.data() + static_cast<size_t>(id) * 5;
      if (r[4] < 2) continue;  // absent or <2 px (reference example.py:408-411)
      const int ymin = r[0], ymax = r[1], xmin = r[2], xmax = r[3];
      int32_t* box = bboxes + (static_cast<size_t>(i) * max_objs + slot) * 4;
      box[0] = (xmin + xmax) / 2;
      box[1] = (ymin + ymax) / 2;
      box[2] = ymax - ymin;
      box[3] = xmax - xmin;
      crop_pad_resize_one(
          frames[i], H, W, ymin, ymax, xmin, xmax, out_res,
          crops + (static_cast<size_t>(i) * max_objs + slot) * 3 * out_res *
                      out_res,
          hwc, resized);
      masks[static_cast<size_t>(i) * max_objs + slot] = 1;
      ++slot;
    }
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

