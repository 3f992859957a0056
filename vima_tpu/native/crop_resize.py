"""ctypes wrapper for the native crop/resize kernel, with a pure-numpy
fallback implementing the same OpenCV INTER_AREA semantics.

Build on demand (g++ only; no pybind11 in the image):
    python -m vima_tpu.native.build
"""

from __future__ import annotations

import ctypes
import os
import pathlib

import numpy as np

_LIB_PATH = pathlib.Path(__file__).parent / "libcrop_resize.so"
_lib = None


def _load():
    global _lib
    if _lib is None and _LIB_PATH.exists():
        lib = ctypes.CDLL(str(_LIB_PATH))
        lib.resize_inter_area_u8.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int,
        ]
        lib.crop_pad_resize_batch_u8.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_int), ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_uint8),
        ]
        if hasattr(lib, "segm_bboxes_i32"):  # present after a rebuild
            lib.segm_bboxes_i32.argtypes = [
                ctypes.POINTER(ctypes.c_int32), ctypes.c_int, ctypes.c_int,
                ctypes.c_int, ctypes.POINTER(ctypes.c_int32),
            ]
        if hasattr(lib, "prepare_objects_frames_u8"):
            lib.prepare_objects_frames_u8.argtypes = [
                ctypes.POINTER(ctypes.c_void_p), ctypes.POINTER(ctypes.c_void_p),
                ctypes.c_int, ctypes.c_int, ctypes.c_int,
                ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
                ctypes.c_int, ctypes.c_int,
                ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_int32),
                ctypes.POINTER(ctypes.c_uint8),
            ]
        _lib = lib
    return _lib


def prepare_objects_frames(frames, segms, ids_per_frame, *, max_objs: int, out_res: int = 32):
    """The whole segm->bbox->crop pipeline for N (env, view) frames in ONE
    native call (see crop_resize.cpp). Returns (crops (N, max_objs, 3, R,
    R) u8, bboxes (N, max_objs, 4) i32, masks (N, max_objs) bool), or None
    when the library (or symbol, pre-rebuild) is unavailable — callers
    fall back to the per-frame Python loop (identical output).

    frames: list of (3, H, W) uint8; segms: list of (H, W) arrays (any int
    dtype); ids_per_frame: per-frame candidate object ids, host order.
    """
    lib = _load()
    if lib is None or not hasattr(lib, "prepare_objects_frames_u8"):
        return None
    N = len(frames)
    if N == 0:
        return (
            np.zeros((0, max_objs, 3, out_res, out_res), np.uint8),
            np.zeros((0, max_objs, 4), np.int32),
            np.zeros((0, max_objs), bool),
        )
    H, W = frames[0].shape[1:]
    frames_c = [np.ascontiguousarray(f, dtype=np.uint8) for f in frames]
    segms_c = [np.ascontiguousarray(s, dtype=np.int32) for s in segms]
    if any(f.shape != (3, H, W) for f in frames_c) or any(
        s.shape != (H, W) for s in segms_c
    ):
        return None  # mixed geometries: fall back
    ids_flat, starts = [], [0]
    for ids in ids_per_frame:
        good = [int(i) for i in ids if 0 < int(i) <= 4096]
        if len(good) != len(ids):  # hostile id range: numpy fallback
            return None
        ids_flat.extend(good)
        starts.append(len(ids_flat))
    ids_flat = np.asarray(ids_flat or [0], np.int32)
    starts = np.asarray(starts, np.int32)

    fptrs = (ctypes.c_void_p * N)(*[f.ctypes.data for f in frames_c])
    sptrs = (ctypes.c_void_p * N)(*[s.ctypes.data for s in segms_c])
    crops = np.zeros((N, max_objs, 3, out_res, out_res), np.uint8)
    bboxes = np.zeros((N, max_objs, 4), np.int32)
    masks = np.zeros((N, max_objs), np.uint8)
    lib.prepare_objects_frames_u8(
        fptrs, sptrs, N, H, W,
        ids_flat.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        starts.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        max_objs, out_res,
        _as_u8_ptr(crops),
        bboxes.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        _as_u8_ptr(masks),
    )
    return crops, bboxes, masks.astype(bool)


def native_available() -> bool:
    return _load() is not None


def _as_u8_ptr(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))


def resize_inter_area(img: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """(H, W, C) uint8 -> (out_h, out_w, C) uint8, INTER_AREA semantics."""
    img = np.ascontiguousarray(img, dtype=np.uint8)
    H, W, C = img.shape
    lib = _load()
    if lib is not None:
        out = np.empty((out_h, out_w, C), dtype=np.uint8)
        lib.resize_inter_area_u8(_as_u8_ptr(img), H, W, C, _as_u8_ptr(out), out_h, out_w)
        return out
    return _resize_area_numpy(img, out_h, out_w)


def crop_pad_resize_batch(frame_chw: np.ndarray, boxes: np.ndarray, out: int = 32) -> np.ndarray:
    """frame (3, H, W) uint8; boxes (n, 4) int32 [ymin, ymax, xmin, xmax]
    inclusive -> (n, 3, out, out) uint8 (crop, center-pad square, resize)."""
    frame_chw = np.ascontiguousarray(frame_chw, dtype=np.uint8)
    boxes = np.ascontiguousarray(boxes, dtype=np.int32)
    n = boxes.shape[0]
    lib = _load()
    dst = np.empty((n, 3, out, out), dtype=np.uint8)
    if lib is not None and n:
        _, H, W = frame_chw.shape
        lib.crop_pad_resize_batch_u8(
            _as_u8_ptr(frame_chw), H, W,
            boxes.ctypes.data_as(ctypes.POINTER(ctypes.c_int)), n, out, _as_u8_ptr(dst),
        )
        return dst
    for i in range(n):
        ymin, ymax, xmin, xmax = (int(b) for b in boxes[i])
        crop = frame_chw[:, ymin : ymax + 1, xmin : xmax + 1]
        h, w = crop.shape[1:]
        side = max(h, w)
        padded = np.zeros((3, side, side), dtype=np.uint8)
        py, px = (side - h) // 2, (side - w) // 2
        padded[:, py : py + h, px : px + w] = crop
        dst[i] = np.transpose(
            resize_inter_area(np.transpose(padded, (1, 2, 0)), out, out), (2, 0, 1)
        )
    return dst


def _resize_area_numpy(img: np.ndarray, dh: int, dw: int) -> np.ndarray:
    """Numpy INTER_AREA: exact area weighting for downscale, bilinear for
    upscale (OpenCV behavior)."""
    sh, sw, c = img.shape
    scale_y, scale_x = sh / dh, sw / dw
    src = img.astype(np.float64)
    if scale_y >= 1.0 and scale_x >= 1.0 and sh % dh == 0 and sw % dw == 0:
        iy, ix = sh // dh, sw // dw
        area = iy * ix
        box = img.astype(np.int64).reshape(dh, iy, dw, ix, c).sum(axis=(1, 3))
        return ((box + area // 2) // area).astype(np.uint8)
    if scale_y >= 1.0 and scale_x >= 1.0:
        out = np.zeros((dh, dw, c), dtype=np.float64)
        for dy in range(dh):
            fy0, fy1 = dy * scale_y, (dy + 1) * scale_y
            y0, y1 = int(fy0), min(int(np.ceil(fy1)), sh)
            wy = np.minimum(fy1, np.arange(y0, y1) + 1) - np.maximum(fy0, np.arange(y0, y1))
            for dx in range(dw):
                fx0, fx1 = dx * scale_x, (dx + 1) * scale_x
                x0, x1 = int(fx0), min(int(np.ceil(fx1)), sw)
                wx = np.minimum(fx1, np.arange(x0, x1) + 1) - np.maximum(fx0, np.arange(x0, x1))
                block = src[y0:y1, x0:x1]
                out[dy, dx] = np.einsum("i,j,ijc->c", wy, wx, block) / (scale_x * scale_y)
        return np.clip(np.rint(out), 0, 255).astype(np.uint8)
    # upscale: bilinear with pixel-area coefficient mapping (OpenCV
    # INTER_AREA zoom-in behavior)
    y0 = np.floor(np.arange(dh) * scale_y).astype(int)
    x0 = np.floor(np.arange(dw) * scale_x).astype(int)
    ay = (np.arange(dh) + 1) - (y0 + 1) / scale_y
    ax = (np.arange(dw) + 1) - (x0 + 1) / scale_x
    ay = np.where(ay <= 0, 0.0, ay - np.floor(ay))[:, None, None]
    ax = np.where(ax <= 0, 0.0, ax - np.floor(ax))[None, :, None]
    y0c = np.clip(y0, 0, sh - 1)
    y1c = np.clip(y0 + 1, 0, sh - 1)
    x0c = np.clip(x0, 0, sw - 1)
    x1c = np.clip(x0 + 1, 0, sw - 1)
    v00 = src[np.ix_(y0c, x0c)]
    v01 = src[np.ix_(y0c, x1c)]
    v10 = src[np.ix_(y1c, x0c)]
    v11 = src[np.ix_(y1c, x1c)]
    v = (1 - ay) * ((1 - ax) * v00 + ax * v01) + ay * ((1 - ax) * v10 + ax * v11)
    return np.clip(np.rint(v), 0, 255).astype(np.uint8)


def segm_bboxes_native(segm: np.ndarray):
    """One C pass over an integer segmentation: {id: (ymin, ymax, xmin,
    xmax, count)} for every id > 0. Returns None when the library (or the
    symbol, pre-rebuild) is unavailable — callers fall back to the numpy
    implementation in bridge/obs_prep (identical results; integer extrema
    have no rounding semantics to diverge on)."""
    lib = _load()
    if lib is None or not hasattr(lib, "segm_bboxes_i32"):
        return None
    segm = np.ascontiguousarray(segm, dtype=np.int32)
    if segm.size == 0:
        return {}
    max_id = int(segm.max())
    if max_id <= 0:
        return {}
    if max_id > 4096:
        # The C pass allocates (max_id+1) x 5 int32 rows, so a single huge
        # id (an oracle sentinel/uid) would cost max_id*20 bytes per call;
        # it also skips negative ids the numpy path counts. Defer to the
        # numpy implementation, whose cost depends only on ids present.
        return None
    h, w = segm.shape
    out = np.empty((max_id + 1, 5), dtype=np.int32)
    lib.segm_bboxes_i32(
        segm.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), h, w, max_id,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
    )
    return {
        int(i): (int(r[0]), int(r[1]), int(r[2]), int(r[3]), int(r[4]))
        for i, r in enumerate(out)
        if r[4] > 0
    }
