"""On-device observation prep: segmentation -> object crops, inside jit.

The host obs path (bridge/obs_prep.py, mirroring reference
scripts/example.py:374-473) fetches the segmentation to the host, loops
per object per view through segm->bbox->crop->pad->INTER_AREA resize, and
re-uploads the crops. On the tunneled TPU that costs a D2H fetch + host
Python + H2D upload on every step's critical path. For the detector-in-
the-loop configuration (BASELINE config 3) the segmentation is *born on
the device* (nn/maskrcnn + bridge/detector._paste_segm_device), so this
module keeps the whole pipeline there:

  * per-id bbox extrema via masked min/max over the (detection-budget)
    id range — static shapes, no host loop;
  * crop + center-pad-to-square + INTER_AREA resize expressed as two
    per-object weight matmuls (INTER_AREA is separable: the area overlap
    of input pixel i with output span o factorizes into row x column
    weights, for both the downscale and the OpenCV zoom-in regime), so
    a view's whole object set is one einsum over the raw frame;
  * per-view slot compaction matching obs_prep.extract_objects exactly
    (ascending-id order, <2-pixel objects skipped, ``max_objs`` cap).

Numerics: bboxes/masks/slots are integer-exact vs the host path; crop
pixels match within +-1 (the host path rounds through cv2/numpy fixed
point, the device path through fp32 rint — see tests/test_device_prep).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def interarea_weights(lo, length, side, out_res: int, axis_size: int):
    """INTER_AREA row (or column) weights over frame coordinates.

    lo: () int32 crop start (ymin/xmin); length: () int32 crop extent
    (inclusive count); side: () int32 padded square side; out_res/axis_size
    static. Returns (out_res, axis_size) fp32 W with
    ``out[o] = sum_y W[o, y] * frame[y]`` equal to crop -> center-pad to
    ``side`` -> INTER_AREA resize to ``out_res`` along this axis.

    One formula covers both OpenCV regimes: output span [o*s, (o+1)*s)
    with s = side/out_res; weight of square pixel q is its overlap with
    the span / s. For s >= 1 that is the area average; for s < 1 the span
    covers <= 2 pixels and the overlap weights reduce to exactly OpenCV's
    INTER_AREA zoom-in bilinear coefficients (cv2.resize INTER_AREA,
    reference scripts/example.py:301-305).
    """
    pad = (side - length) // 2
    s = side.astype(jnp.float32) / out_res
    coords = jnp.arange(axis_size, dtype=jnp.int32)
    q = (coords - lo + pad).astype(jnp.float32)  # square-buffer coords
    o = jnp.arange(out_res, dtype=jnp.float32)[:, None]
    span_lo = o * s
    span_hi = (o + 1.0) * s
    w = jnp.maximum(
        0.0, jnp.minimum(span_hi, q[None] + 1.0) - jnp.maximum(span_lo, q[None])
    ) / s
    in_crop = (coords >= lo) & (coords < lo + length)
    return w * in_crop[None].astype(jnp.float32)


def _extract_one_view(rgb, segm, ids, max_objs: int, out_res: int):
    """One view: rgb (H, W, 3) f32 [0,255], segm (H, W) int32 ->
    (crops (max_objs, 3, R, R) uint8, bbox (max_objs, 4) int32,
    mask (max_objs,) bool). Mirrors obs_prep.extract_objects."""
    H, W = segm.shape
    D = ids.shape[0]
    onehot = segm[None, :, :] == ids[:, None, None]  # (D, H, W)
    count = jnp.sum(onehot, axis=(1, 2))  # (D,)
    ys = jnp.arange(H, dtype=jnp.int32)
    xs = jnp.arange(W, dtype=jnp.int32)
    big = jnp.int32(1 << 30)
    ymin = jnp.min(jnp.where(onehot, ys[None, :, None], big), axis=(1, 2))
    ymax = jnp.max(jnp.where(onehot, ys[None, :, None], -1), axis=(1, 2))
    xmin = jnp.min(jnp.where(onehot, xs[None, None, :], big), axis=(1, 2))
    xmax = jnp.max(jnp.where(onehot, xs[None, None, :], -1), axis=(1, 2))
    # sanitize absent ids so weight math stays finite (their slots are
    # compacted away below)
    present = count > 0
    ymin = jnp.where(present, ymin, 0)
    ymax = jnp.where(present, ymax, 0)
    xmin = jnp.where(present, xmin, 0)
    xmax = jnp.where(present, xmax, 0)

    # bbox features [xc, yc, h, w] (reference example.py:412-416: h/w are
    # extrema differences WITHOUT +1; centers truncate toward zero)
    bbox = jnp.stack(
        [(xmin + xmax) // 2, (ymin + ymax) // 2, ymax - ymin, xmax - xmin], axis=-1
    ).astype(jnp.int32)

    h = ymax + 1 - ymin
    w = xmax + 1 - xmin
    side = jnp.maximum(h, w)
    wy = jax.vmap(lambda a, b, c: interarea_weights(a, b, c, out_res, H))(
        ymin, h, side
    )  # (D, R, H)
    wx = jax.vmap(lambda a, b, c: interarea_weights(a, b, c, out_res, W))(
        xmin, w, side
    )  # (D, R, W)
    crops = jnp.einsum(
        "doh,hwc,dpw->dcop", wy, rgb, wx, preferred_element_type=jnp.float32
    )  # (D, 3, R, R)
    crops = jnp.clip(jnp.rint(crops), 0, 255).astype(jnp.uint8)

    # compaction: valid ids (>=2 px) fill slots in ascending-id order,
    # capped at max_objs (obs_prep.extract_objects slot loop)
    valid = count >= 2
    rank = jnp.cumsum(valid.astype(jnp.int32)) - 1
    slots = jnp.where(valid & (rank < max_objs), rank, max_objs)
    out_crops = (
        jnp.zeros((max_objs + 1, 3, out_res, out_res), jnp.uint8).at[slots].set(crops)
    )
    out_bbox = jnp.zeros((max_objs + 1, 4), jnp.int32).at[slots].set(bbox)
    out_mask = (
        jnp.zeros((max_objs + 1,), bool).at[slots].max(valid & (slots < max_objs))
    )
    return out_crops[:max_objs], out_bbox[:max_objs], out_mask[:max_objs]


def extract_objects_device(rgb, segm, *, d_budget: int, max_objs: int, out_res: int = 32):
    """Device twin of ``obs_prep.prepare_obs(meta=None)`` for ONE env.

    rgb: (V, H, W, 3) f32 in [0, 255] (view-sorted, HWC); segm: (V, H, W)
    int32 with ids in [0, d_budget] (e.g. the detector's dense ranks from
    ``_paste_segm_device``). Object ids are the 1..d_budget range — the
    ascending iteration order equals the host's sorted-union order, and
    absent ids compact away exactly like the host's ``continue``.

    Returns (crops (V, max_objs, 3, R, R) uint8, bbox (V, max_objs, 4)
    int32, mask (V, max_objs) bool) with views in the input's order.
    """
    ids = jnp.arange(1, d_budget + 1, dtype=jnp.int32)
    return jax.vmap(
        lambda r, s: _extract_one_view(r, s, ids, max_objs, out_res)
    )(rgb, segm)
