"""Host-side observation preprocessing: segmentation -> per-object bbox ->
crop -> pad-to-square -> 32x32 INTER_AREA resize.

Byte-identical math to reference scripts/example.py:374-473 (and the
prompt-asset variant :259-311), re-designed for the TPU feed:

  * fixed-capacity output — objects are padded to ``max_objs`` slots with a
    mask, so device shapes are static (the reference re-pads the whole
    episode history on the host each step instead, example.py:135-174);
  * batched over parallel envs;
  * the crop+resize inner loop can run through the native C++ kernel
    (vima_tpu/native) when built, with an exact numpy/cv2 fallback.
"""

from __future__ import annotations

from typing import Dict, List, Sequence, Tuple

import numpy as np

try:
    import cv2

    _HAS_CV2 = True
except Exception:  # pragma: no cover
    _HAS_CV2 = False

from vima_tpu.native.crop_resize import (
    crop_pad_resize_batch,
    native_available,
    resize_inter_area,
    segm_bboxes_native,
)


def crop_pad_resize(rgb: np.ndarray, ymin, ymax, xmin, xmax, out_res: int = 32) -> np.ndarray:
    """Crop (3,H,W) rgb to bbox, zero-pad to square (reference
    example.py:417-428: pad_before = diff//2), INTER_AREA-resize to
    (3, out_res, out_res). Byte-identical to the reference's cv2 math; the
    square pad is a preallocated HWC buffer + slice write (np.pad costs
    ~0.13 ms of pure Python per object — this path runs per object per view
    per env step)."""
    h = ymax + 1 - ymin
    w = xmax + 1 - xmin
    side = max(h, w)
    sq = np.zeros((side, side, 3), dtype=rgb.dtype)
    py = (side - h) // 2
    px = (side - w) // 2
    sq[py : py + h, px : px + w] = np.transpose(
        rgb[:, ymin : ymax + 1, xmin : xmax + 1], (1, 2, 0)
    )
    if _HAS_CV2:
        resized = cv2.resize(sq, (out_res, out_res), interpolation=cv2.INTER_AREA)
    else:
        resized = resize_inter_area(sq, out_res, out_res)
    return np.transpose(resized, (2, 0, 1))


def resize_frame_chw(rgb: np.ndarray, hw: Tuple[int, int]) -> np.ndarray:
    """Resize a full (3, H, W) frame to ``hw`` with INTER_AREA — the raw-RGB
    baseline families consume whole frames at the policy's ``img_size``
    (reference vima_gato_policy.py:36-45 / GatoViTEncoder img_size) rather
    than object crops; same resampling as the crop path."""
    if rgb.shape[1:] == tuple(hw):
        return np.ascontiguousarray(rgb)
    hwc = np.ascontiguousarray(np.transpose(rgb, (1, 2, 0)))
    if _HAS_CV2:
        resized = cv2.resize(hwc, (hw[1], hw[0]), interpolation=cv2.INTER_AREA)
    else:
        resized = resize_inter_area(hwc, hw[0], hw[1])
    return np.transpose(resized, (2, 0, 1))


def segm_bboxes(segm: np.ndarray) -> Dict[int, Tuple[int, int, int, int, int]]:
    """One pass over the segmentation: per-id (ymin, ymax, xmin, xmax,
    n_pixels). Replaces a per-object ``np.nonzero(segm == id)`` scan (the
    reference's loop, example.py:400-407) — identical extrema, O(pixels)
    once instead of once per object. Prefers the native C pass (identical
    integer extrema; the numpy nonzero/argsort/reduceat pipeline profiled
    at ~0.26 ms per frame on the single-core host — this runs per view per
    env per step in the closed loop)."""
    native = segm_bboxes_native(segm)
    if native is not None:
        return native
    ys, xs = np.nonzero(segm)
    if len(ys) == 0:
        return {}
    ids = segm[ys, xs]
    order = np.argsort(ids, kind="stable")
    ids_s, ys_s, xs_s = ids[order], ys[order], xs[order]
    uniq, starts = np.unique(ids_s, return_index=True)
    ymin = np.minimum.reduceat(ys_s, starts)
    ymax = np.maximum.reduceat(ys_s, starts)
    xmin = np.minimum.reduceat(xs_s, starts)
    xmax = np.maximum.reduceat(xs_s, starts)
    counts = np.diff(np.append(starts, len(ids_s)))
    return {
        int(u): (int(ymin[i]), int(ymax[i]), int(xmin[i]), int(xmax[i]), int(counts[i]))
        for i, u in enumerate(uniq)
    }


def extract_objects(
    rgb: np.ndarray,
    segm: np.ndarray,
    obj_ids: Sequence[int],
    *,
    max_objs: int,
    out_res: int = 32,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """One view, one frame: (cropped_imgs (max_objs,3,R,R) uint8,
    bboxes (max_objs,4) int32 [xc,yc,h,w], mask (max_objs,) bool).

    Objects whose segmentation covers <2 pixels are skipped (reference
    example.py:408-411). The crop path prefers cv2 (byte-identical to the
    reference); without cv2 the native C++ batch kernel handles all of a
    view's objects in one call (OpenCV-semantics INTER_AREA, within +-1)."""
    crops = np.zeros((max_objs, 3, out_res, out_res), dtype=np.uint8)
    bboxes = np.zeros((max_objs, 4), dtype=np.int32)
    mask = np.zeros((max_objs,), dtype=bool)
    by_id = segm_bboxes(segm)
    boxes_yx = []
    slot = 0
    for obj_id in obj_ids:
        if slot >= max_objs:
            break
        entry = by_id.get(int(obj_id))
        if entry is None:
            continue
        ymin, ymax, xmin, xmax, n_px = entry
        if n_px < 2:
            continue
        x_center, y_center = (xmin + xmax) / 2, (ymin + ymax) / 2
        h, w = ymax - ymin, xmax - xmin
        bboxes[slot] = [int(x_center), int(y_center), int(h), int(w)]
        boxes_yx.append((ymin, ymax, xmin, xmax))
        mask[slot] = True
        slot += 1
    if boxes_yx:
        if not _HAS_CV2 and native_available():
            crops[: len(boxes_yx)] = crop_pad_resize_batch(
                rgb, np.asarray(boxes_yx, np.int32), out_res
            )
        else:
            for i, (ymin, ymax, xmin, xmax) in enumerate(boxes_yx):
                crops[i] = crop_pad_resize(rgb, ymin, ymax, xmin, xmax, out_res)
    return crops, bboxes, mask


def prepare_obs(
    obs: Dict,
    meta: Dict | None,
    *,
    max_objs: int,
    views: Sequence[str] = ("front", "top"),
    out_res: int = 32,
) -> Dict:
    """Single-env single-frame obs -> fixed-capacity device feed.

    obs: {"rgb": {view: (3,H,W)}, "segm": {view: (H,W)}, "ee": int}
    Returns {"objects": {cropped_img/bbox/mask per view: (1, max_objs, ...)},
             "ee": (1,)} — batch axis ready for the jitted rollout step.

    ``meta`` supplies the object-id universe (simulator ground truth);
    pass None when the segmentation comes from a detector — object ids are
    then the segm's nonzero uniques (BASELINE config 3 flow).
    """
    views = sorted(views)
    if meta is not None:
        obj_ids = list(meta["obj_id_to_info"].keys())
    else:
        obj_ids = sorted(
            set(
                int(i)
                for v in views
                for i in np.unique(np.asarray(obs["segm"][v]))
                if i != 0
            )
        )
    objects = {"cropped_img": {}, "bbox": {}, "mask": {}}
    for v in views:
        crops, bboxes, mask = extract_objects(
            np.asarray(obs["rgb"][v]),
            np.asarray(obs["segm"][v]),
            obj_ids,
            max_objs=max_objs,
            out_res=out_res,
        )
        objects["cropped_img"][v] = crops[None]
        objects["bbox"][v] = bboxes[None]
        objects["mask"][v] = mask[None]
    return {"objects": objects, "ee": np.asarray([obs["ee"]], dtype=np.int32)}


def stack_obs_batch(obs_list: List[Dict]) -> Dict:
    """Stack per-env prepared obs (each with leading batch 1) into one batch."""

    def rec(items):
        if isinstance(items[0], dict):
            return {k: rec([it[k] for it in items]) for k in items[0]}
        return np.concatenate(items, axis=0)

    return rec(obs_list)


def prepare_prompt_assets(
    prompt_assets: Dict,
    placeholders_in_order: Sequence[str],
    *,
    views: Sequence[str] = ("front", "top"),
    out_res: int = 32,
) -> Tuple[Dict, Dict]:
    """Prompt assets -> per-image crops/bboxes/masks padded to the max object
    count across assets (reference example.py:259-371).

    placeholders_in_order: asset names in prompt-token order.
    Returns (image_batch {cropped_img/bbox/mask per view: (n_imgs, n_max, ...)},
             per-view obj masks for gather-index building)."""
    views = sorted(views)
    per_asset = []
    for name in placeholders_in_order:
        asset = prompt_assets[name]
        obj_info = asset["segm"]["obj_info"]
        if asset["placeholder_type"] == "object":
            objects = [obj_info["obj_id"]]
        elif asset["placeholder_type"] == "scene":
            objects = [info["obj_id"] for info in obj_info]
        else:
            raise ValueError(f"unknown placeholder type {asset['placeholder_type']!r}")
        entry = {}
        for v in views:
            rgb = np.asarray(asset["rgb"][v])
            segm = np.asarray(asset["segm"][v])
            crops_l, bboxes_l = [], []
            for obj_id in objects:
                ys, xs = np.nonzero(segm == obj_id)
                if len(xs) < 2 or len(ys) < 2:
                    continue
                xmin, xmax = int(np.min(xs)), int(np.max(xs))
                ymin, ymax = int(np.min(ys)), int(np.max(ys))
                bboxes_l.append(
                    [int((xmin + xmax) / 2), int((ymin + ymax) / 2), ymax - ymin, xmax - xmin]
                )
                crops_l.append(crop_pad_resize(rgb, ymin, ymax, xmin, xmax, out_res))
            entry[v] = (crops_l, bboxes_l)
        per_asset.append(entry)

    n_max = max(
        (len(entry[v][0]) for entry in per_asset for v in views), default=0
    )
    image_batch = {"cropped_img": {}, "bbox": {}, "mask": {}}
    for v in views:
        crops = np.zeros((len(per_asset), n_max, 3, out_res, out_res), dtype=np.uint8)
        bboxes = np.zeros((len(per_asset), n_max, 4), dtype=np.int64)
        mask = np.zeros((len(per_asset), n_max), dtype=bool)
        for i, entry in enumerate(per_asset):
            cl, bl = entry[v]
            if cl:
                crops[i, : len(cl)] = np.stack(cl)
                bboxes[i, : len(bl)] = np.asarray(bl)
                mask[i, : len(cl)] = True
        image_batch["cropped_img"][v] = crops
        image_batch["bbox"][v] = bboxes
        image_batch["mask"][v] = mask
    return image_batch, image_batch["mask"]
