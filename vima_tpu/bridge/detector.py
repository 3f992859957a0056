"""Object detection front-end for the observation loop.

The reference evaluates with ground-truth segmentation from the simulator
(scripts/example.py:89 requests the "segm" modality) and separately releases
a Mask R-CNN checkpoint for segmentation-free deployment (README.md:37).
This module provides both behind one interface (BASELINE config 3 runs the
full policy with the detector in the obs loop):

  * ``OracleSegmDetector`` — passthrough of simulator segmentation;
  * ``MaskRCNNDetector``  — host-side torchvision Mask R-CNN over the raw
    RGB frames, emitting the same {view: (H, W) int} segm format keyed by
    synthetic object ids (gated: torchvision is not in every image).

Detection is host-side preprocessing (like cropping), not TPU work: it runs
concurrently with the device step in the batched env loop.
"""

from __future__ import annotations

from typing import Dict, Protocol

import numpy as np


class Detector(Protocol):
    def detect(self, rgb: Dict[str, np.ndarray], obs: Dict) -> Dict[str, np.ndarray]:
        """rgb: {view: (3, H, W) uint8} -> segm {view: (H, W) int}."""
        ...


class OracleSegmDetector:
    """Uses the simulator's ground-truth segmentation (reference behavior)."""

    def detect(self, rgb, obs):
        return obs["segm"]


def _np_bilinear_resize(img: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Half-pixel-center bilinear resize (torch F.interpolate
    align_corners=False semantics), pure numpy — used for host-side mask
    pasting so no eager device op pays the tunnel round trip."""
    h, w = img.shape[:2]
    ys = (np.arange(out_h) + 0.5) * h / out_h - 0.5
    xs = (np.arange(out_w) + 0.5) * w / out_w - 0.5
    y0 = np.clip(np.floor(ys), 0, h - 1).astype(np.int64)
    x0 = np.clip(np.floor(xs), 0, w - 1).astype(np.int64)
    y1 = np.minimum(y0 + 1, h - 1)
    x1 = np.minimum(x0 + 1, w - 1)
    wy = np.clip(ys - y0, 0.0, 1.0)[:, None]
    wx = np.clip(xs - x0, 0.0, 1.0)[None, :]
    a = img[np.ix_(y0, x0)]
    b = img[np.ix_(y0, x1)]
    c = img[np.ix_(y1, x0)]
    d = img[np.ix_(y1, x1)]
    return a * (1 - wy) * (1 - wx) + b * (1 - wy) * wx + c * wy * (1 - wx) + d * wy * wx


def _paste_segm_device(out, scale: float, h: int, w: int, score_thr: float, mask_thr: float):
    """Device-side mask pasting: detections (score-desc) -> (H, W) int32 segm.

    Exactly the torchvision ``paste_masks_in_image`` + sequential-paint
    semantics of the host loop it replaces (see ``host_paste`` below): pad
    the MxM mask by 1 px, expand the box by (M+2)/M about its center,
    truncate extents to int (toward zero), inclusive +1 pixel extents,
    half-pixel-center bilinear, ``> mask_thr``; earlier (higher-score)
    detections win contested pixels; ids are dense ranks over detections
    that pass score/validity and intersect the frame. Runs as a handful of
    vector ops inside the detector jit — the round-3 host loop resized and
    painted per object per view in Python.

    out: dict for ONE view (boxes (D,4) canvas coords, masks (D,M,M),
    scores (D,), valid (D,)), already in descending score order (the NMS
    output contract).
    """
    import jax.numpy as jnp

    boxes = out["boxes"].astype(jnp.float32) / scale
    masks = out["masks"].astype(jnp.float32)
    scores = out["scores"]
    valid = out["valid"]
    D, M = masks.shape[0], masks.shape[1]
    Mp = M + 2
    padded = jnp.pad(masks, ((0, 0), (1, 1), (1, 1)))

    x1, y1, x2, y2 = boxes[:, 0], boxes[:, 1], boxes[:, 2], boxes[:, 3]
    ex = (x2 - x1) * 0.5 * (Mp / M)
    ey = (y2 - y1) * 0.5 * (Mp / M)
    cx, cy = (x1 + x2) * 0.5, (y1 + y2) * 0.5
    bx1 = jnp.trunc(cx - ex).astype(jnp.int32)
    by1 = jnp.trunc(cy - ey).astype(jnp.int32)
    bx2 = jnp.trunc(cx + ex).astype(jnp.int32)
    by2 = jnp.trunc(cy + ey).astype(jnp.int32)
    bw = jnp.maximum(bx2 - bx1 + 1, 1)
    bh = jnp.maximum(by2 - by1 + 1, 1)

    ys = jnp.arange(h)
    xs = jnp.arange(w)
    r = ys[None, :] - by1[:, None]  # (D, H)
    c = xs[None, :] - bx1[:, None]  # (D, W)
    sy = (r.astype(jnp.float32) + 0.5) * Mp / bh[:, None].astype(jnp.float32) - 0.5
    sx = (c.astype(jnp.float32) + 0.5) * Mp / bw[:, None].astype(jnp.float32) - 0.5
    y0 = jnp.clip(jnp.floor(sy), 0, Mp - 1)
    x0 = jnp.clip(jnp.floor(sx), 0, Mp - 1)
    wy = jnp.clip(sy - y0, 0.0, 1.0)
    wx = jnp.clip(sx - x0, 0.0, 1.0)
    y0 = y0.astype(jnp.int32)
    x0 = x0.astype(jnp.int32)
    y1i = jnp.minimum(y0 + 1, Mp - 1)
    x1i = jnp.minimum(x0 + 1, Mp - 1)

    # separable bilinear: interpolate rows (D, H, Mp), then columns (D, H, W)
    gy0 = jnp.take_along_axis(padded, y0[:, :, None], axis=1)
    gy1 = jnp.take_along_axis(padded, y1i[:, :, None], axis=1)
    gy = gy0 * (1 - wy[:, :, None]) + gy1 * wy[:, :, None]
    g0 = jnp.take_along_axis(gy, x0[:, None, :], axis=2)
    g1 = jnp.take_along_axis(gy, x1i[:, None, :], axis=2)
    m = g0 * (1 - wx[:, None, :]) + g1 * wx[:, None, :]  # (D, H, W)

    inter_x = jnp.minimum(bx2 + 1, w) > jnp.maximum(bx1, 0)
    inter_y = jnp.minimum(by2 + 1, h) > jnp.maximum(by1, 0)
    ok = valid & (scores >= score_thr) & inter_x & inter_y  # (D,)
    inside = (
        (r >= 0)[:, :, None]
        & (r < bh[:, None])[:, :, None]
        & (c >= 0)[:, None, :]
        & (c < bw[:, None])[:, None, :]
    )
    claimed = ok[:, None, None] & inside & (m > mask_thr)
    first = jnp.argmax(claimed, axis=0)  # first claiming detection
    ids = jnp.cumsum(ok.astype(jnp.int32))  # dense 1-based ranks
    return jnp.where(claimed.any(axis=0), ids[first], 0).astype(jnp.int32)


class JaxMaskRCNNDetector:
    """TPU-native Mask R-CNN detector (no torch/torchvision at inference).

    Loads the reference's released ``mask_rcnn.pth`` (torchvision format,
    reference README.md:34,37) via ``ckpt.detector_convert`` and runs the
    static-shape Flax graph (``nn.maskrcnn.MaskRCNN``); both camera views
    go through one vmapped jit call. Resize/pad to the static canvas AND
    mask pasting back to frame coordinates all run inside the jit — the
    host fetches one (V, H, W) int32 segmentation per step (one D2H on the
    ~30 ms-RTT tunneled link). ``host_paste=True`` keeps the round-3
    per-object numpy pasting loop (the numerics oracle for tests).

    VIMA frames are 64x128 (or 128x256); the defaults map them to a
    128x256 canvas (min_size=128) — detection at 2x upscale, 16x fewer
    canvas pixels than torchvision's 800/1333 default. Pass
    ``min_size``/``max_size`` for other geometries, and ``dtype=bfloat16``
    (the CLI default) for bf16 conv/gather stages (nn/maskrcnn.py).

    For tests (or custom detectors), pass ``model``/``params`` directly
    instead of ``ckpt_path``.
    """

    def __init__(
        self,
        ckpt_path: str | None = None,
        *,
        model=None,
        params=None,
        score_threshold: float = 0.5,
        mask_threshold: float = 0.5,
        min_size: int = 128,
        max_size: int = 256,
        host_paste: bool = False,
        **model_overrides,
    ):
        if ckpt_path is not None:
            from vima_tpu.ckpt.detector_convert import load_maskrcnn_from_torch_ckpt

            model, params = load_maskrcnn_from_torch_ckpt(ckpt_path, **model_overrides)
        if model is None or params is None:
            raise ValueError("need either ckpt_path or (model, params)")
        self.model = model
        self.params = params
        self._thr = score_threshold
        self._mthr = mask_threshold
        self._min = min_size
        self._max = max_size
        self._host_paste = host_paste
        self._jit = None  # built lazily once the frame geometry is known
        self._fused = {}  # (policy id, max_objs) -> FusedDetectStep

    def make_fused_step(self, policy, *, max_objs: int, views=None):
        """One-dispatch detect->prep->policy-step for the closed loop (see
        bridge/fused_detect). Returns None for host-paste instances (the
        per-object numpy oracle path has no device segm to fuse on)."""
        if self._host_paste:
            return None
        key = (id(policy), max_objs)
        fs = self._fused.get(key)
        if fs is None:
            from vima_tpu.bridge.fused_detect import FusedDetectStep

            fs = FusedDetectStep(
                self,
                policy,
                max_objs=max_objs,
                views=tuple(views) if views else tuple(sorted(policy.views)),
            )
            self._fused[key] = fs
        return fs

    def _build(self, h: int, w: int):
        import jax
        import jax.numpy as jnp

        scale = min(self._min / min(h, w), self._max / max(h, w))
        nh, nw = int(round(h * scale)), int(round(w * scale))
        ch = -(-nh // 32) * 32
        cw = -(-nw // 32) * 32

        def run(params, frames):  # frames (V, H0, W0, 3) float [0,1]
            def one(img):
                img = jax.image.resize(img, (nh, nw, 3), "bilinear")
                img = jnp.pad(img, ((0, ch - nh), (0, cw - nw), (0, 0)))
                out = self.model.apply(
                    params, img, jnp.asarray([nh, nw], jnp.float32)
                )
                if not self._host_paste:
                    return _paste_segm_device(out, scale, h, w, self._thr, self._mthr)
                return out

            return jax.vmap(one)(frames)

        self._jit = jax.jit(run)
        self._scale = scale
        self._frame_hw = (h, w)

    def detect_batch(self, rgb_list, obs_list=None):
        """Batched detection for N envs in ONE jit call: all envs' views
        stack into a single (K, H, W, 3) canvas batch (K padded to the next
        power of two so the set of compiled executables stays bounded as
        envs finish). The closed loop calls this once per step round
        instead of once per env — per-call dispatch + the ~30 ms tunnel
        RTT amortize across the whole batch (bridge/env_loop). Returns one
        {view: (H, W) int32} segm dict per env."""
        if not rgb_list:
            return []
        if self._host_paste:  # oracle path stays per-env (test surface)
            return [self.detect(rgb, {}) for rgb in rgb_list]
        views = sorted(rgb_list[0].keys())
        frames = np.stack(
            [
                np.asarray(rgb[v]).transpose(1, 2, 0).astype(np.float32) / 255.0
                for rgb in rgb_list
                for v in views
            ]
        )
        K, h, w = frames.shape[:3]
        if self._jit is None or self._frame_hw != (h, w):
            self._build(h, w)
        # Cap the canvases per jit call: each canvas's box stage transients
        # (RoI gathers, NMS matrices) are a few hundred MB even chunked, so
        # an unbounded vmap width would scale transient HBM with env count.
        CHUNK = 8
        segs = []
        for i in range(0, K, CHUNK):
            part = frames[i : i + CHUNK]
            k = part.shape[0]
            kp = 1 << (k - 1).bit_length()
            if kp != k:
                part = np.concatenate(
                    [part, np.zeros((kp - k, h, w, 3), np.float32)]
                )
            segs.append(np.asarray(self._jit(self.params, part))[:k])
        seg = np.concatenate(segs)
        V = len(views)
        return [
            {v: seg[i * V + j] for j, v in enumerate(views)}
            for i in range(len(rgb_list))
        ]

    def detect(self, rgb, obs):
        views = sorted(rgb.keys())
        frames = np.stack(
            [np.asarray(rgb[v]).transpose(1, 2, 0).astype(np.float32) / 255.0 for v in views]
        )
        h, w = frames.shape[1:3]
        if self._jit is None or self._frame_hw != (h, w):
            self._build(h, w)
        import jax

        out = self._jit(self.params, frames)
        if not self._host_paste:
            seg = np.asarray(out)  # one fetch: (V, H, W) int32
            return {view: seg[vi] for vi, view in enumerate(views)}
        out = jax.tree_util.tree_map(np.asarray, out)
        segm = {}
        for vi, view in enumerate(views):
            seg = np.zeros((h, w), dtype=np.int32)
            next_id = 1
            order = np.argsort(-out["scores"][vi])  # paint high -> low score
            for di in order:
                if not out["valid"][vi][di] or out["scores"][vi][di] < self._thr:
                    continue
                x1, y1, x2, y2 = out["boxes"][vi][di] / self._scale
                # torchvision paste_masks_in_image semantics: pad the MxM
                # mask by 1 px, expand the box by (M+2)/M about its center,
                # truncate to int, and use inclusive (+1) pixel extents.
                mask = out["masks"][vi][di]
                M = mask.shape[0]
                mask = np.pad(mask, 1)
                ex = (x2 - x1) * 0.5 * ((M + 2) / M)
                ey = (y2 - y1) * 0.5 * ((M + 2) / M)
                cx, cy = (x1 + x2) * 0.5, (y1 + y2) * 0.5
                bx1, by1 = int(cx - ex), int(cy - ey)
                bx2, by2 = int(cx + ex), int(cy + ey)
                bw, bh = max(bx2 - bx1 + 1, 1), max(by2 - by1 + 1, 1)
                x0, x1i = max(bx1, 0), min(bx2 + 1, w)
                y0, y1i = max(by1, 0), min(by2 + 1, h)
                if x1i <= x0 or y1i <= y0:
                    continue
                m = _np_bilinear_resize(mask, bh, bw) > self._mthr
                m = m[y0 - by1 : y1i - by1, x0 - bx1 : x1i - bx1]
                region = seg[y0:y1i, x0:x1i]
                region[m & (region == 0)] = next_id
                next_id += 1
            segm[view] = seg
        return segm


class MaskRCNNDetector:
    """Host-side Mask R-CNN (the reference's released detector ckpt).

    Requires torchvision; construct lazily so environments without it can
    still import this module.
    """

    def __init__(self, ckpt_path: str | None = None, score_threshold: float = 0.5):
        try:
            import torch
            import torchvision
        except ImportError as e:  # pragma: no cover
            raise ImportError(
                "MaskRCNNDetector needs torchvision; install it or use "
                "OracleSegmDetector (simulator segmentation)"
            ) from e
        self._torch = torch
        self._thr = score_threshold
        self.model = torchvision.models.detection.maskrcnn_resnet50_fpn(weights=None)
        if ckpt_path is not None:
            sd = torch.load(ckpt_path, map_location="cpu")
            if isinstance(sd, dict) and "state_dict" in sd:
                sd = sd["state_dict"]
            self.model.load_state_dict(sd)
        self.model.eval()

    def detect(self, rgb, obs):
        torch = self._torch
        segm = {}
        with torch.no_grad():
            for view, frame in rgb.items():
                img = torch.tensor(np.asarray(frame), dtype=torch.float32) / 255.0
                out = self.model([img])[0]
                seg = np.zeros(frame.shape[-2:], dtype=np.int32)
                next_id = 1
                for mask, score in zip(out["masks"], out["scores"]):
                    if float(score) < self._thr:
                        continue
                    m = mask[0].numpy() > 0.5
                    seg[m] = next_id
                    next_id += 1
                segm[view] = seg
        return segm
