"""Mask R-CNN (ResNet-50 FPN) — TPU-native Flax, inference.

The reference releases a Mask R-CNN checkpoint for segmentation-free
deployment (reference README.md:34,37: "off-the-shelf detectors",
mask_rcnn.pth) but contains no detector code — evaluation uses the
simulator's ground-truth segmentation (reference scripts/example.py:89).
This module provides the detector as a first-class TPU citizen so
BASELINE config 3 (full policy + Mask R-CNN in the obs loop) runs with no
torch/torchvision dependency.

Design notes (TPU-first, not a port of torchvision):
  * the ENTIRE detection pipeline — backbone, FPN, RPN proposal selection,
    NMS, RoIAlign, box/mask heads — is one static-shape jitted graph.
    Dynamic-shape stages (torchvision filters by score and keeps variable
    counts) become fixed-capacity arrays + validity masks: top-k instead
    of threshold-filter, sort + pairwise-IoU fixpoint NMS instead of a
    serial suppression loop, and a fixed detection budget.
  * NHWC layout throughout (XLA:TPU's native conv layout); frozen
    batchnorm is a per-channel scale/shift folded at convert time.
  * RoIAlign over the feature pyramid samples a single flattened
    multi-level buffer at each RoI's canonical level — one gather per
    RoI, zero dynamic control flow.
  * the 2x2-stride-2 mask deconv is an einsum + reshape (exact
    ConvTranspose2d semantics for the non-overlapping case) — one MXU
    matmul instead of a conv-transpose lowering.

Numerics match torchvision's ``maskrcnn_resnet50_fpn`` at inference:
aligned=False RoIAlign with sampling_ratio=2, box-decode weights
(1,1,1,1) RPN / (10,10,5,5) heads, dw/dh clamp log(1000/16), level
assignment floor(4 + log2(sqrt(area)/224)).
"""

from __future__ import annotations

import math
from typing import Any, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

# ImageNet statistics (torchvision GeneralizedRCNNTransform defaults).
IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)

BBOX_XFORM_CLIP = math.log(1000.0 / 16)


# ---------------------------------------------------------------------------
# Backbone: ResNet-50 + FPN
# ---------------------------------------------------------------------------


class FrozenBN(nn.Module):
    """Frozen batchnorm as per-channel scale/shift.

    The converter folds torchvision's FrozenBatchNorm2d running stats:
    scale = gamma / sqrt(var + eps), shift = beta - mean * scale.
    """

    features: int

    @nn.compact
    def __call__(self, x):
        scale = self.param("scale", nn.initializers.ones, (self.features,))
        shift = self.param("shift", nn.initializers.zeros, (self.features,))
        return x * scale.astype(x.dtype) + shift.astype(x.dtype)


class ConvBN(nn.Module):
    features: int
    kernel: int = 3
    stride: int = 1
    relu: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(
            self.features,
            (self.kernel, self.kernel),
            strides=self.stride,
            padding=self.kernel // 2,
            use_bias=False,
            dtype=self.dtype,
            name="conv",
        )(x)
        x = FrozenBN(self.features, name="bn")(x)
        return nn.relu(x) if self.relu else x


class Bottleneck(nn.Module):
    mid: int
    out: int
    stride: int = 1
    downsample: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        identity = x
        y = ConvBN(self.mid, 1, dtype=self.dtype, name="conv1")(x)
        y = ConvBN(self.mid, 3, stride=self.stride, dtype=self.dtype, name="conv2")(y)
        y = ConvBN(self.out, 1, relu=False, dtype=self.dtype, name="conv3")(y)
        if self.downsample:
            identity = ConvBN(
                self.out, 1, stride=self.stride, relu=False, dtype=self.dtype,
                name="downsample",
            )(x)
        return nn.relu(y + identity)


class ResNetBody(nn.Module):
    """ResNet-(50) body returning C2..C5. ``blocks``/``width`` are knobs so
    tests run a tiny instance; defaults are the resnet50 geometry."""

    blocks: Sequence[int] = (3, 4, 6, 3)
    width: int = 64
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        w = self.width
        x = nn.Conv(
            w, (7, 7), strides=2, padding=3, use_bias=False, dtype=self.dtype,
            name="conv1",
        )(x)
        x = FrozenBN(w, name="bn1")(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        feats = []
        for stage, n in enumerate(self.blocks):
            mid = w * (2**stage)
            out = mid * 4
            for b in range(n):
                stride = 2 if (stage > 0 and b == 0) else 1
                x = Bottleneck(
                    mid,
                    out,
                    stride=stride,
                    downsample=(b == 0),
                    dtype=self.dtype,
                    name=f"layer{stage + 1}_{b}",
                )(x)
            feats.append(x)
        return feats  # C2 (stride 4) .. C5 (stride 32)


class FPN(nn.Module):
    """Top-down feature pyramid (P2..P5 + P6 via stride-2 maxpool)."""

    features: int = 256
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feats):
        inners = [
            nn.Conv(self.features, (1, 1), dtype=self.dtype, name=f"inner{i}")(c)
            for i, c in enumerate(feats)
        ]
        outs = [None] * len(inners)
        last = inners[-1]
        outs[-1] = last
        for i in range(len(inners) - 2, -1, -1):
            h, w = inners[i].shape[-3:-1]
            up = jax.image.resize(last, (*last.shape[:-3], h, w, last.shape[-1]), "nearest")
            last = inners[i] + up
            outs[i] = last
        outs = [
            nn.Conv(self.features, (3, 3), padding=1, dtype=self.dtype, name=f"layer{i}")(o)
            for i, o in enumerate(outs)
        ]
        p6 = nn.max_pool(outs[-1], (1, 1), strides=(2, 2))
        return outs + [p6]  # P2..P5, P6


# ---------------------------------------------------------------------------
# Box utilities (pure jnp; all static shapes)
# ---------------------------------------------------------------------------


def generate_anchors(
    grid_hw: Sequence[Tuple[int, int]],
    strides: Sequence[int],
    sizes: Sequence[int],
    ratios: Sequence[float] = (0.5, 1.0, 2.0),
) -> list:
    """Per-level anchor grids for static feature shapes (numpy, trace-time).

    torchvision AnchorGenerator semantics: zero-centered (x1,y1,x2,y2)
    cell anchors of area size^2 at the given aspect ratios, rounded,
    shifted by stride over the feature grid. ``grid_hw`` is the actual
    per-level feature shape (must match the conv outputs, which is why it
    is passed rather than derived from the canvas). Returns one
    (Hl*Wl*A, 4) array per level.
    """
    out = []
    for (fh, fw), stride, size in zip(grid_hw, strides, sizes):
        hr = np.sqrt(np.asarray(ratios))
        wr = 1.0 / hr
        # torchvision AnchorGenerator rounds ONCE, on the half-extents:
        # round((wr*size)/2) — rounding ws first and again after halving
        # shifts every non-unit-ratio anchor by 1-2 px/side (e.g. size 32
        # ratio 0.5: [-23,-11,23,11], not [-22,-12,22,12]).
        ws = wr * size
        hs = hr * size
        cell = np.round(np.stack([-ws / 2, -hs / 2, ws / 2, hs / 2], axis=1))  # (A, 4)
        sx = np.arange(fw) * stride
        sy = np.arange(fh) * stride
        shift_x, shift_y = np.meshgrid(sx, sy)
        shifts = np.stack(
            [shift_x.ravel(), shift_y.ravel(), shift_x.ravel(), shift_y.ravel()], axis=1
        )
        anchors = (shifts[:, None, :] + cell[None, :, :]).reshape(-1, 4)
        out.append(anchors.astype(np.float32))
    return out


def decode_boxes(anchors, deltas, weights=(1.0, 1.0, 1.0, 1.0)):
    """(dx,dy,dw,dh) regression deltas -> (x1,y1,x2,y2) boxes."""
    ax1, ay1, ax2, ay2 = jnp.split(anchors, 4, axis=-1)
    aw = ax2 - ax1
    ah = ay2 - ay1
    acx = ax1 + 0.5 * aw
    acy = ay1 + 0.5 * ah
    dx, dy, dw, dh = jnp.split(deltas, 4, axis=-1)
    wx, wy, ww, wh = weights
    dx, dy = dx / wx, dy / wy
    dw = jnp.minimum(dw / ww, BBOX_XFORM_CLIP)
    dh = jnp.minimum(dh / wh, BBOX_XFORM_CLIP)
    cx = dx * aw + acx
    cy = dy * ah + acy
    w = jnp.exp(dw) * aw
    h = jnp.exp(dh) * ah
    return jnp.concatenate(
        [cx - 0.5 * w, cy - 0.5 * h, cx + 0.5 * w, cy + 0.5 * h], axis=-1
    )


def clip_boxes(boxes, image_hw):
    h, w = image_hw
    x1, y1, x2, y2 = jnp.split(boxes, 4, axis=-1)
    return jnp.concatenate(
        [
            jnp.clip(x1, 0, w),
            jnp.clip(y1, 0, h),
            jnp.clip(x2, 0, w),
            jnp.clip(y2, 0, h),
        ],
        axis=-1,
    )


def box_iou_one_vs_all(box, boxes):
    """IoU of one (4,) box against (N, 4)."""
    x1 = jnp.maximum(box[0], boxes[:, 0])
    y1 = jnp.maximum(box[1], boxes[:, 1])
    x2 = jnp.minimum(box[2], boxes[:, 2])
    y2 = jnp.minimum(box[3], boxes[:, 3])
    inter = jnp.clip(x2 - x1, 0) * jnp.clip(y2 - y1, 0)
    a = jnp.clip(box[2] - box[0], 0) * jnp.clip(box[3] - box[1], 0)
    b = jnp.clip(boxes[:, 2] - boxes[:, 0], 0) * jnp.clip(boxes[:, 3] - boxes[:, 1], 0)
    return inter / jnp.maximum(a + b - inter, 1e-9)


def _pairwise_iou(boxes):
    """(K, 4) -> (K, K) IoU (same formula as box_iou_one_vs_all)."""
    x1 = jnp.maximum(boxes[:, None, 0], boxes[None, :, 0])
    y1 = jnp.maximum(boxes[:, None, 1], boxes[None, :, 1])
    x2 = jnp.minimum(boxes[:, None, 2], boxes[None, :, 2])
    y2 = jnp.minimum(boxes[:, None, 3], boxes[None, :, 3])
    inter = jnp.clip(x2 - x1, 0) * jnp.clip(y2 - y1, 0)
    area = jnp.clip(boxes[:, 2] - boxes[:, 0], 0) * jnp.clip(
        boxes[:, 3] - boxes[:, 1], 0
    )
    return inter / jnp.maximum(area[:, None] + area[None, :] - inter, 1e-9)


def nms_padded(boxes, scores, valid, iou_thresh: float, topk: int, candidates=None):
    """Masked parallel NMS with a static output budget.

    boxes (N,4), scores (N,), valid (N,) bool -> (idx (topk,) int32,
    keep_scores (topk,), keep_valid (topk,) bool), in descending score
    order, exactly torchvision greedy-NMS semantics (IoU strictly greater
    than the threshold suppresses; equal scores break ties by lower index).

    TPU-first formulation: instead of a topk-iteration serial select-max
    loop (which at torchvision budgets means 1000 sequential fori_loop
    steps of tiny VPU ops — the round-3 detector spent most of its 257 ms
    there), sort once by score, build the pairwise IoU matrix, and solve
    the suppression recurrence keep[i] = valid[i] & !any_{j<i}(keep[j] &
    iou[j,i] > t) by fixpoint iteration: each sweep is one big masked
    any-reduction, and each sweep provably extends the correct prefix by
    >= 1 (the first undecided index only depends on already-correct
    entries), so the while_loop converges to the exact sequential result
    in <= K sweeps — in practice a handful (suppression-chain depth).

    ``candidates``: optional cap on the sorted candidate set (the IoU
    matrix is K^2; the box stage passes ~90k boxes for a 100-detection
    budget, where only the top few thousand scores can possibly matter).
    """
    N = boxes.shape[0]
    K = N if candidates is None else min(int(candidates), N)
    key = jnp.where(valid, scores.astype(jnp.float32), -jnp.inf)
    key, order = jax.lax.top_k(key, K)  # ties: lower index first
    sboxes = boxes[order].astype(jnp.float32)
    svalid = jnp.isfinite(key)

    iou = _pairwise_iou(sboxes)
    ar = jnp.arange(K)
    sup_allowed = (iou > iou_thresh) & (ar[:, None] < ar[None, :])

    def cond(st):
        keep, prev, it = st
        return jnp.logical_and(it < K, jnp.any(keep != prev))

    def body(st):
        keep, _, it = st
        sup = jnp.any(sup_allowed & keep[:, None], axis=0)
        return svalid & ~sup, keep, it + 1

    keep, _, _ = jax.lax.while_loop(
        cond, body, (svalid, jnp.zeros_like(svalid), jnp.int32(0))
    )

    k_out = min(topk, K)
    ks, top_i = jax.lax.top_k(jnp.where(keep, key, -jnp.inf), k_out)
    idx = order[top_i].astype(jnp.int32)
    kvalid = jnp.isfinite(ks)
    if k_out < topk:  # static pad to the requested budget
        pad = topk - k_out
        idx = jnp.pad(idx, (0, pad))
        ks = jnp.pad(ks, (0, pad), constant_values=-jnp.inf)
        kvalid = jnp.pad(kvalid, (0, pad))
    return idx, jnp.where(kvalid, ks, 0.0), kvalid


def roi_align(feat, boxes, out_size: int, spatial_scale: float, sampling_ratio: int = 2):
    """RoIAlign (aligned=False), torchvision semantics, vectorized.

    feat (H, W, C), boxes (N, 4) in image coords -> (N, out, out, C).
    Each output cell averages sampling_ratio^2 bilinear samples.
    """
    H, W, C = feat.shape
    n = sampling_ratio
    b = boxes * spatial_scale
    x1, y1 = b[:, 0], b[:, 1]
    bw = jnp.maximum(b[:, 2] - b[:, 0], 1.0)  # torchvision clamps roi size >= 1
    bh = jnp.maximum(b[:, 3] - b[:, 1], 1.0)
    cell_w = bw / out_size
    cell_h = bh / out_size
    # sample grid: (N, out, n) offsets along each axis
    ij = jnp.arange(out_size, dtype=jnp.float32)
    ss = (jnp.arange(n, dtype=jnp.float32) + 0.5) / n
    ys = y1[:, None, None] + cell_h[:, None, None] * (ij[None, :, None] + ss[None, None, :])
    xs = x1[:, None, None] + cell_w[:, None, None] * (ij[None, :, None] + ss[None, None, :])

    def bilinear(yy, xx):
        # yy (N, out, n), xx (N, out, n) -> (N, out, n, out, n, C)
        yy = jnp.clip(yy, 0.0, H - 1.0)
        xx = jnp.clip(xx, 0.0, W - 1.0)
        y0 = jnp.floor(yy)
        x0 = jnp.floor(xx)
        wy = yy - y0
        wx = xx - x0
        y0 = y0.astype(jnp.int32)
        x0 = x0.astype(jnp.int32)
        y1i = jnp.minimum(y0 + 1, H - 1)
        x1i = jnp.minimum(x0 + 1, W - 1)
        flat = feat.reshape(H * W, C)

        def gather(yi, xi):
            # yi (N,out,n) + xi (N,out,n) -> (N,out,n,out,n,C)
            lin = yi[:, :, :, None, None] * W + xi[:, None, None, :, :]
            return flat[lin.reshape(lin.shape[0], -1)].reshape(*lin.shape, C)

        g00 = gather(y0, x0)
        g01 = gather(y0, x1i)
        g10 = gather(y1i, x0)
        g11 = gather(y1i, x1i)
        wy_ = wy[:, :, :, None, None, None]
        wx_ = wx[:, None, None, :, :, None]
        return (
            g00 * (1 - wy_) * (1 - wx_)
            + g01 * (1 - wy_) * wx_
            + g10 * wy_ * (1 - wx_)
            + g11 * wy_ * wx_
        )

    samples = bilinear(ys, xs)  # (N, out, n, out, n, C)
    return samples.mean(axis=(2, 4))


def fpn_level_assignment(boxes, num_levels: int):
    """Canonical FPN level per box: floor(4 + log2(sqrt(area)/224)),
    clamped to [2, 2+num_levels-1], returned as 0-based index."""
    w = boxes[:, 2] - boxes[:, 0]
    h = boxes[:, 3] - boxes[:, 1]
    scale = jnp.sqrt(jnp.clip(w * h, 1e-6))
    # torchvision LevelMapper: floor(lvl0 + log2(s/s0) + eps)
    lvl = jnp.floor(4 + jnp.log2(scale / 224.0) + 1e-6)
    lvl = jnp.clip(lvl, 2, 2 + num_levels - 1)
    return (lvl - 2).astype(jnp.int32)


# Default RoI chunk for multiscale_roi_align (overridable per call): bounds
# the corner-gather transients; 0 disables chunking.
ROI_CHUNK = 256


def multiscale_roi_align(
    pyramid, boxes, out_size: int, strides, sampling_ratio: int = 2,
    roi_chunk: int | None = None,
):
    """RoIAlign over an FPN pyramid with canonical level selection.

    pyramid: list of (Hl, Wl, C); boxes (N, 4) -> (N, out, out, C).

    One gather from a flattened pyramid: all levels are concatenated into
    one (sum Hl*Wl, C) buffer and every RoI samples it at its assigned
    level's base offset/stride, so each RoI is computed exactly once.
    (The round-3 version ran every RoI on every level and selected — 4x
    the gather traffic; numerically identical since the per-level sample
    math below is the same as :func:`roi_align` with that level's scale.)

    RoIs are processed in ``roi_chunk`` groups via ``lax.map``: the four
    corner gathers materialize (chunk, out, s, out, s, C) each (~200 MB at
    the torchvision 1000-proposal budget with C=256), and a vmapped
    multi-canvas detect would otherwise multiply that transient by the
    batch — measured OOM on the 16 GB chip at 16 canvases.
    """
    lvl = fpn_level_assignment(boxes, len(pyramid))  # (N,) 0-based
    C = pyramid[0].shape[-1]
    flat = jnp.concatenate([f.reshape(-1, C) for f in pyramid], axis=0)
    sizes = np.asarray([f.shape[:2] for f in pyramid], np.int64)  # (L, 2)
    bases = np.concatenate([[0], np.cumsum(sizes[:, 0] * sizes[:, 1])])[:-1]
    Hl = jnp.asarray(sizes[:, 0], jnp.float32)[lvl]
    Wl = jnp.asarray(sizes[:, 1], jnp.float32)[lvl]
    base = jnp.asarray(bases, jnp.int32)[lvl]
    scale = 1.0 / jnp.asarray(strides, jnp.float32)[lvl]

    N = boxes.shape[0]
    if roi_chunk is None:
        roi_chunk = ROI_CHUNK
    if roi_chunk and N > roi_chunk:
        pad = (-N) % roi_chunk
        n_chunks = (N + pad) // roi_chunk

        def to_chunks(a):
            if pad:
                a = jnp.concatenate([a, jnp.zeros((pad,) + a.shape[1:], a.dtype)])
            return a.reshape((n_chunks, roi_chunk) + a.shape[1:])

        chunks = tuple(to_chunks(a) for a in (boxes, base, Hl, Wl, scale))
        out = jax.lax.map(
            lambda c: _roi_align_flat_chunk(flat, *c, out_size, sampling_ratio),
            chunks,
        )
        return out.reshape((N + pad, out_size, out_size, C))[:N]
    return _roi_align_flat_chunk(flat, boxes, base, Hl, Wl, scale, out_size, sampling_ratio)


def _roi_align_flat_chunk(flat, boxes, base, Hl, Wl, scale, out_size, sampling_ratio):
    C = flat.shape[-1]
    n = sampling_ratio
    N = boxes.shape[0]
    b = boxes.astype(jnp.float32) * scale[:, None]
    x1, y1 = b[:, 0], b[:, 1]
    bw = jnp.maximum(b[:, 2] - b[:, 0], 1.0)  # torchvision clamps roi size >= 1
    bh = jnp.maximum(b[:, 3] - b[:, 1], 1.0)
    cell_w = bw / out_size
    cell_h = bh / out_size
    ij = jnp.arange(out_size, dtype=jnp.float32)
    ss = (jnp.arange(n, dtype=jnp.float32) + 0.5) / n
    ys = y1[:, None, None] + cell_h[:, None, None] * (ij[None, :, None] + ss[None, None, :])
    xs = x1[:, None, None] + cell_w[:, None, None] * (ij[None, :, None] + ss[None, None, :])

    yy = jnp.clip(ys, 0.0, (Hl - 1.0)[:, None, None])
    xx = jnp.clip(xs, 0.0, (Wl - 1.0)[:, None, None])
    y0 = jnp.floor(yy)
    x0 = jnp.floor(xx)
    wy = yy - y0
    wx = xx - x0
    Hi = (Hl - 1.0).astype(jnp.int32)[:, None, None]
    Wi = (Wl - 1.0).astype(jnp.int32)[:, None, None]
    y0 = y0.astype(jnp.int32)
    x0 = x0.astype(jnp.int32)
    y1i = jnp.minimum(y0 + 1, Hi)
    x1i = jnp.minimum(x0 + 1, Wi)
    Wrow = Wl.astype(jnp.int32)

    def gather(yi, xi):
        # yi (N,out,n) + xi (N,out,n) -> (N,out,n,out,n,C)
        lin = (
            base[:, None, None, None, None]
            + yi[:, :, :, None, None] * Wrow[:, None, None, None, None]
            + xi[:, None, None, :, :]
        )
        return flat[lin.reshape(N, -1)].reshape(*lin.shape, C)

    g00 = gather(y0, x0)
    g01 = gather(y0, x1i)
    g10 = gather(y1i, x0)
    g11 = gather(y1i, x1i)
    wy_ = wy[:, :, :, None, None, None]
    wx_ = wx[:, None, None, :, :, None]
    samples = (
        g00 * (1 - wy_) * (1 - wx_)
        + g01 * (1 - wy_) * wx_
        + g10 * wy_ * (1 - wx_)
        + g11 * wy_ * wx_
    )
    return samples.mean(axis=(2, 4))


# ---------------------------------------------------------------------------
# Heads
# ---------------------------------------------------------------------------


class RPNHead(nn.Module):
    features: int
    num_anchors: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feats):
        conv = nn.Conv(self.features, (3, 3), padding=1, dtype=self.dtype, name="conv")
        cls = nn.Conv(self.num_anchors, (1, 1), dtype=self.dtype, name="cls_logits")
        bbox = nn.Conv(self.num_anchors * 4, (1, 1), dtype=self.dtype, name="bbox_pred")
        logits, deltas = [], []
        for f in feats:
            t = nn.relu(conv(f))
            logits.append(cls(t))
            deltas.append(bbox(t))
        return logits, deltas


class BoxHead(nn.Module):
    representation: int = 1024
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):  # (N, out, out, C)
        # torchvision flattens torch-layout (C, h, w); transpose so the
        # converted fc6 weights see the same input ordering.
        x = x.transpose(0, 3, 1, 2).reshape(x.shape[0], -1).astype(self.dtype)
        x = nn.relu(nn.Dense(self.representation, dtype=self.dtype, name="fc6")(x))
        x = nn.relu(nn.Dense(self.representation, dtype=self.dtype, name="fc7")(x))
        return x


class BoxPredictor(nn.Module):
    num_classes: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        scores = nn.Dense(self.num_classes, dtype=self.dtype, name="cls_score")(x)
        deltas = nn.Dense(self.num_classes * 4, dtype=self.dtype, name="bbox_pred")(x)
        return scores, deltas


class MaskHead(nn.Module):
    features: int = 256
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = x.astype(self.dtype)
        for i in range(1, 5):
            x = nn.relu(
                nn.Conv(self.features, (3, 3), padding=1, dtype=self.dtype,
                        name=f"mask_fcn{i}")(x)
            )
        return x


class MaskPredictor(nn.Module):
    """2x2-stride-2 deconv + relu + 1x1 conv, as one einsum + conv.

    For the non-overlapping kernel==stride case, ConvTranspose2d is exactly
    out[2i+di, 2j+dj] = sum_ci in[i,j,ci] * W[ci, co, di, dj] (+ bias):
    an outer-product upsample -> einsum + reshape, no conv lowering.
    """

    features: int = 256
    num_classes: int = 91
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):  # (N, h, w, C)
        N, h, w, C = x.shape
        kernel = self.param(
            "conv5_mask_kernel",
            nn.initializers.lecun_normal(),
            (C, self.features, 2, 2),
        )
        bias = self.param("conv5_mask_bias", nn.initializers.zeros, (self.features,))
        y = jnp.einsum("nhwc,cfab->nhawbf", x, kernel.astype(x.dtype))
        y = y.reshape(N, 2 * h, 2 * w, self.features) + bias.astype(x.dtype)
        y = nn.relu(y)
        return nn.Conv(self.num_classes, (1, 1), dtype=self.dtype,
                       name="mask_fcn_logits")(y)


# ---------------------------------------------------------------------------
# Full model
# ---------------------------------------------------------------------------


class MaskRCNN(nn.Module):
    """Static-shape Mask R-CNN inference graph.

    __call__(image (H, W, 3) float [0,1], image_hw (2,) f32 valid extent)
    -> dict(boxes (D,4), scores (D,), labels (D,) int32, masks (D,28,28)
    sigmoid probs, valid (D,) bool), D = ``detections_per_img``.

    The canvas (H, W) is static; ``image_hw`` is the pre-padding resized
    image extent used for box clipping (torchvision keeps per-image sizes
    through its batched transform the same way).
    """

    num_classes: int = 91
    blocks: Sequence[int] = (3, 4, 6, 3)
    width: int = 64
    fpn_features: int = 256
    anchor_sizes: Sequence[int] = (32, 64, 128, 256, 512)
    anchor_ratios: Sequence[float] = (0.5, 1.0, 2.0)
    pre_nms_top_n: int = 1000   # per level
    post_nms_top_n: int = 1000
    rpn_nms_thresh: float = 0.7
    box_score_thresh: float = 0.05
    box_nms_thresh: float = 0.5
    detections_per_img: int = 100
    representation: int = 1024
    # Cap on the box-stage NMS candidate set (the P x (C-1) fg boxes are
    # score-top_k'd to this many before the pairwise-IoU NMS; ~90k at the
    # torchvision budgets, of which only the top few thousand can matter
    # for a 100-detection output). None = exact (full set).
    box_nms_candidates: int = 4096
    # Compute dtype for the conv/dense stages (backbone, FPN, heads) and
    # the RoIAlign gathers. Box geometry, NMS, softmax/sigmoid stay fp32.
    # fp32 (default) matches torchvision inference; bf16 halves the HBM
    # traffic of the conv/gather stages on TPU with box/mask deviations
    # far below the detector's own score threshold noise.
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, image, image_hw):
        H, W, _ = image.shape
        mean = jnp.asarray(IMAGENET_MEAN, jnp.float32)
        std = jnp.asarray(IMAGENET_STD, jnp.float32)
        x = ((image.astype(jnp.float32) - mean) / std).astype(self.dtype)

        feats = ResNetBody(self.blocks, self.width, dtype=self.dtype, name="body")(
            x[None]
        )
        pyramid = FPN(self.fpn_features, dtype=self.dtype, name="fpn")(feats)
        pyramid = [p[0] for p in pyramid]  # drop batch: (Hl, Wl, C)
        strides = [4, 8, 16, 32, 64]

        A = len(self.anchor_ratios)
        logits, deltas = RPNHead(self.fpn_features, A, dtype=self.dtype, name="rpn_head")(
            [p[None] for p in pyramid]
        )
        logits = [l.astype(jnp.float32) for l in logits]
        deltas = [d.astype(jnp.float32) for d in deltas]
        anchors = generate_anchors(
            [p.shape[:2] for p in pyramid], strides, self.anchor_sizes, self.anchor_ratios
        )

        # --- RPN proposal selection (torchvision filter_proposals, static) ---
        lvl_boxes, lvl_scores, lvl_valid, lvl_id = [], [], [], []
        for li in range(len(pyramid)):
            # torch layout flattens (A, H, W) after a (H, W, A) permute of
            # the conv output... torchvision: permute_and_flatten gives
            # (H*W*A) ordering with A fastest — NHWC conv output already
            # has channels (=A) fastest, matching anchor grid ordering.
            s = logits[li][0].reshape(-1)
            d = deltas[li][0].reshape(-1, 4)
            k = min(self.pre_nms_top_n, s.shape[0])
            top_s, top_i = jax.lax.top_k(s, k)
            boxes = decode_boxes(jnp.asarray(anchors[li])[top_i], d[top_i])
            boxes = clip_boxes(boxes, image_hw)
            wh = boxes[:, 2:] - boxes[:, :2]
            ok = (wh[:, 0] > 1e-3) & (wh[:, 1] > 1e-3)
            lvl_boxes.append(boxes)
            lvl_scores.append(jax.nn.sigmoid(top_s))
            lvl_valid.append(ok)
            lvl_id.append(jnp.full((k,), li, jnp.float32))
        pb = jnp.concatenate(lvl_boxes)
        ps = jnp.concatenate(lvl_scores)
        pv = jnp.concatenate(lvl_valid)
        pl = jnp.concatenate(lvl_id)
        # batched NMS across levels: offset boxes per level so cross-level
        # pairs never overlap (torchvision batched_nms trick).
        off = pl * jnp.float32(max(H, W) + 1)
        idx, _, keep_valid = nms_padded(
            pb + off[:, None], jnp.where(pv, ps, 0.0), pv, self.rpn_nms_thresh,
            min(self.post_nms_top_n, pb.shape[0]),
        )
        proposals = pb[idx]
        prop_valid = keep_valid & pv[idx]

        # --- Box stage ---
        roi = multiscale_roi_align(pyramid[:4], proposals, 7, strides[:4])
        rep = BoxHead(self.representation, dtype=self.dtype, name="box_head")(roi)
        cls_logits, box_deltas = BoxPredictor(
            self.num_classes, dtype=self.dtype, name="box_predictor"
        )(rep)
        cls_logits = cls_logits.astype(jnp.float32)
        box_deltas = box_deltas.astype(jnp.float32)
        probs = jax.nn.softmax(cls_logits, axis=-1)  # (P, C)
        P = proposals.shape[0]
        C = self.num_classes
        all_boxes = decode_boxes(
            jnp.broadcast_to(proposals[:, None, :], (P, C, 4)).reshape(-1, 4),
            box_deltas.reshape(-1, 4),
            weights=(10.0, 10.0, 5.0, 5.0),
        ).reshape(P, C, 4)
        all_boxes = clip_boxes(all_boxes.reshape(-1, 4), image_hw).reshape(P, C, 4)
        # drop background column 0
        fg_boxes = all_boxes[:, 1:, :].reshape(-1, 4)
        fg_scores = probs[:, 1:].reshape(-1)
        fg_labels = jnp.broadcast_to(
            jnp.arange(1, C, dtype=jnp.int32)[None, :], (P, C - 1)
        ).reshape(-1)
        wh = fg_boxes[:, 2:] - fg_boxes[:, :2]
        fg_valid = (
            (wh[:, 0] > 1e-2)
            & (wh[:, 1] > 1e-2)
            & (fg_scores > self.box_score_thresh)
            & jnp.repeat(prop_valid, C - 1)
        )
        off = fg_labels.astype(jnp.float32) * jnp.float32(max(H, W) + 1)
        didx, dscores, dvalid = nms_padded(
            fg_boxes + off[:, None],
            jnp.where(fg_valid, fg_scores, 0.0),
            fg_valid,
            self.box_nms_thresh,
            self.detections_per_img,
            candidates=self.box_nms_candidates,
        )
        det_boxes = fg_boxes[didx]
        det_labels = fg_labels[didx]
        dvalid = dvalid & fg_valid[didx]

        # --- Mask stage ---
        mroi = multiscale_roi_align(pyramid[:4], det_boxes, 14, strides[:4])
        mfeat = MaskHead(self.fpn_features, dtype=self.dtype, name="mask_head")(mroi)
        mlogits = MaskPredictor(
            self.fpn_features, self.num_classes, dtype=self.dtype, name="mask_predictor"
        )(mfeat)  # (D, 28, 28, C)
        sel = jnp.take_along_axis(
            mlogits, det_labels[:, None, None, None].astype(jnp.int32), axis=-1
        )[..., 0]
        masks = jax.nn.sigmoid(sel.astype(jnp.float32))

        return {
            "boxes": det_boxes,
            "scores": jnp.where(dvalid, dscores, 0.0),
            "labels": jnp.where(dvalid, det_labels, 0),
            "masks": masks,
            "valid": dvalid,
        }
