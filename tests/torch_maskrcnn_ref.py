"""Composed torch Mask R-CNN reference for the tiny-geometry golden test.

An independent, loop-based re-implementation of torchvision's
``maskrcnn_resnet50_fpn`` inference semantics built from torch *operators*
(F.conv2d / F.linear / F.max_pool2d in NCHW on the raw torchvision-layout
state dict) plus plain-python geometry stages (anchors, greedy NMS,
per-RoI RoIAlign loops). torchvision itself is not installed on this host
(zero egress), so this module is what the composed-graph wiring of
``vima_tpu.nn.maskrcnn`` (NHWC, folded BN, static-shape NMS/top-k,
flattened-pyramid RoIAlign) is validated against end to end —
complementing the per-component torch cross-checks in test_maskrcnn.py.

Semantics references (also cited in vima_tpu/nn/maskrcnn.py):
torchvision GeneralizedRCNNTransform (ImageNet stats),
AnchorGenerator (round-on-half-extent cell anchors), RegionProposalNetwork
filter_proposals (per-level pre-NMS top-k on raw logits, clip, min-size
1e-3, cross-level batched NMS), MultiScaleRoIAlign (canonical level
floor(4 + log2(sqrt(area)/224)), aligned=False, sampling_ratio 2),
RoIHeads postprocess_detections (per-class decode with (10,10,5,5),
score_thresh, min-size 1e-2, per-class batched NMS, top
detections_per_img), MaskRCNNPredictor (2x2-stride-2 deconv).
"""

from __future__ import annotations

import math

import numpy as np

IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)


def _np_nms(boxes, scores, thresh):
    """Greedy NMS, torchvision semantics (IoU > thresh suppresses)."""
    order = list(np.argsort(-scores, kind="stable"))
    keep = []
    while order:
        i = order.pop(0)
        keep.append(i)
        rest = []
        for j in order:
            xx1 = max(boxes[i, 0], boxes[j, 0])
            yy1 = max(boxes[i, 1], boxes[j, 1])
            xx2 = min(boxes[i, 2], boxes[j, 2])
            yy2 = min(boxes[i, 3], boxes[j, 3])
            inter = max(xx2 - xx1, 0) * max(yy2 - yy1, 0)
            a = (boxes[i, 2] - boxes[i, 0]) * (boxes[i, 3] - boxes[i, 1])
            b = (boxes[j, 2] - boxes[j, 0]) * (boxes[j, 3] - boxes[j, 1])
            if inter / max(a + b - inter, 1e-9) <= thresh:
                rest.append(j)
        order = rest
    return keep


def _batched_nms(boxes, scores, cats, thresh):
    off = cats.astype(np.float64) * (boxes.max() + 1.0 if len(boxes) else 1.0)
    return _np_nms(boxes + off[:, None], scores, thresh)


def _decode(anchors, deltas, weights):
    wx, wy, ww, wh = weights
    aw = anchors[:, 2] - anchors[:, 0]
    ah = anchors[:, 3] - anchors[:, 1]
    acx = anchors[:, 0] + 0.5 * aw
    acy = anchors[:, 1] + 0.5 * ah
    dx = deltas[:, 0] / wx
    dy = deltas[:, 1] / wy
    dw = np.minimum(deltas[:, 2] / ww, math.log(1000.0 / 16))
    dh = np.minimum(deltas[:, 3] / wh, math.log(1000.0 / 16))
    cx = dx * aw + acx
    cy = dy * ah + acy
    w = np.exp(dw) * aw
    h = np.exp(dh) * ah
    return np.stack([cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2], axis=1)


def _clip(boxes, h, w):
    out = boxes.copy()
    out[:, 0] = np.clip(out[:, 0], 0, w)
    out[:, 1] = np.clip(out[:, 1], 0, h)
    out[:, 2] = np.clip(out[:, 2], 0, w)
    out[:, 3] = np.clip(out[:, 3], 0, h)
    return out


def _cell_anchors(size, ratios):
    hr = np.sqrt(np.asarray(ratios, np.float64))
    wr = 1.0 / hr
    ws = wr * size
    hs = hr * size
    return np.round(np.stack([-ws / 2, -hs / 2, ws / 2, hs / 2], axis=1))


def _anchors(fh, fw, stride, size, ratios):
    cell = _cell_anchors(size, ratios)
    sx = np.arange(fw) * stride
    sy = np.arange(fh) * stride
    gx, gy = np.meshgrid(sx, sy)
    shifts = np.stack([gx.ravel(), gy.ravel(), gx.ravel(), gy.ravel()], axis=1)
    return (shifts[:, None, :] + cell[None, :, :]).reshape(-1, 4).astype(np.float32)


def _roi_align_np(feat_chw, box, out_size, scale, sampling=2):
    """One RoI, aligned=False, per-sample loops (independent formulation)."""
    C, H, W = feat_chw.shape
    b = box * scale
    bw = max(b[2] - b[0], 1.0)
    bh = max(b[3] - b[1], 1.0)
    cw, ch = bw / out_size, bh / out_size
    out = np.zeros((C, out_size, out_size), np.float32)

    def bil(y, x):
        y = min(max(y, 0.0), H - 1.0)
        x = min(max(x, 0.0), W - 1.0)
        y0, x0 = int(np.floor(y)), int(np.floor(x))
        y1, x1 = min(y0 + 1, H - 1), min(x0 + 1, W - 1)
        wy, wx = y - y0, x - x0
        return (
            feat_chw[:, y0, x0] * (1 - wy) * (1 - wx)
            + feat_chw[:, y0, x1] * (1 - wy) * wx
            + feat_chw[:, y1, x0] * wy * (1 - wx)
            + feat_chw[:, y1, x1] * wy * wx
        )

    for i in range(out_size):
        for j in range(out_size):
            acc = 0.0
            for si in range(sampling):
                for sj in range(sampling):
                    y = b[1] + ch * (i + (si + 0.5) / sampling)
                    x = b[0] + cw * (j + (sj + 0.5) / sampling)
                    acc = acc + bil(y, x)
            out[:, i, j] = acc / (sampling * sampling)
    return out


def torch_maskrcnn_forward(sd, image_hw3, cfg, *, image_valid_hw=None):
    """Full inference on one canvas image (H, W, 3 float [0,1]).

    sd: torchvision-layout state dict (numpy arrays, old vintage keys);
    cfg: the TINY dict from test_maskrcnn (num_classes/blocks/width/...).
    Returns dict(boxes, scores, labels, masks) for the kept detections.
    """
    import torch
    import torch.nn.functional as F

    tt = lambda a: torch.tensor(np.asarray(a), dtype=torch.float32)

    def conv(x, p, stride=1, pad=0, bias=True):
        return F.conv2d(
            x, tt(sd[f"{p}.weight"]),
            tt(sd[f"{p}.bias"]) if bias else None,
            stride=stride, padding=pad,
        )

    def bn(x, p, eps=1e-5):
        w, b = tt(sd[f"{p}.weight"]), tt(sd[f"{p}.bias"])
        m, v = tt(sd[f"{p}.running_mean"]), tt(sd[f"{p}.running_var"])
        s = w / (v + eps).sqrt()
        return x * s.view(1, -1, 1, 1) + (b - m * s).view(1, -1, 1, 1)

    h, w = image_hw3.shape[:2]
    if image_valid_hw is None:
        image_valid_hw = (h, w)
    vh, vw = image_valid_hw
    x = (image_hw3 - np.asarray(IMAGENET_MEAN)) / np.asarray(IMAGENET_STD)
    x = tt(x.transpose(2, 0, 1))[None]

    with torch.no_grad():
        # ---- backbone
        x = F.relu(bn(conv(x, "backbone.body.conv1", stride=2, pad=3, bias=False),
                      "backbone.body.bn1"))
        x = F.max_pool2d(x, 3, stride=2, padding=1)
        feats = []
        for s_i, nblocks in enumerate(cfg["blocks"], start=1):
            for b_i in range(nblocks):
                p = f"backbone.body.layer{s_i}.{b_i}"
                stride = 2 if (s_i > 1 and b_i == 0) else 1
                idn = x
                y = F.relu(bn(conv(x, f"{p}.conv1", bias=False), f"{p}.bn1"))
                y = F.relu(bn(conv(y, f"{p}.conv2", stride=stride, pad=1, bias=False),
                              f"{p}.bn2"))
                y = bn(conv(y, f"{p}.conv3", bias=False), f"{p}.bn3")
                if b_i == 0:
                    idn = bn(conv(x, f"{p}.downsample.0", stride=stride, bias=False),
                             f"{p}.downsample.1")
                x = F.relu(y + idn)
            feats.append(x)

        # ---- FPN
        inners = [conv(f, f"backbone.fpn.inner_blocks.{i}") for i, f in enumerate(feats)]
        outs = [None] * len(inners)
        last = inners[-1]
        outs[-1] = last
        for i in range(len(inners) - 2, -1, -1):
            up = F.interpolate(last, size=inners[i].shape[-2:], mode="nearest")
            last = inners[i] + up
            outs[i] = last
        pyramid = [
            conv(o, f"backbone.fpn.layer_blocks.{i}", pad=1) for i, o in enumerate(outs)
        ]
        pyramid.append(F.max_pool2d(pyramid[-1], 1, stride=2))

        # ---- RPN
        strides = [4, 8, 16, 32, 64]
        ratios = list(cfg.get("anchor_ratios", (0.5, 1.0, 2.0)))
        lvl_boxes, lvl_scores, lvl_ids = [], [], []
        for li, p in enumerate(pyramid):
            t = F.relu(conv(p, "rpn.head.conv", pad=1))
            logits = conv(t, "rpn.head.cls_logits").numpy()[0]  # (A, fh, fw)
            dels = conv(t, "rpn.head.bbox_pred").numpy()[0]  # (4A, fh, fw)
            A = logits.shape[0]
            fh, fw = logits.shape[1:]
            # torchvision permute_and_flatten: (H, W, A) with A fastest
            flat_logits = logits.transpose(1, 2, 0).reshape(-1)
            flat_deltas = (
                dels.reshape(A, 4, fh, fw).transpose(2, 3, 0, 1).reshape(-1, 4)
            )
            anch = _anchors(fh, fw, strides[li], cfg["anchor_sizes"][li], ratios)
            k = min(cfg["pre_nms_top_n"], flat_logits.shape[0])
            top = np.argsort(-flat_logits, kind="stable")[:k]
            boxes = _clip(
                _decode(anch[top], flat_deltas[top], (1, 1, 1, 1)), vh, vw
            )
            keepi = np.flatnonzero(
                (boxes[:, 2] - boxes[:, 0] > 1e-3) & (boxes[:, 3] - boxes[:, 1] > 1e-3)
            )
            lvl_boxes.append(boxes[keepi])
            lvl_scores.append(1 / (1 + np.exp(-flat_logits[top][keepi])))
            lvl_ids.append(np.full(len(keepi), li))
        pb = np.concatenate(lvl_boxes)
        ps = np.concatenate(lvl_scores)
        pl = np.concatenate(lvl_ids)
        keep = _batched_nms(pb, ps, pl, cfg["rpn_nms_thresh"])[: cfg["post_nms_top_n"]]
        proposals = pb[keep]

        # ---- box stage
        np_pyr = [p.numpy()[0] for p in pyramid[:4]]

        def level_of(box):
            area = max((box[2] - box[0]) * (box[3] - box[1]), 1e-6)
            lvl = math.floor(4 + math.log2(math.sqrt(area) / 224.0) + 1e-6)
            return int(np.clip(lvl, 2, 5)) - 2

        def ms_roi(box, out_size):
            li = level_of(box)
            return _roi_align_np(np_pyr[li], box, out_size, 1.0 / strides[li])

        C = cfg["num_classes"]
        rep_w6, rep_b6 = tt(sd["roi_heads.box_head.fc6.weight"]), tt(sd["roi_heads.box_head.fc6.bias"])
        rep_w7, rep_b7 = tt(sd["roi_heads.box_head.fc7.weight"]), tt(sd["roi_heads.box_head.fc7.bias"])
        cls_w, cls_b = tt(sd["roi_heads.box_predictor.cls_score.weight"]), tt(sd["roi_heads.box_predictor.cls_score.bias"])
        reg_w, reg_b = tt(sd["roi_heads.box_predictor.bbox_pred.weight"]), tt(sd["roi_heads.box_predictor.bbox_pred.bias"])

        all_boxes, all_scores, all_labels = [], [], []
        per_prop = []
        for box in proposals:
            roi = tt(ms_roi(box, 7)).reshape(1, -1)
            r = F.relu(F.linear(roi, rep_w6, rep_b6))
            r = F.relu(F.linear(r, rep_w7, rep_b7))
            scores = F.softmax(F.linear(r, cls_w, cls_b), dim=-1).numpy()[0]
            deltas = F.linear(r, reg_w, reg_b).numpy()[0].reshape(C, 4)
            dec = _clip(
                _decode(np.tile(box[None], (C, 1)), deltas, (10.0, 10.0, 5.0, 5.0)),
                vh, vw,
            )
            per_prop.append((dec, scores))
        for dec, scores in per_prop:
            for c in range(1, C):
                b = dec[c]
                if scores[c] <= cfg["box_score_thresh"]:
                    continue
                if b[2] - b[0] <= 1e-2 or b[3] - b[1] <= 1e-2:
                    continue
                all_boxes.append(b)
                all_scores.append(scores[c])
                all_labels.append(c)
        if all_boxes:
            ab = np.asarray(all_boxes)
            asc = np.asarray(all_scores)
            al = np.asarray(all_labels)
            keep = _batched_nms(ab, asc, al, cfg["box_nms_thresh"])
            keep = keep[: cfg["detections_per_img"]]
            det_boxes, det_scores, det_labels = ab[keep], asc[keep], al[keep]
        else:
            det_boxes = np.zeros((0, 4), np.float32)
            det_scores = np.zeros((0,), np.float32)
            det_labels = np.zeros((0,), np.int64)

        # ---- mask stage
        masks = []
        for box, label in zip(det_boxes, det_labels):
            m = tt(ms_roi(box, 14))[None]
            for i in range(1, 5):
                m = F.relu(conv(m, f"roi_heads.mask_head.mask_fcn{i}", pad=1))
            m = F.relu(
                F.conv_transpose2d(
                    m, tt(sd["roi_heads.mask_predictor.conv5_mask.weight"]),
                    tt(sd["roi_heads.mask_predictor.conv5_mask.bias"]), stride=2,
                )
            )
            m = conv(m, "roi_heads.mask_predictor.mask_fcn_logits")
            masks.append(torch.sigmoid(m[0, int(label)]).numpy())
        masks = np.stack(masks) if masks else np.zeros((0, 28, 28), np.float32)

    return {
        "boxes": det_boxes.astype(np.float32),
        "scores": det_scores.astype(np.float32),
        "labels": det_labels.astype(np.int64),
        "masks": masks,
    }
