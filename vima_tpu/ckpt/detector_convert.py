"""torchvision Mask R-CNN checkpoint -> Flax MaskRCNN params.

The reference releases ``mask_rcnn.pth`` (reference README.md:34,37) in
torchvision ``maskrcnn_resnet50_fpn`` state-dict format but ships no code
that loads it. This converter maps that layout onto
``vima_tpu.nn.maskrcnn.MaskRCNN`` so the detector runs TPU-native with no
torch/torchvision at inference.

Layout hazards handled:
  * Conv2d OIHW -> Flax HWIO transpose.
  * FrozenBatchNorm2d running stats folded to scale/shift
    (scale = gamma / sqrt(var + eps), shift = beta - mean * scale).
  * nn.Linear (out, in) -> kernel transpose.
  * ConvTranspose2d weight (in, out, kh, kw) -> our einsum kernel, which
    uses the identical (in, out, kh, kw) layout (direct copy).
  * both torchvision key vintages: pre-0.12 ``fpn.inner_blocks.0.weight``
    and post ``fpn.inner_blocks.0.0.weight`` (Conv2dNormActivation), same
    for ``rpn.head.conv`` and ``roi_heads.mask_head``.

Geometry (num_classes, widths, anchor count) is auto-detected from tensor
shapes. Strict coverage: every checkpoint key must be consumed.
"""

from __future__ import annotations

from typing import Dict, Tuple

import numpy as np

from vima_tpu.ckpt.convert import StateDict


def _conv(sd: StateDict, prefix: str, bias: bool = True) -> dict:
    out = {"kernel": sd(f"{prefix}.weight").transpose(2, 3, 1, 0)}
    if bias:
        out["bias"] = sd(f"{prefix}.bias")
    return out


def _frozen_bn(sd: StateDict, prefix: str, eps: float) -> dict:
    gamma = sd(f"{prefix}.weight")
    beta = sd(f"{prefix}.bias")
    mean = sd(f"{prefix}.running_mean")
    var = sd(f"{prefix}.running_var")
    scale = gamma / np.sqrt(var + eps)
    return {"scale": scale.astype(np.float32), "shift": (beta - mean * scale).astype(np.float32)}


def _linear(sd: StateDict, prefix: str) -> dict:
    return {"kernel": sd(f"{prefix}.weight").T, "bias": sd(f"{prefix}.bias")}


def _conv_bn(sd: StateDict, conv_prefix: str, bn_prefix: str, eps: float) -> dict:
    return {"conv": _conv(sd, conv_prefix, bias=False), "bn": _frozen_bn(sd, bn_prefix, eps)}


def _dual(sd: StateDict, old: str, new: str) -> str:
    """Pick whichever key-prefix vintage the checkpoint uses."""
    if sd.has(f"{new}.weight"):
        return new
    return old


def convert_maskrcnn(flat_sd: Dict, eps: float = 1e-5) -> Tuple[dict, dict]:
    """Flat torchvision state_dict -> (Flax params, detected geometry cfg)."""
    sd = StateDict(flat_sd)

    blocks = []
    for stage in range(1, 5):
        n = 0
        while sd.has(f"backbone.body.layer{stage}.{n}.conv1.weight"):
            n += 1
        blocks.append(n)
    body = {
        "conv1": _conv(sd, "backbone.body.conv1", bias=False),
        "bn1": _frozen_bn(sd, "backbone.body.bn1", eps),
    }
    width = body["conv1"]["kernel"].shape[-1]
    for stage, n in enumerate(blocks, start=1):
        for b in range(n):
            p = f"backbone.body.layer{stage}.{b}"
            blk = {
                "conv1": _conv_bn(sd, f"{p}.conv1", f"{p}.bn1", eps),
                "conv2": _conv_bn(sd, f"{p}.conv2", f"{p}.bn2", eps),
                "conv3": _conv_bn(sd, f"{p}.conv3", f"{p}.bn3", eps),
            }
            if sd.has(f"{p}.downsample.0.weight"):
                blk["downsample"] = _conv_bn(
                    sd, f"{p}.downsample.0", f"{p}.downsample.1", eps
                )
            body[f"layer{stage}_{b}"] = blk

    fpn = {}
    for i in range(4):
        inner = _dual(
            sd, f"backbone.fpn.inner_blocks.{i}", f"backbone.fpn.inner_blocks.{i}.0"
        )
        layer = _dual(
            sd, f"backbone.fpn.layer_blocks.{i}", f"backbone.fpn.layer_blocks.{i}.0"
        )
        fpn[f"inner{i}"] = _conv(sd, inner)
        fpn[f"layer{i}"] = _conv(sd, layer)
    fpn_features = fpn["inner0"]["kernel"].shape[-1]

    rpn_conv = _dual(sd, "rpn.head.conv", "rpn.head.conv.0.0")
    rpn = {
        "conv": _conv(sd, rpn_conv),
        "cls_logits": _conv(sd, "rpn.head.cls_logits"),
        "bbox_pred": _conv(sd, "rpn.head.bbox_pred"),
    }
    num_anchors = rpn["cls_logits"]["kernel"].shape[-1]

    box_head = {
        "fc6": _linear(sd, "roi_heads.box_head.fc6"),
        "fc7": _linear(sd, "roi_heads.box_head.fc7"),
    }
    box_predictor = {
        "cls_score": _linear(sd, "roi_heads.box_predictor.cls_score"),
        "bbox_pred": _linear(sd, "roi_heads.box_predictor.bbox_pred"),
    }
    num_classes = box_predictor["cls_score"]["kernel"].shape[-1]
    representation = box_head["fc6"]["kernel"].shape[-1]

    mask_head = {}
    for i in range(1, 5):
        p = _dual(
            sd,
            f"roi_heads.mask_head.mask_fcn{i}",
            f"roi_heads.mask_head.{i - 1}.0",
        )
        mask_head[f"mask_fcn{i}"] = _conv(sd, p)

    mask_predictor = {
        # ConvTranspose2d (in, out, kh, kw) == our einsum kernel layout
        "conv5_mask_kernel": sd("roi_heads.mask_predictor.conv5_mask.weight"),
        "conv5_mask_bias": sd("roi_heads.mask_predictor.conv5_mask.bias"),
        "mask_fcn_logits": _conv(sd, "roi_heads.mask_predictor.mask_fcn_logits"),
    }

    leftovers = [k for k in sd.unconsumed() if not k.endswith("num_batches_tracked")]
    if leftovers:
        raise ValueError(f"unconsumed detector checkpoint keys: {leftovers[:8]}")

    params = {
        "params": {
            "body": body,
            "fpn": fpn,
            "rpn_head": rpn,
            "box_head": box_head,
            "box_predictor": box_predictor,
            "mask_head": mask_head,
            "mask_predictor": mask_predictor,
        }
    }
    cfg = {
        "num_classes": int(num_classes),
        "blocks": tuple(blocks),
        "width": int(width),
        "fpn_features": int(fpn_features),
        "representation": int(representation),
        "num_anchors": int(num_anchors),
    }
    return params, cfg


def load_maskrcnn_from_torch_ckpt(ckpt_path: str, **model_overrides):
    """torch ``mask_rcnn.pth`` -> (MaskRCNN module, params).

    Accepts a raw state_dict, or dicts nesting it under ``state_dict`` /
    ``model`` (common torchvision training-harness formats).
    ``model_overrides`` override runtime knobs (anchor sizes, NMS budgets,
    detections_per_img) — geometry comes from the checkpoint.
    """
    import torch

    from vima_tpu.nn.maskrcnn import MaskRCNN

    obj = torch.load(ckpt_path, map_location="cpu", weights_only=False)
    if isinstance(obj, dict):
        for key in ("state_dict", "model"):
            if key in obj and isinstance(obj[key], dict):
                obj = obj[key]
                break
    params, cfg = convert_maskrcnn(obj)
    if cfg["num_anchors"] != len(model_overrides.get("anchor_ratios", (0.5, 1.0, 2.0))):
        raise ValueError(
            f"checkpoint has {cfg['num_anchors']} anchors per cell; pass "
            f"anchor_ratios of that length"
        )
    model = MaskRCNN(
        num_classes=cfg["num_classes"],
        blocks=cfg["blocks"],
        width=cfg["width"],
        fpn_features=cfg["fpn_features"],
        representation=cfg["representation"],
        **model_overrides,
    )
    return model, params
