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
