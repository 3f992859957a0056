"""Generate the Mask R-CNN golden-detection fixture (needs torchvision).

The reference releases ``mask_rcnn.pth`` (reference README.md:34,37) but no
detector code; our TPU-native graph (vima_tpu/nn/maskrcnn.py) claims
torchvision-inference numerics. This script produces the ground truth that
claim is tested against. Run it ONCE in an environment that has torchvision
(this repo's CI host has none — zero egress, torch-cpu only):

    python tools/gen_detector_golden.py \
        --ckpt /path/to/mask_rcnn.pth \
        --out tests/fixtures/detector_golden.npz

then commit the npz. ``tests/test_detector_golden.py`` picks the fixture up
automatically and asserts that the converted Flax graph reproduces the
recorded detections on the recorded image (set ``VIMA_TPU_DETECTOR_CKPT`` to
the same .pth when running pytest so the test can convert the weights).

The input image defaults to a deterministic synthetic VIMA-like scene
(seeded colored rectangles at the 128x256 frame size the simulator renders,
bridge/fake_env.py geometry); pass ``--image frame.npy`` (H, W, 3 uint8) to
use a real simulator frame instead. Detections are recorded with
``box_score_thresh=0`` and a fixed top-K so the fixture is non-empty even
for images the released detector finds uninteresting.
"""

from __future__ import annotations

import argparse

import numpy as np


def synthetic_frame(h: int = 128, w: int = 256, n_objects: int = 4, seed: int = 7):
    """Deterministic colored-rectangle scene (same family as
    vima_tpu/bridge/fake_env.py:59-72 so crops look like VIMA obs)."""
    rng = np.random.default_rng(seed)
    img = np.full((h, w, 3), 96, dtype=np.uint8)
    for _ in range(n_objects):
        bh = int(rng.integers(16, 48))
        bw = int(rng.integers(16, 48))
        y = int(rng.integers(0, h - bh))
        x = int(rng.integers(0, w - bw))
        img[y : y + bh, x : x + bw] = rng.integers(40, 255, size=3)
    return img


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", required=True, help="released mask_rcnn.pth")
    ap.add_argument("--out", default="tests/fixtures/detector_golden.npz")
    ap.add_argument("--image", default=None, help="optional (H,W,3) uint8 .npy")
    ap.add_argument("--top-k", type=int, default=20)
    ap.add_argument("--min-size", type=int, default=128)
    ap.add_argument("--max-size", type=int, default=256)
    args = ap.parse_args()

    import torch
    import torchvision

    if args.image is not None:
        img = np.load(args.image)
        assert img.dtype == np.uint8 and img.ndim == 3 and img.shape[2] == 3, img.shape
    else:
        img = synthetic_frame()

    model = torchvision.models.detection.maskrcnn_resnet50_fpn(
        weights=None,
        weights_backbone=None,
        min_size=args.min_size,
        max_size=args.max_size,
        box_score_thresh=0.0,
        box_detections_per_img=args.top_k,
    )
    sd = torch.load(args.ckpt, map_location="cpu")
    if isinstance(sd, dict) and "state_dict" in sd:
        sd = sd["state_dict"]
    model.load_state_dict(sd)
    model.eval()

    x = torch.from_numpy(img).permute(2, 0, 1).float() / 255.0
    with torch.no_grad():
        out = model([x])[0]

    np.savez_compressed(
        args.out,
        image=img,
        boxes=out["boxes"].numpy(),
        labels=out["labels"].numpy().astype(np.int32),
        scores=out["scores"].numpy(),
        masks=out["masks"][:, 0].numpy(),  # (N, H, W) pasted probabilities
        min_size=np.int32(args.min_size),
        max_size=np.int32(args.max_size),
        top_k=np.int32(args.top_k),
        torchvision_version=np.str_(torchvision.__version__),
    )
    print(f"wrote {args.out}: {len(out['boxes'])} detections, "
          f"max score {float(out['scores'].max()) if len(out['scores']) else 0:.3f}")


if __name__ == "__main__":
    main()
