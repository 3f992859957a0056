"""On-device obs prep (bridge/device_prep) and the fused detector->policy
step (bridge/fused_detect) vs the host pipeline they replace.

Host oracle: bridge/obs_prep (byte-identical to reference
scripts/example.py:374-473). The device crop path goes through fp32
weight matmuls + rint while the host goes through cv2/numpy fixed point,
so crop pixels are compared within +-1; bboxes, masks, and slot layout
must be integer-exact.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vima_tpu.bridge.device_prep import extract_objects_device, interarea_weights
from vima_tpu.bridge.obs_prep import crop_pad_resize, extract_objects


def _random_scene(rng, H, W, n_objs, min_side=2, max_side=40):
    rgb = rng.integers(0, 255, size=(3, H, W)).astype(np.uint8)
    segm = np.zeros((H, W), dtype=np.int32)
    for oid in range(1, n_objs + 1):
        h = int(rng.integers(min_side, max_side))
        w = int(rng.integers(min_side, max_side))
        y = int(rng.integers(0, H - h))
        x = int(rng.integers(0, W - w))
        segm[y : y + h, x : x + w] = oid
    return rgb, segm


def test_interarea_weights_match_host_crop():
    """Device weight-matmul crop == host crop_pad_resize within +-1, for
    boxes spanning the downscale, exact-integer, and zoom-in regimes."""
    rng = np.random.default_rng(0)
    H, W = 64, 128
    rgb = rng.integers(0, 255, size=(3, H, W)).astype(np.uint8)
    frame = jnp.asarray(np.transpose(rgb, (1, 2, 0)).astype(np.float32))

    boxes = [
        (0, 63, 0, 127),     # full frame, rectangular
        (10, 41, 20, 51),    # exact 32x32 (identity-ish)
        (5, 68 - 5, 9, 72 - 9),  # 64x64 -> integer 2x downscale
        (30, 44, 100, 120),  # 15x21 -> zoom-in rows, downscale cols
        (8, 12, 40, 44),     # 5x5 -> pure zoom-in
        (0, 2, 0, 2),        # tiny 3x3
        (50, 63, 110, 127),  # corner-anchored
    ]
    for ymin, ymax, xmin, xmax in boxes:
        host = crop_pad_resize(rgb, ymin, ymax, xmin, xmax, 32)
        h = ymax + 1 - ymin
        w = xmax + 1 - xmin
        side = max(h, w)
        wy = interarea_weights(jnp.int32(ymin), jnp.int32(h), jnp.int32(side), 32, H)
        wx = interarea_weights(jnp.int32(xmin), jnp.int32(w), jnp.int32(side), 32, W)
        dev = jnp.einsum("oh,hwc,pw->cop", wy, frame, wx)
        dev = np.asarray(jnp.clip(jnp.rint(dev), 0, 255)).astype(np.int32)
        diff = np.abs(dev - host.astype(np.int32))
        assert diff.max() <= 1, (ymin, ymax, xmin, xmax, diff.max())


def test_extract_objects_device_matches_host():
    """Full per-view extraction: bbox/mask/slot layout exact, crops +-1.
    Scenes include overlap (later ids paint over earlier), 1-pixel objects
    (skipped), absent ids (compacted), and more objects than max_objs."""
    rng = np.random.default_rng(1)
    H, W, D, max_objs = 64, 128, 10, 4
    for case in range(4):
        rgb, segm = _random_scene(rng, H, W, n_objs=D - 2)
        if case == 1:  # a 1-pixel object: must be skipped in both paths
            segm[segm == 2] = 0
            segm[3, 3] = 2
        if case == 2:  # an id absent entirely
            segm[segm == 3] = 0
        crops_h, bbox_h, mask_h = extract_objects(
            rgb, segm, list(range(1, D + 1)), max_objs=max_objs
        )
        crops_d, bbox_d, mask_d = jax.jit(
            lambda r, s: extract_objects_device(
                r[None], s[None], d_budget=D, max_objs=max_objs
            )
        )(
            jnp.asarray(np.transpose(rgb, (1, 2, 0)).astype(np.float32)),
            jnp.asarray(segm),
        )
        np.testing.assert_array_equal(np.asarray(mask_d[0]), mask_h)
        np.testing.assert_array_equal(np.asarray(bbox_d[0]), bbox_h)
        diff = np.abs(
            np.asarray(crops_d[0]).astype(np.int32) - crops_h.astype(np.int32)
        )
        assert diff.max() <= 1, (case, diff.max())


def _tiny_detector():
    from vima_tpu.bridge.detector import JaxMaskRCNNDetector
    from vima_tpu.nn.maskrcnn import MaskRCNN

    model = MaskRCNN(
        num_classes=5, blocks=(1, 1, 1, 1), width=8, fpn_features=16,
        anchor_sizes=(8, 16, 32, 64, 128), pre_nms_top_n=50, post_nms_top_n=20,
        detections_per_img=8, representation=32,
    )
    canvas = jnp.zeros((32, 64, 3), jnp.float32)
    hw = jnp.asarray([32, 64], jnp.float32)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), canvas, hw)
    return JaxMaskRCNNDetector(
        model=model, params=params, min_size=32, max_size=64, score_threshold=0.0
    )


def _tiny_policy():
    from vima_tpu.nn.t5 import T5Config
    from vima_tpu.policy import VIMAPolicy, init_params

    policy = VIMAPolicy(
        embed_dim=64, xf_n_layers=1, sattn_n_heads=4, xattn_n_heads=4,
        vit_width=32, vit_layers=1, vit_heads=2, vit_output_dim=64,
        bbox_mlp_hidden_dim=64,
        t5_cfg=T5Config(
            d_model=48, d_ff=96, num_layers=1, num_heads=4, d_kv=12,
            vocab_size=32128,
        ),
    )
    return policy, init_params(policy)


def test_fused_prep_equals_host_prep_on_device_segm():
    """The fused graph's prep stage == host prepare_obs fed the SAME
    device segmentation: slot/mask/bbox exact, crops +-1. This pins the
    fused path to the per-env detector flow it replaces
    (adapter.prep_obs(meta=None) object-id semantics)."""
    from vima_tpu.bridge.obs_prep import prepare_obs

    det = _tiny_detector()
    policy, _ = _tiny_policy()
    fs = det.make_fused_step(policy, max_objs=3)
    rng = np.random.default_rng(2)
    B, V, H, W = 2, 2, 64, 128
    frames = rng.integers(0, 255, size=(B, V, H, W, 3)).astype(np.uint8)

    objects, segm = fs.prep_only(frames)
    segm = np.asarray(segm)
    views = fs.views
    for b in range(B):
        obs = {
            "rgb": {v: frames[b, i].transpose(2, 0, 1) for i, v in enumerate(views)},
            "segm": {v: segm[b, i] for i, v in enumerate(views)},
            "ee": 0,
        }
        host = prepare_obs(obs, None, max_objs=3, views=views)
        for i, v in enumerate(views):
            np.testing.assert_array_equal(
                np.asarray(objects["mask"][v][b]), host["objects"]["mask"][v][0]
            )
            np.testing.assert_array_equal(
                np.asarray(objects["bbox"][v][b]), host["objects"]["bbox"][v][0]
            )
            diff = np.abs(
                np.asarray(objects["cropped_img"][v][b]).astype(np.int32)
                - host["objects"]["cropped_img"][v][0].astype(np.int32)
            )
            assert diff.max() <= 1, (b, v, diff.max())


def test_fused_closed_loop():
    """run_episode_batch routes through the fused one-dispatch path when a
    device detector is provided, and completes episodes."""
    from vima_tpu.bridge.env_loop import run_episode_batch
    from vima_tpu.bridge.fake_env import FakeVimaEnv
    from vima_tpu.bridge.tokenizer import PromptTokenizer

    det = _tiny_detector()
    policy, params = _tiny_policy()
    tok = PromptTokenizer(None, vocab_size=policy.vocab_size, offline=True)
    envs = [
        FakeVimaEnv(seed=i, n_objects=3, oracle_max_steps=3, img_hw=(64, 128))
        for i in range(2)
    ]
    results = run_episode_batch(
        policy, params, envs, tokenize_prompt=tok, max_objs=3, capacity=64,
        detector=det,
    )
    fs = det._fused[(id(policy), 3)]
    assert fs.calls >= 3  # one dispatch per loop tick, nothing per-env
    assert all(r["done"] for r in results)
    assert all(r["steps"] == 3 for r in results)
