"""One-dispatch detector -> obs prep -> policy step (BASELINE config 3).

Round 4 ran the detector-in-the-loop configuration as three serialized
tunnel crossings per loop tick: a detector dispatch (+ its (V, H, W) segm
fetch), host-side crop/pad/resize per env, then the policy-step dispatch
(+ action fetch). At ~25 ms link RTT that floor-bounded the loop at
24.6-50 env-steps/s (BENCH_r04) regardless of device speed.

Here the whole tick is ONE jitted program: raw uint8 frames go up, packed
int32 actions come down, and everything between — canvas resize, Mask
R-CNN, mask pasting (bridge/detector._paste_segm_device), segmentation ->
object crops (bridge/device_prep), and the cached policy step
(policy/rollout._rollout_step_core) — runs on the TPU. Per tick the host
pays exactly one dispatch + one small D2H fetch, and zero crop work.

The detector sub-graph processes canvases in ``detect_chunk`` groups via
``lax.map`` so the box-stage transients (RoI gathers, NMS matrices) stay
bounded as the env batch grows — same budget logic as
``JaxMaskRCNNDetector.detect_batch``, but inside one dispatch instead of
K/chunk serial ones.

Reference: scripts/example.py:89 (segm in the obs contract),
README.md:34,37 (released Mask R-CNN for segmentation-free deployment).
"""

from __future__ import annotations

from typing import Dict, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from vima_tpu.bridge.device_prep import extract_objects_device
from vima_tpu.policy.rollout import _rollout_step_core, pack_actions


class FusedDetectStep:
    """Callable ``(params, state, frames, ee) -> (packed_actions, state)``.

    frames: (B, V, H, W, 3) uint8 raw env frames (views sorted);
    ee: (B,) int32. Compiled executables are cached per (B, H, W); the
    env loop's fixed stream batches keep that set at one or two entries.
    """

    def __init__(
        self,
        detector,
        policy,
        *,
        max_objs: int,
        views: Sequence[str],
        detect_chunk: int = 8,
    ):
        self.detector = detector
        self.policy = policy
        self.max_objs = max_objs
        self.views = tuple(views)
        self.detect_chunk = detect_chunk
        self._jits: Dict[Tuple[int, int, int], object] = {}
        self._prep_jits: Dict[Tuple[int, int, int], object] = {}
        self.calls = 0

    # ------------------------------------------------------------ builders

    def _geometry(self, H: int, W: int):
        det = self.detector
        scale = min(det._min / min(H, W), det._max / max(H, W))
        nh, nw = int(round(H * scale)), int(round(W * scale))
        return scale, nh, nw, -(-nh // 32) * 32, -(-nw // 32) * 32

    def _make_segm_fn(self, B: int, V: int, H: int, W: int):
        """(dparams, frames (B,V,H,W,3) uint8) -> segm (B,V,H,W) int32."""
        from vima_tpu.bridge.detector import _paste_segm_device

        det = self.detector
        scale, nh, nw, ch, cw = self._geometry(H, W)
        model, thr, mthr = det.model, det._thr, det._mthr
        K = B * V
        chunk = min(self.detect_chunk, K)
        Kp = -(-K // chunk) * chunk

        def detect_one(dparams, img_u8):
            img = img_u8.astype(jnp.float32) / 255.0
            img = jax.image.resize(img, (nh, nw, 3), "bilinear")
            img = jnp.pad(img, ((0, ch - nh), (0, cw - nw), (0, 0)))
            out = model.apply(dparams, img, jnp.asarray([nh, nw], jnp.float32))
            return _paste_segm_device(out, scale, H, W, thr, mthr)

        def segm_fn(dparams, frames):
            flat = frames.reshape(K, H, W, 3)
            if Kp != K:
                flat = jnp.pad(flat, ((0, Kp - K), (0, 0), (0, 0), (0, 0)))
            chunks = flat.reshape(Kp // chunk, chunk, H, W, 3)
            segm = jax.lax.map(
                lambda c: jax.vmap(lambda im: detect_one(dparams, im))(c), chunks
            )
            return segm.reshape(Kp, H, W)[:K].reshape(B, V, H, W)

        return segm_fn

    def _objects_from_segm(self, frames, segm):
        """frames (B,V,H,W,3) uint8 + segm (B,V,H,W) int32 -> policy feed."""
        D = self.detector.model.detections_per_img
        crops, bbox, mask = jax.vmap(
            lambda r, s: extract_objects_device(
                r, s, d_budget=D, max_objs=self.max_objs
            )
        )(frames.astype(jnp.float32), segm)
        return {
            "cropped_img": {v: crops[:, i] for i, v in enumerate(self.views)},
            "bbox": {v: bbox[:, i] for i, v in enumerate(self.views)},
            "mask": {v: mask[:, i] for i, v in enumerate(self.views)},
        }

    def _build(self, B: int, V: int, H: int, W: int):
        segm_fn = self._make_segm_fn(B, V, H, W)
        policy = self.policy

        def fused(params, dparams, state, frames, ee):
            segm = segm_fn(dparams, frames)
            objects = self._objects_from_segm(frames, segm)
            actions, new_state = _rollout_step_core(policy, params, state, objects, ee)
            return pack_actions(actions), new_state

        return jax.jit(fused, donate_argnums=(2,))

    # ------------------------------------------------------------- calling

    def __call__(self, params, state, frames: np.ndarray, ee: np.ndarray):
        B, V, H, W, _ = frames.shape
        key = (B, H, W)
        fn = self._jits.get(key)
        if fn is None:
            fn = self._jits[key] = self._build(B, V, H, W)
        self.calls += 1
        return fn(
            params, self.detector.params, state, jnp.asarray(frames), jnp.asarray(ee)
        )

    def prep_only(self, frames: np.ndarray):
        """Debug/test surface: the fused graph's detector+prep stages only.
        frames (B, V, H, W, 3) uint8 -> objects feed (same pytree the
        policy step consumes). Separately jitted; not used by the loop."""
        B, V, H, W, _ = frames.shape
        key = (B, H, W)
        fn = self._prep_jits.get(key)
        if fn is None:
            segm_fn = self._make_segm_fn(B, V, H, W)

            def prep(dparams, frames):
                segm = segm_fn(dparams, frames)
                return self._objects_from_segm(frames, segm), segm

            fn = self._prep_jits[key] = jax.jit(prep)
        return fn(self.detector.params, jnp.asarray(frames))


def frames_feed(obs, views: Sequence[str]) -> Dict:
    """Host prep for the fused path: just stack the raw view frames HWC.
    (All crop/resize work moved on-device — compare obs_prep.prepare_obs.)"""
    return {
        "frames": np.stack(
            [np.asarray(obs["rgb"][v]).transpose(1, 2, 0) for v in views]
        ).astype(np.uint8),
        "ee": np.int32(obs["ee"]),
    }
