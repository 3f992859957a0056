"""Per-family bridge adapters: one closed-loop surface for all 4 policies.

The reference harness only ever drives the flagship — its loader constructs
``VIMAPolicy`` exclusively (vima/__init__.py:10) and scripts/example.py's
obs path (example.py:374-473) produces the cropped-object tokens only that
family consumes. The baseline families (vima_gato_policy.py:120-191,
vima_gpt_policy.py:119-180, vima_flamingo_policy.py:107-154) take raw RGB
frames and were never runnable closed-loop upstream.

Here every family gets an adapter with one surface, so ``env_loop`` (and the
eval CLI) drive any checkpoint the loader produces:

  * ``prep_obs``          host: env obs -> device feed (batch axis 1)
  * ``prep_assets``       host: prompt assets -> gather image source
  * ``group_img_tokens``  interior per-image token capacity for the gather
  * ``cat_images``        concat + pad a group's image sources (bucketing)
  * ``encode`` / ``step`` the jitted cached-rollout entry points
  * ``chunk_obs_tokens`` / ``prefill_slots``  KV-capacity bookkeeping
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from vima_tpu.bridge.obs_prep import (
    prepare_obs,
    prepare_prompt_assets,
    resize_frame_chw,
)


def _pad_axis(arr: np.ndarray, axis: int, size: int) -> np.ndarray:
    pad = size - arr.shape[axis]
    if pad <= 0:
        return arr
    widths = [(0, 0)] * arr.ndim
    widths[axis] = (0, pad)
    return np.pad(arr, widths)


class FlagshipAdapter:
    """VIMAPolicy: cropped-object tokens + bbox MLPs (reference
    vima_policy.py:242-259; obs prep example.py:374-473)."""

    kind = "objects"

    def __init__(self, policy):
        self.policy = policy
        self.views = tuple(sorted(policy.views))

    def prep_obs(self, obs, meta, *, max_objs: int, detector=None) -> Dict:
        if detector is not None:
            obs["segm"] = detector.detect(obs["rgb"], obs)
            return prepare_obs(obs, None, max_objs=max_objs, views=self.views)
        return prepare_obs(obs, meta, max_objs=max_objs, views=self.views)

    def prep_assets(self, prompt_assets, names) -> Tuple[Dict, Optional[Dict]]:
        return prepare_prompt_assets(prompt_assets, names, views=self.views)

    def n_imgs(self, image_batch) -> int:
        return image_batch["mask"][self.views[0]].shape[0]

    def group_img_tokens(self, tokenized) -> int:
        """Interior per-image object capacity: max across the group's assets
        (reference max-objects-across-assets semantics, vima_policy.py:168-231).
        Interior masked slots shift T5 relative positions, so this is NOT
        bucketed — it must match the reference exactly."""
        return max(t[2]["mask"][self.views[0]].shape[1] for t in tokenized)

    def cat_images(self, tokenized, n_objs: int, n_imgs_pad: int):
        if n_objs > 0:
            image_cat = {"cropped_img": {}, "bbox": {}, "mask": {}}
            for v in self.views:
                for key in image_cat:
                    parts = [
                        _pad_axis(np.asarray(t[2][key][v]), 1, n_objs) for t in tokenized
                    ]
                    image_cat[key][v] = _pad_axis(np.concatenate(parts, axis=0), 0, n_imgs_pad)
            return image_cat, {v: image_cat["mask"][v] for v in self.views}, n_imgs_pad
        # no placeholders anywhere in the group: empty image source
        image_cat = {
            key: {v: np.asarray(tokenized[0][2][key][v]) for v in self.views}
            for key in ("cropped_img", "bbox", "mask")
        }
        return image_cat, None, 0

    def chunk_obs_tokens(self, max_objs: int) -> int:
        return max_objs * len(self.views)

    def prefill_slots(self, lp_pad: int) -> int:
        return 0  # prompt lives in its own xattn K/V, not the stream cache

    def encode(self, params, word_batch, image_batch, gather, capacity: int):
        from vima_tpu.policy.rollout import encode_prompt

        _, state = encode_prompt(self.policy, params, word_batch, image_batch, gather, capacity)
        return state

    def step(self, params, state, feed: Dict):
        """Returns (packed_actions (B, 12) int32, new_state) — one D2H fetch;
        host-side unpack via rollout.unpack_actions_np."""
        from vima_tpu.policy.rollout import rollout_step_packed

        return rollout_step_packed(self.policy, params, state, feed["objects"], feed["ee"])


class _RgbAdapterBase:
    """Shared host prep for the raw-RGB families: full frames resized to the
    policy's ``img_size`` (INTER_AREA, same resampling as the crop path)."""

    kind = "rgb"

    def __init__(self, policy):
        self.policy = policy
        self.views = tuple(sorted(policy.views))
        self.img_hw = tuple(policy.img_size)

    def prep_obs(self, obs, meta, *, max_objs: int, detector=None) -> Dict:
        rgb = {
            v: resize_frame_chw(np.asarray(obs["rgb"][v]), self.img_hw)[None]
            for v in self.views
        }
        return {"rgb": rgb, "ee": np.asarray([obs["ee"]], dtype=np.int32)}

    def prep_assets(self, prompt_assets, names) -> Tuple[Dict, Optional[Dict]]:
        frames = {v: [] for v in self.views}
        for name in names:
            asset = prompt_assets[name]
            for v in self.views:
                frames[v].append(resize_frame_chw(np.asarray(asset["rgb"][v]), self.img_hw))
        H, W = self.img_hw
        rgb = {
            v: (
                np.stack(frames[v])
                if frames[v]
                else np.zeros((0, 3, H, W), np.uint8)
            )
            for v in self.views
        }
        return {"rgb": rgb}, None

    def n_imgs(self, image_batch) -> int:
        return image_batch["rgb"][self.views[0]].shape[0]

    def cat_images(self, tokenized, n_objs: int, n_imgs_pad: int):
        rgb = {}
        H, W = self.img_hw
        for v in self.views:
            parts = [np.asarray(t[2]["rgb"][v]).reshape(-1, 3, H, W) for t in tokenized]
            rgb[v] = _pad_axis(np.concatenate(parts, axis=0), 0, n_imgs_pad)
        return {"rgb": rgb}, None, n_imgs_pad


class FlamingoAdapter(_RgbAdapterBase):
    """VIMAFlamingoPolicy: perceiver-resampled frames, xattn decoder
    (reference vima_flamingo_policy.py:107-154)."""

    def group_img_tokens(self, tokenized) -> int:
        return self.policy.num_queries

    def chunk_obs_tokens(self, max_objs: int) -> int:
        return self.policy.num_queries

    def prefill_slots(self, lp_pad: int) -> int:
        return 0

    def encode(self, params, word_batch, image_batch, gather, capacity: int):
        from vima_tpu.policy.rollout_families import encode_prompt_flamingo

        _, state = encode_prompt_flamingo(
            self.policy, params, word_batch, image_batch, gather, capacity
        )
        return state

    def step(self, params, state, feed: Dict):
        from vima_tpu.policy.rollout_families import rollout_step_flamingo_packed

        return rollout_step_flamingo_packed(
            self.policy, params, state, feed["rgb"], feed["ee"]
        )


class _DecoderOnlyAdapter(_RgbAdapterBase):
    """Gato / GPT: in-stream prompt, causal prefill (reference
    vima_gato_policy.py:120-191, vima_gpt_policy.py:119-180)."""

    def prefill_slots(self, lp_pad: int) -> int:
        return lp_pad + 1  # prompt + separator live in the stream cache

    def encode(self, params, word_batch, image_batch, gather, capacity: int):
        from vima_tpu.policy.rollout_families import encode_prompt_decoder_only

        _, state = encode_prompt_decoder_only(
            self.policy, params, word_batch, image_batch, gather, capacity
        )
        return state

    def step(self, params, state, feed: Dict):
        from vima_tpu.policy.rollout_families import rollout_step_decoder_only_packed

        return rollout_step_decoder_only_packed(
            self.policy, params, state, feed["rgb"], feed["ee"]
        )


class GatoAdapter(_DecoderOnlyAdapter):
    def group_img_tokens(self, tokenized) -> int:
        return self.policy.obj_xf_num_queries

    def chunk_obs_tokens(self, max_objs: int) -> int:
        return self.policy.obj_xf_num_queries


class GPTAdapter(_DecoderOnlyAdapter):
    def group_img_tokens(self, tokenized) -> int:
        return 1  # one cls token per prompt image (vima_gpt_policy.py:182-195)

    def chunk_obs_tokens(self, max_objs: int) -> int:
        return 1


def get_adapter(policy):
    """Resolve the bridge adapter for a policy instance (any family)."""
    from vima_tpu.policy import (
        VIMAFlamingoPolicy,
        VIMAGatoPolicy,
        VIMAGPTPolicy,
        VIMAPolicy,
    )

    if isinstance(policy, VIMAPolicy):
        return FlagshipAdapter(policy)
    if isinstance(policy, VIMAFlamingoPolicy):
        return FlamingoAdapter(policy)
    if isinstance(policy, VIMAGatoPolicy):
        return GatoAdapter(policy)
    if isinstance(policy, VIMAGPTPolicy):
        return GPTAdapter(policy)
    raise TypeError(f"no bridge adapter for policy type {type(policy).__name__}")
