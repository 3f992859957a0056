"""Trajectory dataset -> BC training batches.

The reference ships no data pipeline (training ran in an unreleased
harness over 650K oracle trajectories, model-card.md:27). This module
provides the TPU-native one: episodes stored as npz files (the format
``save_episode`` writes), padded into fixed-shape batches that
``vima_tpu.train.loss.bc_loss`` consumes directly.

Episode npz schema (one file per episode):
  objects/<field>/<view>   (T, n_objs, ...) uint8/int32/bool
  ee                       (T,) int32
  actions/<key>            (T, n_components) int32 (discretized)
  prompt_word_ids          (Lw,) int32
  prompt_token_types       (Lt,) int32  (0 word / 1 image)
  prompt_assets/<field>/<view> (A, n_objs, ...)
optional (written by ``record --record-rgb``; required for obs_mode="rgb"):
  rgb/<view>               (T, 3, H, W) uint8 raw frames
  prompt_assets_rgb/<view> (A, 3, H, W) uint8 raw asset frames

``obs_mode="rgb"`` serves the raw-RGB baseline families (gato/gpt/
flamingo): frames and asset images are resized to the policy's ``img_hw``
at load and the prompt gather uses the family's fixed per-image token
count (``tokens_per_img``) instead of per-object masks.
"""

from __future__ import annotations

import pathlib
from typing import Dict, Iterator, List, Sequence

import numpy as np

from vima_tpu.bridge.prompt_prep import prompt_gather_indices

VIEWS = ("front", "top")
ACTION_KEYS = ("pose0_position", "pose0_rotation", "pose1_position", "pose1_rotation")


def dataset_kwargs_for_policy(policy) -> Dict:
    """obs_mode / img_hw / tokens_per_img for a policy instance: the
    flagship consumes object crops; the baselines consume raw frames at
    their ``img_size`` with a family-fixed per-image prompt token count."""
    from vima_tpu.policy import VIMAPolicy

    if isinstance(policy, VIMAPolicy):
        return {"obs_mode": "objects"}
    if hasattr(policy, "num_queries"):  # flamingo: perceiver queries
        tokens = policy.num_queries
    elif hasattr(policy, "obj_xf_num_queries"):  # gato: patch tokens x views
        tokens = policy.obj_xf_num_queries
    else:  # gpt: one cls token per image
        tokens = 1
    return {"obs_mode": "rgb", "img_hw": tuple(policy.img_size), "tokens_per_img": tokens}


def save_episode(path, episode: Dict) -> None:
    flat = {}

    def rec(prefix, value):
        if isinstance(value, dict):
            for k, v in value.items():
                rec(f"{prefix}/{k}" if prefix else k, v)
        else:
            flat[prefix] = np.asarray(value)

    rec("", episode)
    np.savez_compressed(path, **flat)


def load_episode(path) -> Dict:
    data = np.load(path)
    out: Dict = {}
    for key in data.files:
        parts = key.split("/")
        node = out
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = data[key]
    return out


class TrajectoryDataset:
    """Directory of episode npz files -> shuffled fixed-shape batches."""

    def __init__(
        self,
        root,
        *,
        max_steps: int,
        max_objs: int,
        prompt_len: int,
        seed: int = 0,
        obs_mode: str = "objects",
        img_hw: tuple | None = None,
        tokens_per_img: int | None = None,
        word_len: int | None = None,
        max_assets: int | None = None,
    ):
        """``word_len``/``max_assets``: optional fixed buckets for the
        prompt word ids and asset-image count. Unset (default), samples
        keep their natural sizes, so episodes in a batch must agree; set,
        every sample has identical shapes (heterogeneous data batches
        freely — this is what the sharded format uses)."""
        self.paths: List[pathlib.Path] = sorted(pathlib.Path(root).glob("*.npz"))
        if not self.paths:
            raise FileNotFoundError(f"no episodes under {root}")
        self.max_steps = max_steps
        self.max_objs = max_objs
        self.prompt_len = prompt_len
        if obs_mode not in ("objects", "rgb"):
            raise ValueError(f"obs_mode must be 'objects' or 'rgb', got {obs_mode!r}")
        if obs_mode == "rgb" and (img_hw is None or tokens_per_img is None):
            raise ValueError("obs_mode='rgb' needs img_hw and tokens_per_img")
        self.obs_mode = obs_mode
        self.img_hw = tuple(img_hw) if img_hw else None
        self.tokens_per_img = tokens_per_img
        self.word_len = word_len
        self.max_assets = max_assets
        self._rng = np.random.default_rng(seed)

    def __len__(self):
        return len(self.paths)

    def _pad_steps(self, arr, T):
        pad = T - arr.shape[0]
        if pad <= 0:
            return arr[:T]
        widths = [(0, pad)] + [(0, 0)] * (arr.ndim - 1)
        return np.pad(arr, widths)

    def _pad_objs(self, arr, n, axis=1):
        pad = n - arr.shape[axis]
        if pad <= 0:
            return np.take(arr, range(n), axis=axis)
        widths = [(0, 0)] * arr.ndim
        widths[axis] = (0, pad)
        return np.pad(arr, widths)

    def _episode_to_sample(self, ep: Dict) -> Dict:
        T = self.max_steps
        n = self.max_objs
        t_real = ep["ee"].shape[0]
        sample = {
            "ee": self._pad_steps(ep["ee"].astype(np.int32), T),
            "actions": {
                k: self._pad_steps(ep["actions"][k].astype(np.int32), T)
                for k in ACTION_KEYS
            },
            "action_mask": self._pad_steps(np.ones(t_real, bool), T),
        }
        types = ep["prompt_token_types"].tolist()
        n_words = int(sum(1 for t in types if t == 0))
        word_ids = ep["prompt_word_ids"].astype(np.int32)
        if self.word_len is not None:
            if word_ids.shape[0] > self.word_len:
                raise ValueError(
                    f"episode has {word_ids.shape[0]} prompt words > "
                    f"word_len bucket {self.word_len}"
                )
            word_ids = np.pad(word_ids, (0, self.word_len - word_ids.shape[0]))
            # gather idx below uses [0, word_len) as the word block; padded
            # word rows are simply never referenced.
            n_words = self.word_len
        sample["prompt_word_ids"] = word_ids

        if self.obs_mode == "rgb":
            from vima_tpu.bridge.obs_prep import resize_frame_chw

            if "rgb" not in ep:
                raise KeyError(
                    "episode has no raw frames; re-record with --record-rgb "
                    "to train raw-RGB families"
                )
            sample["rgb"] = {
                v: self._pad_steps(
                    np.stack([resize_frame_chw(f, self.img_hw) for f in ep["rgb"][v]]), T
                )
                for v in VIEWS
            }
            assets_rgb = {
                v: np.stack(
                    [resize_frame_chw(f, self.img_hw) for f in ep["prompt_assets_rgb"][v]]
                )
                for v in VIEWS
            }
            if self.max_assets is not None:
                assets_rgb = {
                    v: self._pad_objs(a, self.max_assets, axis=0)
                    for v, a in assets_rgb.items()
                }
            sample["prompt_assets"] = {"rgb": assets_rgb}
            idx, mask = prompt_gather_indices(
                [types], n_words, None, self.tokens_per_img, pad_to=self.prompt_len,
                n_imgs=self.max_assets,
            )
        else:
            objects = {}
            for field in ("cropped_img", "bbox", "mask"):
                objects[field] = {
                    v: self._pad_steps(self._pad_objs(ep["objects"][field][v], n), T)
                    for v in VIEWS
                }
            sample["objects"] = objects
            # prompt: per-sample gather indices at a fixed prompt_len bucket
            asset_masks = {v: ep["prompt_assets"]["mask"][v] for v in VIEWS}
            qp = asset_masks[VIEWS[0]].shape[1] * len(VIEWS)
            idx, mask = prompt_gather_indices(
                [types], n_words, asset_masks, qp, pad_to=self.prompt_len,
                n_imgs=self.max_assets,
            )
            assets = {
                field: {v: ep["prompt_assets"][field][v] for v in VIEWS}
                for field in ("cropped_img", "bbox", "mask")
            }
            if self.max_assets is not None:
                assets = {
                    field: {
                        v: self._pad_objs(a, self.max_assets, axis=0)
                        for v, a in d.items()
                    }
                    for field, d in assets.items()
                }
            sample["prompt_assets"] = assets
        sample["prompt_gather_idx"] = idx[0]
        sample["prompt_mask"] = mask[0]
        return sample

    def batches(
        self, batch_size: int, *, epochs: int = 1, shuffle: bool = True
    ) -> Iterator[Dict]:
        """Yield stacked batches; episodes within a batch must share asset
        counts (bucketing is the caller's concern for heterogeneous data).
        The trailing remainder (< batch_size episodes) is dropped to keep
        shapes static for jit. ``shuffle=False`` gives a deterministic order
        (validation passes must score the same episodes every time)."""
        for _ in range(epochs):
            order = (
                self._rng.permutation(len(self.paths))
                if shuffle
                else np.arange(len(self.paths))
            )
            for i in range(0, len(order) - batch_size + 1, batch_size):
                samples = [
                    self._episode_to_sample(load_episode(self.paths[j]))
                    for j in order[i : i + batch_size]
                ]
                yield _stack(samples)


def _stack(samples: Sequence[Dict]):
    def rec(items):
        if isinstance(items[0], dict):
            return {k: rec([it[k] for it in items]) for k in items[0]}
        return np.stack(items, axis=0)

    return rec(samples)
