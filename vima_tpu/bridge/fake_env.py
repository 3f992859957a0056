"""Replay / synthetic environments for CI and benchmarks — no PyBullet.

``FakeVimaEnv`` mimics the VIMA-Bench env surface the harness touches
(reference scripts/example.py:100-240: reset/step/meta_info/prompt/
prompt_assets, ``task.oracle_max_steps``): synthetic scenes with colored
rectangles so the segmentation->crop pipeline has real work to do.
``ReplayEnv`` replays a recorded episode dict (obs/meta/prompt sequences).
"""

from __future__ import annotations

from typing import Dict, List, Optional

import numpy as np


class _Task:
    def __init__(self, oracle_max_steps=4, seed=0):
        self.oracle_max_steps = oracle_max_steps
        self.seed = seed


class FakeVimaEnv:
    """Synthetic two-view env with n_objects rectangles per scene."""

    def __init__(
        self,
        *,
        n_objects: int = 3,
        img_hw=(128, 256),
        views=("front", "top"),
        oracle_max_steps: int = 4,
        seed: int = 0,
        fail_first_resets: int = 0,
    ):
        self.n_objects = n_objects
        self.img_hw = img_hw
        self.views = sorted(views)
        self.task = _Task(oracle_max_steps, seed)
        self.global_seed = seed
        self._rng = np.random.default_rng(seed)
        self._steps = 0
        self._fail_resets_left = fail_first_resets
        self.meta_info = {
            "n_objects": n_objects,
            "obj_id_to_info": {i + 1: {"obj_name": f"obj_{i}"} for i in range(n_objects)},
            "action_bounds": {
                "low": np.asarray([0.25, -0.5], dtype=np.float32),
                "high": np.asarray([0.75, 0.5], dtype=np.float32),
            },
        }
        self.prompt = "Put the {dragged_obj} into the {base_obj}."
        self.prompt_assets = {
            name: self._make_asset() for name in ("dragged_obj", "base_obj")
        }

    # ----------------------------------------------------------- scene gen

    def _scene(self, n_objs):
        H, W = self.img_hw
        rgb = {v: np.zeros((3, H, W), dtype=np.uint8) for v in self.views}
        segm = {v: np.zeros((H, W), dtype=np.uint8) for v in self.views}
        for v in self.views:
            for oid in range(1, n_objs + 1):
                h = int(self._rng.integers(8, 30))
                w = int(self._rng.integers(8, 30))
                y = int(self._rng.integers(0, H - h))
                x = int(self._rng.integers(0, W - w))
                color = self._rng.integers(40, 255, size=3)
                rgb[v][:, y : y + h, x : x + w] = color[:, None, None]
                segm[v][y : y + h, x : x + w] = oid
        return rgb, segm

    def _make_asset(self):
        rgb, segm = self._scene(1)
        return {
            "rgb": rgb,
            "segm": {**segm, "obj_info": {"obj_id": 1}},
            "placeholder_type": "object",
        }

    def _obs(self):
        rgb, segm = self._scene(self.n_objects)
        return {"rgb": rgb, "segm": segm, "ee": int(self._rng.integers(0, 2))}

    # ------------------------------------------------------------- gym api

    def reset(self):
        if self._fail_resets_left > 0:
            self._fail_resets_left -= 1
            raise RuntimeError("synthetic reset failure")
        self._steps = 0
        return self._obs()

    def step(self, action: Dict):
        self._steps += 1
        done = self._steps >= self.task.oracle_max_steps
        success = done and bool(self._rng.random() > 0.5)
        return self._obs(), 0.0, done, {"success": success}

    def render(self):
        pass

    @property
    def unwrapped(self):
        return self


def scripted_target_bins(obs, views=("front", "top")) -> Dict[str, np.ndarray]:
    """Deterministic visuomotor demonstration policy: discrete action bins
    computed from the CURRENT observation (the first visible object's
    center in each view -> position bins; rotations zero). Used as the
    oracle for ``ScriptedTargetEnv`` — a BC-trained policy succeeds there
    iff it reproduces this obs->action mapping, which is the end-to-end
    train->act evidence the fake env's random success flag cannot give.
    """
    from vima_tpu.bridge.obs_prep import segm_bboxes

    views = sorted(views)

    def first_center(v):
        segm = np.asarray(obs["segm"][v])
        by_id = segm_bboxes(segm)
        for oid in sorted(by_id):
            ymin, ymax, xmin, xmax, n_px = by_id[oid]
            if n_px >= 2:
                return (ymin + ymax) // 2, (xmin + xmax) // 2, segm.shape
        return 0, 0, segm.shape

    out = {}
    for pose, v in zip(("pose0", "pose1"), views):
        yc, xc, (H, W) = first_center(v)
        out[f"{pose}_position"] = np.asarray(
            [min(49, yc * 50 // H), min(99, xc * 100 // W)], np.int64
        )
        out[f"{pose}_rotation"] = np.zeros(4, np.int64)
    return out


class ScriptedTargetEnv(FakeVimaEnv):
    """FakeVimaEnv whose success is DEFINED by behavior: the episode
    succeeds iff EVERY step's (continuous, bounded) action matches the
    ``scripted_target_bins`` demonstration for the observation it acted
    on, within half an action bin. Obs generation is inherited (and
    independent of the actions), so same-seed envs replay identical
    episodes for recording and closed-loop evaluation."""

    def reset(self):
        obs = super().reset()
        self._last_obs = obs
        self._all_matched = True
        return obs

    def _matches_target(self, action) -> bool:
        target = scripted_target_bins(self._last_obs, views=self.views)
        lo = np.asarray(self.meta_info["action_bounds"]["low"], np.float64)
        hi = np.asarray(self.meta_info["action_bounds"]["high"], np.float64)
        pos_div = np.asarray([50.0, 100.0])
        ok = True
        for pose in ("pose0", "pose1"):
            tpos = np.clip(
                target[f"{pose}_position"] / pos_div * (hi - lo) + lo, lo, hi
            )
            trot = np.clip(target[f"{pose}_rotation"] / 50.0 * 2.0 - 1.0, -1.0, 1.0)
            ok &= bool(
                np.all(
                    np.abs(np.asarray(action[f"{pose}_position"], np.float64) - tpos)
                    <= 0.4 * (hi - lo) / pos_div
                )
            )
            ok &= bool(
                np.all(
                    np.abs(np.asarray(action[f"{pose}_rotation"], np.float64) - trot)
                    <= 0.4 * (2.0 / 50.0)
                )
            )
        return ok

    def step(self, action: Dict):
        self._all_matched &= self._matches_target(action)
        self._steps += 1
        done = self._steps >= self.task.oracle_max_steps
        obs = self._obs()
        self._last_obs = obs
        return obs, 0.0, done, {"success": done and self._all_matched}


class ReplayEnv:
    """Replays a recorded episode: obs sequence + prompt + meta."""

    def __init__(self, episode: Dict):
        self._episode = episode
        self.meta_info = episode["meta_info"]
        self.prompt = episode["prompt"]
        self.prompt_assets = episode["prompt_assets"]
        self.task = _Task(len(episode["observations"]) - 1, seed=0)
        self._t = 0

    def reset(self):
        self._t = 0
        return self._episode["observations"][0]

    def step(self, action):
        self._t += 1
        done = self._t >= len(self._episode["observations"]) - 1
        return (
            self._episode["observations"][min(self._t, len(self._episode["observations"]) - 1)],
            0.0,
            done,
            {"success": done},
        )

    @property
    def unwrapped(self):
        return self
