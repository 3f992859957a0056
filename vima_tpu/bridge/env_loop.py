"""Closed-loop evaluation: host envs <-> jitted TPU policy.

Replaces the reference harness loop (scripts/example.py:100-240) with:
  * KV-cached per-step policy calls (no full-sequence recompute);
  * N parallel envs batched into ONE policy step (the reference runs one
    env, one forward per step) — episodes shard naturally over the batch
    (and over a ``dp`` mesh axis when one is provided);
  * per-env fault isolation: a crashing env is re-reset without killing the
    batch (survey §5 "failure detection");
  * reset fault tolerance + time limits matching the reference wrappers
    (example.py:476-496);
  * structured per-episode metrics (JSONL-able dicts) — the reference has
    none (survey §5 "metrics").
"""

from __future__ import annotations

import concurrent.futures
import time
from typing import Callable, Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from vima_tpu.bridge.obs_prep import (
    prepare_obs,
    prepare_prompt_assets,
    stack_obs_batch,
)
from vima_tpu.bridge.prompt_prep import prompt_gather_indices
from vima_tpu.policy.base import bound_actions, de_discretize_actions
from vima_tpu.policy.rollout import encode_prompt, rollout_step


class ResetFaultTolerance:
    """Retry reset with seed bumps (reference example.py:476-491)."""

    max_retries = 10

    def __init__(self, env):
        self.env = env

    def reset(self):
        for _ in range(self.max_retries):
            try:
                return self.env.reset()
            except Exception:
                current_seed = getattr(self.env.unwrapped.task, "seed", 0)
                self.env.global_seed = current_seed + 1
        raise RuntimeError(f"Failed to reset environment after {self.max_retries} retries")

    def __getattr__(self, name):
        return getattr(self.env, name)


class TimeLimit:
    """oracle_max_steps + bonus_steps cap (reference example.py:494-496)."""

    def __init__(self, env, bonus_steps: int = 2):
        self.env = env
        self._max = env.task.oracle_max_steps + bonus_steps
        self._elapsed = 0

    def reset(self):
        self._elapsed = 0
        return self.env.reset()

    def step(self, action):
        obs, rew, done, info = self.env.step(action)
        self._elapsed += 1
        if self._elapsed >= self._max:
            done = True
        return obs, rew, done, info

    def __getattr__(self, name):
        return getattr(self.env, name)


def run_episode_batch(
    policy,
    params,
    envs: Sequence,
    *,
    tokenize_prompt: Callable[[str], tuple],
    max_objs: int = 10,
    capacity: int = 512,
    max_steps: Optional[int] = None,
    detector=None,
    env_workers: int = 0,
) -> List[Dict]:
    """Run one episode on each env, batched through one jitted policy.

    All envs must share prompt/object capacity buckets (padded). For
    simplicity each env gets its own prompt encode (prompts differ per
    episode); the per-step policy call is batched across envs.

    tokenize_prompt(prompt) -> (token_ids, token_types, placeholder_names):
      token_types[i]==0 for word i (consuming token_ids in order), ==1 for a
      placeholder (consuming placeholder_names in order).

    Returns one metrics dict per env.
    """
    B = len(envs)
    t_start = time.perf_counter()

    # KV-cache capacity contract (see policy/rollout.py::rollout_step):
    # fail before the expensive per-env prompt encodes, not after.
    _limit = max_steps or max(env.task.oracle_max_steps + 2 for env in envs)
    _chunk = 1 + 2 * max_objs  # action slot + objects over both views
    if _limit * _chunk > capacity:
        raise ValueError(
            f"episode limit {_limit} x {_chunk}-token chunks exceeds KV "
            f"capacity {capacity}; raise capacity= or lower max_steps/max_objs"
        )

    # --- reset + per-env prompt encode (once per episode)
    obs_list, states, prompt_meta = [], [], []
    for env in envs:
        obs = env.reset()
        obs_list.append(obs)
    # batch B=1 states? prompts differ in length -> pad to shared bucket
    word_ids_all, token_types_all, assets_all = [], [], []
    for env in envs:
        ids, types, names = tokenize_prompt(env.prompt)
        image_batch, obj_masks = prepare_prompt_assets(env.prompt_assets, names)
        word_ids_all.append(ids)
        token_types_all.append(types)
        assets_all.append((image_batch, obj_masks))

    # one encode per env (B=1 each) — prompt lengths vary; the heavy per-step
    # path below is fully batched.
    for b, env in enumerate(envs):
        ids = np.asarray(word_ids_all[b], dtype=np.int32)
        image_batch, obj_masks = assets_all[b]
        n_objs_max = image_batch["mask"]["front"].shape[1] * 2 if image_batch["mask"] else 0
        idx, mask = prompt_gather_indices(
            [token_types_all[b]], len(ids), obj_masks, n_objs_max
        )
        gather = {"idx": jnp.asarray(idx), "mask": jnp.asarray(mask)}
        _, state = encode_prompt(
            policy,
            params,
            jnp.asarray(ids),
            jax.tree_util.tree_map(jnp.asarray, image_batch),
            gather,
            capacity,
        )
        states.append(state)

    # batch the per-env states (they share capacity); prompts are padded to
    # the max prompt length in the batch.
    state = _concat_states(states)

    results = [
        {"steps": 0, "success": False, "done": False, "step_latencies": []}
        for _ in range(B)
    ]
    done = np.zeros(B, dtype=bool)
    steps = 0
    limit = _limit
    while not done.all() and steps < limit:
        if detector is not None:
            # detector-in-the-loop (BASELINE config 3): replace simulator
            # segmentation; object ids come from the detections.
            for obs in obs_list:
                obs["segm"] = detector.detect(obs["rgb"], obs)
            prepared = [
                prepare_obs(obs, None, max_objs=max_objs) for obs in obs_list
            ]
        else:
            prepared = [
                prepare_obs(obs, env.meta_info, max_objs=max_objs)
                for obs, env in zip(obs_list, envs)
            ]
        batch = stack_obs_batch(prepared)
        t0 = time.perf_counter()
        actions, state = rollout_step(
            policy,
            params,
            state,
            jax.tree_util.tree_map(jnp.asarray, batch["objects"]),
            jnp.asarray(batch["ee"]),
        )
        actions_np = {k: np.asarray(v) for k, v in actions.items()}
        dt = time.perf_counter() - t0

        cont = de_discretize_actions({k: jnp.asarray(v) for k, v in actions_np.items()})

        def step_env(b):
            """Physics step for env b (runs in the worker pool: PyBullet
            stepping is the host bottleneck and overlaps across envs —
            survey §7 'host/device pipelining')."""
            env = envs[b]
            lo = jnp.asarray(env.meta_info["action_bounds"]["low"])
            hi = jnp.asarray(env.meta_info["action_bounds"]["high"])
            env_action = bound_actions({k: v[b] for k, v in cont.items()}, lo, hi)
            env_action = {k: np.asarray(v) for k, v in env_action.items()}
            try:
                return env.step(env_action)
            except Exception:
                # per-env fault isolation: mark failed, keep the batch alive
                return obs_list[b], 0.0, True, {"success": False}

        active = [b for b in range(B) if not done[b]]
        if env_workers > 1 and len(active) > 1:
            with concurrent.futures.ThreadPoolExecutor(env_workers) as pool:
                stepped = list(pool.map(step_env, active))
        else:
            stepped = [step_env(b) for b in active]
        for b, (obs, _, d, info) in zip(active, stepped):
            results[b]["step_latencies"].append(dt)
            obs_list[b] = obs
            results[b]["steps"] += 1
            if d:
                done[b] = True
                results[b]["done"] = True
                results[b]["success"] = bool(info.get("success", False))
        steps += 1

    wall = time.perf_counter() - t_start
    for b in range(B):
        lat = results[b].pop("step_latencies")
        results[b]["p50_step_latency_ms"] = float(np.percentile(lat, 50) * 1e3) if lat else None
        results[b]["wall_time_s"] = wall
    return results


def _concat_states(states):
    """Concatenate per-env RolloutStates on the batch axis, padding prompts
    to the longest in the batch."""
    if len(states) == 1:
        return states[0]
    n_layer = len(states[0].prompt_k)
    max_lp = max(s.prompt_k[0].shape[2] for s in states)

    def pad_prompt(arr, axis):
        pad = max_lp - arr.shape[axis]
        if pad == 0:
            return arr
        widths = [(0, 0)] * arr.ndim
        widths[axis] = (0, pad)
        return jnp.pad(arr, widths)

    import jax.numpy as jnp_

    return states[0].replace(
        prompt_k=tuple(
            jnp_.concatenate([pad_prompt(s.prompt_k[i], 2) for s in states], axis=0)
            for i in range(n_layer)
        ),
        prompt_v=tuple(
            jnp_.concatenate([pad_prompt(s.prompt_v[i], 2) for s in states], axis=0)
            for i in range(n_layer)
        ),
        prompt_mask=jnp_.concatenate([pad_prompt(s.prompt_mask, 1) for s in states], axis=0),
        cache_k=tuple(
            jnp_.concatenate([s.cache_k[i] for s in states], axis=0) for i in range(n_layer)
        ),
        cache_v=tuple(
            jnp_.concatenate([s.cache_v[i] for s in states], axis=0) for i in range(n_layer)
        ),
        slot_mask=jnp_.concatenate([s.slot_mask for s in states], axis=0),
        pos_count=jnp_.concatenate([s.pos_count for s in states], axis=0),
        last_action={
            k: jnp_.concatenate([s.last_action[k] for s in states], axis=0)
            for k in states[0].last_action
        },
        has_action=jnp_.concatenate([s.has_action for s in states], axis=0),
    )
