"""Record episodes to npz: fixtures for replay benchmarks, parity checks,
and BC training (the "recorded episode" / "canned dump" fixtures the
BASELINE configs name).

    python -m vima_tpu.eval.record --out episodes/ --episodes 8 --fake-env
"""

from __future__ import annotations

import argparse
import pathlib
import sys

import numpy as np

from vima_tpu.bridge.obs_prep import prepare_obs, prepare_prompt_assets
from vima_tpu.train.data import save_episode


def record_episode(
    env, tokenize_prompt, *, max_objs: int, action_sampler=None, seed=0,
    record_rgb: bool = False,
):
    """Run one episode with oracle/random actions; return the npz-ready dict.

    ``record_rgb`` additionally stores the raw per-view frames
    (``rgb/<view>`` (T, 3, H, W)) and raw prompt-asset frames
    (``prompt_assets_rgb/<view>`` (A, 3, H, W)) so the same data directory
    can train the raw-RGB baseline families (the dataset resizes to each
    policy's img_size at load)."""
    rng = np.random.default_rng(seed)
    if action_sampler is None:
        def action_sampler(_obs):
            return {
                "pose0_position": np.stack([rng.integers(0, 50), rng.integers(0, 100)]),
                "pose0_rotation": rng.integers(0, 50, size=4),
                "pose1_position": np.stack([rng.integers(0, 50), rng.integers(0, 100)]),
                "pose1_rotation": rng.integers(0, 50, size=4),
            }

    obs = env.reset()
    word_ids, token_types, names = tokenize_prompt(env.prompt)
    assets, _ = prepare_prompt_assets(env.prompt_assets, names)

    frames, ees, actions, rgb_frames = [], [], [], []
    done = False
    while not done:
        prepared = prepare_obs(obs, env.meta_info, max_objs=max_objs)
        frames.append({k: {v: a[0] for v, a in d.items()} for k, d in prepared["objects"].items()})
        if record_rgb:
            rgb_frames.append({v: np.asarray(obs["rgb"][v]) for v in obs["rgb"]})
        ees.append(int(prepared["ee"][0]))
        act = action_sampler(obs)
        actions.append(act)
        from vima_tpu.policy.base import bound_actions, de_discretize_actions
        import jax.numpy as jnp

        cont = de_discretize_actions({k: jnp.asarray(v) for k, v in act.items()})
        lo = jnp.asarray(env.meta_info["action_bounds"]["low"])
        hi = jnp.asarray(env.meta_info["action_bounds"]["high"])
        env_action = {k: np.asarray(v) for k, v in bound_actions(cont, lo, hi).items()}
        obs, _, done, _ = env.step(env_action)

    T = len(frames)
    episode = {
        "objects": {
            field: {
                v: np.stack([f[field][v] for f in frames]) for v in frames[0][field]
            }
            for field in ("cropped_img", "bbox", "mask")
        },
        "ee": np.asarray(ees, dtype=np.int32),
        "actions": {
            k: np.stack([np.asarray(a[k]) for a in actions]).astype(np.int32)
            for k in actions[0]
        },
        "prompt_word_ids": np.asarray(word_ids, dtype=np.int32),
        "prompt_token_types": np.asarray(token_types, dtype=np.int32),
        "prompt_assets": assets,
    }
    if record_rgb:
        episode["rgb"] = {
            v: np.stack([f[v] for f in rgb_frames]) for v in rgb_frames[0]
        }
        episode["prompt_assets_rgb"] = {
            v: np.stack(
                [np.asarray(env.prompt_assets[n]["rgb"][v]) for n in names]
            )
            for v in rgb_frames[0]
        }
    return episode


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--out", required=True)
    p.add_argument("--episodes", type=int, default=8)
    p.add_argument("--max-objs", type=int, default=10)
    p.add_argument("--fake-env", action="store_true")
    p.add_argument("--partition", type=str, default="placement_generalization")
    p.add_argument("--task", type=str, default="visual_manipulation")
    p.add_argument("--tokenizer", type=str, default=None)
    p.add_argument(
        "--record-rgb",
        action="store_true",
        help="also store raw per-view frames (needed to train the raw-RGB "
        "baseline families from this data)",
    )
    cfg = p.parse_args(argv)

    from vima_tpu.bridge.tokenizer import PromptTokenizer

    tokenize = PromptTokenizer(cfg.tokenizer)
    out = pathlib.Path(cfg.out)
    out.mkdir(parents=True, exist_ok=True)
    for i in range(cfg.episodes):
        if cfg.fake_env:
            from vima_tpu.bridge.fake_env import FakeVimaEnv

            env = FakeVimaEnv(seed=i)
        else:
            from vima_bench import PARTITION_TO_SPECS, make

            env = make(
                cfg.task,
                modalities=["segm", "rgb"],
                task_kwargs=PARTITION_TO_SPECS["test"][cfg.partition][cfg.task],
                seed=i,
                render_prompt=False,
                display_debug_window=False,
                hide_arm_rgb=False,
            )
        episode = record_episode(
            env, tokenize, max_objs=cfg.max_objs, seed=i, record_rgb=cfg.record_rgb
        )
        save_episode(out / f"episode_{i:05d}.npz", episode)
        print(f"recorded {out}/episode_{i:05d}.npz "
              f"({episode['ee'].shape[0]} steps)", file=sys.stderr)


if __name__ == "__main__":
    main()
