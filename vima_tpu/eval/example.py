"""Closed-loop VIMA-Bench evaluation CLI.

Drop-in surface parity with reference scripts/example.py:499-506:

    python -m vima_tpu.eval.example --ckpt <path> --partition <p> --task <t> \
        [--device tpu] [--num-envs N] [--episodes K] [--fake-env]

Differences by design (TPU-first):
  * the policy runs KV-cached on the accelerator; PyBullet stays host-CPU;
  * ``--num-envs`` batches parallel envs through one policy step;
  * per-episode JSONL metrics on stdout (success, steps, p50 latency) —
    the reference has no metrics at all (survey §5).
``--fake-env`` runs the synthetic environment (no vima_bench install).
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--partition", type=str, default="placement_generalization")
    p.add_argument("--task", type=str, default="visual_manipulation")
    p.add_argument("--ckpt", type=str, default=None)
    p.add_argument("--device", type=str, default=None, help="ignored; jax placement")
    p.add_argument("--num-envs", type=int, default=1)
    p.add_argument("--episodes", type=int, default=1)
    p.add_argument("--max-objs", type=int, default=10)
    p.add_argument("--fake-env", action="store_true")
    p.add_argument("--tokenizer", type=str, default=None, help="local tokenizer.json")
    p.add_argument(
        "--trace",
        type=str,
        default=None,
        help="capture a jax.profiler trace of the eval into this directory "
        "(TensorBoard-viewable)",
    )
    cfg = p.parse_args(argv)

    from vima_tpu.bridge.env_loop import ResetFaultTolerance, TimeLimit, run_episode_batch
    from vima_tpu.bridge.tokenizer import PromptTokenizer

    if cfg.ckpt is not None:
        from vima_tpu import create_policy_from_ckpt

        policy, params = create_policy_from_ckpt(cfg.ckpt, cfg.device)
    else:
        # random-init tiny policy (smoke / fake-env runs)
        from vima_tpu.nn.t5 import T5Config
        from vima_tpu.policy import VIMAPolicy, init_params

        policy = VIMAPolicy(
            embed_dim=256, xf_n_layers=2, sattn_n_heads=4, xattn_n_heads=4,
            vit_width=64, vit_layers=1, vit_heads=4, vit_output_dim=64,
            bbox_mlp_hidden_dim=64,
            t5_cfg=T5Config(d_model=128, d_ff=256, num_layers=2, num_heads=4, d_kv=32),
        )
        params = init_params(policy)
        print("note: no --ckpt given; running a random-init policy", file=sys.stderr)

    tokenize = PromptTokenizer(cfg.tokenizer, vocab_size=policy.vocab_size)
    if tokenize.using_fallback:
        if cfg.ckpt is not None:
            # garbage ids into a trained embedding table would silently
            # produce nonsense actions — refuse instead
            tokenize.require_real()
        print("note: t5 tokenizer unavailable; using offline hash tokenizer", file=sys.stderr)

    def make_env(i):
        if cfg.fake_env:
            from vima_tpu.bridge.fake_env import FakeVimaEnv

            return TimeLimit(
                ResetFaultTolerance(FakeVimaEnv(seed=42 + i)), bonus_steps=2
            )
        from vima_bench import PARTITION_TO_SPECS, make  # external dependency

        return TimeLimit(
            ResetFaultTolerance(
                make(
                    cfg.task,
                    modalities=["segm", "rgb"],
                    task_kwargs=PARTITION_TO_SPECS["test"][cfg.partition][cfg.task],
                    seed=42 + i,
                    render_prompt=False,
                    display_debug_window=False,
                    hide_arm_rgb=False,
                )
            ),
            bonus_steps=2,
        )

    envs = [make_env(i) for i in range(cfg.num_envs)]
    totals = {"episodes": 0, "successes": 0}

    import contextlib

    from vima_tpu.utils import trace_to

    with trace_to(cfg.trace) if cfg.trace else contextlib.nullcontext():
        for ep in range(cfg.episodes):
            results = run_episode_batch(
                policy, params, envs, tokenize_prompt=tokenize, max_objs=cfg.max_objs
            )
            for r in results:
                totals["episodes"] += 1
                totals["successes"] += int(r["success"])
                print(json.dumps({"episode": ep, **r}))
    totals["success_rate"] = totals["successes"] / max(totals["episodes"], 1)
    totals["partition"] = cfg.partition
    totals["task"] = cfg.task
    print(json.dumps({"summary": totals}))


if __name__ == "__main__":
    main()
