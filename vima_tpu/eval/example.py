"""Closed-loop VIMA-Bench evaluation CLI.

Drop-in surface parity with reference scripts/example.py:499-506:

    python -m vima_tpu.eval.example --ckpt <path> --partition <p> --task <t> \
        [--device tpu] [--num-envs N] [--episodes K] [--fake-env]

Differences by design (TPU-first):
  * the policy runs KV-cached on the accelerator; PyBullet stays host-CPU;
  * ``--num-envs`` batches parallel envs through one policy step;
  * per-episode JSONL metrics on stdout (success, steps, p50 latency) —
    the reference has no metrics at all (survey §5);
  * ``--all-partitions`` sweeps the full 4-level generalization protocol
    (L1 placement / L2 combinatorial / L3 novel object / L4 novel task,
    reference model-card.md:29-31) over every task in each partition and
    prints one aggregated JSON summary — the reference runs exactly one
    partition x task per invocation (scripts/example.py:499-506).
``--fake-env`` runs the synthetic environment (no vima_bench install).
"""

from __future__ import annotations

import argparse
import json
import sys

# The 4-level evaluation protocol (reference model-card.md:29-31; README.md:49).
ALL_PARTITIONS = (
    "placement_generalization",
    "combinatorial_generalization",
    "novel_object_generalization",
    "novel_task_generalization",
)

# Stand-in task lists for --fake-env sweeps (real runs query
# vima_bench.PARTITION_TO_SPECS). Distinct names exercise the aggregation
# and the compile-cache reuse across tasks; seeds differ per task.
_FAKE_TASKS = {
    "placement_generalization": ["visual_manipulation", "scene_understanding"],
    "combinatorial_generalization": ["novel_adj", "novel_noun"],
    "novel_object_generalization": ["novel_adj_and_noun"],
    "novel_task_generalization": ["follow_order", "twist"],
}


def _partition_tasks(partition: str, fake_env: bool):
    if fake_env:
        return list(_FAKE_TASKS[partition])
    from vima_bench import PARTITION_TO_SPECS  # external dependency

    return sorted(PARTITION_TO_SPECS["test"][partition].keys())


def _build_policy(cfg):
    if cfg.ckpt is not None:
        from vima_tpu import create_policy_from_ckpt

        return create_policy_from_ckpt(cfg.ckpt, cfg.device)
    # random-init tiny policy (smoke / fake-env runs); any of the 4 families
    from vima_tpu.nn.t5 import T5Config
    from vima_tpu.policy import (
        VIMAFlamingoPolicy,
        VIMAGatoPolicy,
        VIMAGPTPolicy,
        VIMAPolicy,
        init_params,
    )

    t5 = T5Config(d_model=128, d_ff=256, num_layers=2, num_heads=4, d_kv=32)
    family = getattr(cfg, "family", "vima")
    if family == "vima":
        policy = VIMAPolicy(
            embed_dim=256, xf_n_layers=2, sattn_n_heads=4, xattn_n_heads=4,
            vit_width=64, vit_layers=1, vit_heads=4, vit_output_dim=64,
            bbox_mlp_hidden_dim=64, t5_cfg=t5,
        )
    else:
        # raw-RGB families: small frames so decoder-only token budgets fit
        common = dict(
            embed_dim=256, img_size=(32, 64), vit_patch_size=16, vit_width=64,
            vit_layers=1, vit_heads=4, t5_cfg=t5, vocab_size=t5.vocab_size,
        )
        if family == "gato":
            policy = VIMAGatoPolicy(n_layer=2, n_head=4, **common)
        elif family == "gpt":
            policy = VIMAGPTPolicy(n_layer=2, n_head=4, **common)
        elif family == "flamingo":
            policy = VIMAFlamingoPolicy(
                dt_n_layers=2, dt_n_heads=4, xattn_n_heads=4,
                perceiver_num_blocks=1, perceiver_num_self_attends_per_block=1,
                perceiver_num_self_attention_heads=4,
                perceiver_num_cross_attention_heads=4, **common,
            )
        else:
            raise ValueError(f"unknown family {family!r}")
    params = init_params(policy)
    print(
        f"note: no --ckpt given; running a random-init {family} policy",
        file=sys.stderr,
    )
    return policy, params


def _make_envs(cfg, partition: str, task: str, seed_base: int):
    from vima_tpu.bridge.env_loop import ResetFaultTolerance, TimeLimit

    def make_env(i):
        if cfg.fake_env:
            from vima_tpu.bridge.fake_env import FakeVimaEnv

            return TimeLimit(
                ResetFaultTolerance(FakeVimaEnv(seed=seed_base + i)), bonus_steps=2
            )
        from vima_bench import PARTITION_TO_SPECS, make  # external dependency

        return TimeLimit(
            ResetFaultTolerance(
                make(
                    task,
                    modalities=["segm", "rgb"],
                    task_kwargs=PARTITION_TO_SPECS["test"][partition][task],
                    seed=seed_base + i,
                    render_prompt=False,
                    display_debug_window=False,
                    hide_arm_rgb=False,
                )
            ),
            bonus_steps=2,
        )

    return [make_env(i) for i in range(cfg.num_envs)]


def _run_partition_task(policy, params, tokenize, cfg, partition: str, task: str, *, seed_base: int, emit_episodes: bool = True, detector=None):
    """Run cfg.episodes batched episodes on one partition x task; return its
    summary dict (and print per-episode JSONL when emit_episodes)."""
    from vima_tpu.bridge.env_loop import run_episode_batch

    envs = _make_envs(cfg, partition, task, seed_base)
    totals = {"episodes": 0, "successes": 0}
    for ep in range(cfg.episodes):
        results = run_episode_batch(
            policy, params, envs, tokenize_prompt=tokenize, max_objs=cfg.max_objs,
            detector=detector,
        )
        for r in results:
            totals["episodes"] += 1
            totals["successes"] += int(r["success"])
            if emit_episodes:
                print(json.dumps({"partition": partition, "task": task, "episode": ep, **r}))
    totals["success_rate"] = totals["successes"] / max(totals["episodes"], 1)
    totals["partition"] = partition
    totals["task"] = task
    return totals


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
    p.add_argument(
        "--family",
        choices=["vima", "gato", "gpt", "flamingo"],
        default="vima",
        help="policy family for random-init runs (with --ckpt the family is "
        "auto-detected from the state dict)",
    )
    p.add_argument("--tokenizer", type=str, default=None, help="local tokenizer.json")
    p.add_argument(
        "--detector",
        type=str,
        default=None,
        help="path to the released mask_rcnn.pth (reference README.md:34,37); "
        "runs the TPU-native Mask R-CNN in the obs loop instead of the "
        "simulator's ground-truth segmentation (BASELINE config 3)",
    )
    p.add_argument(
        "--detector-min-size",
        type=int,
        default=128,
        help="detector input resize target for the short side. VIMA frames "
        "are 64x128, so the default upsamples 2x to 128x256 — enough pixels "
        "for the R50 stride-32 pyramid to see the tabletop objects, ~40x "
        "cheaper than torchvision's 800 (which would build a 800x1600 "
        "canvas); pass 800 for torchvision-transform-exact behavior",
    )
    p.add_argument(
        "--detector-max-size",
        type=int,
        default=256,
        help="detector input resize cap for the long side (torchvision "
        "default 1333; see --detector-min-size)",
    )
    p.add_argument(
        "--detector-dtype",
        choices=("bf16", "fp32"),
        default="bf16",
        help="detector conv/gather compute dtype (box geometry, NMS and "
        "score activations stay fp32 either way); fp32 matches torchvision "
        "inference numerics exactly",
    )
    p.add_argument(
        "--detector-proposals",
        type=int,
        default=256,
        help="RPN proposals kept after NMS (torchvision default 1000). The "
        "box-stage RoIAlign cost is linear in this; VIMA scenes hold <=16 "
        "objects, so 256 is generous. Pass 1000 for torchvision-exact "
        "behavior",
    )
    p.add_argument(
        "--detector-max-detections",
        type=int,
        default=32,
        help="final detection budget per frame (torchvision default 100); "
        "the mask stage is linear in this",
    )
    p.add_argument(
        "--all-partitions",
        action="store_true",
        help="sweep every task in all 4 generalization partitions (L1-L4) and "
        "print one aggregated JSON summary",
    )
    p.add_argument(
        "--trace",
        type=str,
        default=None,
        help="capture a jax.profiler trace of the eval into this directory "
        "(TensorBoard-viewable)",
    )
    cfg = p.parse_args(argv)

    from vima_tpu.bridge.tokenizer import PromptTokenizer

    policy, params = _build_policy(cfg)

    detector = None
    if cfg.detector is not None:
        from vima_tpu.bridge.detector import JaxMaskRCNNDetector

        import jax.numpy as jnp

        detector = JaxMaskRCNNDetector(
            cfg.detector,
            min_size=cfg.detector_min_size,
            max_size=cfg.detector_max_size,
            dtype=jnp.bfloat16 if cfg.detector_dtype == "bf16" else jnp.float32,
            post_nms_top_n=cfg.detector_proposals,
            detections_per_img=cfg.detector_max_detections,
        )

    tokenize = PromptTokenizer(cfg.tokenizer, vocab_size=policy.vocab_size)
    if tokenize.using_fallback:
        if cfg.ckpt is not None:
            # garbage ids into a trained embedding table would silently
            # produce nonsense actions — refuse instead
            tokenize.require_real()
        print("note: t5 tokenizer unavailable; using offline hash tokenizer", file=sys.stderr)

    import contextlib

    from vima_tpu.utils import trace_to

    with trace_to(cfg.trace) if cfg.trace else contextlib.nullcontext():
        if cfg.all_partitions:
            sweep = {}
            seed = 42
            for partition in ALL_PARTITIONS:
                sweep[partition] = {}
                for task in _partition_tasks(partition, cfg.fake_env):
                    summary = _run_partition_task(
                        policy, params, tokenize, cfg, partition, task,
                        seed_base=seed, emit_episodes=False, detector=detector,
                    )
                    seed += cfg.num_envs
                    sweep[partition][task] = {
                        k: summary[k] for k in ("episodes", "successes", "success_rate")
                    }
            # aggregate: per-partition mean over tasks (the protocol metric:
            # "task success % aggregated over tasks", model-card.md:29) and
            # the overall 4-level vector.
            levels = {
                part: (
                    sum(t["success_rate"] for t in tasks.values()) / max(len(tasks), 1)
                )
                for part, tasks in sweep.items()
            }
            out = {
                "sweep": sweep,
                "levels": levels,
                "mean_success_rate": sum(levels.values()) / len(levels),
                "episodes_total": sum(
                    t["episodes"] for tasks in sweep.values() for t in tasks.values()
                ),
            }
            print(json.dumps(out))
        else:
            totals = _run_partition_task(
                policy, params, tokenize, cfg, cfg.partition, cfg.task,
                seed_base=42, detector=detector,
            )
            print(json.dumps({"summary": totals}))


if __name__ == "__main__":
    main()
