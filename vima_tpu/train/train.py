"""Behavior-cloning training CLI.

    python -m vima_tpu.train.train --data <episodes_dir> --model vima-2m \
        --batch-size 8 --steps 1000 --dp 4 --tp 2 --out ckpt_dir

The reference ships no trainer at all (its 650K-trajectory BC run lived in
an unreleased harness, survey §1). This drives the sharded train step over
a ('dp','tp') mesh with JSONL metrics and orbax checkpoints.
"""

from __future__ import annotations

import argparse
import sys
import time


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--data", required=True, help="directory of episode .npz files")
    p.add_argument("--eval-data", default=None, help="held-out episode dir for validation")
    p.add_argument("--eval-every", type=int, default=50, help="validate every N steps")
    p.add_argument("--model", default="vima-2m", help="registry size name")
    p.add_argument("--batch-size", type=int, default=8)
    p.add_argument("--steps", type=int, default=100)
    p.add_argument("--epochs", type=int, default=1000)
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--lr-schedule", default="constant", choices=["constant", "cosine", "linear"])
    p.add_argument("--warmup-steps", type=int, default=0)
    p.add_argument("--weight-decay", type=float, default=0.0)
    p.add_argument("--dp", type=int, default=None)
    p.add_argument("--tp", type=int, default=None)
    p.add_argument("--max-steps-per-episode", type=int, default=8)
    p.add_argument("--max-objs", type=int, default=10)
    p.add_argument("--prompt-len", type=int, default=64)
    p.add_argument("--remat", action="store_true")
    p.add_argument(
        "--dtype",
        default="fp32",
        choices=["fp32", "bf16"],
        help="computation dtype (mixed precision: params/optimizer stay "
        "fp32, activations and matmuls run bf16 with fp32 logit/softmax "
        "islands — fp32 matmuls run multi-pass on the TPU MXU at <1/30th "
        "of bf16 throughput)",
    )
    p.add_argument("--out", default=None, help="orbax checkpoint output dir")
    p.add_argument("--metrics", default=None, help="JSONL metrics path (default stdout)")
    p.add_argument("--resume", default=None, help="orbax checkpoint to resume params from")
    p.add_argument(
        "--resume-state",
        default=None,
        help="full train-state dir from a previous --out (params + optimizer + step)",
    )
    cfg = p.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from vima_tpu.ckpt.io import load_checkpoint, load_policy_meta
    from vima_tpu.ckpt.registry import get_config
    from vima_tpu.parallel import make_mesh
    from vima_tpu.policy import init_params
    from vima_tpu.train.data import TrajectoryDataset, dataset_kwargs_for_policy
    from vima_tpu.train.trainer import Trainer
    from vima_tpu.utils import LatencyTracker, MetricsLogger

    if cfg.resume_state:
        # params are restored inside restore_state; don't read them twice
        policy = load_policy_meta(cfg.resume_state)
        params = None
    elif cfg.resume:
        policy, params = load_checkpoint(cfg.resume)
    else:
        compute_dtype = jnp.bfloat16 if cfg.dtype == "bf16" else jnp.float32
        policy = get_config(cfg.model).build(remat=cfg.remat, dtype=compute_dtype)
        params = init_params(policy)

    mesh = make_mesh(dp=cfg.dp, tp=cfg.tp)
    print(f"mesh: {dict(mesh.shape)}", file=sys.stderr)
    trainer = Trainer(
        policy,
        mesh,
        learning_rate=cfg.lr,
        weight_decay=cfg.weight_decay,
        schedule=cfg.lr_schedule,
        warmup_steps=cfg.warmup_steps,
        total_steps=cfg.steps,
    )
    if cfg.resume_state:
        trainer.restore_state(cfg.resume_state)
        print(f"resumed train state at step {trainer.step_count}", file=sys.stderr)
    else:
        trainer.init(params)

    ds_kwargs = dict(
        max_steps=cfg.max_steps_per_episode,
        max_objs=cfg.max_objs,
        prompt_len=cfg.prompt_len,
        **dataset_kwargs_for_policy(policy),
    )

    def open_dataset(root):
        """npz episode dir, or a packed shard root (streamed, mmap'd —
        the at-scale path; see vima_tpu.train.shards)."""
        from vima_tpu.train.shards import ShardedTrajectoryDataset, is_packed_root

        if is_packed_root(root):
            return ShardedTrajectoryDataset(
                root,
                validate_against={
                    # full bucket geometry: a packed root silently overrides
                    # the CLI's shape flags, so any mismatch must fail loudly
                    # at startup instead of training at unexpected shapes
                    "obs_mode": ds_kwargs["obs_mode"],
                    "max_steps": ds_kwargs["max_steps"],
                    "max_objs": ds_kwargs["max_objs"],
                    "prompt_len": ds_kwargs["prompt_len"],
                    **{
                        k: ds_kwargs[k]
                        for k in ("word_len", "max_assets")
                        if ds_kwargs.get(k) is not None
                    },
                    **(
                        {"img_hw": ds_kwargs["img_hw"],
                         "tokens_per_img": ds_kwargs["tokens_per_img"]}
                        if ds_kwargs["obs_mode"] == "rgb" else {}
                    ),
                },
            )
        return TrajectoryDataset(root, **ds_kwargs)

    ds = open_dataset(cfg.data)
    logger = MetricsLogger(cfg.metrics)
    tracker = LatencyTracker()

    eval_ds = None
    if cfg.eval_data:
        eval_ds = open_dataset(cfg.eval_data)
        if len(eval_ds) < cfg.batch_size:
            p.error(
                f"--eval-data has {len(eval_ds)} episodes but --batch-size is "
                f"{cfg.batch_size}; partial batches are dropped, so no eval "
                "batch would ever run"
            )

    last_eval = [-1]

    def run_eval(step):
        if step == last_eval[0]:
            return
        last_eval[0] = step
        # deterministic order: every eval pass scores the same episodes
        batches = (
            jax.tree_util.tree_map(jnp.asarray, b)
            for b in eval_ds.batches(cfg.batch_size, epochs=1, shuffle=False)
        )
        logger.log("eval", step=step, **trainer.evaluate(batches))

    eval_every = max(cfg.eval_every, 0)  # 0 disables periodic eval (final-only)
    start_step = trainer.step_count
    window_t0, window_step0 = time.perf_counter(), start_step
    # prefetch_batches device-puts batch t+1 while the device runs step t;
    # metrics stay on device between logging points (no per-step host sync)
    for batch in trainer.prefetch_batches(ds.batches(cfg.batch_size, epochs=cfg.epochs)):
        if trainer.step_count >= cfg.steps:
            break  # e.g. resumed from a state already at --steps
        with tracker.measure():
            metrics = trainer.step(batch)
        step = trainer.step_count
        if step % 10 == 0 or step == start_step + 1:
            # fetching metrics blocks until every queued step finished, so
            # the window wall-clock is an honest throughput number
            fetched = trainer.fetch(metrics)
            now = time.perf_counter()
            sps = (step - window_step0) / max(now - window_t0, 1e-9)
            window_t0, window_step0 = now, step
            logger.log(
                "train_step",
                step=step,
                steps_per_sec=round(sps, 3),
                **fetched,
                **tracker.summary(),
            )
        if eval_ds is not None and eval_every and step % eval_every == 0:
            run_eval(step)

    if eval_ds is not None:
        run_eval(trainer.step_count)
    if cfg.out:
        trainer.save_state(cfg.out)
        print(f"saved train state to {cfg.out}", file=sys.stderr)
    logger.log("train_done", steps=trainer.step_count, **tracker.summary())


if __name__ == "__main__":
    main()
