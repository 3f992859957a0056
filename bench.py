#!/usr/bin/env python
"""Benchmark: p50 per-step policy latency for the 200M-class flagship policy.

Ours: TPU cached-KV rollout (encode_prompt once + rollout_step per env step,
vima_tpu/policy/rollout.py), measured with block_until_ready — the full
policy-side step: object-crop ViT encode + action embed + decoder chunk +
action decode.

Baseline: the PyTorch reference's own per-step behavior (full recompute of
the growing sequence each step, scripts/example.py:111-240) at the same
config/shapes on torch-CPU, same measurement scope.

Prints ONE JSON line:
  {"metric": ..., "value": p50_ms, "unit": "ms", "vs_baseline": ref_p50/our_p50}
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

MODEL = "vima-200m"
B = 1
N_OBJS = 8  # per view -> Q = 16 stream slots per step
STEPS = 10
EPISODES = 3
PROMPT_WORDS = 20
VIEWS = ("front", "top")


def _step_inputs(rng, R=32):
    objects = {
        "cropped_img": {
            v: rng.integers(3, 255, size=(B, N_OBJS, 3, R, R)).astype(np.uint8)
            for v in VIEWS
        },
        "bbox": {v: rng.integers(5, 120, size=(B, N_OBJS, 4)).astype(np.int32) for v in VIEWS},
        "mask": {v: np.ones((B, N_OBJS), bool) for v in VIEWS},
    }
    ee = rng.integers(0, 2, size=(B,))
    return objects, ee


def bench_ours():
    import jax
    import jax.numpy as jnp

    from vima_tpu.bridge.prompt_prep import prompt_gather_indices
    from vima_tpu.ckpt.registry import get_config
    from vima_tpu.policy import init_params
    from vima_tpu.policy.rollout import encode_prompt, rollout_step

    policy = get_config(MODEL).build()
    params = init_params(policy)
    rng = np.random.default_rng(0)

    token_types = [[0] * PROMPT_WORDS + [1] for _ in range(B)]
    n_words = PROMPT_WORDS * B
    word_batch = rng.integers(0, policy.vocab_size, size=(n_words,))
    image_batch = {
        "cropped_img": {
            v: rng.integers(3, 255, size=(B, N_OBJS, 3, 32, 32)).astype(np.uint8)
            for v in VIEWS
        },
        "bbox": {v: rng.integers(5, 120, size=(B, N_OBJS, 4)).astype(np.int32) for v in VIEWS},
        "mask": {v: np.ones((B, N_OBJS), bool) for v in VIEWS},
    }
    idx, pmask = prompt_gather_indices(token_types, n_words, image_batch["mask"], N_OBJS * 2)
    gather = {"idx": jnp.asarray(idx), "mask": jnp.asarray(pmask)}
    Q = N_OBJS * 2
    capacity = STEPS * (Q + 1) + 1

    image_batch = jax.tree.map(jnp.asarray, image_batch)
    word_batch = jnp.asarray(word_batch)

    objects, ee = _step_inputs(rng)
    objects = jax.tree.map(jnp.asarray, objects)
    ee = jnp.asarray(ee)

    # warmup / compile
    _, state = encode_prompt(policy, params, word_batch, image_batch, gather, capacity)
    acts, state = rollout_step(policy, params, state, objects, ee)
    jax.block_until_ready(acts)

    prompt_times, step_times = [], []
    for _ in range(EPISODES):
        t0 = time.perf_counter()
        _, state = encode_prompt(policy, params, word_batch, image_batch, gather, capacity)
        jax.block_until_ready(state.prompt_k)
        prompt_times.append(time.perf_counter() - t0)
        for _ in range(STEPS):
            t0 = time.perf_counter()
            acts, state = rollout_step(policy, params, state, objects, ee)
            jax.block_until_ready(acts)
            step_times.append(time.perf_counter() - t0)
    return {
        "p50_step_ms": float(np.percentile(step_times, 50) * 1e3),
        "p90_step_ms": float(np.percentile(step_times, 90) * 1e3),
        "prompt_encode_ms": float(np.percentile(prompt_times, 50) * 1e3),
        "steps_per_sec": float(1.0 / np.percentile(step_times, 50)),
    }


def bench_reference():
    """Reference per-step latency (its own full-recompute semantics), CPU."""
    try:
        import torch

        from vima_tpu.ckpt.registry import get_config
        from vima_tpu.eval.reference_compat import build_reference_vima_policy

        cfg = get_config(MODEL)
        ref, _, _ = build_reference_vima_policy(
            embed_dim=cfg.embed_dim,
            xf_n_layers=cfg.xf_n_layers,
            sattn_n_heads=cfg.sattn_n_heads,
            xattn_n_heads=cfg.xattn_n_heads,
            t5_num_layers=12,
            t5_d_ff=3072,
            vocab_size=32128,
        )
    except Exception as e:
        print(f"reference baseline unavailable: {e!r}", file=sys.stderr)
        return None

    import torch

    rng = np.random.default_rng(0)
    Q = N_OBJS * 2
    E = ref.embed_dim
    Lp = PROMPT_WORDS + Q
    prompt_tokens = torch.randn(Lp, B, E)
    prompt_mask = torch.ones(B, Lp, dtype=torch.bool)

    step_times = []
    with torch.no_grad():
        obs_hist, mask_hist, act_hist = [], [], []
        for t in range(STEPS):
            objects, ee = _step_inputs(rng)
            t0 = time.perf_counter()
            # policy-side per-step work, mirroring scripts/example.py:111-240
            t_objects = {
                k: {v: torch.tensor(arr).reshape(-1, *arr.shape[2:]) for v, arr in d.items()}
                for k, d in {
                    "cropped_img": objects["cropped_img"],
                    "bbox": objects["bbox"],
                }.items()
            }
            img_feats = ref.obj_encoder(
                cropped_img=t_objects["cropped_img"], bbox=t_objects["bbox"], mask=None
            ).reshape(1, B, Q, -1)
            ee_t = torch.tensor(ee).unsqueeze(0)
            ee_feats = ref.end_effector_encoder(ee_t)
            ee_rep = ee_feats.unsqueeze(2).repeat(1, 1, Q, 1)
            obs_tok = ref.obs_fusion_layer(torch.cat([img_feats, ee_rep], dim=-1))
            obs_hist.append(obs_tok[0])
            mask_hist.append(torch.ones(B, Q, dtype=torch.bool))

            obs_stack = torch.stack(obs_hist, dim=0)  # (t+1, B, Q, E)
            mask_stack = torch.stack(mask_hist, dim=0)
            act_stack = None if t == 0 else torch.stack(act_hist, dim=0)
            pred = ref.forward(
                obs_token=obs_stack,
                obs_mask=mask_stack,
                action_token=act_stack,
                prompt_token=prompt_tokens,
                prompt_token_mask=prompt_mask,
            )
            dists = ref.forward_action_decoder(pred[-1].unsqueeze(0))
            actions = {k: v.mode() for k, v in dists.items()}
            act_hist.append(ref.forward_action_token(actions)[0])
            step_times.append(time.perf_counter() - t0)
    return {
        "p50_step_ms": float(np.percentile(step_times, 50) * 1e3),
    }


def main():
    ours = bench_ours()
    ref = bench_reference()
    vs = None
    if ref is not None and ours["p50_step_ms"] > 0:
        vs = ref["p50_step_ms"] / ours["p50_step_ms"]
    result = {
        "metric": f"p50_step_latency_{MODEL}",
        "value": round(ours["p50_step_ms"], 3),
        "unit": "ms",
        "vs_baseline": round(vs, 2) if vs is not None else None,
        "detail": {
            "ours": ours,
            "reference_cpu_p50_ms": ref["p50_step_ms"] if ref else None,
            "shapes": {"B": B, "n_objs_per_view": N_OBJS, "steps": STEPS},
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
