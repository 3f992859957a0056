#!/usr/bin/env python
"""Benchmark: p50 per-step policy latency for the 200M-class flagship policy.

Ours: TPU cached-KV rollout (encode_prompt once + rollout_step per env
step, vima_tpu/policy/rollout.py) — the full policy-side step: object-crop
ViT encode + action embed + decoder chunk + action decode. Timed with a
CSE-proof nested lax.scan (episodes x steps in one jit, inputs varying
with the carry) and a forced host fetch, because the tunneled TPU's
block_until_ready can ack early and identical episodes would otherwise be
computed once.

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
EPISODES = 1
REF_STEPS = 6
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

    jax.config.update("jax_compilation_cache_dir", str(__import__("pathlib").Path(__file__).parent / ".cache" / "jax_comp_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    import time as _t
    _last = [_t.time()]

    def _phase(name):
        now = _t.time()
        print(f"[bench] {name}: {now - _last[0]:.1f}s", file=sys.stderr)
        _last[0] = now

    from vima_tpu.bridge.prompt_prep import prompt_gather_indices
    from vima_tpu.ckpt.registry import get_config
    from vima_tpu.policy import init_params
    from vima_tpu.policy.rollout import encode_prompt, rollout_step

    policy = get_config(MODEL).build()
    params = init_params(policy)
    _phase("init")
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
    capacity = 512  # the architecture's n_positions cap

    image_batch = jax.tree.map(jnp.asarray, image_batch)
    word_batch = jnp.asarray(word_batch)

    objects, ee = _step_inputs(rng)
    objects = jax.tree.map(jnp.asarray, objects)
    ee = jnp.asarray(ee)

    def fetch(acts):
        # host fetch forces true completion (block_until_ready can ack early
        # over the axon tunnel; a data read cannot lie)
        return {k: np.asarray(v) for k, v in acts.items()}

    # warmup / compile
    _, state = encode_prompt(policy, params, word_batch, image_batch, gather, capacity)
    _phase("encode_prompt compile")
    acts, state = rollout_step(policy, params, state, objects, ee)
    fetch(acts)
    _phase("rollout_step compile")

    # measure host<->device round-trip floor to subtract from episode totals
    rtts = []
    tiny = jax.jit(lambda x: x + 1)
    tiny(jnp.zeros(())).block_until_ready()
    for _ in range(10):
        t0 = time.perf_counter()
        float(tiny(jnp.zeros(())))
        rtts.append(time.perf_counter() - t0)
    rtt = float(np.percentile(rtts, 50))

    # per-step latency, amortized over a chained episode (each rollout_step
    # consumes the previous step's state, so the device must execute them
    # sequentially); one fetch at episode end.
    prompt_times, episode_times = [], []
    for _ in range(3):
        t0 = time.perf_counter()
        _, state = encode_prompt(policy, params, word_batch, image_batch, gather, capacity)
        np.asarray(state.pos_count)  # data fetch forces completion, no new compile
        prompt_times.append(time.perf_counter() - t0 - rtt)
    for _ in range(EPISODES):
        t0 = time.perf_counter()
        for _ in range(STEPS):
            acts, state = rollout_step(policy, params, state, objects, ee)
        fetch(acts)
        episode_times.append(time.perf_counter() - t0 - rtt)
    step_ms = np.asarray(episode_times) / STEPS * 1e3

    # pure device compute per step: many autoregressive episodes in ONE jit
    # (nested lax.scan: episodes x steps, recorded-obs replay — BASELINE
    # config 2) so tunnel RTT variance amortizes to noise.
    import functools

    from vima_tpu.policy.rollout import _rollout_step_core

    SCAN_STEPS = 28  # 28 * (Q+1) = 476 < n_positions cap 512
    SCAN_EPISODES = 5
    objects_seq = jax.tree.map(
        lambda x: jnp.broadcast_to(x[None], (SCAN_STEPS,) + x.shape), objects
    )
    ee_seq = jnp.broadcast_to(ee[None], (SCAN_STEPS,) + ee.shape)

    @functools.partial(jax.jit, static_argnums=(0,))
    def bench_episodes(policy, params, state0, objects_seq, ee_seq):
        def step_body(state, inputs):
            obj, e = inputs
            actions, state = _rollout_step_core(policy, params, state, obj, e)
            return state, actions["pose0_position"]

        def ep_body(acc, ep_idx):
            # vary each episode's inputs with the carry so XLA cannot hoist
            # or CSE the inner scan (identical episodes would otherwise be
            # computed once — a 5x benchmark lie)
            eseq_i = (ee_seq + ep_idx + acc % 2) % 2
            _, actions = jax.lax.scan(step_body, state0, (objects_seq, eseq_i))
            return acc + actions[-1].sum(), None

        acc, _ = jax.lax.scan(
            ep_body, jnp.int32(0), jnp.arange(SCAN_EPISODES, dtype=jnp.int32)
        )
        return acc

    _, state0 = encode_prompt(policy, params, word_batch, image_batch, gather, capacity)
    int(bench_episodes(policy, params, state0, objects_seq, ee_seq))  # compile
    _phase("bench_episodes compile")
    t0 = time.perf_counter()
    int(bench_episodes(policy, params, state0, objects_seq, ee_seq))
    total = time.perf_counter() - t0 - rtt
    scan_step_ms = np.asarray([total / (SCAN_STEPS * SCAN_EPISODES) * 1e3])

    # bf16 inference variant (params + activations bf16, fp32 logit islands)
    bf16_step_ms = None
    try:
        from vima_tpu.ckpt.convert import cast_params

        policy16 = get_config(MODEL).build(dtype=jnp.bfloat16)
        params16 = cast_params(params, jnp.bfloat16)
        _, s16 = encode_prompt(policy16, params16, word_batch, image_batch, gather, capacity)
        int(bench_episodes(policy16, params16, s16, objects_seq, ee_seq))
        t0 = time.perf_counter()
        int(bench_episodes(policy16, params16, s16, objects_seq, ee_seq))
        bf16_step_ms = (time.perf_counter() - t0 - rtt) / (SCAN_STEPS * SCAN_EPISODES) * 1e3
        _phase("bf16 variant")
    except Exception as e:
        print(f"bf16 variant skipped: {e!r}", file=sys.stderr)

    return {
        "p50_step_ms": float(np.percentile(scan_step_ms, 50)),
        "p90_step_ms": float(np.percentile(scan_step_ms, 90)),
        "bf16_step_ms": bf16_step_ms,
        "closed_loop_step_ms": float(np.percentile(step_ms, 50)),
        "prompt_encode_ms": float(np.percentile(prompt_times, 50) * 1e3),
        "steps_per_sec": float(1e3 / np.percentile(scan_step_ms, 50)),
        "host_device_rtt_ms": rtt * 1e3,
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
        for t in range(REF_STEPS):
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
