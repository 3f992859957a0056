"""Cached rollout == parity path for the baseline families (greedy actions)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vima_tpu.nn.t5 import T5Config
from vima_tpu.policy import (
    VIMAFlamingoPolicy,
    VIMAGatoPolicy,
    VIMAGPTPolicy,
    init_params,
)
from vima_tpu.nn.action import action_mode
from vima_tpu.policy.base import ACTION_DIMS
from vima_tpu.bridge.prompt_prep import prompt_gather_indices
from vima_tpu.policy.rollout_families import (
    encode_prompt_decoder_only,
    encode_prompt_flamingo,
    rollout_step_decoder_only,
    rollout_step_flamingo,
)

TINY_T5 = T5Config(d_model=48, d_ff=96, num_layers=1, num_heads=4, d_kv=12, vocab_size=64)
COMMON = dict(
    img_size=(32, 64), vit_patch_size=16, vit_width=32, vit_layers=1, vit_heads=2,
    t5_cfg=TINY_T5, vocab_size=64,
)
DIMS = {k: list(v) for k, v in ACTION_DIMS.items()}


def make_prompt(policy, params, rng, B, n_objs_max, encode_fn, capacity, image_key="rgb"):
    token_types = [[0, 0, 1] for _ in range(B)]
    n_words = 2 * B
    word_batch = jnp.asarray(rng.integers(0, 64, size=(n_words,)))
    image_batch = {
        "rgb": {
            v: jnp.asarray(
                rng.integers(3, 255, size=(B, 3, 32, 64)), jnp.uint8
            )
            for v in ("front", "top")
        }
    }
    idx, mask = prompt_gather_indices(token_types, n_words, None, n_objs_max)
    gather = {"idx": jnp.asarray(idx), "mask": jnp.asarray(mask)}
    prompt_tokens, state = encode_fn(policy, params, word_batch, image_batch, gather, capacity)
    return prompt_tokens, jnp.asarray(mask), state


def drive_and_compare(policy, params, state, step_fn, prompt_tokens, prompt_mask, rng, B, steps):
    """Run the cached path; re-derive each step's action via the parity path."""
    obs_hist, act_hist, cached_actions = [], [], []
    for t in range(steps):
        rgb = {
            v: jnp.asarray(rng.integers(3, 255, size=(B, 3, 32, 64)), jnp.uint8)
            for v in ("front", "top")
        }
        ee = jnp.asarray(rng.integers(0, 2, size=(B,)))
        acts, state = step_fn(policy, params, state, rgb, ee)
        cached_actions.append(jax.tree.map(np.asarray, acts))

        obs_tok = policy.apply(
            params,
            {v: a[:, None] for v, a in rgb.items()},
            ee[:, None],
            method="forward_obs_token",
        )  # (B, 1, [Q,] E)
        obs_hist.append(obs_tok[:, 0])

        obs_stack = jnp.stack(obs_hist, axis=1)  # (B, T, [Q,] E)
        act_stack = None if t == 0 else jnp.stack(act_hist, axis=0)  # (T-1, B, E)
        obs_sf = jnp.moveaxis(obs_stack, 1, 0)  # (T, B, [Q,] E)
        out = policy.apply(
            params, obs_sf, act_stack, prompt_tokens.transpose(1, 0, 2), prompt_mask
        )
        logits = policy.apply(params, out[-1], method="forward_action_decoder")
        ref_acts = action_mode(logits, DIMS)
        for k in ref_acts:
            np.testing.assert_array_equal(
                np.asarray(ref_acts[k]), cached_actions[t][k], err_msg=f"step {t} {k}"
            )
        act_hist.append(policy.apply(params, ref_acts, method="forward_action_token"))


def test_flamingo_cached_rollout():
    policy = VIMAFlamingoPolicy(
        embed_dim=64, dt_n_layers=1, dt_n_heads=4, xattn_n_heads=4,
        perceiver_num_blocks=1, perceiver_num_self_attends_per_block=1,
        perceiver_num_self_attention_heads=4, perceiver_num_cross_attention_heads=4,
        **COMMON,
    )
    params = init_params(policy)
    rng = np.random.default_rng(0)
    B, steps = 2, 3
    Q = policy.num_queries
    prompt_tokens, pmask, state = make_prompt(
        policy, params, rng, B, Q, encode_prompt_flamingo, capacity=steps * (Q + 1) + 1
    )
    drive_and_compare(
        policy, params, state, rollout_step_flamingo, prompt_tokens, pmask, rng, B, steps
    )


def test_gato_cached_rollout():
    policy = VIMAGatoPolicy(embed_dim=64, n_layer=1, n_head=4, **COMMON)
    params = init_params(policy)
    rng = np.random.default_rng(1)
    B, steps = 2, 2
    Q = policy.obj_xf_num_queries
    Lp = 2 + Q
    prompt_tokens, pmask, state = make_prompt(
        policy, params, rng, B, Q, encode_prompt_decoder_only,
        capacity=Lp + 1 + steps * (Q + 1) + 1,
    )
    drive_and_compare(
        policy, params, state, rollout_step_decoder_only, prompt_tokens, pmask, rng, B, steps
    )


def test_gpt_cached_rollout():
    policy = VIMAGPTPolicy(embed_dim=64, n_layer=1, n_head=4, **COMMON)
    params = init_params(policy)
    rng = np.random.default_rng(2)
    B, steps = 2, 3
    Lp = 2 + 1
    prompt_tokens, pmask, state = make_prompt(
        policy, params, rng, B, 1, encode_prompt_decoder_only,
        capacity=Lp + 1 + steps * 2 + 1,
    )
    drive_and_compare(
        policy, params, state, rollout_step_decoder_only, prompt_tokens, pmask, rng, B, steps
    )
