"""bf16 inference: fp32-logit islands keep greedy actions aligned with the
fp32 policy (the TPU production dtype policy)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vima_tpu.nn.action import action_mode
from vima_tpu.nn.t5 import T5Config
from vima_tpu.policy import VIMAPolicy, init_params
from vima_tpu.policy.base import ACTION_DIMS

TINY_T5 = T5Config(d_model=48, d_ff=96, num_layers=1, num_heads=4, d_kv=12, vocab_size=64)
DIMS = {k: list(v) for k, v in ACTION_DIMS.items()}


def make_policy(dtype):
    return VIMAPolicy(
        embed_dim=64, xf_n_layers=1, sattn_n_heads=4, xattn_n_heads=4,
        vit_resolution=16, vit_patch_size=8, vit_width=32, vit_layers=1,
        vit_heads=2, vit_output_dim=32, bbox_mlp_hidden_dim=32,
        t5_cfg=TINY_T5, vocab_size=64, dtype=dtype,
    )


def test_bf16_forward_close_and_actions_match():
    p32 = make_policy(jnp.float32)
    p16 = make_policy(jnp.bfloat16)
    params = init_params(p32)

    rng = np.random.default_rng(0)
    T, B, Q, Lp, E = 2, 2, 4, 6, 64
    obs = jnp.asarray(rng.normal(size=(T, B, Q, E)), jnp.float32)
    mask = jnp.ones((T, B, Q), bool)
    act = jnp.asarray(rng.normal(size=(T - 1, B, E)), jnp.float32)
    prompt = jnp.asarray(rng.normal(size=(Lp, B, E)), jnp.float32)
    pmask = jnp.ones((B, Lp), bool)

    out32 = p32.apply(params, obs, mask, act, prompt, pmask)
    out16 = p16.apply(params, obs.astype(jnp.bfloat16), mask, act.astype(jnp.bfloat16),
                      prompt.astype(jnp.bfloat16), pmask)
    rel = np.abs(np.asarray(out16, np.float32) - np.asarray(out32)) / (
        np.abs(np.asarray(out32)) + 1e-3
    )
    assert np.median(rel) < 0.05, np.median(rel)

    l32 = p32.apply(params, out32[-1], method="forward_action_decoder")
    l16 = p16.apply(params, out16[-1], method="forward_action_decoder")
    a32 = action_mode(l32, DIMS)
    a16 = action_mode(l16, DIMS)
    total = agree = 0
    for k in a32:
        total += np.asarray(a32[k]).size
        agree += int((np.asarray(a32[k]) == np.asarray(a16[k])).sum())
    # random-init logits are near-uniform (last_layer_gain=0.01) so some
    # flips are expected; trained checkpoints have far larger margins.
    assert agree / total > 0.5, (agree, total)
