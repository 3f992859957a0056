"""End-to-end tests of the jitted TPU rollout path (encode_prompt +
rollout_step) on a tiny random-init policy: the cached step loop must make
the same action choices as composing the reference-parity entry points.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vima_tpu.nn.t5 import T5Config
from vima_tpu.policy import VIMAPolicy, init_params
from vima_tpu.policy.rollout import encode_prompt, rollout_step
from vima_tpu.bridge.prompt_prep import prompt_gather_indices
from vima_tpu.nn.action import action_mode
from vima_tpu.policy.base import ACTION_DIMS


TINY_T5 = T5Config(d_model=48, d_ff=96, num_layers=2, num_heads=4, d_kv=12, vocab_size=64)


@pytest.fixture(scope="module")
def tiny_policy():
    policy = VIMAPolicy(
        embed_dim=64,
        xf_n_layers=2,
        sattn_n_heads=4,
        xattn_n_heads=4,
        vit_resolution=16,
        vit_patch_size=8,
        vit_width=32,
        vit_layers=1,
        vit_heads=2,
        vit_output_dim=32,
        bbox_mlp_hidden_dim=32,
        bbox_mlp_hidden_depth=2,
        t5_cfg=TINY_T5,
        vocab_size=64,
    )
    params = init_params(policy)
    return policy, params


def make_step_objects(rng, B, n_objs, R=16, views=("front", "top")):
    return {
        "cropped_img": {
            v: rng.integers(3, 255, size=(B, n_objs, 3, R, R)).astype(np.uint8)
            for v in views
        },
        "bbox": {v: rng.integers(5, 120, size=(B, n_objs, 4)).astype(np.int32) for v in views},
        "mask": {
            v: np.concatenate(
                [np.ones((B, n_objs - 1), bool), rng.random((B, 1)) > 0.4], axis=1
            )
            for v in views
        },
    }


def test_jitted_rollout_matches_parity_path(tiny_policy):
    policy, params = tiny_policy
    rng = np.random.default_rng(0)
    B, n_objs, steps = 2, 3, 3
    Q = n_objs * 2  # both views

    # --- prompt: 2 words + 1 image asset
    token_types = [[0, 1, 0]] * 1  # B=1 prompt broadcast? keep B prompts
    token_types = [[0, 1, 0] for _ in range(B)]
    n_words = 2 * B
    word_batch = rng.integers(0, 64, size=(n_words,))
    n_imgs = B
    image_batch = {
        "cropped_img": {
            v: rng.integers(3, 255, size=(n_imgs, n_objs, 3, 16, 16)).astype(np.uint8)
            for v in ("front", "top")
        },
        "bbox": {
            v: rng.integers(5, 120, size=(n_imgs, n_objs, 4)).astype(np.int32)
            for v in ("front", "top")
        },
        "mask": {v: np.ones((n_imgs, n_objs), bool) for v in ("front", "top")},
    }
    idx, pmask = prompt_gather_indices(
        token_types, n_words, image_batch["mask"], n_objs * 2
    )

    capacity = steps * (Q + 1) + 1
    prompt_tokens, state = encode_prompt(
        policy,
        params,
        jnp.asarray(word_batch),
        jax.tree.map(jnp.asarray, image_batch),
        {"idx": jnp.asarray(idx), "mask": jnp.asarray(pmask)},
        capacity,
    )
    assert prompt_tokens.shape == (B, idx.shape[1], policy.embed_dim)

    # --- drive both paths with identical observations
    all_objects, all_ee, actions_per_step = [], [], []
    for t in range(steps):
        objects = make_step_objects(rng, B, n_objs)
        ee = rng.integers(0, 2, size=(B,))
        all_objects.append(objects)
        all_ee.append(ee)
        acts, state = rollout_step(
            policy, params, state, jax.tree.map(jnp.asarray, objects), jnp.asarray(ee)
        )
        actions_per_step.append(jax.tree.map(np.asarray, acts))

    # --- parity path: full recompute at each step, greedy action feedback
    obs_tok_hist, obs_mask_hist, act_tok_hist = [], [], []
    for t in range(steps):
        objects = all_objects[t]
        ee = all_ee[t]
        obs_tok, obs_mask = policy.apply(
            params,
            jax.tree.map(lambda x: jnp.asarray(x)[:, None], objects),
            jnp.asarray(ee)[:, None],
            method="forward_obs_token",
        )  # (B, 1, Q, E)
        obs_tok_hist.append(obs_tok[:, 0])
        obs_mask_hist.append(obs_mask[:, 0])

        obs_stack = jnp.stack(obs_tok_hist, axis=0)  # (t+1, B, Q, E)
        mask_stack = jnp.stack(obs_mask_hist, axis=0)
        act_stack = (
            None if t == 0 else jnp.stack(act_tok_hist, axis=0)
        )  # (t, B, E)
        out = policy.apply(
            params,
            obs_stack,
            mask_stack,
            act_stack,
            prompt_tokens.transpose(1, 0, 2),
            jnp.asarray(pmask),
        )  # (t+1, B, E)
        logits = policy.apply(params, out[-1], method="forward_action_decoder")
        acts = action_mode(logits, {k: list(v) for k, v in ACTION_DIMS.items()})
        for k in acts:
            np.testing.assert_array_equal(
                np.asarray(acts[k]),
                actions_per_step[t][k],
                err_msg=f"step {t} action {k}",
            )
        act_emb = policy.apply(params, acts, method="forward_action_token")
        act_tok_hist.append(act_emb)


def test_replay_rollout_matches_stepwise(tiny_policy):
    """The one-jit lax.scan episode (BASELINE config 2) must choose the same
    actions as sequential rollout_step calls."""
    from vima_tpu.policy.rollout import replay_rollout

    policy, params = tiny_policy
    rng = np.random.default_rng(3)
    B, n_objs, steps = 2, 3, 3
    Q = n_objs * 2

    token_types = [[0, 1] for _ in range(B)]
    word_batch = jnp.asarray(rng.integers(0, 64, size=(B,)))
    image_batch = {
        "cropped_img": {
            v: jnp.asarray(rng.integers(3, 255, size=(B, n_objs, 3, 16, 16)), jnp.uint8)
            for v in ("front", "top")
        },
        "bbox": {v: jnp.asarray(rng.integers(5, 120, size=(B, n_objs, 4)), jnp.int32) for v in ("front", "top")},
        "mask": {v: jnp.ones((B, n_objs), bool) for v in ("front", "top")},
    }
    idx, pmask = prompt_gather_indices(
        token_types, B, {v: np.ones((B, n_objs), bool) for v in ("front", "top")}, Q
    )
    gather = {"idx": jnp.asarray(idx), "mask": jnp.asarray(pmask)}
    capacity = steps * (Q + 1) + 1

    objs_seq, ee_seq = [], []
    for _ in range(steps):
        o = make_step_objects(rng, B, n_objs)
        objs_seq.append(jax.tree.map(jnp.asarray, o))
        ee_seq.append(rng.integers(0, 2, size=(B,)))

    _, st = encode_prompt(policy, params, word_batch, image_batch, gather, capacity)
    step_actions = []
    for t in range(steps):
        a, st = rollout_step(policy, params, st, objs_seq[t], jnp.asarray(ee_seq[t]))
        step_actions.append(jax.tree.map(np.asarray, a))

    _, st2 = encode_prompt(policy, params, word_batch, image_batch, gather, capacity)
    stacked_objs = jax.tree.map(lambda *xs: jnp.stack(xs, axis=0), *objs_seq)
    stacked_ee = jnp.asarray(np.stack(ee_seq, axis=0))
    replay_actions, _ = replay_rollout(policy, params, st2, stacked_objs, stacked_ee)
    for t in range(steps):
        for k in step_actions[t]:
            np.testing.assert_array_equal(
                np.asarray(replay_actions[k][t]), step_actions[t][k], err_msg=f"step {t} {k}"
            )


def test_replay_rollout_capacity_guard(tiny_policy):
    """A replay that would overflow the KV cache must fail at trace time,
    not silently overwrite slots (dynamic_update_slice clamps)."""
    from vima_tpu.policy.rollout import replay_rollout

    policy, params = tiny_policy
    rng = np.random.default_rng(4)
    B, n_objs, steps = 2, 3, 3
    Q = n_objs * 2

    token_types = [[0, 1] for _ in range(B)]
    word_batch = jnp.asarray(rng.integers(0, 64, size=(B,)))
    image_batch = {
        "cropped_img": {
            v: jnp.asarray(rng.integers(3, 255, size=(B, n_objs, 3, 16, 16)), jnp.uint8)
            for v in ("front", "top")
        },
        "bbox": {v: jnp.asarray(rng.integers(5, 120, size=(B, n_objs, 4)), jnp.int32) for v in ("front", "top")},
        "mask": {v: jnp.ones((B, n_objs), bool) for v in ("front", "top")},
    }
    idx, pmask = prompt_gather_indices(
        token_types, B, {v: np.ones((B, n_objs), bool) for v in ("front", "top")}, Q
    )
    gather = {"idx": jnp.asarray(idx), "mask": jnp.asarray(pmask)}
    capacity = steps * (Q + 1) - 1  # one slot short

    objs_seq = [jax.tree.map(jnp.asarray, make_step_objects(rng, B, n_objs)) for _ in range(steps)]
    stacked_objs = jax.tree.map(lambda *xs: jnp.stack(xs, axis=0), *objs_seq)
    stacked_ee = jnp.zeros((steps, B), jnp.int32)

    _, st = encode_prompt(policy, params, word_batch, image_batch, gather, capacity)
    with pytest.raises(ValueError, match="cache slots"):
        replay_rollout(policy, params, st, stacked_objs, stacked_ee)


def test_init_all_policies():
    from vima_tpu.policy import VIMAGatoPolicy, VIMAFlamingoPolicy, VIMAGPTPolicy

    common = dict(
        img_size=(32, 64),
        vit_patch_size=16,
        vit_width=32,
        vit_layers=1,
        vit_heads=2,
        t5_cfg=TINY_T5,
        vocab_size=64,
    )
    gato = VIMAGatoPolicy(embed_dim=64, n_layer=1, n_head=4, **common)
    p = init_params(gato)
    assert "transformer" in p["params"]

    flamingo = VIMAFlamingoPolicy(
        embed_dim=64, dt_n_layers=1, dt_n_heads=4, xattn_n_heads=4,
        perceiver_num_blocks=1, perceiver_num_self_attends_per_block=1,
        perceiver_num_self_attention_heads=4, perceiver_num_cross_attention_heads=4,
        **common,
    )
    p = init_params(flamingo)
    assert "obj_encoder" in p["params"]

    gpt = VIMAGPTPolicy(embed_dim=64, n_layer=1, n_head=4, **common)
    p = init_params(gpt)
    assert "prompt_sep_token" in p["params"]
