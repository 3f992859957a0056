"""Full flagship-policy parity: converted reference weights, identical
outputs for every policy entry point, and cached-rollout == full-recompute.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tests.reference_loader import (
    build_reference_vima_policy,
    load_reference,
    reference_available,
)
from vima_tpu.ckpt import convert as C
from vima_tpu.nn.t5 import T5Config

pytestmark = pytest.mark.skipif(
    not reference_available(), reason="PyTorch reference not available"
)

EMBED_DIM = 256
CFG = dict(embed_dim=EMBED_DIM, xf_n_layers=2, sattn_n_heads=4, xattn_n_heads=4)
T5_LAYERS, T5_FF, VOCAB = 2, 1024, 100


@pytest.fixture(scope="module")
def policies():
    ref, cfg, meta = build_reference_vima_policy(
        **CFG, t5_num_layers=T5_LAYERS, t5_d_ff=T5_FF, vocab_size=VOCAB
    )
    params = C.convert_vima_policy(
        ref.state_dict(), cfg, t5_num_layers=T5_LAYERS, vit_layers=4
    )
    from vima_tpu.policy.vima import VIMAPolicy

    ours = VIMAPolicy(
        **cfg,
        t5_cfg=T5Config(d_model=768, d_ff=T5_FF, num_layers=T5_LAYERS, num_heads=12, d_kv=64, vocab_size=VOCAB),
        vocab_size=VOCAB,
    )
    return ref, ours, {"params": jax.tree.map(jnp.asarray, params)}


def make_objects(rng, B, T, n_objs, views=("front", "top")):
    objects = {"cropped_img": {}, "bbox": {}, "mask": {}}
    for v in views:
        objects["cropped_img"][v] = rng.integers(
            3, 255, size=(B, T, n_objs, 3, 32, 32)
        ).astype(np.uint8)
        objects["bbox"][v] = rng.integers(5, 120, size=(B, T, n_objs, 4)).astype(np.int64)
        m = np.ones((B, T, n_objs), dtype=bool)
        m[..., -1] = rng.random((B, T)) > 0.5
        objects["mask"][v] = m
    return objects


def test_obs_token_parity(policies):
    import torch

    ref, ours, params = policies
    rng = np.random.default_rng(7)
    B, T, n = 2, 3, 3
    objects = make_objects(rng, B, T, n)
    ee = rng.integers(0, 2, size=(B, T))

    # reference: stream-first (L, B); uses DataDict + flattened leading dims
    load_reference()
    from vima.utils import any_to_datadict

    t_objects = any_to_datadict(
        {
            k: {v: torch.tensor(np.swapaxes(arr, 0, 1)) for v, arr in d.items()}
            for k, d in objects.items()
        }
    )
    t_obs = {"objects": t_objects, "ee": torch.tensor(np.swapaxes(ee, 0, 1))}
    with torch.no_grad():
        ref_tok, ref_mask = ref.forward_obs_token(t_obs)

    obs_tok, obs_mask = ours.apply(
        params,
        jax.tree.map(jnp.asarray, objects),
        jnp.asarray(ee),
        method="forward_obs_token",
    )
    # ours batch-first (B, T, ...) vs ref (T, B, ...)
    np.testing.assert_allclose(
        np.swapaxes(np.asarray(obs_tok), 0, 1), ref_tok.numpy(), atol=2e-4, rtol=2e-4
    )
    np.testing.assert_array_equal(
        np.swapaxes(np.asarray(obs_mask), 0, 1), ref_mask.numpy()
    )


def test_policy_forward_parity(policies):
    import torch

    ref, ours, params = policies
    rng = np.random.default_rng(8)
    T, B, Q, Lp = 3, 2, 6, 10
    E = EMBED_DIM
    obs_token = rng.normal(size=(T, B, Q, E)).astype(np.float32)
    obs_mask = rng.random((T, B, Q)) > 0.2
    obs_mask[..., 0] = True
    action_token = rng.normal(size=(T - 1, B, E)).astype(np.float32)
    prompt_token = rng.normal(size=(Lp, B, E)).astype(np.float32)
    prompt_mask = np.ones((B, Lp), dtype=bool)
    prompt_mask[1, 7:] = False

    with torch.no_grad():
        ref_out = ref.forward(
            obs_token=torch.tensor(obs_token),
            obs_mask=torch.tensor(obs_mask),
            action_token=torch.tensor(action_token),
            prompt_token=torch.tensor(prompt_token),
            prompt_token_mask=torch.tensor(prompt_mask),
        ).numpy()

    out = ours.apply(
        params,
        jnp.asarray(obs_token),
        jnp.asarray(obs_mask),
        jnp.asarray(action_token),
        jnp.asarray(prompt_token),
        jnp.asarray(prompt_mask),
    )
    np.testing.assert_allclose(np.asarray(out), ref_out, atol=2e-4, rtol=2e-4)

    # step 0: no action tokens
    with torch.no_grad():
        ref_out0 = ref.forward(
            obs_token=torch.tensor(obs_token[:1]),
            obs_mask=torch.tensor(obs_mask[:1]),
            action_token=None,
            prompt_token=torch.tensor(prompt_token),
            prompt_token_mask=torch.tensor(prompt_mask),
        ).numpy()
    out0 = ours.apply(
        params,
        jnp.asarray(obs_token[:1]),
        jnp.asarray(obs_mask[:1]),
        None,
        jnp.asarray(prompt_token),
        jnp.asarray(prompt_mask),
    )
    np.testing.assert_allclose(np.asarray(out0), ref_out0, atol=2e-4, rtol=2e-4)


def test_prompt_assembly_parity(policies):
    import torch

    ref, ours, params = policies
    rng = np.random.default_rng(9)
    token_types = [[0, 0, 1, 0, 1, 0]]
    n_words = sum(1 for p in token_types for t in p if t == 0)
    n_imgs = sum(1 for p in token_types for t in p if t == 1)
    n_objs = 2
    word_batch = rng.integers(0, VOCAB, size=(n_words,))
    image_batch = {"cropped_img": {}, "bbox": {}, "mask": {}}
    for v in ("front", "top"):
        image_batch["cropped_img"][v] = rng.integers(
            3, 255, size=(n_imgs, n_objs, 3, 32, 32)
        ).astype(np.uint8)
        image_batch["bbox"][v] = rng.integers(5, 120, size=(n_imgs, n_objs, 4)).astype(np.int64)
        m = np.ones((n_imgs, n_objs), dtype=bool)
        m[0, -1] = False
        image_batch["mask"][v] = m

    load_reference()
    from vima.utils import any_to_datadict

    t_batch = any_to_datadict(
        {k: {v: torch.tensor(arr) for v, arr in d.items()} for k, d in image_batch.items()}
    )
    with torch.no_grad():
        ref_tokens, ref_masks = ref.forward_prompt_assembly(
            (token_types, torch.tensor(word_batch), t_batch)
        )
    ref_tokens = ref_tokens.numpy()  # (L, B, E)
    ref_masks = ref_masks.numpy()  # (B, L)

    # ours: host gather indices + device gather + t5
    from vima_tpu.bridge.prompt_prep import prompt_gather_indices

    idx, mask = prompt_gather_indices(
        token_types, n_words, image_batch["mask"], n_objs * 2
    )
    word_embs = ours.apply(params, jnp.asarray(word_batch), method="embed_prompt_words")
    img_embs = ours.apply(
        params, jax.tree.map(jnp.asarray, image_batch), method="embed_prompt_images"
    )
    d = word_embs.shape[-1]
    src = jnp.concatenate(
        [word_embs, img_embs.reshape(-1, d), jnp.zeros((1, d), word_embs.dtype)], axis=0
    )
    assembled = src[jnp.asarray(idx)]
    out = ours.apply(
        params, assembled, jnp.asarray(mask), method="encode_prompt_assembled"
    )
    np.testing.assert_array_equal(mask, ref_masks)
    out = np.swapaxes(np.asarray(out), 0, 1)  # (L, B, E)
    valid = ref_masks[0]
    np.testing.assert_allclose(
        out[valid, 0], ref_tokens[valid, 0], atol=2e-4, rtol=2e-4
    )


def test_action_token_and_decoder_parity(policies):
    import torch

    ref, ours, params = policies
    rng = np.random.default_rng(10)
    B = 2
    actions = {
        "pose0_position": rng.integers(0, 50, size=(1, B, 2)),
        "pose0_rotation": rng.integers(0, 50, size=(1, B, 4)),
        "pose1_position": rng.integers(0, 50, size=(1, B, 2)),
        "pose1_rotation": rng.integers(0, 50, size=(1, B, 4)),
    }
    t_actions = {k: torch.tensor(v) for k, v in actions.items()}
    with torch.no_grad():
        ref_emb = ref.forward_action_token(t_actions).numpy()
    emb = ours.apply(
        params, jax.tree.map(jnp.asarray, actions), method="forward_action_token"
    )
    np.testing.assert_allclose(np.asarray(emb), ref_emb, atol=2e-4, rtol=2e-4)

    x = rng.normal(size=(1, B, EMBED_DIM)).astype(np.float32)
    with torch.no_grad():
        ref_dists = ref.forward_action_decoder(torch.tensor(x))
        ref_modes = {k: v.mode().numpy() for k, v in ref_dists.items()}
    logits = ours.apply(params, jnp.asarray(x), method="forward_action_decoder")
    from vima_tpu.nn.action import action_mode
    from vima_tpu.policy.base import ACTION_DIMS

    modes = action_mode(logits, {k: list(v) for k, v in ACTION_DIMS.items()})
    for k in ref_modes:
        np.testing.assert_array_equal(np.asarray(modes[k]), ref_modes[k], err_msg=k)


def test_discretize_parity():
    import torch

    load_reference()
    rng = np.random.default_rng(11)
    vals = rng.random((40,)).astype(np.float32)
    vals[:4] = [0.0, 1.0, 0.5, 0.999]
    for n in (50, 100):
        t = torch.bucketize(
            torch.tensor(vals), torch.linspace(0, 1, n)
        ).numpy()
        j = np.asarray(jnp.searchsorted(jnp.linspace(0.0, 1.0, n), jnp.asarray(vals), side="left"))
        np.testing.assert_array_equal(j, t)


def test_cached_rollout_matches_full_forward(policies):
    """The TPU KV-cached step path must reproduce the parity path exactly."""
    ref, ours, params = policies
    rng = np.random.default_rng(12)
    B, Q, Lp, steps = 2, 6, 10, 4
    E = EMBED_DIM

    prompt_token = rng.normal(size=(B, Lp, E)).astype(np.float32)
    prompt_mask = np.ones((B, Lp), dtype=bool)
    prompt_mask[1, 7:] = False

    obs_tokens = rng.normal(size=(B, steps, Q, E)).astype(np.float32)
    obs_masks = rng.random((B, steps, Q)) > 0.2
    obs_masks[..., 0] = True
    action_tokens = rng.normal(size=(B, steps - 1, E)).astype(np.float32)

    # --- full-recompute path (parity __call__) at final step
    full_out = ours.apply(
        params,
        jnp.asarray(obs_tokens).transpose(1, 0, 2, 3),
        jnp.asarray(obs_masks).transpose(1, 0, 2),
        jnp.asarray(action_tokens).transpose(1, 0, 2),
        jnp.asarray(prompt_token).transpose(1, 0, 2),
        jnp.asarray(prompt_mask),
    )  # (steps, B, E)
    full_out = np.asarray(full_out)

    # --- cached path, step by step
    from vima_tpu.policy.base import masked_position_ids

    pk, pv = ours.apply(
        params, jnp.asarray(prompt_token), jnp.asarray(prompt_mask), method="encode_prompt_kv"
    )
    n_layer = CFG["xf_n_layers"]
    S = steps * (Q + 1)
    # E-contiguous (B, S, E) caches (see nn/xattn_gpt.py docstring)
    cache_k = tuple(jnp.zeros((B, S, E)) for _ in range(n_layer))
    cache_v = tuple(jnp.zeros((B, S, E)) for _ in range(n_layer))
    slot_mask = np.zeros((B, S), dtype=bool)
    write_index = 0
    pos_count = np.zeros((B,), dtype=np.int32)

    stepwise = []
    for t in range(steps):
        if t == 0:
            chunk = obs_tokens[:, 0]
            chunk_mask = obs_masks[:, 0]
        else:
            chunk = np.concatenate(
                [action_tokens[:, t - 1 : t], obs_tokens[:, t]], axis=1
            )
            chunk_mask = np.concatenate(
                [np.ones((B, 1), bool), obs_masks[:, t]], axis=1
            )
        C_len = chunk.shape[1]
        chunk_pos = np.clip(
            pos_count[:, None] + np.cumsum(chunk_mask, axis=1) - 1, 0, None
        ).astype(np.int32)
        slot_mask[:, write_index : write_index + C_len] = chunk_mask
        out, cache_k, cache_v = ours.apply(
            params,
            jnp.asarray(chunk),
            jnp.asarray(chunk_pos),
            pk,
            pv,
            jnp.asarray(prompt_mask),
            cache_k,
            cache_v,
            jnp.asarray(slot_mask),
            write_index,
            method="step_chunk",
        )
        stepwise.append(np.asarray(out[:, -1]))  # last obs slot this step
        write_index += C_len
        pos_count += chunk_mask.sum(axis=1).astype(np.int32)

    stepwise = np.stack(stepwise, axis=0)  # (steps, B, E)
    np.testing.assert_allclose(stepwise, full_out, atol=1e-4, rtol=1e-4)
