"""KV-cached rollout for the baseline policy families.

Flamingo shares VIMA's xattn decoder shape (prompt K/V cached per layer,
(Q+1)-token chunks) but with arange positions and unmasked obs queries
(reference vima_flamingo_policy.py:150-154 passes no masks/position ids).

Gato / GPT are decoder-only: the prompt lives in the same causal stream, so
the episode starts with a **prefill** of [prompt | sep] into the KV cache
(positions: prompt pads frozen at n_valid-1, stream continuing from n_valid
— reference vima_gato_policy.py:156-184) and each env step appends a
[prev_action | obs tokens] chunk.

All paths make the exact same action choices as the parity ``__call__``
(tests/test_rollout_families.py).
"""

from __future__ import annotations

import functools
from typing import Dict

import jax
import jax.numpy as jnp
from flax import struct

from vima_tpu.policy.rollout import (
    RolloutState,
    advance_state,
    assemble_prompt,
    decode_chunk_actions,
    make_chunk,
    pack_actions,
    zero_actions,
)


# ------------------------------------------------------------------ Flamingo


@functools.partial(jax.jit, static_argnums=(0, 5, 6))
def encode_prompt_flamingo(
    policy, params, word_batch, image_batch, gather, capacity: int, cache_dtype=None
):
    """image_batch: {"rgb": {view: (n_imgs, 3, H, W)}}; gather as in
    rollout.encode_prompt with n_objs_max = num_queries (all valid).
    cache_dtype defaults to the policy's activation dtype (see
    rollout.encode_prompt)."""
    apply = lambda method, *a, **kw: policy.apply(params, *a, method=method, **kw)
    prompt_tokens, prompt_mask = assemble_prompt(apply, word_batch, image_batch, gather)
    prompt_tokens = apply("encode_prompt_assembled", prompt_tokens, prompt_mask)
    # flamingo: arange prompt positions (no position ids passed, ref :150-154)
    pk, pv = policy.apply(
        params, prompt_tokens, None, method=lambda m, t, _: m.xattn_gpt.encode_prompt_kv(t)
    )

    B = prompt_tokens.shape[0]
    n_layer = policy.dt_n_layers
    E = policy.embed_dim
    cdt = cache_dtype or policy.dtype
    state = RolloutState(
        prompt_k=jax.tree_util.tree_map(lambda x: x.astype(cdt), pk),
        prompt_v=jax.tree_util.tree_map(lambda x: x.astype(cdt), pv),
        prompt_mask=prompt_mask,
        cache_k=tuple(jnp.zeros((B, capacity, E), cdt) for _ in range(n_layer)),
        cache_v=tuple(jnp.zeros((B, capacity, E), cdt) for _ in range(n_layer)),
        slot_mask=jnp.zeros((B, capacity), bool),
        write_index=jnp.int32(0),
        pos_count=jnp.zeros((B,), jnp.int32),
        last_action=zero_actions(B),
        has_action=jnp.zeros((B,), bool),
    )
    return prompt_tokens, state


def _rollout_step_flamingo_core(policy, params, state: RolloutState, rgb: Dict, ee):
    apply = lambda method, *a, **kw: policy.apply(params, *a, method=method, **kw)
    obs_tok = apply("forward_obs_token", rgb, ee)  # (B, Q, E), all valid
    act_emb = apply("forward_action_token", state.last_action)

    B, Q, _ = obs_tok.shape
    chunk, chunk_mask, chunk_pos, slot_mask = make_chunk(
        state, obs_tok, jnp.ones((B, Q), bool), act_emb
    )

    out, new_k, new_v = policy.apply(
        params,
        chunk,
        chunk_pos,
        state.prompt_k,
        state.prompt_v,
        state.prompt_mask,
        state.cache_k,
        state.cache_v,
        slot_mask,
        state.write_index,
        method=lambda m, *a: m.xattn_gpt.forward_chunk(
            a[0], a[1], prompt_k=a[2], prompt_v=a[3], prompt_mask=a[4],
            cache_k=a[5], cache_v=a[6], cache_mask=a[7], write_index=a[8],
        ),
    )
    actions = decode_chunk_actions(apply, out)
    return actions, advance_state(
        state, actions, new_k, new_v, slot_mask, chunk_mask, chunk.shape[1]
    )


@functools.partial(jax.jit, static_argnums=(0,), donate_argnums=(2,))
def rollout_step_flamingo(policy, params, state: RolloutState, rgb: Dict, ee):
    """rgb: per-view (B, 3, H, W); ee: (B,)."""
    return _rollout_step_flamingo_core(policy, params, state, rgb, ee)


@functools.partial(jax.jit, static_argnums=(0,), donate_argnums=(2,))
def rollout_step_flamingo_packed(policy, params, state: RolloutState, rgb: Dict, ee):
    """:func:`rollout_step_flamingo` with one packed (B, 12) action array
    (single D2H fetch; see rollout.pack_actions)."""
    actions, state = _rollout_step_flamingo_core(policy, params, state, rgb, ee)
    return pack_actions(actions), state


# -------------------------------------------------------------- decoder-only


@struct.dataclass
class DecoderRolloutState:
    cache_k: tuple  # n_layer x (B, S, E) — E-contiguous (see nn/xattn_gpt.py)
    cache_v: tuple
    slot_mask: jnp.ndarray  # (B, S)
    write_index: jnp.ndarray  # ()
    pos_count: jnp.ndarray  # (B,) next stream position
    last_action: Dict[str, jnp.ndarray]
    has_action: jnp.ndarray  # (B,)


@functools.partial(jax.jit, static_argnums=(0, 5, 6))
def encode_prompt_decoder_only(
    policy, params, word_batch, image_batch, gather, capacity: int, cache_dtype=None
):
    """Prefill [prompt | sep] into the causal KV cache (Gato / GPT).

    Prompt positions: arange frozen at n_valid-1 over pads; sep at n_valid
    (reference vima_gato_policy.py:156-184). cache_dtype defaults to the
    policy's activation dtype (see rollout.encode_prompt)."""
    apply = lambda method, *a, **kw: policy.apply(params, *a, method=method, **kw)
    prompt_tokens, prompt_mask = assemble_prompt(apply, word_batch, image_batch, gather)
    prompt_tokens = apply("encode_prompt_assembled", prompt_tokens, prompt_mask)  # (B, Lp, E)

    B, Lp, E = prompt_tokens.shape
    sep = jnp.broadcast_to(
        params["params"]["prompt_sep_token"].astype(prompt_tokens.dtype), (B, 1, E)
    )
    prefill = jnp.concatenate([prompt_tokens, sep], axis=1)  # (B, Lp+1, E)

    n_valid = jnp.sum(prompt_mask.astype(jnp.int32), axis=1)  # (B,)
    prompt_pos = jnp.minimum(jnp.arange(Lp, dtype=jnp.int32)[None], (n_valid - 1)[:, None])
    positions = jnp.concatenate([prompt_pos, n_valid[:, None]], axis=1)

    n_layer = policy.n_layer
    E = policy.embed_dim
    cdt = cache_dtype or policy.dtype
    cache_k = tuple(jnp.zeros((B, capacity, E), cdt) for _ in range(n_layer))
    cache_v = tuple(jnp.zeros((B, capacity, E), cdt) for _ in range(n_layer))
    slot_mask = jnp.zeros((B, capacity), bool)
    slot_mask = jax.lax.dynamic_update_slice(
        slot_mask,
        jnp.concatenate([prompt_mask.astype(bool), jnp.ones((B, 1), bool)], axis=1),
        (0, 0),
    )

    _, cache_k, cache_v = policy.apply(
        params,
        prefill,
        positions,
        cache_k,
        cache_v,
        slot_mask,
        0,
        method=lambda m, *a: m.transformer.forward_chunk(
            a[0], a[1], cache_k=a[2], cache_v=a[3], cache_mask=a[4], write_index=a[5]
        ),
    )
    state = DecoderRolloutState(
        cache_k=cache_k,
        cache_v=cache_v,
        slot_mask=slot_mask,
        write_index=jnp.int32(Lp + 1),
        pos_count=n_valid + 1,  # next stream position (sep consumed one)
        last_action=zero_actions(B),
        has_action=jnp.zeros((B,), bool),
    )
    return prompt_tokens, state


def _rollout_step_decoder_only_core(policy, params, state: DecoderRolloutState, rgb: Dict, ee):
    apply = lambda method, *a, **kw: policy.apply(params, *a, method=method, **kw)
    obs_tok = apply("forward_obs_token", rgb, ee)
    if obs_tok.ndim == 2:  # GPT: one token per frame
        obs_tok = obs_tok[:, None, :]
    act_emb = apply("forward_action_token", state.last_action)

    B, Q, _ = obs_tok.shape
    chunk, chunk_mask, chunk_pos, slot_mask = make_chunk(
        state, obs_tok, jnp.ones((B, Q), bool), act_emb
    )

    out, new_k, new_v = policy.apply(
        params,
        chunk,
        chunk_pos,
        state.cache_k,
        state.cache_v,
        slot_mask,
        state.write_index,
        method=lambda m, *a: m.transformer.forward_chunk(
            a[0], a[1], cache_k=a[2], cache_v=a[3], cache_mask=a[4], write_index=a[5]
        ),
    )
    actions = decode_chunk_actions(apply, out)
    return actions, advance_state(
        state, actions, new_k, new_v, slot_mask, chunk_mask, chunk.shape[1]
    )

@functools.partial(jax.jit, static_argnums=(0,), donate_argnums=(2,))
def rollout_step_decoder_only(policy, params, state: DecoderRolloutState, rgb: Dict, ee):
    """One env step for Gato (Q=img_patch_len tokens/frame) or GPT (Q=1)."""
    return _rollout_step_decoder_only_core(policy, params, state, rgb, ee)


@functools.partial(jax.jit, static_argnums=(0,), donate_argnums=(2,))
def rollout_step_decoder_only_packed(
    policy, params, state: DecoderRolloutState, rgb: Dict, ee
):
    """:func:`rollout_step_decoder_only` with one packed (B, 12) action array
    (single D2H fetch; see rollout.pack_actions)."""
    actions, state = _rollout_step_decoder_only_core(policy, params, state, rgb, ee)
    return pack_actions(actions), state
