"""TPU-native cached rollout for VIMAPolicy.

The reference recomputes the entire growing sequence every env step with no
KV cache of any kind (scripts/example.py:111-240, survey §3.3). Here:

  * ``encode_prompt``  — once per episode: assemble prompt embeddings via
    one gather, run T5, precompute per-layer prompt K/V for every xattn
    layer, and initialize fixed-capacity self-attention KV caches.
  * ``rollout_step``   — once per env step: embed the new observation's
    object tokens + the previous action token as one (Q+1)-token chunk,
    run the decoder over the chunk against the caches, decode the action.

Per-step decoder cost is O(chunk x capacity) with static shapes — compiled
once, no recompilation across steps or episodes. Numerics match the parity
path exactly (same softmax key sets; masked dummy slots consume no
positions and are excluded from attention).
"""

from __future__ import annotations

import functools
from typing import Any, Dict

import jax
import jax.numpy as jnp
from flax import struct

from vima_tpu.policy.base import ACTION_DIMS, masked_position_ids
from vima_tpu.nn.action import action_mode


@struct.dataclass
class RolloutState:
    """Per-episode device state (a pytree; donated through jit)."""

    prompt_k: tuple  # n_layer x (B, Lp, E) — E-contiguous (see nn/xattn_gpt.py)
    prompt_v: tuple
    prompt_mask: jnp.ndarray  # (B, Lp) bool
    cache_k: tuple  # n_layer x (B, S, E) — E-contiguous
    cache_v: tuple
    slot_mask: jnp.ndarray  # (B, S) bool
    write_index: jnp.ndarray  # () int32
    pos_count: jnp.ndarray  # (B,) int32 — valid tokens so far
    last_action: Dict[str, jnp.ndarray]  # predicted at previous step
    has_action: jnp.ndarray  # (B,) bool


def zero_actions(batch: int) -> Dict[str, jnp.ndarray]:
    return {
        "pose0_position": jnp.zeros((batch, 2), jnp.int32),
        "pose0_rotation": jnp.zeros((batch, 4), jnp.int32),
        "pose1_position": jnp.zeros((batch, 2), jnp.int32),
        "pose1_rotation": jnp.zeros((batch, 4), jnp.int32),
    }


# Fixed key order for single-array action transport. The closed loop fetches
# actions from the device every step; one packed (B, 12) fetch instead of 8
# per-key fetches matters on high-latency links (the tunneled-TPU RTT is
# ~30 ms — see CLAUDE.md) and is one D2H instead of 8 everywhere else.
ACTION_PACK_ORDER = ("pose0_position", "pose0_rotation", "pose1_position", "pose1_rotation")


def pack_actions(actions: Dict[str, jnp.ndarray]) -> jnp.ndarray:
    """dict of (B, d_k) int32 -> one (B, 12) int32 in ACTION_PACK_ORDER."""
    return jnp.concatenate([actions[k] for k in ACTION_PACK_ORDER], axis=-1)


def unpack_actions_np(packed) -> Dict[str, "np.ndarray"]:
    """Host-side inverse of :func:`pack_actions` (numpy, zero-copy slices)."""
    import numpy as np

    packed = np.asarray(packed)
    out, i = {}, 0
    for k in ACTION_PACK_ORDER:
        d = len(ACTION_DIMS[k])
        out[k] = packed[..., i : i + d]
        i += d
    return out


@functools.partial(jax.jit, static_argnums=(0, 5, 6))
def encode_prompt(
    policy,
    params,
    word_batch: jnp.ndarray,
    image_batch: Dict,
    gather: Dict[str, jnp.ndarray],
    capacity: int,
    cache_dtype=None,
):
    """Episode-start prompt encoding + cache init.

    word_batch: (n_words,) int32 token ids.
    image_batch: dict(cropped_img/bbox/mask per view) with leading (n_imgs, n_objs).
    gather: dict with
      ``idx``  (B, Lp) int32 — index into [word_embs; img_embs_flat; zero_row]
      ``mask`` (B, Lp) bool  — assembled prompt mask (host-computed from
      token types and per-object masks, reference vima_policy.py:168-231).
    capacity: self-attn KV capacity S (static).
    cache_dtype: KV-cache storage dtype (static); defaults to the policy's
      activation dtype. (Round 2 defaulted fp32 because the head-split
      (B, H, S, 64) layout made bf16 cache tiles pathological; the
      E-contiguous (B, S, E) layout removed that, so bf16 policies now get
      the halved cache traffic.) Attention logits stay fp32 either way.
    Returns (prompt_tokens (B, Lp, E), RolloutState).
    """
    apply = lambda method, *a, **kw: policy.apply(params, *a, method=method, **kw)

    prompt_tokens, prompt_mask = assemble_prompt(apply, word_batch, image_batch, gather)
    prompt_tokens = apply("encode_prompt_assembled", prompt_tokens, prompt_mask)
    pk, pv = apply("encode_prompt_kv", prompt_tokens, prompt_mask)

    B = prompt_tokens.shape[0]
    n_layer = policy.xf_n_layers
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


def assemble_prompt(apply, word_batch, image_batch, gather):
    """One-gather prompt assembly shared by every family's encode_prompt:
    [word embs; flattened asset-object embs; zero row][gather.idx]
    (replaces the reference's host-driven interleave loop,
    vima_policy.py:168-231). Returns (prompt_tokens (B, Lp, d), mask)."""
    word_embs = apply("embed_prompt_words", word_batch)
    img_embs = apply("embed_prompt_images", image_batch)
    d = word_embs.shape[-1]
    src = jnp.concatenate(
        [word_embs, img_embs.reshape(-1, d), jnp.zeros((1, d), word_embs.dtype)], axis=0
    )
    return src[gather["idx"]], gather["mask"]


def make_chunk(state, obs_tok, obs_mask, act_emb):
    """Per-step chunk bookkeeping shared by every family's rollout step:
    [prev_action | obs tokens] chunk, its validity mask (the step-0 dummy
    action slot stays masked forever via ``has_action``), cumsum positions
    (padding consumes none, reference vima_policy.py:145-147), and the
    slot-mask cache write."""
    chunk = jnp.concatenate([act_emb[:, None, :], obs_tok], axis=1)  # (B, 1+Q, E)
    chunk_mask = jnp.concatenate(
        [state.has_action[:, None], obs_mask.astype(bool)], axis=1
    )  # (B, 1+Q)
    chunk_pos = jnp.clip(
        state.pos_count[:, None] + jnp.cumsum(chunk_mask.astype(jnp.int32), axis=1) - 1,
        0,
        None,
    )
    slot_mask = jax.lax.dynamic_update_slice(
        state.slot_mask, chunk_mask, (0, state.write_index)
    )
    return chunk, chunk_mask, chunk_pos, slot_mask


def decode_chunk_actions(apply, out):
    """Greedy actions from the chunk's last output slot (reference
    example.py:191-195: take the final obs-group slot, argmax per head)."""
    logits = apply("forward_action_decoder", out[:, -1, :])
    actions = action_mode(logits, {k: list(v) for k, v in ACTION_DIMS.items()})
    return {k: v.astype(jnp.int32) for k, v in actions.items()}


def advance_state(state, actions, new_k, new_v, slot_mask, chunk_mask, chunk_len: int):
    """Post-step state update shared by every family."""
    return state.replace(
        cache_k=new_k,
        cache_v=new_v,
        slot_mask=slot_mask,
        write_index=state.write_index + chunk_len,
        pos_count=state.pos_count + jnp.sum(chunk_mask.astype(jnp.int32), axis=1),
        last_action=actions,
        has_action=jnp.ones_like(state.has_action),
    )


def _rollout_step_core(policy, params, state: RolloutState, objects: Dict, ee: jnp.ndarray):
    apply = lambda method, *a, **kw: policy.apply(params, *a, method=method, **kw)

    obs_tok, obs_mask = apply("forward_obs_token", objects, ee)  # (B, Q, E), (B, Q)
    act_emb = apply("forward_action_token", state.last_action)  # (B, E)
    chunk, chunk_mask, chunk_pos, slot_mask = make_chunk(state, obs_tok, obs_mask, act_emb)

    out, new_k, new_v = apply(
        "step_chunk",
        chunk,
        chunk_pos,
        state.prompt_k,
        state.prompt_v,
        state.prompt_mask,
        state.cache_k,
        state.cache_v,
        slot_mask,
        state.write_index,
    )
    actions = decode_chunk_actions(apply, out)
    new_state = advance_state(
        state, actions, new_k, new_v, slot_mask, chunk_mask, chunk.shape[1]
    )
    return actions, new_state


@functools.partial(jax.jit, static_argnums=(0,), donate_argnums=(2,))
def rollout_step(policy, params, state: RolloutState, objects: Dict, ee: jnp.ndarray):
    """One env step. objects: dict(cropped_img (B,n,3,R,R), bbox (B,n,4),
    mask (B,n) per view); ee: (B,) int. Returns (discrete_actions, new_state).

    Capacity contract: the caller must not step past
    ``capacity // (1 + Q)`` env steps (Q = total objects across views).
    ``write_index`` is traced, so overflow cannot raise in-graph; past the
    cap ``dynamic_update_slice`` clamps and overwrites the newest slots,
    corrupting subsequent actions. ``bridge.env_loop`` checks this at
    setup; ``replay_rollout`` checks it at trace time."""
    return _rollout_step_core(policy, params, state, objects, ee)


@functools.partial(jax.jit, static_argnums=(0,), donate_argnums=(2,))
def rollout_step_packed(policy, params, state: RolloutState, objects: Dict, ee: jnp.ndarray):
    """:func:`rollout_step` with actions packed into one (B, 12) int32 array
    (one device->host fetch per step instead of 8; unpack with
    :func:`unpack_actions_np`)."""
    actions, state = _rollout_step_core(policy, params, state, objects, ee)
    return pack_actions(actions), state


@functools.partial(jax.jit, static_argnums=(0,), donate_argnums=(2,))
def replay_rollout(policy, params, state: RolloutState, objects_seq: Dict, ee_seq):
    """Autoregressive rollout over a recorded observation sequence: obs come
    from the recording, actions feed back from the model (BASELINE config 2).
    One jit, ``lax.scan`` over steps — zero per-step dispatch.

    objects_seq leaves have leading (T, B, ...); ee_seq: (T, B).
    Returns (actions with leading (T, B, ...), final_state)."""
    # Static capacity check (shapes are concrete at trace time): T steps of
    # (1 + Q)-token chunks must fit the KV cache, or dynamic_update_slice
    # would clamp and silently overwrite recent slots.
    T = ee_seq.shape[0]
    n_objs = sum(m.shape[2] for m in objects_seq["mask"].values())
    capacity = state.slot_mask.shape[1]
    if T * (1 + n_objs) > capacity:
        raise ValueError(
            f"replay of {T} steps x {1 + n_objs}-token chunks needs "
            f"{T * (1 + n_objs)} cache slots but capacity is {capacity}; "
            "raise encode_prompt's capacity (architecture cap: 512 positions)"
        )

    def body(state, inputs):
        objects, ee = inputs
        actions, state = _rollout_step_core(policy, params, state, objects, ee)
        return state, actions

    state, actions = jax.lax.scan(body, state, (objects_seq, ee_seq))
    return actions, state
