"""Shared policy math: action (de)discretization and stream assembly.

Reference semantics: vima/policy/vima_policy.py:267-322 (identical across
all four policies). Bins: x=50, y=100, z=50, rot=50.
"""

from __future__ import annotations

from typing import Dict

import jax.numpy as jnp

N_DISCRETE_X_BINS = 50
N_DISCRETE_Y_BINS = 100
N_DISCRETE_Z_BINS = 50
N_DISCRETE_ROT_BINS = 50

ACTION_KEYS = ("pose0_position", "pose0_rotation", "pose1_position", "pose1_rotation")
ACTION_DIMS = {
    "pose0_position": (50, 100),
    "pose0_rotation": (50, 50, 50, 50),
    "pose1_position": (50, 100),
    "pose1_rotation": (50, 50, 50, 50),
}
# ActionEmbedding specs: key -> (output_dim, hidden_dim, hidden_depth)
# (reference vima_policy.py:51-79).
ACTION_EMBED_SPECS = {k: (256, 256, 1) for k in ACTION_KEYS}


def de_discretize_actions(actions: Dict[str, jnp.ndarray]) -> Dict[str, jnp.ndarray]:
    """Discrete bins -> [0, 1) continuous (reference vima_policy.py:301-322)."""
    out = {}
    pos_div = jnp.asarray([N_DISCRETE_X_BINS, N_DISCRETE_Y_BINS], dtype=jnp.float32)
    out["pose0_position"] = actions["pose0_position"].astype(jnp.float32) / pos_div
    out["pose1_position"] = actions["pose1_position"].astype(jnp.float32) / pos_div
    out["pose0_rotation"] = actions["pose0_rotation"].astype(jnp.float32) / N_DISCRETE_ROT_BINS
    out["pose1_rotation"] = actions["pose1_rotation"].astype(jnp.float32) / N_DISCRETE_ROT_BINS
    return out


def discretize_action(action: Dict[str, jnp.ndarray]) -> Dict[str, jnp.ndarray]:
    """Continuous [0,1] -> bin index via boundary search; matches
    torch.bucketize(v, linspace(0,1,n), right=False)
    (reference vima_policy.py:267-299)."""
    bx = jnp.linspace(0.0, 1.0, N_DISCRETE_X_BINS)
    by = jnp.linspace(0.0, 1.0, N_DISCRETE_Y_BINS)
    br = jnp.linspace(0.0, 1.0, N_DISCRETE_ROT_BINS)

    def bucketize(v, boundaries):
        return jnp.searchsorted(boundaries, v, side="left").astype(jnp.int32)

    out = {}
    for p in ("pose0", "pose1"):
        pos = action[f"{p}_position"].astype(jnp.float32)
        out[f"{p}_position"] = jnp.stack(
            [bucketize(pos[..., 0], bx), bucketize(pos[..., 1], by)], axis=-1
        )
        out[f"{p}_rotation"] = bucketize(action[f"{p}_rotation"].astype(jnp.float32), br)
    return out


def bound_actions(
    actions: Dict[str, jnp.ndarray],
    action_bounds_low: jnp.ndarray,
    action_bounds_high: jnp.ndarray,
) -> Dict[str, jnp.ndarray]:
    """De-discretized [0,1] actions -> env action space: positions scaled to
    bounds and clamped, rotations mapped to [-1, 1]
    (reference scripts/example.py:199-234)."""
    lo, hi = action_bounds_low, action_bounds_high
    out = {}
    for p in ("pose0", "pose1"):
        pos = actions[f"{p}_position"] * (hi - lo) + lo
        out[f"{p}_position"] = jnp.clip(pos, lo, hi)
        out[f"{p}_rotation"] = jnp.clip(actions[f"{p}_rotation"] * 2.0 - 1.0, -1.0, 1.0)
    return out


def interleave_obs_actions(
    obs_tokens: jnp.ndarray,
    obs_masks: jnp.ndarray,
    action_tokens,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Build the interleaved stream [obs_0 .. obs_{Q-1}, act]* as one reshape.

    obs_tokens: (B, T, Q, E); obs_masks: (B, T, Q) bool;
    action_tokens: (B, T_a, E) or None with T_a <= T.
    Returns (tokens (B, T*(Q+1), E), masks (B, T*(Q+1))).

    Matches the reference's strided scatter (vima_policy.py:129-143): group t
    holds that step's Q obs slots then its action slot. Groups beyond T_a
    carry a masked dummy action slot — excluded from attention and from the
    position-id cumsum, so downstream outputs are bit-identical to the
    reference's shorter stream.
    """
    B, T, Q, E = obs_tokens.shape
    if action_tokens is None:
        T_a = 0
        act = jnp.zeros((B, T, 1, E), dtype=obs_tokens.dtype)
    else:
        T_a = action_tokens.shape[1]
        pad = jnp.zeros((B, T - T_a, E), dtype=obs_tokens.dtype)
        act = jnp.concatenate([action_tokens, pad], axis=1)[:, :, None, :]
    groups = jnp.concatenate([obs_tokens, act], axis=2)  # (B, T, Q+1, E)
    tokens = groups.reshape(B, T * (Q + 1), E)

    act_mask = jnp.zeros((B, T, 1), dtype=bool)
    if T_a > 0:
        act_mask = act_mask.at[:, :T_a, :].set(True)
    masks = jnp.concatenate([obs_masks.astype(bool), act_mask], axis=2).reshape(B, T * (Q + 1))
    return tokens, masks


def masked_position_ids(masks: jnp.ndarray) -> jnp.ndarray:
    """cumsum(mask)-1: padding consumes no positions
    (reference vima_policy.py:145-147)."""
    return jnp.clip(jnp.cumsum(masks.astype(jnp.int32), axis=1) - 1, 0, None)
