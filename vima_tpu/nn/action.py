"""Action embedding and decoding heads.

Capability parity:
  * ContinuousActionEmbedding — MLP over de-discretized action vectors
    (reference vima/nn/action_embd/action_embd.py:40-56).
  * ActionEmbedding — dict of embedders, concat on sorted keys, optional
    post-linear to the transformer width (reference :9-37).
  * ActionDecoder — per-key MultiCategorical heads: one small MLP **per
    component dim**, no weight sharing, orthogonal init with
    last_layer_gain=0.01 (reference vima/nn/action_decoder/action_decoder.py).

TPU-first: heads return raw logits (padded into one tensor per key);
``mode`` is a plain argmax over each split — no distribution objects in the
jitted path (reference dists.py only ever uses ``mode``).
"""

from __future__ import annotations

from typing import Any, Dict, Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

from vima_tpu.ops.layers import MLP


class ContinuousActionEmbedding(nn.Module):
    output_dim: int
    hidden_dim: int
    hidden_depth: int
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        return MLP(
            hidden_dim=self.hidden_dim,
            output_dim=self.output_dim,
            hidden_depth=self.hidden_depth,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            name="layer",
        )(x)


class ActionEmbedding(nn.Module):
    """Embed a dict of continuous action components; concat sorted keys."""

    output_dim: int
    embed_specs: Dict[str, Tuple[int, int, int]]  # key -> (output_dim, hidden_dim, hidden_depth)
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x_dict):
        keys = sorted(self.embed_specs.keys())
        embs = []
        for k in keys:
            out_dim, hid, depth = self.embed_specs[k]
            embs.append(
                ContinuousActionEmbedding(
                    output_dim=out_dim,
                    hidden_dim=hid,
                    hidden_depth=depth,
                    dtype=self.dtype,
                    param_dtype=self.param_dtype,
                    name=f"embed_{k}",
                )(x_dict[k])
            )
        x = jnp.concatenate(embs, axis=-1)
        total = sum(self.embed_specs[k][0] for k in keys)
        if total != self.output_dim:
            x = nn.Dense(
                self.output_dim, dtype=self.dtype, param_dtype=self.param_dtype, name="post_layer"
            )(x)
        return x


class MultiCategoricalNet(nn.Module):
    """One MLP per component dim; logits concatenated (reference
    action_decoder.py:128-166)."""

    action_dims: Sequence[int]
    hidden_dim: int
    hidden_depth: int
    activation: str = "relu"
    last_layer_gain: float = 0.01
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        logits = []
        for i, adim in enumerate(self.action_dims):
            logits.append(
                MLP(
                    hidden_dim=self.hidden_dim,
                    output_dim=adim,
                    hidden_depth=self.hidden_depth,
                    activation=self.activation,
                    last_layer_gain=self.last_layer_gain,
                    dtype=self.dtype,
                    param_dtype=self.param_dtype,
                    name=f"mlp_{i}",
                )(x)
            )
        return jnp.concatenate(logits, axis=-1)


class ActionDecoder(nn.Module):
    """Dict of MultiCategorical heads; returns concatenated logits per key."""

    action_dims: Dict[str, Sequence[int]]
    hidden_dim: int
    hidden_depth: int
    activation: str = "relu"
    last_layer_gain: float = 0.01
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        return {
            k: MultiCategoricalNet(
                action_dims=tuple(dims),
                hidden_dim=self.hidden_dim,
                hidden_depth=self.hidden_depth,
                activation=self.activation,
                last_layer_gain=self.last_layer_gain,
                dtype=self.dtype,
                param_dtype=self.param_dtype,
                name=f"decoder_{k}",
            )(x)
            for k, dims in self.action_dims.items()
        }


def multi_categorical_mode(logits: jnp.ndarray, action_dims: Sequence[int]) -> jnp.ndarray:
    """argmax per split, stacked on the last axis (reference dists.py:25-28)."""
    splits = []
    start = 0
    for d in action_dims:
        splits.append(jnp.argmax(logits[..., start : start + d], axis=-1))
        start += d
    return jnp.stack(splits, axis=-1)


def action_mode(logits_dict: Dict[str, jnp.ndarray], action_dims: Dict[str, Sequence[int]]):
    return {k: multi_categorical_mode(v, action_dims[k]) for k, v in logits_dict.items()}
