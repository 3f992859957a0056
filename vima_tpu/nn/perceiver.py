"""Perceiver resampler: variable patch tokens -> fixed `num_latents` queries.

Re-implements the subset of HF ``PerceiverModel`` the reference uses
(vima/nn/obj_encoder/perceiver/perceiver.py:25-41 with
``PerceiverConfig(d_model=E, d_latents=E, num_latents=4, ...)``):

  * learned latents, cross-attention layer (qk/v channels = kv_dim since
    ``cross_attention_shape_for_attention == "kv"``), then a block of
    ``num_self_attends_per_block`` self-attention layers applied
    ``num_blocks`` times **with shared weights** (HF PerceiverEncoder.forward
    loops the same ModuleList).
  * pre-LN on queries (and on inputs for cross-attn), q/k/v projections with
    bias, scale 1/sqrt(head_dim), output dense, query residual; FF is
    LN -> dense(widening factor 1) -> exact GELU -> dense, residual.
  * LayerNorm eps 1e-5 (torch default — HF builds them without
    passing config.layer_norm_eps), no final norm; latents returned directly.
"""

from __future__ import annotations

from typing import Any, Optional

import jax.numpy as jnp
from flax import linen as nn

from vima_tpu.ops.attention import attend, split_heads, merge_heads
from vima_tpu.ops.layers import gelu_exact


class PerceiverAttentionLayer(nn.Module):
    d_model: int
    num_heads: int
    is_cross: bool
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, latents, inputs=None, inputs_mask=None):
        ln = lambda name: nn.LayerNorm(
            epsilon=1e-5, dtype=self.dtype, param_dtype=self.param_dtype, name=name
        )
        dense = lambda feats, name: nn.Dense(
            feats, dtype=self.dtype, param_dtype=self.param_dtype, name=name
        )

        q_in = ln("layernorm1")(latents)
        if self.is_cross:
            kv_in = ln("layernorm2")(inputs)
            kmask = inputs_mask
        else:
            kv_in = q_in
            kmask = None

        q = dense(self.d_model, "query")(q_in)
        k = dense(self.d_model, "key")(kv_in)
        v = dense(self.d_model, "value")(kv_in)
        d = self.d_model // self.num_heads
        ctx = attend(
            split_heads(q, self.num_heads),
            split_heads(k, self.num_heads),
            split_heads(v, self.num_heads),
            scale=1.0 / (d**0.5),
            key_mask=kmask,
        )
        attn_out = dense(self.d_model, "out")(merge_heads(ctx))
        attn_out = attn_out + latents  # query residual

        h = ln("ff_layernorm")(attn_out)
        h = dense(self.d_model, "ff_dense1")(h)  # widening factor 1
        h = gelu_exact(h)
        h = dense(self.d_model, "ff_dense2")(h)
        return h + attn_out


class PerceiverResampler(nn.Module):
    d_model: int
    num_latents: int
    num_blocks: int
    num_self_attends_per_block: int
    num_self_attention_heads: int
    num_cross_attention_heads: int
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, inputs, mask: Optional[jnp.ndarray] = None):
        """inputs: (B, L, d_model); mask: optional bool (B, L).
        Returns (B, num_latents, d_model)."""
        B = inputs.shape[0]
        latents = self.param(
            "latents",
            nn.initializers.normal(stddev=1.0),
            (self.num_latents, self.d_model),
            self.param_dtype,
        )
        x = jnp.broadcast_to(latents.astype(self.dtype), (B, self.num_latents, self.d_model))

        x = PerceiverAttentionLayer(
            d_model=self.d_model,
            num_heads=self.num_cross_attention_heads,
            is_cross=True,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            name="cross_attention",
        )(x, inputs=inputs, inputs_mask=mask)

        # Shared-weight self-attend block applied num_blocks times
        # (HF PerceiverEncoder.forward loops the same layers).
        layers = [
            PerceiverAttentionLayer(
                d_model=self.d_model,
                num_heads=self.num_self_attention_heads,
                is_cross=False,
                dtype=self.dtype,
                param_dtype=self.param_dtype,
                name=f"self_attends_{i}",
            )
            for i in range(self.num_self_attends_per_block)
        ]
        for _ in range(self.num_blocks):
            for layer in layers:
                x = layer(x)
        return x
