"""T5 encoder stack — TPU-native Flax re-implementation of the subset the
reference uses (vima/nn/prompt_encoder/prompt_encoder.py:22-825, a vendored
HF T5 encoder running over pre-assembled embedding sequences).

Semantics preserved exactly:
  * RMS layer norm (no bias, fp32 stats, eps 1e-6), pre-norm residual blocks.
  * Attention without logit scaling (T5 folds it into init), q/k/v/o with no
    bias, **fp32 QK scores** (reference prompt_encoder.py:769-770).
  * Bidirectional relative-position bias (32 buckets, max distance 128) held
    by layer 0 only and shared across layers (reference :151-155, :775-800);
    the additive padding mask is folded into the bias (:794-797).
  * ReLU feed-forward (t5-base), final RMS norm + dropout.

TPU-first: batch-first, static shapes; the bias+mask tensor is computed once
per call and broadcast; dropout only when ``deterministic=False``.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from vima_tpu.ops.attention import attend, split_heads, merge_heads, padding_bias_from_mask
from vima_tpu.ops.layers import RMSNorm


@dataclasses.dataclass(frozen=True)
class T5Config:
    d_model: int = 768
    d_kv: int = 64
    d_ff: int = 3072
    num_layers: int = 12
    num_heads: int = 12
    relative_attention_num_buckets: int = 32
    relative_attention_max_distance: int = 128
    layer_norm_epsilon: float = 1e-6
    dropout_rate: float = 0.1
    vocab_size: int = 32128

    @classmethod
    def t5_base(cls):
        return cls()


def relative_position_bucket(
    relative_position: jnp.ndarray,
    *,
    bidirectional: bool = True,
    num_buckets: int = 32,
    max_distance: int = 128,
) -> jnp.ndarray:
    """HF T5 bucket function (encoder flavor, bidirectional)."""
    relative_buckets = jnp.zeros_like(relative_position)
    if bidirectional:
        num_buckets //= 2
        relative_buckets += (relative_position > 0).astype(jnp.int32) * num_buckets
        relative_position = jnp.abs(relative_position)
    else:
        relative_position = -jnp.minimum(relative_position, 0)

    max_exact = num_buckets // 2
    is_small = relative_position < max_exact
    rel_pos_if_large = max_exact + (
        jnp.log(relative_position.astype(jnp.float32) / max_exact + 1e-20)
        / np.log(max_distance / max_exact)
        * (num_buckets - max_exact)
    ).astype(jnp.int32)
    rel_pos_if_large = jnp.minimum(rel_pos_if_large, num_buckets - 1)
    relative_buckets += jnp.where(is_small, relative_position, rel_pos_if_large)
    return relative_buckets


class T5Attention(nn.Module):
    cfg: T5Config
    has_relative_attention_bias: bool = False
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, position_bias=None, key_mask=None):
        cfg = self.cfg
        inner = cfg.num_heads * cfg.d_kv
        dense = lambda feats, name: nn.Dense(
            feats, use_bias=False, dtype=self.dtype, param_dtype=self.param_dtype, name=name
        )
        q = split_heads(dense(inner, "q")(x), cfg.num_heads)
        k = split_heads(dense(inner, "k")(x), cfg.num_heads)
        v = split_heads(dense(inner, "v")(x), cfg.num_heads)

        out = attend(q, k, v, scale=None, bias=position_bias, key_mask=key_mask)
        return dense(cfg.d_model, "o")(merge_heads(out))


class T5Block(nn.Module):
    cfg: T5Config
    has_relative_attention_bias: bool = False
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    def setup(self):
        cfg = self.cfg
        self.attn = T5Attention(
            cfg,
            has_relative_attention_bias=self.has_relative_attention_bias,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            name="SelfAttention",
        )
        self.attn_norm = RMSNorm(eps=cfg.layer_norm_epsilon, param_dtype=self.param_dtype, name="self_attn_norm")
        self.wi = nn.Dense(cfg.d_ff, use_bias=False, dtype=self.dtype, param_dtype=self.param_dtype, name="wi")
        self.wo = nn.Dense(cfg.d_model, use_bias=False, dtype=self.dtype, param_dtype=self.param_dtype, name="wo")
        self.ff_norm = RMSNorm(eps=cfg.layer_norm_epsilon, param_dtype=self.param_dtype, name="ff_norm")
        self.dropout = nn.Dropout(rate=cfg.dropout_rate)

    def __call__(self, x, position_bias, key_mask=None, deterministic: bool = True):
        h = self.attn(self.attn_norm(x), position_bias=position_bias, key_mask=key_mask)
        x = x + self.dropout(h, deterministic=deterministic)

        h = self.ff_norm(x)
        h = jax.nn.relu(self.wi(h))
        h = self.dropout(h, deterministic=deterministic)
        h = self.wo(h)
        x = x + self.dropout(h, deterministic=deterministic)
        return x


class T5EncoderStack(nn.Module):
    """The encoder: N blocks, shared rel-bias from block 0, final RMS norm.

    ``remat`` rematerializes each block during training — the TPU-native
    replacement for the reference's gradient-checkpoint path
    (prompt_encoder.py:376-400)."""

    cfg: T5Config
    remat: bool = False
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    def setup(self):
        cfg = self.cfg
        # static_argnums counts self at index 0 -> deterministic is arg 4
        block_cls = nn.remat(T5Block, static_argnums=(4,)) if self.remat else T5Block
        # The relative attention bias table lives on block 0's attention
        # (reference prompt_encoder.py:151-155).
        self.rel_bias_table = self.param(
            "relative_attention_bias",
            nn.initializers.normal(stddev=1.0),
            (cfg.relative_attention_num_buckets, cfg.num_heads),
            self.param_dtype,
        )
        self.blocks = [
            block_cls(
                cfg,
                has_relative_attention_bias=(i == 0),
                dtype=self.dtype,
                param_dtype=self.param_dtype,
                name=f"block_{i}",
            )
            for i in range(cfg.num_layers)
        ]
        self.final_norm = RMSNorm(
            eps=cfg.layer_norm_epsilon, param_dtype=self.param_dtype, name="final_layer_norm"
        )
        self.dropout = nn.Dropout(rate=cfg.dropout_rate)

    def __call__(
        self,
        inputs_embeds: jnp.ndarray,
        attention_mask: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
    ) -> jnp.ndarray:
        """inputs_embeds: (B, L, d_model); attention_mask: bool/float (B, L)."""
        B, L, _ = inputs_embeds.shape
        cfg = self.cfg

        ctx = jnp.arange(L, dtype=jnp.int32)[:, None]
        mem = jnp.arange(L, dtype=jnp.int32)[None, :]
        buckets = relative_position_bucket(
            mem - ctx,
            bidirectional=True,
            num_buckets=cfg.relative_attention_num_buckets,
            max_distance=cfg.relative_attention_max_distance,
        )
        bias = jnp.take(self.rel_bias_table, buckets, axis=0).transpose(2, 0, 1)[None]
        bias = bias.astype(jnp.float32)  # (1, H, L, L)
        key_mask = None if attention_mask is None else attention_mask.astype(jnp.bool_)

        x = self.dropout(inputs_embeds, deterministic=deterministic)
        for block in self.blocks:
            # positional call: remat's static_argnums needs `deterministic`
            # at a positional index (3)
            x = block(x, bias, key_mask, deterministic)
        x = self.final_norm(x)
        x = self.dropout(x, deterministic=deterministic)
        return x


class T5PromptEncoder(nn.Module):
    """Batch-first wrapper matching reference T5PromptEncoder
    (prompt_encoder.py:22-58): runs the encoder over pre-assembled embedding
    sequences."""

    cfg: T5Config
    remat: bool = False
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @property
    def output_dim(self):
        return self.cfg.d_model

    @nn.compact
    def __call__(self, x, attention_mask=None, deterministic: bool = True):
        return T5EncoderStack(
            self.cfg, remat=self.remat, dtype=self.dtype,
            param_dtype=self.param_dtype, name="encoder"
        )(x, attention_mask=attention_mask, deterministic=deterministic)
