"""Decoder-only GPT for the VIMA-Gato / VIMA-GPT baselines.

Capability parity with reference vima/nn/seq_modeling/gpt/gpt.py:15-301
(vendored OpenAI-GPT accepting ``inputs_embeds``, custom additive padding
mask combined with the causal bias, fp32 QK, ``-1e4`` causal fill, GEGLU
MLP, post-LN blocks). The ``tokens_embed`` table exists for checkpoint
parity but is unused at runtime (the policies always feed embeddings).

TPU-native addition: ``forward_chunk`` + ``prefill`` give these policies the
same fixed-capacity KV-cache rollout as XAttnGPT — here the prompt lives in
the same causal stream, so prefill writes prompt+separator once per episode.
"""

from __future__ import annotations

import math
from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from vima_tpu.nn.xattn_gpt import GPTBlock


class GPTDecoder(nn.Module):
    n_embd: int
    n_layer: int = 12
    n_head: int = 12
    n_positions: int = 512
    vocab_size: int = 40478
    use_geglu: bool = True
    dropout: float = 0.1
    remat: bool = False
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    def setup(self):
        block_cls = nn.remat(GPTBlock) if self.remat else GPTBlock
        self.tokens_embed = nn.Embed(
            self.vocab_size, self.n_embd, param_dtype=self.param_dtype, dtype=self.dtype,
            name="tokens_embed",
        )
        self.positions_embed = nn.Embed(
            self.n_positions, self.n_embd, param_dtype=self.param_dtype, dtype=self.dtype,
            name="positions_embed",
        )
        self.h = [
            block_cls(
                dim=self.n_embd,
                num_heads=self.n_head,
                use_geglu=self.use_geglu,
                dtype=self.dtype,
                param_dtype=self.param_dtype,
                name=f"h_{i}",
            )
            for i in range(self.n_layer)
        ]
        self.drop = nn.Dropout(rate=self.dropout)

    def __call__(
        self,
        inputs_embeds: jnp.ndarray,
        *,
        custom_mask: Optional[jnp.ndarray] = None,
        position_ids: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
    ) -> jnp.ndarray:
        """inputs_embeds: (B, L, E); custom_mask: bool (B, L); batch-first."""
        B, L, E = inputs_embeds.shape
        if position_ids is None:
            position_ids = jnp.arange(L, dtype=jnp.int32)[None]
        x = inputs_embeds + self.positions_embed(jnp.clip(position_ids, 0, None))
        x = self.drop(x, deterministic=deterministic)
        key_mask = None if custom_mask is None else custom_mask.astype(bool)
        for block in self.h:
            x = block(x, key_mask)
        return x

    def forward_chunk(
        self,
        chunk_tokens: jnp.ndarray,
        chunk_position_ids: jnp.ndarray,
        *,
        cache_k,
        cache_v,
        cache_mask: jnp.ndarray,
        write_index,
    ):
        """Chunk (B, C, E) against per-layer E-contiguous caches (tuples of
        (B, S, E)); returns (out, new_cache_k, new_cache_v). Each layer
        updates its own buffer in place (see XAttnGPT.forward_chunk)."""
        x = chunk_tokens + self.positions_embed(jnp.clip(chunk_position_ids, 0, None))
        new_ks, new_vs = [], []
        for i, block in enumerate(self.h):
            x, nk, nv = block.forward_cached(
                x, cache_k[i], cache_v[i], write_index, cache_mask
            )
            new_ks.append(nk)
            new_vs.append(nv)
        return x, tuple(new_ks), tuple(new_vs)
