"""Frozen word-embedding table (t5-base input embeddings).

Reference vima/nn/prompt_encoder/word_embd.py:8-23 loads the 32128x768
t5-base table via ``AutoModel.from_pretrained``; in the TPU build the table
arrives through the checkpoint converter (the released VIMA ckpts embed it
in their state_dict), so no network access is needed at runtime.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn


class WordEmbedding(nn.Module):
    vocab_size: int = 32128
    embed_dim: int = 768
    param_dtype: Any = jnp.float32
    dtype: Any = jnp.float32

    @property
    def output_dim(self):
        return self.embed_dim

    @nn.compact
    def __call__(self, ids):
        table = self.param(
            "embedding",
            nn.initializers.normal(stddev=1.0),
            (self.vocab_size, self.embed_dim),
            self.param_dtype,
        )
        return jnp.take(table, ids, axis=0).astype(self.dtype)
