"""XAttnGPT — the VIMA decoder: per layer, cross-attend the obs/action
stream to the prompt, then causal self-attention.

Capability parity with reference vima/nn/seq_modeling/xattn_gpt/
(xattn_gpt.py:13-139, components.py:14-256):
  * learned absolute positions for the stream (``n_positions=512``) and a
    separate table for the prompt (``xattn_n_positions=256``), added once
    before the layer stack.
  * XAttention: pre-LN on queries only, bias-free q/kv/out projections,
    fp32 logits, scale 1/sqrt(head_dim), additive fp32-min padding mask,
    GEGLU FF whose gate reads the **post-residual** activation
    (components.py:220-227 — gated_layer(attention_output), not ln output).
  * Self-attn Block: OpenAI-GPT style **post-LN** (a = attn(x);
    n = ln_1(x+a); h = ln_2(n + mlp(n)); components.py:23-37), causal mask
    as ``where(allowed, w, -1e4)``, fp32 QK, GEGLU MLP with exact GELU.

TPU-native additions (the reference recomputes the full sequence every env
step — scripts/example.py:184, §3.3 of the survey):
  * ``encode_prompt_kv``  — per-layer prompt K/V computed once per episode.
  * ``forward_chunk``     — processes only the new chunk of tokens against a
    fixed-capacity KV cache; per-step cost is O(chunk), not O(history).
Both paths produce identical math (softmax over the same key sets).

Cache layout: all caches (self-attn KV and prompt KV) are **E-contiguous**
``(B, S, H*D)`` — the head split lives inside the attention op
(ops.decode_attention). A head-split ``(B, H, S, D)`` cache with D = 64
pads to 128 lanes on TPU and doubles every cache read/write (measured on
v5e: the round-2 layout spent more HBM time on cache traffic than on all
the matmuls combined at B=64).
"""

from __future__ import annotations

import math
from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from vima_tpu.ops.attention import attend, merge_heads, split_heads
from vima_tpu.ops.layers import gelu_exact


class XAttentionLayer(nn.Module):
    """Cross-attention + gated FF (reference components.py:105-228)."""

    dim: int
    num_heads: int
    ff_expanding: int = 4
    use_geglu: bool = True
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    def setup(self):
        dense = lambda feats, name: nn.Dense(
            feats, use_bias=False, dtype=self.dtype, param_dtype=self.param_dtype, name=name
        )
        ln = lambda name: nn.LayerNorm(
            epsilon=1e-5, dtype=self.dtype, param_dtype=self.param_dtype, name=name
        )
        self.layernorm = ln("layernorm")
        self.query = dense(self.dim, "query")
        self.key_value = dense(2 * self.dim, "key_value")
        self.attention_out = dense(self.dim, "attention_out")
        inner = self.dim * self.ff_expanding
        self.ln = ln("ln")
        self.linear1 = dense(inner, "linear1")
        self.linear2 = dense(self.dim, "linear2")
        if self.use_geglu:
            self.gated_layer = dense(inner, "gated_layer")

    def compute_kv(self, kv_tokens):
        """Project (pos-embedded) prompt tokens to per-head K, V."""
        kv = self.key_value(kv_tokens)
        k, v = jnp.split(kv, 2, axis=-1)
        return split_heads(k, self.num_heads), split_heads(v, self.num_heads)

    def compute_kv_flat(self, kv_tokens):
        """E-contiguous prompt K, V for the cached path: (B, Lp, E) each."""
        kv = self.key_value(kv_tokens)
        k, v = jnp.split(kv, 2, axis=-1)
        return k, v

    def _ff(self, attn_out):
        ff = self.ln(attn_out)
        ff = gelu_exact(self.linear1(ff))
        if self.use_geglu:
            # Gate reads the post-residual activation (components.py:224).
            ff = ff * self.gated_layer(attn_out)
        return self.linear2(ff) + attn_out

    def attend_out(self, q_tokens, k, v, kv_mask):
        """q_tokens: (B, L, E); k/v: (B, H, Lk, D); kv_mask bool (B, Lk)."""
        d = self.dim // self.num_heads
        queries = self.query(self.layernorm(q_tokens))
        ctx = attend(
            split_heads(queries, self.num_heads),
            k,
            v,
            scale=1.0 / math.sqrt(d),
            key_mask=kv_mask,
        )
        attn_out = self.attention_out(merge_heads(ctx)) + q_tokens
        return self._ff(attn_out)

    def attend_out_cached(self, q_tokens, k_flat, v_flat, kv_mask):
        """Cached-path cross-attention against E-contiguous prompt K/V
        (B, Lp, E); same math as :meth:`attend_out`."""
        from vima_tpu.ops.decode_attention import cached_attend

        d = self.dim // self.num_heads
        queries = self.query(self.layernorm(q_tokens))
        ctx = cached_attend(
            split_heads(queries, self.num_heads),
            k_flat,
            v_flat,
            scale=1.0 / math.sqrt(d),
            slot_mask=kv_mask,
            causal=False,
        )
        attn_out = self.attention_out(merge_heads(ctx)) + q_tokens
        return self._ff(attn_out)

    def __call__(self, q_tokens, kv_tokens, kv_mask):
        k, v = self.compute_kv(kv_tokens)
        return self.attend_out(q_tokens, k, v, kv_mask)


class GPTBlock(nn.Module):
    """Post-LN causal self-attention block (reference components.py:14-102)."""

    dim: int
    num_heads: int
    use_geglu: bool = True
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    def setup(self):
        dense = lambda feats, name, bias=True: nn.Dense(
            feats, use_bias=bias, dtype=self.dtype, param_dtype=self.param_dtype, name=name
        )
        self.c_attn = dense(3 * self.dim, "c_attn")
        self.c_proj = dense(self.dim, "c_proj")
        self.ln_1 = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, param_dtype=self.param_dtype, name="ln_1")
        self.ln_2 = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, param_dtype=self.param_dtype, name="ln_2")
        self.mlp_c_fc = dense(4 * self.dim, "mlp_c_fc")
        self.mlp_c_proj = dense(self.dim, "mlp_c_proj")
        if self.use_geglu:
            self.mlp_gated = dense(4 * self.dim, "mlp_gated", bias=False)

    def _mlp(self, n):
        h = gelu_exact(self.mlp_c_fc(n))
        if self.use_geglu:
            h = h * self.mlp_gated(n)
        return self.mlp_c_proj(h)

    def _qkv(self, x):
        qkv = self.c_attn(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        return (
            split_heads(q, self.num_heads),
            split_heads(k, self.num_heads),
            split_heads(v, self.num_heads),
        )

    def _finish(self, x, ctx):
        a = self.c_proj(merge_heads(ctx))
        n = self.ln_1(x + a)
        m = self._mlp(n)
        return self.ln_2(n + m)

    def __call__(self, x, key_mask=None):
        q, k, v = self._qkv(x)
        d = self.dim // self.num_heads
        ctx = attend(q, k, v, scale=1.0 / math.sqrt(d), causal=True, key_mask=key_mask)
        return self._finish(x, ctx)

    def _qkv_flat(self, x):
        """q head-split (B, H, C, D); k, v E-contiguous (B, C, E)."""
        qkv = self.c_attn(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        return split_heads(q, self.num_heads), k, v

    def forward_cached(self, x, cache_k, cache_v, write_index, cache_mask):
        """Process chunk ``x`` (B, C, E) against a fixed-capacity cache.

        cache_k/v: E-contiguous (B, S, E); cache_mask: bool (B, S)
        slot-validity mask already including this chunk. The chunk's K/V
        are written at ``write_index`` before attending, so the chunk
        attends to itself causally. Returns (out, new_cache_k, new_cache_v).
        """
        from vima_tpu.ops.decode_attention import cached_attend

        q, k, v = self._qkv_flat(x)
        new_k = jax.lax.dynamic_update_slice(
            cache_k, k.astype(cache_k.dtype), (0, write_index, 0)
        )
        new_v = jax.lax.dynamic_update_slice(
            cache_v, v.astype(cache_v.dtype), (0, write_index, 0)
        )
        # Value-identity barrier between the in-place cache update and the
        # attend: without it XLA's memory-space assignment fuses the DUS
        # into the attend's operand, promotes the whole (B, S, E) cache to
        # VMEM, and evicts all of it back to HBM every step (~50 MB/layer
        # at B=64). Measured on v5e: 0.39 -> 0.28-0.32 ms per layer at
        # B=64,S=512 bf16 (round-3 DUS labs). The un-barriered new_k/new_v
        # are returned for the carry so the DUS still aliases in place.
        bar_k, bar_v = jax.lax.optimization_barrier((new_k, new_v))
        d = self.dim // self.num_heads
        ctx = cached_attend(
            q,
            bar_k,
            bar_v,
            scale=1.0 / math.sqrt(d),
            slot_mask=cache_mask,
            valid_len=write_index + x.shape[1],
            q_offset=write_index,
            causal=True,
        )
        return self._finish(x, ctx), new_k, new_v


class XAttnGPT(nn.Module):
    """Alternating xattn / causal-self-attn decoder (reference xattn_gpt.py)."""

    embd_dim: int
    n_layer: int
    n_head: int
    xattn_n_head: int
    n_positions: int = 512
    xattn_n_positions: int = 256
    use_geglu: bool = True
    dropout: float = 0.1
    remat: bool = False  # rematerialize blocks during training (jax.checkpoint)
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    def setup(self):
        block_cls = nn.remat(GPTBlock) if self.remat else GPTBlock
        xattn_cls = nn.remat(XAttentionLayer) if self.remat else XAttentionLayer
        self.positions_embed = nn.Embed(
            self.n_positions, self.embd_dim, param_dtype=self.param_dtype, dtype=self.dtype,
            name="positions_embed",
        )
        self.xattn_positions_embed = nn.Embed(
            self.xattn_n_positions, self.embd_dim, param_dtype=self.param_dtype, dtype=self.dtype,
            name="xattn_positions_embed",
        )
        self.h = [
            block_cls(
                dim=self.embd_dim,
                num_heads=self.n_head,
                use_geglu=self.use_geglu,
                dtype=self.dtype,
                param_dtype=self.param_dtype,
                name=f"h_{i}",
            )
            for i in range(self.n_layer)
        ]
        self.xattns = [
            xattn_cls(
                dim=self.embd_dim,
                num_heads=self.xattn_n_head,
                use_geglu=self.use_geglu,
                dtype=self.dtype,
                param_dtype=self.param_dtype,
                name=f"xattn_{i}",
            )
            for i in range(self.n_layer)
        ]
        self.drop = nn.Dropout(rate=self.dropout)

    def _embed_prompt(self, prompt_tokens, prompt_position_ids):
        if prompt_position_ids is None:
            Lp = prompt_tokens.shape[1]
            prompt_position_ids = jnp.arange(Lp, dtype=jnp.int32)[None]
        pos = self.xattn_positions_embed(jnp.clip(prompt_position_ids, 0, None))
        return prompt_tokens + pos

    def __call__(
        self,
        obs_action_tokens: jnp.ndarray,
        prompt_tokens: jnp.ndarray,
        *,
        obs_action_position_ids: Optional[jnp.ndarray] = None,
        prompt_position_ids: Optional[jnp.ndarray] = None,
        prompt_mask: Optional[jnp.ndarray] = None,
        obs_action_masks: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
    ) -> jnp.ndarray:
        """Full-sequence forward, batch-first: tokens (B, L, E)."""
        B, L, E = obs_action_tokens.shape
        if obs_action_position_ids is None:
            obs_action_position_ids = jnp.arange(L, dtype=jnp.int32)[None]
        x = obs_action_tokens + self.positions_embed(jnp.clip(obs_action_position_ids, 0, None))
        x = self.drop(x, deterministic=deterministic)

        prompt = self._embed_prompt(prompt_tokens, prompt_position_ids)

        for xattn, block in zip(self.xattns, self.h):
            x = xattn(x, prompt, prompt_mask)
            x = block(x, obs_action_masks)
        return x

    def encode_prompt_kv(self, prompt_tokens, prompt_position_ids=None):
        """Per-layer prompt K/V, computed once per episode.

        Returns (k, v): tuples of n_layer arrays, each E-contiguous
        (B, Lp, E) — see the module docstring on cache layout. Per-layer
        pytrees (not a stacked array): every cache consumer then
        reads/writes its own buffer directly, with no per-step stack/slice
        copies of the full cache."""
        prompt = self._embed_prompt(prompt_tokens, prompt_position_ids)
        ks, vs = [], []
        for xattn in self.xattns:
            k, v = xattn.compute_kv_flat(prompt)
            ks.append(k)
            vs.append(v)
        return tuple(ks), tuple(vs)

    def forward_chunk(
        self,
        chunk_tokens: jnp.ndarray,
        chunk_position_ids: jnp.ndarray,
        *,
        prompt_k,
        prompt_v,
        prompt_mask: jnp.ndarray,
        cache_k,
        cache_v,
        cache_mask: jnp.ndarray,
        write_index,
    ):
        """Cached step: chunk (B, C, E) against per-layer E-contiguous
        caches (tuples of (B, S, E)).

        ``cache_mask`` is the bool slot-validity mask over all S slots and
        must already include the chunk's own mask (the caller updates it
        before calling). Returns (out, new_cache_k, new_cache_v).

        Each layer updates its own cache buffer with one
        ``dynamic_update_slice`` — XLA aliases these in place inside
        scan/donated carries; a stacked cache would force whole-cache
        stack/slice copies (hundreds of MB at batch) every step.
        """
        x = chunk_tokens + self.positions_embed(jnp.clip(chunk_position_ids, 0, None))
        new_ks, new_vs = [], []
        for i, (xattn, block) in enumerate(zip(self.xattns, self.h)):
            x = xattn.attend_out_cached(x, prompt_k[i], prompt_v[i], prompt_mask)
            out, nk, nv = block.forward_cached(
                x, cache_k[i], cache_v[i], write_index, cache_mask
            )
            new_ks.append(nk)
            new_vs.append(nv)
            x = out
        return x, tuple(new_ks), tuple(new_vs)
