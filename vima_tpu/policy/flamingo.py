"""VIMA-Flamingo baseline: XAttnGPT decoder over Perceiver-resampled RGB.

Capability parity with reference vima/policy/vima_flamingo_policy.py:11-291:
obs = 4 perceiver queries per frame; the decoder is called **without** obs
masks or explicit position ids (reference :150-154) — positions default to
arange and the stream mask is all-ones.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax.numpy as jnp
from flax import linen as nn

from vima_tpu.nn.action import ActionDecoder, ActionEmbedding
from vima_tpu.nn.obj_encoder import MultiViewRGBPerceiverEncoder
from vima_tpu.nn.t5 import T5Config, T5PromptEncoder
from vima_tpu.nn.word_embedding import WordEmbedding
from vima_tpu.nn.xattn_gpt import XAttnGPT
from vima_tpu.ops.layers import MLP
from vima_tpu.policy import base
from vima_tpu.policy.base import ACTION_DIMS, ACTION_EMBED_SPECS, interleave_obs_actions


class VIMAFlamingoPolicy(nn.Module):
    embed_dim: int
    dt_n_layers: int
    dt_n_heads: int
    xattn_n_heads: int
    img_size: tuple = (64, 128)
    vit_patch_size: int = 32
    vit_width: int = 768
    vit_layers: int = 4
    vit_heads: int = 24
    num_queries: int = 4
    perceiver_num_blocks: int = 4
    perceiver_num_self_attends_per_block: int = 4
    perceiver_num_self_attention_heads: int = 8
    perceiver_num_cross_attention_heads: int = 8
    t5_cfg: T5Config = T5Config()
    vocab_size: int = 32128
    views: tuple = ("front", "top")
    remat: bool = False
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    def setup(self):
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        self.xattn_gpt = XAttnGPT(
            embd_dim=self.embed_dim,
            n_layer=self.dt_n_layers,
            n_head=self.dt_n_heads,
            xattn_n_head=self.xattn_n_heads,
            xattn_n_positions=256,
            use_geglu=True,
            remat=self.remat,
            name="xattn_gpt",
            **kw,
        )
        self.obj_encoder = MultiViewRGBPerceiverEncoder(
            emb_dim=self.embed_dim,
            views=self.views,
            img_size=self.img_size,
            vit_patch_size=self.vit_patch_size,
            vit_width=self.vit_width,
            vit_layers=self.vit_layers,
            vit_heads=self.vit_heads,
            perceiver_num_queries=self.num_queries,
            perceiver_num_blocks=self.perceiver_num_blocks,
            perceiver_num_self_attends_per_block=self.perceiver_num_self_attends_per_block,
            perceiver_num_self_attention_heads=self.perceiver_num_self_attention_heads,
            perceiver_num_cross_attention_heads=self.perceiver_num_cross_attention_heads,
            name="obj_encoder",
            **kw,
        )
        self.end_effector_encoder = nn.Embed(
            2, 2, dtype=self.dtype, param_dtype=self.param_dtype, name="end_effector_encoder"
        )
        self.obs_fusion_layer = nn.Dense(self.embed_dim, name="obs_fusion_layer", **kw)
        self.action_encoder = ActionEmbedding(
            output_dim=self.embed_dim, embed_specs=dict(ACTION_EMBED_SPECS),
            name="action_encoder", **kw,
        )
        self.action_decoder = ActionDecoder(
            action_dims={k: list(v) for k, v in ACTION_DIMS.items()},
            hidden_dim=512, hidden_depth=2, activation="relu", last_layer_gain=0.01,
            name="action_decoder", **kw,
        )
        self.prompt_embedding = WordEmbedding(
            vocab_size=self.vocab_size, embed_dim=self.t5_cfg.d_model,
            name="prompt_embedding", **kw,
        )
        self.t5_prompt_encoder = T5PromptEncoder(
            self.t5_cfg, remat=self.remat, name="t5_prompt_encoder", **kw
        )
        if self.embed_dim != self.t5_cfg.d_model:
            self.t5_prompt_encoder_post_layer = nn.Dense(
                self.embed_dim, use_bias=False, name="t5_prompt_encoder_post_layer", **kw
            )
        else:
            self.t5_prompt_encoder_post_layer = None
        self.prompt_obj_post_layer = MLP(
            hidden_dim=self.t5_cfg.d_model, output_dim=self.t5_cfg.d_model,
            hidden_depth=2, name="prompt_obj_post_layer", **kw,
        )

    def warmup(self):
        """Touch every submodule once for full param-tree init."""
        B, T = 1, 1
        H, W = self.img_size
        rgb = {v: jnp.full((B, T, 3, H, W), 128, jnp.uint8) for v in self.views}
        obs_tok = self.forward_obs_token(rgb, jnp.zeros((B, T), jnp.int32))
        action = {
            "pose0_position": jnp.zeros((T, B, 2), jnp.int32),
            "pose0_rotation": jnp.zeros((T, B, 4), jnp.int32),
            "pose1_position": jnp.zeros((T, B, 2), jnp.int32),
            "pose1_rotation": jnp.zeros((T, B, 4), jnp.int32),
        }
        self.forward_action_token(action)
        self.embed_prompt_words(jnp.zeros((1,), jnp.int32))
        self.embed_prompt_images({"rgb": {v: rgb[v][:, 0] for v in self.views}})
        Lp = 2
        prompt = self.encode_prompt_assembled(
            jnp.zeros((B, Lp, self.t5_cfg.d_model)), jnp.ones((B, Lp), bool)
        )
        out = self.__call__(
            obs_tok.transpose(1, 0, 2, 3), None,
            prompt.transpose(1, 0, 2), jnp.ones((B, Lp), bool),
        )
        return self.forward_action_decoder(out[-1])

    def embed_prompt_words(self, word_batch):
        return self.prompt_embedding(word_batch)

    def embed_prompt_images(self, image_batch):
        emb = self.obj_encoder(rgb=image_batch["rgb"])
        return self.prompt_obj_post_layer(emb)

    def encode_prompt_assembled(self, prompt_tokens, prompt_mask, deterministic: bool = True):
        out = self.t5_prompt_encoder(
            prompt_tokens, attention_mask=prompt_mask, deterministic=deterministic
        )
        if self.t5_prompt_encoder_post_layer is not None:
            out = self.t5_prompt_encoder_post_layer(out)
        return out

    def forward_obs_token(self, rgb: Dict, ee):
        """rgb: per-view (..., 3, H, W); ee: (...,) int.
        Returns (B_lead..., num_queries, E) obs tokens (no masks —
        reference :150-154 passes none)."""
        img_feats = self.obj_encoder(rgb=rgb)
        ee_feats = self.end_effector_encoder(ee)
        n_q = img_feats.shape[-2]
        ee_rep = jnp.broadcast_to(
            ee_feats[..., None, :], ee_feats.shape[:-1] + (n_q, ee_feats.shape[-1])
        )
        return self.obs_fusion_layer(
            jnp.concatenate([img_feats, ee_rep.astype(img_feats.dtype)], axis=-1)
        )

    def forward_action_token(self, action):
        return self.action_encoder(base.de_discretize_actions(action))

    def forward_action_decoder(self, predicted_action_tokens):
        return self.action_decoder(predicted_action_tokens)

    def __call__(
        self,
        obs_token: jnp.ndarray,
        action_token: Optional[jnp.ndarray],
        prompt_token: jnp.ndarray,
        prompt_token_mask: jnp.ndarray,
    ) -> jnp.ndarray:
        """Stream-first parity API (reference :125-158). obs_token (T,B,Q,E)."""
        obs_bf = obs_token.transpose(1, 0, 2, 3)
        act_bf = None if action_token is None else action_token.transpose(1, 0, 2)
        prompt_bf = prompt_token.transpose(1, 0, 2)
        B, T, Q, E = obs_bf.shape

        tokens, _ = interleave_obs_actions(
            obs_bf, jnp.ones((B, T, Q), bool), act_bf
        )
        L = T * (Q + 1)
        T_a = 0 if action_token is None else action_token.shape[0]
        if T_a not in (T - 1, T):
            raise ValueError(
                f"action_token must cover T-1 or T steps (got T_a={T_a}, "
                f"T={T}); shorter histories would silently corrupt the "
                "interleaved stream (dummy slots kept, real tokens cut)"
            )
        # The reference stream has no trailing dummy action slots and no
        # masks: truncate to the exact reference length so default arange
        # positions line up.
        L_ref = T * Q + T_a
        tokens = tokens[:, :L_ref, :]
        out = self.xattn_gpt(tokens, prompt_bf, prompt_mask=prompt_token_mask)
        predicted = out[:, Q - 1 :: Q + 1, :]
        return predicted.transpose(1, 0, 2)
