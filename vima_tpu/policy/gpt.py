"""VIMA-GPT baseline: decoder-only GPT; obs = ONE cls-token embedding per
frame (both views concat channel-wise).

Capability parity with reference vima/policy/vima_gpt_policy.py:11-316:
stream [prompt | sep | obs, act, obs, act, ...] with stride 2, padding-aware
position ids shared with Gato (reference :147-175).
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax.numpy as jnp
from flax import linen as nn

from vima_tpu.nn.action import ActionDecoder, ActionEmbedding
from vima_tpu.nn.gpt import GPTDecoder
from vima_tpu.nn.obj_encoder import MultiViewRGBEncoder
from vima_tpu.nn.t5 import T5Config, T5PromptEncoder
from vima_tpu.nn.word_embedding import WordEmbedding
from vima_tpu.ops.layers import MLP
from vima_tpu.policy import base
from vima_tpu.policy.base import ACTION_DIMS, ACTION_EMBED_SPECS, interleave_obs_actions
from vima_tpu.policy.gato import decoder_stream_position_ids


class VIMAGPTPolicy(nn.Module):
    embed_dim: int
    n_layer: int = 12
    n_head: int = 12
    n_positions: int = 512
    img_size: tuple = (64, 128)
    vit_patch_size: int = 32
    vit_width: int = 768
    vit_layers: int = 4
    vit_heads: int = 24
    t5_cfg: T5Config = T5Config()
    vocab_size: int = 32128
    views: tuple = ("front", "top")
    remat: bool = False
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    def setup(self):
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        self.transformer = GPTDecoder(
            n_embd=self.embed_dim,
            n_layer=self.n_layer,
            n_head=self.n_head,
            n_positions=self.n_positions,
            use_geglu=True,
            remat=self.remat,
            name="transformer",
            **kw,
        )
        self.prompt_sep_token = self.param(
            "prompt_sep_token", nn.initializers.zeros, (self.embed_dim,), self.param_dtype
        )
        self.obj_encoder = MultiViewRGBEncoder(
            emb_dim=self.embed_dim,
            views=self.views,
            img_size=self.img_size,
            vit_patch_size=self.vit_patch_size,
            vit_width=self.vit_width,
            vit_layers=self.vit_layers,
            vit_heads=self.vit_heads,
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
            obs_tok.transpose(1, 0, 2), None,
            prompt.transpose(1, 0, 2), jnp.ones((B, Lp), bool),
        )
        return self.forward_action_decoder(out[-1])

    def embed_prompt_words(self, word_batch):
        return self.prompt_embedding(word_batch)

    def embed_prompt_images(self, image_batch):
        """Prompt assets for VIMA-GPT are single cls embeddings per asset
        (reference vima_gpt_policy.py:182-195: each image contributes ONE
        token). Returns (n_imgs, 1, 768)."""
        emb = self.obj_encoder(rgb=image_batch["rgb"])
        emb = self.prompt_obj_post_layer(emb)
        return emb[..., None, :] if emb.ndim == 2 else emb

    def encode_prompt_assembled(self, prompt_tokens, prompt_mask, deterministic: bool = True):
        out = self.t5_prompt_encoder(
            prompt_tokens, attention_mask=prompt_mask, deterministic=deterministic
        )
        if self.t5_prompt_encoder_post_layer is not None:
            out = self.t5_prompt_encoder_post_layer(out)
        return out

    def forward_obs_token(self, rgb: Dict, ee):
        """One fused token per frame (reference :182-190 in vima_gpt_policy)."""
        img_feats = self.obj_encoder(rgb=rgb)  # (..., E * n_views)
        ee_feats = self.end_effector_encoder(ee)
        return self.obs_fusion_layer(
            jnp.concatenate([img_feats, ee_feats.astype(img_feats.dtype)], axis=-1)
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
        """Stream-first parity API (reference :119-180). obs_token (T, B, E)."""
        obs_bf = obs_token.transpose(1, 0, 2)[:, :, None, :]  # (B, T, 1, E)
        act_bf = None if action_token is None else action_token.transpose(1, 0, 2)
        prompt_bf = prompt_token.transpose(1, 0, 2)
        B, T = obs_bf.shape[:2]
        E = obs_bf.shape[-1]
        T_a = 0 if action_token is None else action_token.shape[0]
        if T_a not in (T - 1, T):
            raise ValueError(
                f"action_token must cover T-1 or T steps (got T_a={T_a}, "
                f"T={T}); shorter histories would silently corrupt the "
                "interleaved stream (dummy slots kept, real tokens cut)"
            )
        Lp = prompt_bf.shape[1]

        stream, _ = interleave_obs_actions(obs_bf, jnp.ones((B, T, 1), bool), act_bf)
        L_stream = T + T_a + 1  # + separator
        sep = jnp.broadcast_to(self.prompt_sep_token.astype(stream.dtype), (B, 1, E))
        tokens = jnp.concatenate([prompt_bf, sep, stream], axis=1)[:, : Lp + L_stream, :]
        mask = jnp.concatenate(
            [prompt_token_mask.astype(bool), jnp.ones((B, L_stream), bool)], axis=1
        )
        position_ids = decoder_stream_position_ids(prompt_token_mask, L_stream)

        out = self.transformer(tokens, custom_mask=mask, position_ids=position_ids)
        predicted = out[:, Lp + 1 :: 2, :]
        return predicted.transpose(1, 0, 2)
