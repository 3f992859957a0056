"""VIMAPolicy — the flagship model: object tokens + XAttnGPT decoder.

Capability parity with reference vima/policy/vima_policy.py:11-322. The
hard-coded reference hyperparameters (ViT 32x32/patch16/width768/4layers/
24heads, action embedders 256, decoder MLPs 512x2, t5-base, bins
50/100/50/50) are defaults here — configurable so tests can shrink them.

Two execution paths:
  * parity path — ``__call__`` mirrors ``VIMAPolicy.forward``
    (full-sequence recompute, stream-first API).
  * TPU path — ``encode_prompt_kv`` once per episode + ``step_chunk`` per
    env step against fixed-capacity KV caches (see policy/rollout.py).
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax.numpy as jnp
from flax import linen as nn

from vima_tpu.nn.action import ActionDecoder, ActionEmbedding
from vima_tpu.nn.obj_encoder import ObjEncoder
from vima_tpu.nn.t5 import T5Config, T5PromptEncoder
from vima_tpu.nn.word_embedding import WordEmbedding
from vima_tpu.nn.xattn_gpt import XAttnGPT
from vima_tpu.ops.layers import MLP
from vima_tpu.policy import base
from vima_tpu.policy.base import (
    ACTION_DIMS,
    ACTION_EMBED_SPECS,
    interleave_obs_actions,
    masked_position_ids,
)


class VIMAPolicy(nn.Module):
    embed_dim: int
    xf_n_layers: int
    sattn_n_heads: int
    xattn_n_heads: int
    # reference-hard-coded knobs (vima_policy.py:34-114), overridable:
    vit_resolution: int = 32
    vit_patch_size: int = 16
    vit_width: int = 768
    vit_layers: int = 4
    vit_heads: int = 24
    vit_attn_pack: int = 16  # crop-packed ViT attention (nn/vit.py)
    vit_output_dim: int = 768
    bbox_mlp_hidden_dim: int = 768
    bbox_mlp_hidden_depth: int = 2
    t5_cfg: T5Config = T5Config()
    vocab_size: int = 32128
    xattn_n_positions: int = 256
    n_positions: int = 512
    views: tuple = ("front", "top")
    remat: bool = False
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    def setup(self):
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        self.xattn_gpt = XAttnGPT(
            embd_dim=self.embed_dim,
            n_layer=self.xf_n_layers,
            n_head=self.sattn_n_heads,
            xattn_n_head=self.xattn_n_heads,
            n_positions=self.n_positions,
            xattn_n_positions=self.xattn_n_positions,
            use_geglu=True,
            remat=self.remat,
            name="xattn_gpt",
            **kw,
        )
        self.obj_encoder = ObjEncoder(
            transformer_emb_dim=self.embed_dim,
            views=self.views,
            vit_output_dim=self.vit_output_dim,
            vit_resolution=self.vit_resolution,
            vit_patch_size=self.vit_patch_size,
            vit_width=self.vit_width,
            vit_layers=self.vit_layers,
            vit_heads=self.vit_heads,
            vit_attn_pack=self.vit_attn_pack,
            bbox_mlp_hidden_dim=self.bbox_mlp_hidden_dim,
            bbox_mlp_hidden_depth=self.bbox_mlp_hidden_depth,
            name="obj_encoder",
            **kw,
        )
        self.end_effector_encoder = nn.Embed(
            2, 2, dtype=self.dtype, param_dtype=self.param_dtype, name="end_effector_encoder"
        )
        self.obs_fusion_layer = nn.Dense(self.embed_dim, name="obs_fusion_layer", **kw)
        self.action_encoder = ActionEmbedding(
            output_dim=self.embed_dim,
            embed_specs=dict(ACTION_EMBED_SPECS),
            name="action_encoder",
            **kw,
        )
        self.action_decoder = ActionDecoder(
            action_dims={k: list(v) for k, v in ACTION_DIMS.items()},
            hidden_dim=512,
            hidden_depth=2,
            activation="relu",
            last_layer_gain=0.01,
            name="action_decoder",
            **kw,
        )
        self.prompt_embedding = WordEmbedding(
            vocab_size=self.vocab_size,
            embed_dim=self.t5_cfg.d_model,
            name="prompt_embedding",
            **kw,
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
            hidden_dim=self.t5_cfg.d_model,
            output_dim=self.t5_cfg.d_model,
            hidden_depth=2,
            name="prompt_obj_post_layer",
            **kw,
        )

    # ------------------------------------------------------------------- init

    def warmup(self):
        """Touch every submodule once so ``policy.init`` creates the full
        param tree (used for random init / training-from-scratch)."""
        B, T, n, R = 1, 1, 1, self.vit_resolution
        objects = {
            "cropped_img": {v: jnp.full((B, T, n, 3, R, R), 128, jnp.uint8) for v in self.views},
            "bbox": {v: jnp.ones((B, T, n, 4), jnp.int32) for v in self.views},
            "mask": {v: jnp.ones((B, T, n), bool) for v in self.views},
        }
        obs_tok, obs_mask = self.forward_obs_token(objects, jnp.zeros((B, T), jnp.int32))
        action = {
            "pose0_position": jnp.zeros((T - 1, B, 2), jnp.int32),
            "pose0_rotation": jnp.zeros((T - 1, B, 4), jnp.int32),
            "pose1_position": jnp.zeros((T - 1, B, 2), jnp.int32),
            "pose1_rotation": jnp.zeros((T - 1, B, 4), jnp.int32),
        }
        act_tok = self.forward_action_token(action)
        words = self.embed_prompt_words(jnp.zeros((1,), jnp.int32))
        imgs = self.embed_prompt_images(
            {k: {v: arr[:, 0] for v, arr in d.items()} for k, d in objects.items()}
        )
        Lp = 2
        prompt = jnp.zeros((B, Lp, self.t5_cfg.d_model))
        prompt = self.encode_prompt_assembled(prompt, jnp.ones((B, Lp), bool))
        out = self.__call__(
            obs_tok.transpose(1, 0, 2, 3),
            obs_mask.transpose(1, 0, 2),
            None,
            prompt.transpose(1, 0, 2),
            jnp.ones((B, Lp), bool),
        )
        return self.forward_action_decoder(out[-1])

    # ------------------------------------------------------------- components

    def embed_prompt_words(self, word_batch):
        """token ids -> frozen t5 word embeddings (reference :163)."""
        return self.prompt_embedding(word_batch)

    def embed_prompt_images(self, image_batch):
        """prompt asset crops -> post-processed object embeddings
        (reference :164-165). image_batch: dict(cropped_img, bbox, mask)."""
        emb = self.obj_encoder(
            cropped_img=image_batch["cropped_img"],
            bbox=image_batch["bbox"],
            mask=image_batch.get("mask"),
        )
        return self.prompt_obj_post_layer(emb)

    def encode_prompt_assembled(self, prompt_tokens, prompt_mask, deterministic: bool = True):
        """Assembled embedding sequence -> T5 -> post layer (reference :235-239).
        prompt_tokens: (B, L, d_t5); returns (B, L, E)."""
        out = self.t5_prompt_encoder(
            prompt_tokens, attention_mask=prompt_mask, deterministic=deterministic
        )
        if self.t5_prompt_encoder_post_layer is not None:
            out = self.t5_prompt_encoder_post_layer(out)
        return out

    def forward_obs_token(self, objects: Dict, ee):
        """objects: dict(cropped_img/bbox/mask per view), leading (B, T);
        ee: (B, T) int. Returns (obs_tokens (B,T,n_total,E), masks (B,T,n_total)).
        Mirrors reference :242-259 batch-first."""
        img_feats = self.obj_encoder(
            cropped_img=objects["cropped_img"], bbox=objects["bbox"], mask=objects["mask"]
        )
        ee_feats = self.end_effector_encoder(ee)
        n_total = img_feats.shape[-2]
        ee_rep = jnp.broadcast_to(
            ee_feats[..., None, :], ee_feats.shape[:-1] + (n_total, ee_feats.shape[-1])
        )
        obs_feats = self.obs_fusion_layer(
            jnp.concatenate([img_feats, ee_rep.astype(img_feats.dtype)], axis=-1)
        )
        views = sorted(self.views)
        obj_mask = jnp.concatenate([objects["mask"][v] for v in views], axis=-1)
        return obs_feats, obj_mask

    def forward_action_token(self, action: Dict):
        """Discrete action dict -> embedding (reference :261-262)."""
        return self.action_encoder(base.de_discretize_actions(action))

    def forward_action_decoder(self, predicted_action_tokens):
        """-> dict of concatenated per-component logits (reference :264-265)."""
        return self.action_decoder(predicted_action_tokens)

    # ------------------------------------------------------------ parity path

    def __call__(
        self,
        obs_token: jnp.ndarray,
        obs_mask: jnp.ndarray,
        action_token: Optional[jnp.ndarray],
        prompt_token: jnp.ndarray,
        prompt_token_mask: jnp.ndarray,
    ) -> jnp.ndarray:
        """Full-sequence forward, stream-first API for drop-in parity with
        reference ``VIMAPolicy.forward`` (:116-159).

        obs_token: (T, B, Q, E); obs_mask: (T, B, Q);
        action_token: (T_a, B, E) or None; prompt_token: (Lp, B, E);
        prompt_token_mask: (B, Lp). Returns predicted action tokens (T, B, E).
        """
        obs_bf = obs_token.transpose(1, 0, 2, 3)
        mask_bf = obs_mask.transpose(1, 0, 2)
        act_bf = None if action_token is None else action_token.transpose(1, 0, 2)
        prompt_bf = prompt_token.transpose(1, 0, 2)

        tokens, masks = interleave_obs_actions(obs_bf, mask_bf, act_bf)
        position_ids = masked_position_ids(masks)
        prompt_position_ids = masked_position_ids(prompt_token_mask)

        out = self.xattn_gpt(
            tokens,
            prompt_bf,
            obs_action_position_ids=position_ids,
            prompt_position_ids=prompt_position_ids,
            prompt_mask=prompt_token_mask,
            obs_action_masks=masks,
        )
        Q = obs_token.shape[-2]
        predicted = out[:, Q - 1 :: Q + 1, :]  # last obs slot of each group
        return predicted.transpose(1, 0, 2)

    # --------------------------------------------------------------- TPU path

    def encode_prompt_kv(self, prompt_tokens, prompt_mask):
        """Per-layer prompt K/V, once per episode.
        prompt_tokens: (B, Lp, E) already passed through T5+post layer."""
        prompt_position_ids = masked_position_ids(prompt_mask)
        return self.xattn_gpt.encode_prompt_kv(prompt_tokens, prompt_position_ids)

    def step_chunk(
        self,
        chunk_tokens,
        chunk_position_ids,
        prompt_k,
        prompt_v,
        prompt_mask,
        cache_k,
        cache_v,
        cache_mask,
        write_index,
    ):
        """Cached decoder step over one chunk (see XAttnGPT.forward_chunk)."""
        return self.xattn_gpt.forward_chunk(
            chunk_tokens,
            chunk_position_ids,
            prompt_k=prompt_k,
            prompt_v=prompt_v,
            prompt_mask=prompt_mask,
            cache_k=cache_k,
            cache_v=cache_v,
            cache_mask=cache_mask,
            write_index=write_index,
        )
