"""Object / RGB observation encoders for all four policy families.

Capability parity with reference vima/nn/obj_encoder/obj_encoder.py:
  * ObjEncoder                  — per-view ViT over object crops + bbox MLP,
                                  concat -> per-view linear -> concat views
                                  on the object axis (reference :11-99)
  * GatoMultiViewRGBEncoder     — per-view patch tokens concat (reference :102-147)
  * MultiViewRGBPerceiverEncoder— patch tokens -> Perceiver resampler to a
                                  fixed 4 queries (reference :150-206)
  * MultiViewRGBEncoder         — per-view cls embedding concat on the channel
                                  axis (reference :209-246)

Views are processed with stacked weights where the reference used
per-view ModuleDicts — the math is identical, the converter stacks the
per-view torch weights, and the TPU gets one big matmul instead of V small
ones. View order is always ``sorted(views)`` (reference :31, :116).
"""

from __future__ import annotations

from typing import Any, Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

from vima_tpu.nn.vit import ViTEncoder, ViTEncoderRectangular, GatoViTEncoder
from vima_tpu.nn.perceiver import PerceiverResampler
from vima_tpu.ops.layers import MLP

# bbox normalizer (reference obj_encoder.py:12-13, 79-85): [xc, yc, h, w]
# normalized by [max_w, max_h, max_h, max_w] with max_h=128, max_w=256.
BBOX_MAX_H = 128
BBOX_MAX_W = 256


class ObjEncoder(nn.Module):
    """Cropped-object encoder for the flagship VIMA policy."""

    transformer_emb_dim: int
    views: Sequence[str]
    vit_output_dim: int
    vit_resolution: int
    vit_patch_size: int
    vit_width: int
    vit_layers: int
    vit_heads: int
    bbox_mlp_hidden_dim: int
    bbox_mlp_hidden_depth: int
    vit_attn_pack: int = 16  # crop-packed attention (nn/vit.py attn_pack)
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @property
    def sorted_views(self):
        return sorted(self.views)

    @property
    def output_dim(self):
        return self.transformer_emb_dim

    @nn.compact
    def __call__(self, cropped_img, bbox, mask=None):
        """cropped_img/bbox: dicts keyed by view.

        cropped_img[view]: (..., n_objs, 3, R, R) uint8-range
        bbox[view]: (..., n_objs, 4) int [xc, yc, h, w]
        Returns (..., n_objs * n_views, E).
        """
        views = self.sorted_views
        # Stack views on a new axis so the ViT runs once over all views.
        imgs = jnp.stack([cropped_img[v] for v in views], axis=0)  # (V, ..., n, 3, R, R)
        img_feats = ViTEncoder(
            img_size=(self.vit_resolution, self.vit_resolution),
            patch_size=self.vit_patch_size,
            width=self.vit_width,
            layers=self.vit_layers,
            heads=self.vit_heads,
            output_dim=self.vit_output_dim,
            attn_pack=self.vit_attn_pack,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            name="cropped_img_encoder",
        )(imgs)  # (V, ..., n, vit_output_dim)

        normalizer = jnp.asarray(
            [BBOX_MAX_W, BBOX_MAX_H, BBOX_MAX_H, BBOX_MAX_W], dtype=jnp.float32
        )
        bboxes = jnp.stack([bbox[v] for v in views], axis=0).astype(jnp.float32) / normalizer

        # Per-view bbox MLPs: vmapped over the view axis (stacked params).
        bbox_mlp = nn.vmap(
            MLP,
            in_axes=0,
            out_axes=0,
            variable_axes={"params": 0},
            split_rngs={"params": True},
        )(
            hidden_dim=self.bbox_mlp_hidden_dim,
            output_dim=self.bbox_mlp_hidden_dim,
            hidden_depth=self.bbox_mlp_hidden_depth,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            name="bbox_mlp",
        )
        bbox_feats = bbox_mlp(bboxes)  # (V, ..., n, bbox_hidden)

        fused = jnp.concatenate([img_feats, bbox_feats.astype(img_feats.dtype)], axis=-1)
        pre_xf = nn.vmap(
            nn.Dense,
            in_axes=0,
            out_axes=0,
            variable_axes={"params": 0},
            split_rngs={"params": True},
        )(
            self.transformer_emb_dim,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            name="pre_transformer_layer",
        )
        out = pre_xf(fused)  # (V, ..., n, E)

        # Concat views on the object axis (reference obj_encoder.py:94).
        return jnp.concatenate([out[i] for i in range(len(views))], axis=-2)


class GatoMultiViewRGBEncoder(nn.Module):
    """Per-view full-frame patch tokens, concatenated (reference :102-147)."""

    emb_dim: int
    views: Sequence[str]
    img_size: Tuple[int, int]
    vit_patch_size: int
    vit_width: int
    vit_layers: int
    vit_heads: int
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @property
    def sorted_views(self):
        return sorted(self.views)

    @property
    def output_dim(self):
        return self.emb_dim

    @property
    def img_patch_len(self) -> int:
        gh = self.img_size[0] // self.vit_patch_size
        gw = self.img_size[1] // self.vit_patch_size
        return gh * gw * len(self.views)

    @nn.compact
    def __call__(self, rgb):
        views = self.sorted_views
        imgs = jnp.stack([rgb[v] for v in views], axis=0)  # (V, ..., 3, H, W)
        feats = GatoViTEncoder(
            img_size=self.img_size,
            patch_size=self.vit_patch_size,
            width=self.vit_width,
            layers=self.vit_layers,
            heads=self.vit_heads,
            output_dim=self.emb_dim,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            name="cropped_img_encoder",
        )(imgs)  # (V, ..., L, E)
        return jnp.concatenate([feats[i] for i in range(len(views))], axis=-2)


class MultiViewRGBPerceiverEncoder(nn.Module):
    """Patch tokens resampled by a Perceiver to a fixed query count
    (reference :150-206, used by VIMA-Flamingo)."""

    emb_dim: int
    views: Sequence[str]
    img_size: Tuple[int, int]
    vit_patch_size: int
    vit_width: int
    vit_layers: int
    vit_heads: int
    perceiver_num_queries: int
    perceiver_num_blocks: int
    perceiver_num_self_attends_per_block: int
    perceiver_num_self_attention_heads: int
    perceiver_num_cross_attention_heads: int
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @property
    def sorted_views(self):
        return sorted(self.views)

    @property
    def output_dim(self):
        return self.emb_dim

    @nn.compact
    def __call__(self, rgb):
        views = self.sorted_views
        imgs = jnp.stack([rgb[v] for v in views], axis=0)
        feats = GatoViTEncoder(
            img_size=self.img_size,
            patch_size=self.vit_patch_size,
            width=self.vit_width,
            layers=self.vit_layers,
            heads=self.vit_heads,
            output_dim=self.emb_dim,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            name="cropped_img_encoder",
        )(imgs)  # (V, B, L, E)
        tokens = jnp.concatenate([feats[i] for i in range(len(views))], axis=-2)  # (B, VL, E)
        lead = tokens.shape[:-2]
        tokens2 = tokens.reshape((-1,) + tokens.shape[-2:])
        out = PerceiverResampler(
            d_model=self.emb_dim,
            num_latents=self.perceiver_num_queries,
            num_blocks=self.perceiver_num_blocks,
            num_self_attends_per_block=self.perceiver_num_self_attends_per_block,
            num_self_attention_heads=self.perceiver_num_self_attention_heads,
            num_cross_attention_heads=self.perceiver_num_cross_attention_heads,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            name="perceiver",
        )(tokens2)
        return out.reshape(lead + out.shape[1:])


class MultiViewRGBEncoder(nn.Module):
    """Per-view cls embeddings concat on the channel axis (reference :209-246,
    used by VIMA-GPT). output_dim = emb_dim * n_views."""

    emb_dim: int
    views: Sequence[str]
    img_size: Tuple[int, int]
    vit_patch_size: int
    vit_width: int
    vit_layers: int
    vit_heads: int
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @property
    def sorted_views(self):
        return sorted(self.views)

    @property
    def output_dim(self):
        return self.emb_dim * len(self.views)

    @nn.compact
    def __call__(self, rgb):
        views = self.sorted_views
        imgs = jnp.stack([rgb[v] for v in views], axis=0)
        feats = ViTEncoderRectangular(
            img_size=self.img_size,
            patch_size=self.vit_patch_size,
            width=self.vit_width,
            layers=self.vit_layers,
            heads=self.vit_heads,
            output_dim=self.emb_dim,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            name="cropped_img_encoder",
        )(imgs)  # (V, ..., E)
        return jnp.concatenate([feats[i] for i in range(len(views))], axis=-1)
