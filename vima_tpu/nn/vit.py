"""ViT image encoders (three variants) — TPU-native Flax.

Capability parity with reference vima/nn/obj_encoder/vit/vit.py:
  * ViTEncoder            — square cls-token ViT over 32x32 object crops
                            (reference :13-46, :137-191)
  * ViTEncoderRectangular — rectangular cls-token ViT over full frames
                            (reference :239-329)
  * GatoViTEncoder        — rectangular ViT returning all patch tokens
                            (reference :49-134)

Design notes (TPU-first, not a translation):
  * batch-first everywhere; all leading dims are flattened into one batch
    axis so the whole stack is a single fused sequence of MXU matmuls.
  * patchify is expressed as reshape + one big matmul (`einsum`) rather
    than a conv — identical math for stride==kernel "convs", and it maps
    straight onto the MXU without conv lowering.
  * attention logits in fp32 (reference vit.py:217-231 casts q,k to fp32),
    QuickGELU MLP, pre-LN blocks.
  * image preprocess (/255, mean/std normalize, vit/preprocess.py:9-43)
    is fused into the same jit region.
"""

from __future__ import annotations

from typing import Any, Tuple

import jax.numpy as jnp
from flax import linen as nn

from vima_tpu.ops.attention import attend, split_heads, merge_heads
from vima_tpu.ops.layers import quick_gelu

# Dataset image statistics (reference vit.py:9-10).
VIMA_IMG_MEAN = (0.3471, 0.3429, 0.3383)
VIMA_IMG_STD = (0.3011, 0.2961, 0.2956)


def preprocess_image(img: jnp.ndarray, mean=VIMA_IMG_MEAN, std=VIMA_IMG_STD) -> jnp.ndarray:
    """uint8-range (..., 3, H, W) image -> normalized fp32 (..., 3, H, W).

    Matches reference preprocess.py:9-43 (/255 then per-channel normalize).
    """
    img = img.astype(jnp.float32) / 255.0
    mean = jnp.asarray(mean, dtype=jnp.float32).reshape(3, 1, 1)
    std = jnp.asarray(std, dtype=jnp.float32).reshape(3, 1, 1)
    return (img - mean) / std


class ViTBlock(nn.Module):
    """Pre-LN residual attention block with QuickGELU MLP
    (reference vit.py:199-236). torch nn.MultiheadAttention packs qkv into
    one in_proj — we keep one fused qkv Dense for the same reason: a single
    MXU matmul. ``attn_bias``: optional additive fp32 bias over the score
    matrix (the crop-packing block-diagonal mask, see _ViTCore)."""

    width: int
    heads: int
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, attn_bias=None):
        h = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, param_dtype=self.param_dtype, name="ln_1")(x)
        qkv = nn.Dense(3 * self.width, dtype=self.dtype, param_dtype=self.param_dtype, name="qkv")(h)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        d = self.width // self.heads
        out = attend(
            split_heads(q, self.heads),
            split_heads(k, self.heads),
            split_heads(v, self.heads),
            scale=1.0 / (d**0.5),
            bias=attn_bias,
        )
        out = nn.Dense(self.width, dtype=self.dtype, param_dtype=self.param_dtype, name="out_proj")(
            merge_heads(out)
        )
        x = x + out

        h = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, param_dtype=self.param_dtype, name="ln_2")(x)
        h = nn.Dense(4 * self.width, dtype=self.dtype, param_dtype=self.param_dtype, name="c_fc")(h)
        h = quick_gelu(h)
        h = nn.Dense(self.width, dtype=self.dtype, param_dtype=self.param_dtype, name="c_proj")(h)
        return x + h


class _ViTCore(nn.Module):
    """Shared trunk: patchify -> (+cls) -> +pos -> ln_pre -> blocks.

    ``use_cls``/``return_patches`` select among the three reference variants.
    """

    img_size: Tuple[int, int]
    patch_size: int
    width: int
    layers: int
    heads: int
    output_dim: int
    use_cls: bool = True
    return_patches: bool = False
    # Crop packing: run attention over groups of ``attn_pack`` images as ONE
    # sequence with a block-diagonal mask. A 32x32 crop is 5 tokens with
    # head_dim 32 — thousands of 5x5x32 batched matmuls that tile onto the
    # 128x128 MXU at ~2% utilization (measured: the obs path was ~40% of the
    # B=64 rollout step, round-4 perf lab). Packing G crops gives G*5-token
    # score tiles at identical math: masked cross-crop logits get fp32-min,
    # exp underflows to exactly 0.0, and 0.0-weighted values add exact zeros
    # — bit-identical outputs per crop (pinned by test_parity_nn's
    # pack-equality test). 1 disables.
    attn_pack: int = 1
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        # x: (B, 3, H, W), already preprocessed fp32.
        B = x.shape[0]
        H, W = self.img_size
        p = self.patch_size
        gh, gw = H // p, W // p

        # Patchify as one matmul: equivalent to Conv2d(kernel=p, stride=p, no bias)
        # (reference vit.py:151-157) because stride == kernel.
        patch_kernel = self.param(
            "patch_kernel",
            nn.initializers.lecun_normal(),
            (p * p * 3, self.width),
            self.param_dtype,
        )
        # (B, 3, gh, p, gw, p) -> (B, gh, gw, p, p, 3) -> (B, gh*gw, p*p*3)
        xp = x.reshape(B, 3, gh, p, gw, p).transpose(0, 2, 4, 3, 5, 1).reshape(B, gh * gw, p * p * 3)
        tokens = jnp.einsum(
            "bld,dw->blw", xp.astype(self.dtype), patch_kernel.astype(self.dtype),
            preferred_element_type=jnp.float32,
        ).astype(self.dtype)

        n_tokens = gh * gw + (1 if self.use_cls else 0)
        scale = self.width**-0.5
        pos_embed = self.param(
            "pos_embed",
            nn.initializers.normal(stddev=scale),
            (n_tokens, self.width),
            self.param_dtype,
        )
        if self.use_cls:
            cls_token = self.param(
                "cls_token", nn.initializers.normal(stddev=scale), (self.width,), self.param_dtype
            )
            cls = jnp.broadcast_to(cls_token.astype(self.dtype), (B, 1, self.width))
            tokens = jnp.concatenate([cls, tokens], axis=1)
        tokens = tokens + pos_embed.astype(self.dtype)

        tokens = nn.LayerNorm(
            epsilon=1e-5, dtype=self.dtype, param_dtype=self.param_dtype, name="ln_pre"
        )(tokens)

        G = max(1, int(self.attn_pack))
        # Packing preserves every score bit, but the longer softmax-sum /
        # PV reduction axis can re-associate fp adds (last-ulp wiggle).
        # strict_parity_mode runs ('highest'/'float32' precision) therefore
        # keep the unpacked reduction order — same trace-time gate as the
        # Pallas kernels (ops/attention.py).
        import jax as _jax

        if _jax.config.jax_default_matmul_precision not in (None, "default", "bfloat16"):
            G = 1
        attn_bias = None
        n_real = tokens.shape[0]
        if G > 1:
            # pack G images per attention sequence (see attn_pack docs);
            # pad the image axis to a multiple of G with dummy rows (their
            # outputs are sliced away below and masked out of attention).
            pad = (-n_real) % G
            if pad:
                tokens = jnp.concatenate(
                    [tokens, jnp.zeros((pad,) + tokens.shape[1:], tokens.dtype)], axis=0
                )
            tokens = tokens.reshape(-1, G * n_tokens, self.width)
            block = jnp.kron(
                jnp.eye(G, dtype=jnp.float32),
                jnp.ones((n_tokens, n_tokens), jnp.float32),
            )
            f32_min = float(jnp.finfo(jnp.float32).min)
            attn_bias = ((1.0 - block) * f32_min)[None, None]  # (1, 1, GT, GT)

        for i in range(self.layers):
            tokens = ViTBlock(
                width=self.width,
                heads=self.heads,
                dtype=self.dtype,
                param_dtype=self.param_dtype,
                name=f"block_{i}",
            )(tokens, attn_bias)

        if G > 1:
            tokens = tokens.reshape(-1, n_tokens, self.width)[:n_real]

        projection = self.param(
            "projection",
            nn.initializers.normal(stddev=scale),
            (self.width, self.output_dim),
            self.param_dtype,
        )
        ln_post = nn.LayerNorm(
            epsilon=1e-5, dtype=self.dtype, param_dtype=self.param_dtype, name="ln_post"
        )
        if self.return_patches:
            # Gato variant: all patch tokens (reference vit.py:120-134).
            out = ln_post(tokens)
            return jnp.einsum(
                "blw,wo->blo", out, projection.astype(self.dtype),
                preferred_element_type=jnp.float32,
            ).astype(self.dtype)
        # cls-token variants (reference vit.py:171-191, :309-329).
        out = ln_post(tokens[:, 0, :])
        return jnp.einsum(
            "bw,wo->bo", out, projection.astype(self.dtype),
            preferred_element_type=jnp.float32,
        ).astype(self.dtype)


class _EncoderBase(nn.Module):
    """Flattens leading dims, preprocesses, runs the core, restores dims."""

    img_size: Tuple[int, int]
    patch_size: int
    width: int
    layers: int
    heads: int
    output_dim: int
    use_cls: bool = True
    return_patches: bool = False
    attn_pack: int = 1
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        # x: (..., 3, H, W) uint8-range.
        leading = x.shape[:-3]
        x = x.reshape((-1,) + x.shape[-3:])
        x = preprocess_image(x)
        out = _ViTCore(
            img_size=self.img_size,
            patch_size=self.patch_size,
            width=self.width,
            layers=self.layers,
            heads=self.heads,
            output_dim=self.output_dim,
            use_cls=self.use_cls,
            return_patches=self.return_patches,
            attn_pack=self.attn_pack,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            name="vit",
        )(x)
        return out.reshape(leading + out.shape[1:])


class ViTEncoder(_EncoderBase):
    """Square cls-token ViT over object crops (reference vit.py:13-46).

    Crop batches are large (B x n_objs x views) and sequences tiny
    (32x32/patch16 = 5 tokens), so crop-packed attention defaults ON
    (``attn_pack`` images per score tile, bit-identical math — see
    _ViTCore.attn_pack)."""

    use_cls: bool = True
    return_patches: bool = False
    attn_pack: int = 16

    @classmethod
    def square(cls, *, output_dim, resolution, patch_size, width, layers, heads, **kw):
        return cls(
            img_size=(resolution, resolution),
            patch_size=patch_size,
            width=width,
            layers=layers,
            heads=heads,
            output_dim=output_dim,
            **kw,
        )


class ViTEncoderRectangular(_EncoderBase):
    """Rectangular cls-token ViT over full frames (reference vit.py:239-272)."""

    use_cls: bool = True
    return_patches: bool = False


class GatoViTEncoder(_EncoderBase):
    """Rectangular ViT returning all patch tokens (reference vit.py:49-134)."""

    use_cls: bool = False
    return_patches: bool = True

    @property
    def img_patch_len(self) -> int:
        gh = self.img_size[0] // self.patch_size
        gw = self.img_size[1] // self.patch_size
        return gh * gw
