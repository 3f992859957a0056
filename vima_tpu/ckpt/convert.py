"""PyTorch-checkpoint -> Flax-params converter.

Handles every layout hazard called out in the survey (§5 "Checkpoint"):
  * torch ``nn.Linear`` stores (out, in) -> Flax kernel is its transpose.
  * HF ``Conv1D`` stores (in, out) -> maps to the Flax kernel directly
    (reference gpt.py:253-254, components.py:87-88).
  * torch ``nn.MultiheadAttention`` packs q/k/v into one ``in_proj``.
  * patchify ``Conv2d`` (O, 3, p, p) -> our matmul kernel (p*p*3, O).
  * T5 relative bias lives only in block 0 (prompt_encoder.py:151-155).
  * per-view ``ModuleDict``s keyed ``front``/``top`` -> stacked (vmapped)
    kernels with a leading view axis (obj_encoder.py:44-64).
  * the released ckpts carry a ``policy.`` key prefix (vima/__init__.py:11-14).

All functions consume a *flat* dict of numpy arrays (torch tensors are
converted up front) and return nested Flax param dicts. Conversion is
strict: every consumed key is recorded, and the policy-level entry points
assert full coverage.
"""

from __future__ import annotations

from typing import Dict, List, Sequence

import numpy as np


class StateDict:
    """Flat name->array view over a torch state_dict with consumption
    tracking (for strict coverage checks)."""

    def __init__(self, sd: Dict[str, "np.ndarray"]):
        self._sd = {}
        for k, v in sd.items():
            if hasattr(v, "detach"):
                v = v.detach().cpu()
                # numpy has no bf16/fp16-safe path for some torch dtypes;
                # promote to fp32 (params are cast back via cast_params).
                if str(v.dtype) in ("torch.bfloat16", "torch.float16"):
                    v = v.float()
                v = v.numpy()
            self._sd[k] = np.asarray(v)
        self._consumed = set()

    def __call__(self, key: str) -> np.ndarray:
        if key not in self._sd:
            raise KeyError(f"missing checkpoint key: {key}")
        self._consumed.add(key)
        return self._sd[key]

    def has(self, key: str) -> bool:
        return key in self._sd

    def unconsumed(self) -> List[str]:
        return sorted(set(self._sd) - self._consumed)

    def keys(self):
        return self._sd.keys()


# ---------------------------------------------------------------- primitives

def linear(sd: StateDict, prefix: str, bias: bool = True) -> dict:
    out = {"kernel": sd(f"{prefix}.weight").T}
    if bias:
        out["bias"] = sd(f"{prefix}.bias")
    return out


def conv1d(sd: StateDict, prefix: str) -> dict:
    """HF Conv1D: weight already (in, out)."""
    return {"kernel": sd(f"{prefix}.weight"), "bias": sd(f"{prefix}.bias")}


def layernorm(sd: StateDict, prefix: str) -> dict:
    return {"scale": sd(f"{prefix}.weight"), "bias": sd(f"{prefix}.bias")}


def rmsnorm(sd: StateDict, prefix: str) -> dict:
    return {"scale": sd(f"{prefix}.weight")}


def embedding(sd: StateDict, prefix: str) -> dict:
    return {"embedding": sd(f"{prefix}.weight")}


def stack_trees(trees: Sequence[dict]) -> dict:
    """Stack identical nested dicts along a new leading axis (per-view vmap)."""
    first = trees[0]
    if isinstance(first, dict):
        return {k: stack_trees([t[k] for t in trees]) for k in first}
    return np.stack(trees, axis=0)


# ------------------------------------------------------------------- modules

def convert_mlp(sd: StateDict, prefix: str, hidden_depth: int, norm_type=None) -> dict:
    """Reference build_mlp Sequential (vima/nn/utils.py:80-91): Linear at
    index 0 and then every 3 modules (norm/identity + act between)."""
    params = {}
    if hidden_depth == 0:
        params["layers_0"] = linear(sd, f"{prefix}.0")
        return params
    for i in range(hidden_depth + 1):
        params[f"layers_{i}"] = linear(sd, f"{prefix}.{3 * i}")
        if norm_type == "layernorm" and i < hidden_depth:
            params[f"norm_{i}"] = layernorm(sd, f"{prefix}.{3 * i + 1}")
    return params


def convert_vit(sd: StateDict, prefix: str, *, layers: int, patch_size: int, use_cls: bool = True) -> dict:
    """VisionTransformer / *Rectangular / Gato variants (vit.py:85-191,275-329)."""
    p = patch_size
    w = sd(f"{prefix}.conv1.weight")  # (O, 3, p, p)
    params = {
        "patch_kernel": w.transpose(2, 3, 1, 0).reshape(p * p * 3, -1),
        "pos_embed": sd(f"{prefix}.pos_embed"),
        "ln_pre": layernorm(sd, f"{prefix}.ln_pre"),
        "ln_post": layernorm(sd, f"{prefix}.ln_post"),
        "projection": sd(f"{prefix}.projection"),
    }
    if use_cls:
        params["cls_token"] = sd(f"{prefix}.cls_token")
    for i in range(layers):
        bp = f"{prefix}.blocks.{i}"
        params[f"block_{i}"] = {
            "ln_1": layernorm(sd, f"{bp}.ln_1"),
            "ln_2": layernorm(sd, f"{bp}.ln_2"),
            "qkv": {
                "kernel": sd(f"{bp}.attn.in_proj_weight").T,
                "bias": sd(f"{bp}.attn.in_proj_bias"),
            },
            "out_proj": linear(sd, f"{bp}.attn.out_proj"),
            "c_fc": linear(sd, f"{bp}.mlp.c_fc"),
            "c_proj": linear(sd, f"{bp}.mlp.c_proj"),
        }
    return params


def convert_t5_stack(sd: StateDict, prefix: str, *, num_layers: int) -> dict:
    """T5 encoder stack (prompt_encoder.py:144-604). ``prefix`` addresses the
    torch ``T5Stack`` (e.g. ``t5.encoder``)."""
    params = {
        "relative_attention_bias": sd(
            f"{prefix}.block.0.layer.0.SelfAttention.relative_attention_bias.weight"
        ),
        "final_layer_norm": rmsnorm(sd, f"{prefix}.final_layer_norm"),
    }
    for i in range(num_layers):
        bp = f"{prefix}.block.{i}"
        params[f"block_{i}"] = {
            "SelfAttention": {
                "q": linear(sd, f"{bp}.layer.0.SelfAttention.q", bias=False),
                "k": linear(sd, f"{bp}.layer.0.SelfAttention.k", bias=False),
                "v": linear(sd, f"{bp}.layer.0.SelfAttention.v", bias=False),
                "o": linear(sd, f"{bp}.layer.0.SelfAttention.o", bias=False),
            },
            "self_attn_norm": rmsnorm(sd, f"{bp}.layer.0.layer_norm"),
            "wi": linear(sd, f"{bp}.layer.1.DenseReluDense.wi", bias=False),
            "wo": linear(sd, f"{bp}.layer.1.DenseReluDense.wo", bias=False),
            "ff_norm": rmsnorm(sd, f"{bp}.layer.1.layer_norm"),
        }
    return params


def convert_gpt_block(sd: StateDict, prefix: str, use_geglu: bool = True) -> dict:
    """OpenAI-GPT Block (components.py:14-102 / gpt.py:223-268)."""
    params = {
        "c_attn": conv1d(sd, f"{prefix}.attn.c_attn"),
        "c_proj": conv1d(sd, f"{prefix}.attn.c_proj"),
        "ln_1": layernorm(sd, f"{prefix}.ln_1"),
        "ln_2": layernorm(sd, f"{prefix}.ln_2"),
        "mlp_c_fc": conv1d(sd, f"{prefix}.mlp.c_fc"),
        "mlp_c_proj": conv1d(sd, f"{prefix}.mlp.c_proj"),
    }
    if use_geglu:
        params["mlp_gated"] = linear(sd, f"{prefix}.mlp.gated_layer", bias=False)
    return params


def convert_xattention(sd: StateDict, prefix: str, use_geglu: bool = True) -> dict:
    params = {
        "layernorm": layernorm(sd, f"{prefix}.layernorm"),
        "query": linear(sd, f"{prefix}.query", bias=False),
        "key_value": linear(sd, f"{prefix}.key_value", bias=False),
        "attention_out": linear(sd, f"{prefix}.attention_out", bias=False),
        "ln": layernorm(sd, f"{prefix}.ln"),
        "linear1": linear(sd, f"{prefix}.linear1", bias=False),
        "linear2": linear(sd, f"{prefix}.linear2", bias=False),
    }
    if use_geglu:
        params["gated_layer"] = linear(sd, f"{prefix}.gated_layer", bias=False)
    return params


def convert_xattn_gpt(sd: StateDict, prefix: str, *, n_layer: int, use_geglu: bool = True) -> dict:
    params = {
        "positions_embed": embedding(sd, f"{prefix}.positions_embed"),
        "xattn_positions_embed": embedding(sd, f"{prefix}.xattn_positions_embed"),
    }
    for i in range(n_layer):
        params[f"h_{i}"] = convert_gpt_block(sd, f"{prefix}.h.{i}", use_geglu)
        params[f"xattn_{i}"] = convert_xattention(sd, f"{prefix}.xattns.{i}", use_geglu)
    return params


def convert_gpt_decoder(sd: StateDict, prefix: str, *, n_layer: int, use_geglu: bool = True) -> dict:
    """HFGPT (gpt.py:15-220); torch prefix addresses the HFGPT module, whose
    inner model is ``.lm``."""
    params = {
        "tokens_embed": embedding(sd, f"{prefix}.lm.tokens_embed"),
        "positions_embed": embedding(sd, f"{prefix}.lm.positions_embed"),
    }
    for i in range(n_layer):
        params[f"h_{i}"] = convert_gpt_block(sd, f"{prefix}.lm.h.{i}", use_geglu)
    return params


def convert_perceiver_attention_layer(sd: StateDict, prefix: str, is_cross: bool) -> dict:
    params = {
        "layernorm1": layernorm(sd, f"{prefix}.attention.self.layernorm1"),
        "query": linear(sd, f"{prefix}.attention.self.query"),
        "key": linear(sd, f"{prefix}.attention.self.key"),
        "value": linear(sd, f"{prefix}.attention.self.value"),
        "out": linear(sd, f"{prefix}.attention.output.dense"),
        "ff_layernorm": layernorm(sd, f"{prefix}.layernorm"),
        "ff_dense1": linear(sd, f"{prefix}.mlp.dense1"),
        "ff_dense2": linear(sd, f"{prefix}.mlp.dense2"),
    }
    if is_cross:
        params["layernorm2"] = layernorm(sd, f"{prefix}.attention.self.layernorm2")
    return params


def convert_perceiver(sd: StateDict, prefix: str, *, num_self_attends: int) -> dict:
    """HF PerceiverModel (perceiver.py:25-41). ``prefix`` addresses the
    ObjectsPerceiverEncoder wrapper; the HF model is ``.model``."""
    params = {
        "latents": sd(f"{prefix}.model.embeddings.latents"),
        "cross_attention": convert_perceiver_attention_layer(
            sd, f"{prefix}.model.encoder.cross_attention", is_cross=True
        ),
    }
    for i in range(num_self_attends):
        params[f"self_attends_{i}"] = convert_perceiver_attention_layer(
            sd, f"{prefix}.model.encoder.self_attends.{i}", is_cross=False
        )
    return params


def convert_obj_encoder(
    sd: StateDict, prefix: str, *, views: Sequence[str], vit_layers: int, vit_patch_size: int,
    bbox_mlp_hidden_depth: int,
) -> dict:
    """ObjEncoder (obj_encoder.py:11-99): per-view ModuleDicts -> stacked."""
    views = sorted(views)
    return {
        "cropped_img_encoder": {
            "vit": convert_vit(
                sd, f"{prefix}.cropped_img_encoder.vit",
                layers=vit_layers, patch_size=vit_patch_size, use_cls=True,
            )
        },
        "bbox_mlp": stack_trees(
            [convert_mlp(sd, f"{prefix}.bbox_mlp.{v}", bbox_mlp_hidden_depth) for v in views]
        ),
        "pre_transformer_layer": stack_trees(
            [linear(sd, f"{prefix}.pre_transformer_layer.{v}") for v in views]
        ),
    }


def convert_rgb_encoder(
    sd: StateDict, prefix: str, *, vit_layers: int, vit_patch_size: int, use_cls: bool
) -> dict:
    """Gato / rectangular multi-view RGB encoders (obj_encoder.py:102-147,209-246)."""
    return {
        "cropped_img_encoder": {
            "vit": convert_vit(
                sd, f"{prefix}.cropped_img_encoder.vit",
                layers=vit_layers, patch_size=vit_patch_size, use_cls=use_cls,
            )
        }
    }


def convert_action_embedding(sd: StateDict, prefix: str, keys: Sequence[str], *, has_post_layer: bool) -> dict:
    params = {}
    for k in keys:
        params[f"embed_{k}"] = {"layer": convert_mlp(sd, f"{prefix}._embed_dict.{k}._layer", 1)}
    if has_post_layer:
        params["post_layer"] = linear(sd, f"{prefix}._post_layer")
    return params


def convert_action_decoder(sd: StateDict, prefix: str, action_dims: Dict[str, Sequence[int]], *, hidden_depth: int) -> dict:
    params = {}
    for k, dims in action_dims.items():
        head = {}
        for i in range(len(dims)):
            head[f"mlp_{i}"] = convert_mlp(sd, f"{prefix}._decoders.{k}.mlps.{i}", hidden_depth)
        params[f"decoder_{k}"] = head
    return params


# ------------------------------------------------------------------ policies

ACTION_KEYS = ("pose0_position", "pose0_rotation", "pose1_position", "pose1_rotation")
ACTION_DIMS = {
    "pose0_position": [50, 100],
    "pose0_rotation": [50] * 4,
    "pose1_position": [50, 100],
    "pose1_rotation": [50] * 4,
}


def strip_prefix(sd: Dict, prefix: str = "policy.") -> Dict:
    """Strip the training-wrapper prefix (reference vima/__init__.py:11-14)."""
    out = {}
    for k, v in sd.items():
        out[k[len(prefix):] if k.startswith(prefix) else k] = v
    return out


def convert_vima_policy(
    state_dict: Dict, cfg: Dict, *, t5_num_layers: int = 12, vit_layers: int = 4, strict: bool = True
) -> dict:
    """Full flagship VIMAPolicy conversion (vima_policy.py:12-114)."""
    sd = StateDict(strip_prefix(state_dict))
    params = {
        "xattn_gpt": convert_xattn_gpt(sd, "xattn_gpt", n_layer=cfg["xf_n_layers"]),
        "obj_encoder": convert_obj_encoder(
            sd, "obj_encoder", views=("front", "top"), vit_layers=vit_layers, vit_patch_size=16,
            bbox_mlp_hidden_depth=2,
        ),
        "obs_fusion_layer": linear(sd, "obs_fusion_layer"),
        **_shared_heads(sd, cfg),
    }
    _consume_t5(sd, cfg, params, t5_num_layers)
    _finish(sd, strict)
    return params


def _finish(sd: StateDict, strict: bool) -> None:
    if strict:
        leftover = [k for k in sd.unconsumed() if not _ignorable(k)]
        if leftover:
            raise ValueError(
                f"unconverted checkpoint keys: {leftover[:20]} (+{max(0, len(leftover)-20)} more)"
            )


def _shared_heads(sd: StateDict, cfg: Dict) -> dict:
    """Components shared by every policy family (action heads, prompt side)."""
    return {
        "end_effector_encoder": embedding(sd, "end_effector_encoder"),
        "action_encoder": convert_action_embedding(
            sd, "action_encoder", ACTION_KEYS, has_post_layer=(cfg["embed_dim"] != 1024)
        ),
        "action_decoder": convert_action_decoder(sd, "action_decoder", ACTION_DIMS, hidden_depth=2),
        "prompt_embedding": {"embedding": sd("prompt_embedding._embed_layer.weight")},
        "prompt_obj_post_layer": convert_mlp(sd, "prompt_obj_post_layer", 2),
    }


def _consume_t5(sd: StateDict, cfg: Dict, params: dict, t5_num_layers: int) -> None:
    params["t5_prompt_encoder"] = {
        "encoder": convert_t5_stack(sd, "t5_prompt_encoder.t5.encoder", num_layers=t5_num_layers)
    }
    if cfg["embed_dim"] != 768:
        params["t5_prompt_encoder_post_layer"] = linear(
            sd, "t5_prompt_encoder_post_layer", bias=False
        )
    for k in (
        "t5_prompt_encoder.t5.shared.weight",
        "t5_prompt_encoder.t5.encoder.embed_tokens.weight",
    ):
        if sd.has(k):
            sd(k)


def convert_gato_policy(
    state_dict: Dict, cfg: Dict, *, t5_num_layers: int = 12, vit_layers: int = 4, strict: bool = True
) -> dict:
    """VIMAGatoPolicy (vima_gato_policy.py:11-118)."""
    sd = StateDict(strip_prefix(state_dict))
    params = {
        "transformer": convert_gpt_decoder(sd, "transformer", n_layer=cfg.get("n_layer", 12)),
        "prompt_sep_token": sd("prompt_sep_token"),
        "obj_encoder": convert_rgb_encoder(
            sd, "obj_encoder", vit_layers=vit_layers, vit_patch_size=32, use_cls=False
        ),
        "obs_fusion_layer": linear(sd, "obs_fusion_layer"),
        **_shared_heads(sd, cfg),
    }
    _consume_t5(sd, cfg, params, t5_num_layers)
    _finish(sd, strict)
    return params


def convert_gpt_policy(
    state_dict: Dict, cfg: Dict, *, t5_num_layers: int = 12, vit_layers: int = 4, strict: bool = True
) -> dict:
    """VIMAGPTPolicy (vima_gpt_policy.py:11-117)."""
    sd = StateDict(strip_prefix(state_dict))
    params = {
        "transformer": convert_gpt_decoder(sd, "transformer", n_layer=cfg.get("n_layer", 12)),
        "prompt_sep_token": sd("prompt_sep_token"),
        "obj_encoder": convert_rgb_encoder(
            sd, "obj_encoder", vit_layers=vit_layers, vit_patch_size=32, use_cls=True
        ),
        "obs_fusion_layer": linear(sd, "obs_fusion_layer"),
        **_shared_heads(sd, cfg),
    }
    _consume_t5(sd, cfg, params, t5_num_layers)
    _finish(sd, strict)
    return params


def convert_flamingo_policy(
    state_dict: Dict,
    cfg: Dict,
    *,
    t5_num_layers: int = 12,
    vit_layers: int = 4,
    num_self_attends: int = 4,
    strict: bool = True,
) -> dict:
    """VIMAFlamingoPolicy (vima_flamingo_policy.py:11-123). Note the
    reference's perceiver attribute is spelled ``peceiver``
    (obj_encoder.py:182)."""
    sd = StateDict(strip_prefix(state_dict))
    params = {
        "xattn_gpt": convert_xattn_gpt(sd, "xattn_gpt", n_layer=cfg["dt_n_layers"]),
        "obj_encoder": {
            **convert_rgb_encoder(
                sd, "obj_encoder", vit_layers=vit_layers, vit_patch_size=32, use_cls=False
            ),
            "perceiver": convert_perceiver(
                sd, "obj_encoder.peceiver", num_self_attends=num_self_attends
            ),
        },
        "obs_fusion_layer": linear(sd, "obs_fusion_layer"),
        **_shared_heads(sd, cfg),
    }
    _consume_t5(sd, cfg, params, t5_num_layers)
    _finish(sd, strict)
    return params


def _ignorable(key: str) -> bool:
    # torch buffers that carry no weights: causal bias, position id ranges.
    return key.endswith(".bias_buffer") or key.endswith("position_ids") or key.endswith(".attn.bias") or key.endswith("kv_position_ids")


def cast_params(params, dtype):
    """Cast floating-point leaves to ``dtype`` (bf16 inference); integer /
    bool leaves pass through."""
    import jax
    import jax.numpy as jnp

    def f(x):
        if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating):
            return x.astype(dtype)
        return x

    return jax.tree_util.tree_map(f, params)


def _detect_geometry(sd: Dict) -> Dict:
    """Infer T5 depth/dims and ViT depth from (prefix-stripped) ckpt keys.

    The released ckpts all use t5-base + a 4-layer ViT, but detecting from
    the weights keeps the loader honest for truncated/test checkpoints."""
    import re

    t5_blocks, vit_blocks = set(), set()
    for k in sd:
        m = re.match(r"t5_prompt_encoder\.t5\.encoder\.block\.(\d+)\.", k)
        if m:
            t5_blocks.add(int(m.group(1)))
        m = re.match(r"obj_encoder\.cropped_img_encoder\.vit\.blocks\.(\d+)\.", k)
        if m:
            vit_blocks.add(int(m.group(1)))
    out = {
        "t5_num_layers": (max(t5_blocks) + 1) if t5_blocks else 12,
        "vit_layers": (max(vit_blocks) + 1) if vit_blocks else 4,
    }
    shared = sd.get("t5_prompt_encoder.t5.shared.weight")
    wi = sd.get("t5_prompt_encoder.t5.encoder.block.0.layer.1.DenseReluDense.wi.weight")
    q = sd.get("t5_prompt_encoder.t5.encoder.block.0.layer.0.SelfAttention.q.weight")
    bias = sd.get(
        "t5_prompt_encoder.t5.encoder.block.0.layer.0.SelfAttention"
        ".relative_attention_bias.weight"
    )
    if shared is not None:
        out["t5_vocab"], out["t5_d_model"] = int(shared.shape[0]), int(shared.shape[1])
    if wi is not None:
        out["t5_d_ff"] = int(wi.shape[0])
    if bias is not None:
        out["t5_num_heads"] = int(bias.shape[1])
        if q is not None:
            out["t5_d_kv"] = int(q.shape[0]) // out["t5_num_heads"]
    return out


def detect_family(flat_sd: Dict) -> str:
    """Infer the policy family from (prefix-stripped) state-dict keys.

    The reference loads only VIMAPolicy (vima/__init__.py:7-16); this
    framework trains and loads all four families, so the loader
    distinguishes them by their structural signatures: the Flamingo
    perceiver (reference misspells it ``peceiver``, obj_encoder.py:182),
    the in-stream GPT decoder (``transformer.``) shared by Gato/GPT —
    split by the GPT variant's ViT cls token — and the x-attn decoder
    otherwise (flagship VIMA)."""
    keys = list(flat_sd)
    if any(k.startswith("obj_encoder.peceiver.") for k in keys):
        return "flamingo"
    if any(k.startswith("transformer.") for k in keys):
        if "obj_encoder.cropped_img_encoder.vit.cls_token" in flat_sd:
            return "gpt"
        return "gato"
    return "vima"


def _decoder_layers(flat_sd: Dict, prefix: str) -> int | None:
    import re

    blocks = {
        int(m.group(1))
        for k in flat_sd
        if (m := re.match(rf"{prefix}\.h\.(\d+)\.", k))
    }
    return (max(blocks) + 1) if blocks else None


def load_policy_from_torch_ckpt(ckpt_path, family: str | None = None):
    """torch.load a VIMA-format ckpt and return (policy_module, params).

    family: 'vima' | 'gato' | 'gpt' | 'flamingo' | None (auto-detect from
    the state-dict structure). The reference repo can only load the
    flagship (vima/__init__.py:10); here every family round-trips."""
    import torch

    from vima_tpu.nn.t5 import T5Config

    ckpt = torch.load(ckpt_path, map_location="cpu", weights_only=False)
    cfg = dict(ckpt["cfg"])
    flat = strip_prefix(ckpt["state_dict"])
    if family is None:
        family = detect_family(flat)
    geo = _detect_geometry(flat)

    default_t5 = T5Config()
    t5_cfg = T5Config(
        d_model=geo.get("t5_d_model", default_t5.d_model),
        d_ff=geo.get("t5_d_ff", default_t5.d_ff),
        num_layers=geo["t5_num_layers"],
        num_heads=geo.get("t5_num_heads", default_t5.num_heads),
        d_kv=geo.get("t5_d_kv", default_t5.d_kv),
        vocab_size=geo.get("t5_vocab", default_t5.vocab_size),
    )
    kw = {}
    if t5_cfg != default_t5:
        kw["t5_cfg"] = t5_cfg
        kw["vocab_size"] = t5_cfg.vocab_size
    if geo["vit_layers"] != 4:
        kw["vit_layers"] = geo["vit_layers"]

    if family == "vima":
        from vima_tpu.policy.vima import VIMAPolicy

        policy = VIMAPolicy(
            embed_dim=cfg["embed_dim"],
            xf_n_layers=cfg["xf_n_layers"],
            sattn_n_heads=cfg["sattn_n_heads"],
            xattn_n_heads=cfg["xattn_n_heads"],
            **kw,
        )
        params = convert_vima_policy(
            flat, cfg, t5_num_layers=geo["t5_num_layers"], vit_layers=geo["vit_layers"]
        )
    elif family in ("gato", "gpt"):
        from vima_tpu.policy import VIMAGatoPolicy, VIMAGPTPolicy

        n_layer = cfg.get("n_layer") or _decoder_layers(flat, "transformer") or 12
        cls = VIMAGatoPolicy if family == "gato" else VIMAGPTPolicy
        policy = cls(
            embed_dim=cfg["embed_dim"],
            n_layer=n_layer,
            n_head=cfg.get("n_head", 12),
            **kw,
        )
        conv = convert_gato_policy if family == "gato" else convert_gpt_policy
        params = conv(
            flat,
            {**cfg, "n_layer": n_layer},
            t5_num_layers=geo["t5_num_layers"],
            vit_layers=geo["vit_layers"],
        )
    elif family == "flamingo":
        from vima_tpu.policy import VIMAFlamingoPolicy

        dt_n_layers = cfg.get("dt_n_layers") or _decoder_layers(flat, "xattn_gpt") or 12
        policy = VIMAFlamingoPolicy(
            embed_dim=cfg["embed_dim"],
            dt_n_layers=dt_n_layers,
            dt_n_heads=cfg.get("dt_n_heads", 12),
            xattn_n_heads=cfg.get("xattn_n_heads", 12),
            **kw,
        )
        params = convert_flamingo_policy(
            flat,
            {**cfg, "dt_n_layers": dt_n_layers},
            t5_num_layers=geo["t5_num_layers"],
            vit_layers=geo["vit_layers"],
        )
    else:
        raise ValueError(f"unknown policy family {family!r}")
    import jax

    params = jax.tree.map(lambda x: jax.numpy.asarray(x), params)
    return policy, {"params": params}


def main(argv=None):
    """CLI: one-shot released-torch-ckpt -> orbax conversion.

        python -m vima_tpu.ckpt.convert <torch_ckpt.ckpt> <out_dir> [--dtype bf16]

    After this, torch is no longer needed to load the policy
    (vima_tpu.ckpt.io.load_checkpoint).
    """
    import argparse

    p = argparse.ArgumentParser(description=main.__doc__)
    p.add_argument("torch_ckpt", help="released VIMA .ckpt file (torch.save format)")
    p.add_argument("out_dir", help="output orbax checkpoint directory")
    p.add_argument(
        "--dtype", default=None, choices=[None, "bf16", "fp32"],
        help="optionally cast stored params (default: keep fp32)",
    )
    p.add_argument(
        "--family", default=None, choices=[None, "vima", "gato", "gpt", "flamingo"],
        help="policy family (default: auto-detect from state-dict keys)",
    )
    args = p.parse_args(argv)

    import jax.numpy as jnp

    from vima_tpu.ckpt.io import import_torch_checkpoint

    dtype = jnp.bfloat16 if args.dtype == "bf16" else None
    policy, params = import_torch_checkpoint(
        args.torch_ckpt, args.out_dir, dtype=dtype, family=args.family
    )
    n = sum(x.size for x in __import__("jax").tree_util.tree_leaves(params))
    print(
        f"converted {args.torch_ckpt} -> {args.out_dir} "
        f"({type(policy).__name__}, {n/1e6:.1f}M params)"
    )


if __name__ == "__main__":
    main()
