"""Golden parity tests: every Flax module vs. the PyTorch reference,
weights carried across by the checkpoint converter (which these tests
therefore also verify). Reference modules are random-init, seeded; no
network access needed.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tests.reference_loader import reference_available, load_reference
from vima_tpu.ckpt import convert as C

pytestmark = pytest.mark.skipif(
    not reference_available(), reason="PyTorch reference not available"
)


def torch_seed(seed=0):
    import torch

    torch.manual_seed(seed)
    return torch


def assert_close(a, b, atol=2e-5, rtol=2e-5, what=""):
    a = np.asarray(a)
    b = np.asarray(b)
    np.testing.assert_allclose(a, b, atol=atol, rtol=rtol, err_msg=what)


# ------------------------------------------------------------------ build_mlp


def test_mlp_parity():
    torch = torch_seed()
    load_reference()
    from vima.nn.utils import build_mlp

    ref = build_mlp(16, hidden_dim=32, output_dim=8, hidden_depth=2)
    ref.eval()
    params = {
        f"layers_{i}": {
            "kernel": ref.state_dict()[f"{3*i}.weight"].numpy().T,
            "bias": ref.state_dict()[f"{3*i}.bias"].numpy(),
        }
        for i in range(3)
    }

    from vima_tpu.ops.layers import MLP

    m = MLP(hidden_dim=32, output_dim=8, hidden_depth=2)
    x = np.random.default_rng(0).normal(size=(4, 16)).astype(np.float32)
    out = m.apply({"params": params}, jnp.asarray(x))
    ref_out = ref(torch.tensor(x)).detach().numpy()
    assert_close(out, ref_out, what="build_mlp")


def test_mlp_depth0_parity():
    torch = torch_seed()
    load_reference()
    from vima.nn.utils import build_mlp

    ref = build_mlp(16, hidden_dim=32, output_dim=8, hidden_depth=0)
    params = {
        "layers_0": {
            "kernel": ref.state_dict()["0.weight"].numpy().T,
            "bias": ref.state_dict()["0.bias"].numpy(),
        }
    }
    from vima_tpu.ops.layers import MLP

    m = MLP(hidden_dim=32, output_dim=8, hidden_depth=0)
    x = np.random.default_rng(1).normal(size=(4, 16)).astype(np.float32)
    assert_close(
        m.apply({"params": params}, jnp.asarray(x)),
        ref(torch.tensor(x)).detach().numpy(),
        what="build_mlp depth0",
    )


# ------------------------------------------------------------------ ViT


@pytest.mark.parametrize("variant", ["square", "rect", "gato"])
def test_vit_parity(variant):
    torch = torch_seed(1)
    load_reference()
    from vima.nn.obj_encoder.vit.vit import (
        ViTEncoder as RefViTEncoder,
        ViTEncoderRectangular as RefViTRect,
        GatoViTEncoder as RefGatoViT,
    )
    from vima_tpu.nn.vit import ViTEncoder, ViTEncoderRectangular, GatoViTEncoder

    rng = np.random.default_rng(2)
    if variant == "square":
        ref = RefViTEncoder(output_dim=48, resolution=32, patch_size=16, width=64, layers=2, heads=4)
        ours = ViTEncoder(img_size=(32, 32), patch_size=16, width=64, layers=2, heads=4, output_dim=48)
        x = rng.integers(0, 256, size=(3, 5, 3, 32, 32)).astype(np.float32)
        use_cls = True
    elif variant == "rect":
        ref = RefViTRect(output_dim=48, img_size=(64, 128), patch_size=32, width=64, layers=2, heads=4)
        ours = ViTEncoderRectangular(img_size=(64, 128), patch_size=32, width=64, layers=2, heads=4, output_dim=48)
        x = rng.integers(0, 256, size=(2, 3, 64, 128)).astype(np.float32)
        use_cls = True
    else:
        ref = RefGatoViT(img_size=(64, 128), patch_size=32, width=64, layers=2, heads=4, output_dim=48)
        ours = GatoViTEncoder(img_size=(64, 128), patch_size=32, width=64, layers=2, heads=4, output_dim=48)
        x = rng.integers(0, 256, size=(2, 3, 64, 128)).astype(np.float32)
        use_cls = False

    ref.eval()
    sd = C.StateDict(ref.state_dict())
    params = {"vit": C.convert_vit(sd, "vit", layers=2, patch_size=ref.vit.conv1.kernel_size[0], use_cls=use_cls)}
    assert not sd.unconsumed(), sd.unconsumed()

    with torch.no_grad():
        ref_out = ref(torch.tensor(x)).numpy()
    out = ours.apply({"params": params}, jnp.asarray(x))
    assert_close(out, ref_out, atol=5e-5, rtol=5e-5, what=f"vit-{variant}")


# ------------------------------------------------------------------ T5 encoder


def test_t5_encoder_parity():
    torch = torch_seed(2)
    load_reference()
    from transformers.models.t5.modeling_t5 import T5Config as HFT5Config
    from vima.nn.prompt_encoder.prompt_encoder import T5EncoderModel

    cfg = HFT5Config(d_model=64, d_ff=128, num_layers=3, num_heads=4, d_kv=16, vocab_size=100, dropout_rate=0.0)
    ref = T5EncoderModel(cfg)
    ref.eval()

    from vima_tpu.nn.t5 import T5Config, T5EncoderStack

    ours = T5EncoderStack(
        T5Config(d_model=64, d_ff=128, num_layers=3, num_heads=4, d_kv=16, vocab_size=100)
    )
    sd = C.StateDict(ref.state_dict())
    params = C.convert_t5_stack(sd, "encoder", num_layers=3)
    for k in ("shared.weight", "encoder.embed_tokens.weight"):
        if sd.has(k):
            sd(k)
    assert not sd.unconsumed(), sd.unconsumed()

    rng = np.random.default_rng(3)
    x = rng.normal(size=(2, 9, 64)).astype(np.float32)
    mask = np.ones((2, 9), dtype=bool)
    mask[1, 5:] = False
    with torch.no_grad():
        ref_out = ref(
            inputs_embeds=torch.tensor(x), attention_mask=torch.tensor(mask, dtype=torch.float32)
        ).last_hidden_state.numpy()
    out = ours.apply({"params": params}, jnp.asarray(x), attention_mask=jnp.asarray(mask))
    # Padded positions may differ (garbage); compare valid region only.
    assert_close(out[0], ref_out[0], atol=5e-5, rtol=5e-5, what="t5 b0")
    assert_close(out[1, :5], ref_out[1, :5], atol=5e-5, rtol=5e-5, what="t5 b1")


# ------------------------------------------------------------------ XAttnGPT


def test_xattn_gpt_parity():
    torch = torch_seed(3)
    load_reference()
    from vima.nn.seq_modeling.xattn_gpt.xattn_gpt import XAttnGPT as RefXAttnGPT

    ref = RefXAttnGPT(
        64, n_layer=2, n_head=4, dropout=0.1, xattn_n_head=4,
        xattn_ff_expanding=4, xattn_n_positions=32, use_geglu=True,
    )
    ref.eval()
    from vima_tpu.nn.xattn_gpt import XAttnGPT

    ours = XAttnGPT(embd_dim=64, n_layer=2, n_head=4, xattn_n_head=4, xattn_n_positions=32)
    sd = C.StateDict(ref.state_dict())
    params = C.convert_xattn_gpt(_PrefixView(sd), "m", n_layer=2)

    rng = np.random.default_rng(4)
    L, B, Lp = 7, 2, 9
    oa = rng.normal(size=(L, B, 64)).astype(np.float32)
    pt = rng.normal(size=(Lp, B, 64)).astype(np.float32)
    pm = np.ones((B, Lp), dtype=bool)
    pm[1, 6:] = False
    oam = np.ones((B, L), dtype=bool)
    oam[0, 5:] = False
    pos = np.cumsum(oam, axis=1) - 1
    ppos = np.cumsum(pm, axis=1) - 1

    with torch.no_grad():
        ref_out = ref(
            obs_action_tokens=torch.tensor(oa),
            prompt_tokens=torch.tensor(pt),
            prompt_mask=torch.tensor(pm),
            obs_action_masks=torch.tensor(oam),
            obs_action_position_ids=torch.tensor(pos, dtype=torch.long),
            prompt_position_ids=torch.tensor(ppos, dtype=torch.long),
        ).numpy()

    out = ours.apply(
        {"params": params},
        jnp.asarray(oa).transpose(1, 0, 2),
        jnp.asarray(pt).transpose(1, 0, 2),
        obs_action_position_ids=jnp.asarray(pos),
        prompt_position_ids=jnp.asarray(ppos),
        prompt_mask=jnp.asarray(pm),
        obs_action_masks=jnp.asarray(oam),
    )
    out = np.asarray(out).transpose(1, 0, 2)  # back to (L, B, E)
    # Compare valid positions only (mask-padded outputs unused downstream).
    assert_close(out[:5, 0], ref_out[:5, 0], atol=5e-5, rtol=5e-5, what="xattn b0")
    assert_close(out[:, 1], ref_out[:, 1], atol=5e-5, rtol=5e-5, what="xattn b1")


class _PrefixView:
    """Adapter: serve keys of a StateDict under a synthetic 'm.' prefix so
    converters written for 'module.submodule' layouts work on a bare module."""

    def __init__(self, sd):
        self._sd = sd

    def __call__(self, key):
        assert key.startswith("m.")
        return self._sd(key[2:])

    def has(self, key):
        return self._sd.has(key[2:]) if key.startswith("m.") else False

    def unconsumed(self):
        return self._sd.unconsumed()


# ------------------------------------------------------------------ GPT


def test_gpt_decoder_parity():
    torch = torch_seed(4)
    load_reference()
    from vima.nn.seq_modeling.gpt.gpt import HFGPT

    ref = HFGPT(n_embd=64, use_geglu=True, n_positions=64, n_layer=2, n_head=4, dropout=0.1)
    ref.eval()
    from vima_tpu.nn.gpt import GPTDecoder

    ours = GPTDecoder(n_embd=64, n_layer=2, n_head=4, n_positions=64)
    sd = C.StateDict(ref.state_dict())
    params = C.convert_gpt_decoder(_PrefixView(sd), "m", n_layer=2)

    rng = np.random.default_rng(5)
    L, B = 9, 2
    x = rng.normal(size=(L, B, 64)).astype(np.float32)
    mask = np.ones((B, L), dtype=bool)
    mask[1, 7:] = False
    pos = np.cumsum(mask, axis=1) - 1

    with torch.no_grad():
        ref_out = ref(
            torch.tensor(x),
            custom_mask=torch.tensor(mask),
            position_ids=torch.tensor(pos, dtype=torch.long),
        ).numpy()
    out = ours.apply(
        {"params": params},
        jnp.asarray(x).transpose(1, 0, 2),
        custom_mask=jnp.asarray(mask),
        position_ids=jnp.asarray(pos),
    )
    out = np.asarray(out).transpose(1, 0, 2)
    assert_close(out[:, 0], ref_out[:, 0], atol=5e-5, rtol=5e-5, what="gpt b0")
    assert_close(out[:7, 1], ref_out[:7, 1], atol=5e-5, rtol=5e-5, what="gpt b1")


# ------------------------------------------------------------------ Perceiver


def test_perceiver_parity():
    torch = torch_seed(5)
    load_reference()
    from vima.nn.obj_encoder.perceiver import ObjectsPerceiverEncoder

    ref = ObjectsPerceiverEncoder(
        32,
        num_latents=4,
        num_blocks=2,
        num_self_attends_per_block=2,
        num_self_attention_heads=4,
        num_cross_attention_heads=4,
        attention_probs_dropout_prob=0.0,
    )
    ref.eval()
    from vima_tpu.nn.perceiver import PerceiverResampler

    ours = PerceiverResampler(
        d_model=32,
        num_latents=4,
        num_blocks=2,
        num_self_attends_per_block=2,
        num_self_attention_heads=4,
        num_cross_attention_heads=4,
    )
    sd = C.StateDict(ref.state_dict())
    params = C.convert_perceiver(_PrefixView(sd), "m", num_self_attends=2)
    assert not sd.unconsumed(), sd.unconsumed()

    rng = np.random.default_rng(6)
    x = rng.normal(size=(2, 11, 32)).astype(np.float32)
    mask = np.ones((2, 11), dtype=bool)
    with torch.no_grad():
        ref_out = ref(torch.tensor(x), torch.tensor(mask)).numpy()
    out = ours.apply({"params": params}, jnp.asarray(x), jnp.asarray(mask))
    assert_close(out, ref_out, atol=5e-5, rtol=5e-5, what="perceiver")


def test_vit_crop_packing_equality():
    """Crop-packed attention (attn_pack>1) must reproduce the unpacked
    outputs: every cross-crop logit is fp32-min-masked (exp -> exact 0),
    so only fp-add re-association can differ — assert tight closeness,
    and exact equality of argmax-ish structure via a small tolerance."""
    from vima_tpu.nn.vit import ViTEncoder

    rng = np.random.default_rng(17)
    imgs = jnp.asarray(rng.integers(3, 255, size=(2, 7, 3, 32, 32)), jnp.uint8)

    def run(pack):
        enc = ViTEncoder(
            img_size=(32, 32), patch_size=16, width=64, layers=2, heads=4,
            output_dim=48, attn_pack=pack,
        )
        params = enc.init(jax.random.PRNGKey(0), imgs)
        return params, enc.apply(params, imgs)

    params1, out1 = run(1)
    params4, out4 = run(4)  # 14 crops pad to 16 -> dummy rows exercised
    # identical param trees (packing is a compute-shape change only)
    assert jax.tree_util.tree_map(lambda x: x.shape, params1) == jax.tree_util.tree_map(
        lambda x: x.shape, params4
    )
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out4), rtol=2e-5, atol=2e-5)


def test_vit_packing_disabled_under_strict_precision():
    """strict_parity_mode must fall back to the unpacked (reference
    reduction order) path: outputs bit-equal to attn_pack=1."""
    from vima_tpu.nn.vit import ViTEncoder

    rng = np.random.default_rng(18)
    imgs = jnp.asarray(rng.integers(3, 255, size=(1, 5, 3, 32, 32)), jnp.uint8)
    enc_packed = ViTEncoder(
        img_size=(32, 32), patch_size=16, width=64, layers=2, heads=4,
        output_dim=48, attn_pack=8,
    )
    enc_plain = ViTEncoder(
        img_size=(32, 32), patch_size=16, width=64, layers=2, heads=4,
        output_dim=48, attn_pack=1,
    )
    params = enc_plain.init(jax.random.PRNGKey(1), imgs)
    with jax.default_matmul_precision("highest"):
        a = enc_packed.apply(params, imgs)
        b = enc_plain.apply(params, imgs)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
