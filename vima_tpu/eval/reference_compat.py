"""Offline loader for the PyTorch reference (benchmark baseline + golden
parity tests).

Shims the environment gaps (kornia / omegaconf absent, transformers 4.57
dropped three legacy T5 re-exports the vendored encoder imports but never
exercises at inference) and patches ``from_pretrained`` so the reference
policies construct with random-init local weights — no network access.
"""

from __future__ import annotations

import sys
import types

REFERENCE_PATH = "/root/reference"


def load_reference(path: str = REFERENCE_PATH):
    if path not in sys.path:
        sys.path.insert(0, path)
    if "kornia" not in sys.modules:
        k = types.ModuleType("kornia")
        k.geometry = types.SimpleNamespace(
            transform=types.SimpleNamespace(resize=lambda *a, **kw: None)
        )
        sys.modules["kornia"] = k
    if "omegaconf" not in sys.modules:
        oc = types.ModuleType("omegaconf")

        class _DictConfig:  # isinstance checks only (vima/utils.py:650-661)
            pass

        oc.DictConfig = _DictConfig
        oc.OmegaConf = types.SimpleNamespace(to_container=lambda *a, **k: a[0])
        sys.modules["omegaconf"] = oc
    import transformers.models.t5.modeling_t5 as t5m

    for name in ("checkpoint", "get_device_map", "assert_device_map"):
        if not hasattr(t5m, name):
            setattr(t5m, name, None)
    import vima  # noqa: F401

    return vima


def reference_available() -> bool:
    try:
        load_reference()
        return True
    except Exception:
        return False


class _patched_pretrained:
    """Context manager: from_pretrained -> random-init local models."""

    def __init__(self, t5_num_layers, t5_d_ff, vocab_size):
        import importlib

        import torch
        from transformers.models.t5.modeling_t5 import T5Config as HFT5Config

        self.pe = importlib.import_module("vima.nn.prompt_encoder.prompt_encoder")
        self.we = importlib.import_module("vima.nn.prompt_encoder.word_embd")
        self.hf_cfg = HFT5Config(
            d_model=768, d_ff=t5_d_ff, num_layers=t5_num_layers, num_heads=12,
            d_kv=64, vocab_size=vocab_size, dropout_rate=0.1,
        )
        self.vocab_size = vocab_size
        self.torch = torch

    def __enter__(self):
        pe, we, torch = self.pe, self.we, self.torch
        vocab = self.vocab_size
        self._orig_t5 = pe.T5EncoderModel.from_pretrained
        self._orig_auto = we.AutoModel.from_pretrained

        class _FakeAuto:
            def __init__(self):
                self._emb = torch.nn.Embedding(vocab, 768)

            def get_input_embeddings(self):
                return self._emb

        cfg = self.hf_cfg
        pe.T5EncoderModel.from_pretrained = classmethod(
            lambda cls, name, *a, **k: pe.T5EncoderModel(cfg)
        )
        we.AutoModel.from_pretrained = staticmethod(lambda name, *a, **k: _FakeAuto())
        return self

    def __exit__(self, *exc):
        self.pe.T5EncoderModel.from_pretrained = self._orig_t5
        self.we.AutoModel.from_pretrained = self._orig_auto
        return False


def build_reference_policy(
    family: str,
    *,
    t5_num_layers=2,
    t5_d_ff=1024,
    vocab_size=100,
    seed=0,
    **ctor_kwargs,
):
    """Construct any reference policy family offline with random init.

    family: 'vima' | 'gato' | 'flamingo' | 'gpt'."""
    load_reference()
    import torch

    torch.manual_seed(seed)
    with _patched_pretrained(t5_num_layers, t5_d_ff, vocab_size):
        import vima.policy as vp

        cls = {
            "vima": vp.VIMAPolicy,
            "gato": vp.VIMAGatoPolicy,
            "flamingo": vp.VIMAFlamingoPolicy,
            "gpt": vp.VIMAGPTPolicy,
        }[family]
        policy = cls(**ctor_kwargs)
    policy.eval()
    return policy


def build_reference_vima_policy(
    *,
    embed_dim=256,
    xf_n_layers=2,
    sattn_n_heads=4,
    xattn_n_heads=4,
    t5_num_layers=2,
    t5_d_ff=1024,
    vocab_size=100,
    seed=0,
):
    """Construct the reference VIMAPolicy offline: ``from_pretrained`` is
    patched to return random-init local models (d_model stays 768 as the
    policy glue requires). Returns (policy, cfg, meta)."""
    load_reference()
    import importlib

    import torch

    torch.manual_seed(seed)
    from transformers.models.t5.modeling_t5 import T5Config as HFT5Config

    pe = importlib.import_module("vima.nn.prompt_encoder.prompt_encoder")
    we = importlib.import_module("vima.nn.prompt_encoder.word_embd")

    hf_cfg = HFT5Config(
        d_model=768, d_ff=t5_d_ff, num_layers=t5_num_layers, num_heads=12, d_kv=64,
        vocab_size=vocab_size, dropout_rate=0.1,
    )

    orig_t5_fp = pe.T5EncoderModel.from_pretrained
    orig_auto_fp = we.AutoModel.from_pretrained

    class _FakeAuto:
        def __init__(self):
            self._emb = torch.nn.Embedding(vocab_size, 768)

        def get_input_embeddings(self):
            return self._emb

    pe.T5EncoderModel.from_pretrained = classmethod(
        lambda cls, name, *a, **k: pe.T5EncoderModel(hf_cfg)
    )
    we.AutoModel.from_pretrained = staticmethod(lambda name, *a, **k: _FakeAuto())
    try:
        from vima.policy import VIMAPolicy

        policy = VIMAPolicy(
            embed_dim=embed_dim,
            xf_n_layers=xf_n_layers,
            sattn_n_heads=sattn_n_heads,
            xattn_n_heads=xattn_n_heads,
        )
    finally:
        pe.T5EncoderModel.from_pretrained = orig_t5_fp
        we.AutoModel.from_pretrained = orig_auto_fp
    policy.eval()
    cfg = dict(
        embed_dim=embed_dim,
        xf_n_layers=xf_n_layers,
        sattn_n_heads=sattn_n_heads,
        xattn_n_heads=xattn_n_heads,
    )
    meta = dict(t5_num_layers=t5_num_layers, t5_d_ff=t5_d_ff, vocab_size=vocab_size)
    return policy, cfg, meta
