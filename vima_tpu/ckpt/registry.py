"""Model-size registry.

The reference releases 7 checkpoint sizes (2M..200M, README.md:33-37) whose
only architecture knobs live in ``ckpt["cfg"]``: embed_dim, xf_n_layers,
sattn_n_heads, xattn_n_heads (vima/__init__.py:9-10). The converter always
trusts the real ckpt cfg; this registry provides stand-in configs of the
same decoder scale for benchmarks and training-from-scratch.
"""

from __future__ import annotations

import dataclasses
from typing import Dict


@dataclasses.dataclass(frozen=True)
class PolicyConfig:
    embed_dim: int
    xf_n_layers: int
    sattn_n_heads: int
    xattn_n_heads: int

    def build(self, **overrides):
        from vima_tpu.policy.vima import VIMAPolicy

        return VIMAPolicy(
            embed_dim=self.embed_dim,
            xf_n_layers=self.xf_n_layers,
            sattn_n_heads=self.sattn_n_heads,
            xattn_n_heads=self.xattn_n_heads,
            **overrides,
        )


# Decoder parameter count is ~32*E^2 per layer (xattn + self-attn + 2 GEGLU
# FFs); sizes below land near the released ckpt names.
REGISTRY: Dict[str, PolicyConfig] = {
    "vima-2m": PolicyConfig(256, 1, 8, 8),
    "vima-4m": PolicyConfig(256, 2, 8, 8),
    "vima-9m": PolicyConfig(384, 2, 8, 8),
    "vima-20m": PolicyConfig(512, 2, 8, 8),
    "vima-43m": PolicyConfig(512, 5, 8, 8),
    "vima-92m": PolicyConfig(768, 5, 12, 12),
    "vima-200m": PolicyConfig(768, 11, 12, 12),
}


def get_config(name: str) -> PolicyConfig:
    if name not in REGISTRY:
        raise KeyError(f"unknown model size {name!r}; have {sorted(REGISTRY)}")
    return REGISTRY[name]
