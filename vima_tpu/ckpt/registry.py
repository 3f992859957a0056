"""Model-size registry.

The reference releases 7 checkpoint sizes (2M..200M, README.md:33-37) whose
only architecture knobs live in ``ckpt["cfg"]``: embed_dim, xf_n_layers,
sattn_n_heads, xattn_n_heads (vima/__init__.py:9-10). The converter always
trusts the real ckpt cfg; this registry provides stand-in configs of the
same decoder scale for benchmarks and training-from-scratch — for the
flagship and (beyond the reference, which has no registry at all) the
three baseline families.
"""

from __future__ import annotations

import dataclasses
from typing import Dict


@dataclasses.dataclass(frozen=True)
class PolicyConfig:
    """Decoder-scale knobs, reused across families: ``n_layers`` maps to
    xf_n_layers (vima) / n_layer (gato, gpt) / dt_n_layers (flamingo)."""

    embed_dim: int
    n_layers: int
    n_heads: int
    xattn_n_heads: int
    family: str = "vima"

    # backwards-compatible aliases (flagship field names)
    @property
    def xf_n_layers(self) -> int:
        return self.n_layers

    @property
    def sattn_n_heads(self) -> int:
        return self.n_heads

    def build(self, **overrides):
        if self.family == "vima":
            from vima_tpu.policy.vima import VIMAPolicy

            return VIMAPolicy(
                embed_dim=self.embed_dim,
                xf_n_layers=self.n_layers,
                sattn_n_heads=self.n_heads,
                xattn_n_heads=self.xattn_n_heads,
                **overrides,
            )
        if self.family in ("gato", "gpt"):
            from vima_tpu.policy import VIMAGatoPolicy, VIMAGPTPolicy

            cls = VIMAGatoPolicy if self.family == "gato" else VIMAGPTPolicy
            return cls(
                embed_dim=self.embed_dim,
                n_layer=self.n_layers,
                n_head=self.n_heads,
                **overrides,
            )
        if self.family == "flamingo":
            from vima_tpu.policy import VIMAFlamingoPolicy

            return VIMAFlamingoPolicy(
                embed_dim=self.embed_dim,
                dt_n_layers=self.n_layers,
                dt_n_heads=self.n_heads,
                xattn_n_heads=self.xattn_n_heads,
                **overrides,
            )
        raise ValueError(f"unknown family {self.family!r}")


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
# Baseline families (model-card.md:23-27) at test and headline scales.
for _fam in ("gato", "gpt", "flamingo"):
    REGISTRY[f"{_fam}-2m"] = PolicyConfig(256, 1, 8, 8, family=_fam)
    REGISTRY[f"{_fam}-200m"] = PolicyConfig(768, 11, 12, 12, family=_fam)


def get_config(name: str) -> PolicyConfig:
    if name not in REGISTRY:
        raise KeyError(f"unknown model size {name!r}; have {sorted(REGISTRY)}")
    return REGISTRY[name]
