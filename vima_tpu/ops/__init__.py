from vima_tpu.ops.layers import (
    MLP,
    RMSNorm,
    get_activation,
    orthogonal_gain,
)
from vima_tpu.ops.attention import attend

__all__ = ["MLP", "RMSNorm", "get_activation", "orthogonal_gain", "attend"]
