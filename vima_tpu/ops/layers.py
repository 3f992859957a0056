"""Layer primitives shared by every model family.

Capability parity with the reference MLP factory and norm layers
(reference: vima/nn/utils.py:15-148, T5LayerNorm used at
vima/nn/prompt_encoder/prompt_encoder.py:157-159), re-designed as Flax
modules with explicit dtype policy: parameters live in ``param_dtype``
(fp32 by default), activations run in ``dtype`` (bf16-able), and the
normalization statistics are always computed in fp32.
"""

from __future__ import annotations

import math
from typing import Any, Callable, Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn


def quick_gelu(x):
    """x * sigmoid(1.702 x) — the CLIP-ViT activation (reference vit.py:194-196)."""
    return x * jax.nn.sigmoid(1.702 * x)


def gelu_exact(x):
    """Exact (erf) GELU, matching torch nn.GELU default."""
    return jax.nn.gelu(x, approximate=False)


_ACTIVATIONS: dict[str, Callable] = {
    "tanh": jnp.tanh,
    "relu": jax.nn.relu,
    "leaky_relu": lambda x: jax.nn.leaky_relu(x, negative_slope=0.01),
    "swish": jax.nn.silu,
    "sigmoid": jax.nn.sigmoid,
    "elu": jax.nn.elu,
    "gelu": gelu_exact,
    "quick_gelu": quick_gelu,
}


def get_activation(activation: str | Callable | None) -> Callable:
    """Activation registry (reference vima/nn/utils.py:114-130)."""
    if activation is None or activation is False:
        return lambda x: x
    if callable(activation):
        return activation
    key = activation.lower()
    if key not in _ACTIVATIONS:
        raise ValueError(f"Unsupported activation {activation!r}; have {sorted(_ACTIVATIONS)}")
    return _ACTIVATIONS[key]


def orthogonal_gain(activation: str | Callable | None) -> float:
    """torch nn.init.calculate_gain for the activations build_mlp supports
    (reference vima/nn/utils.py:133-148 falls back to 1.0 on ValueError)."""
    if not isinstance(activation, str):
        return 1.0
    key = activation.lower()
    if key in ("relu",):
        return math.sqrt(2.0)
    if key in ("tanh",):
        return 5.0 / 3.0
    if key in ("leaky_relu",):
        return math.sqrt(2.0 / (1.0 + 0.01**2))
    if key in ("sigmoid", "linear"):
        return 1.0
    return 1.0


class RMSNorm(nn.Module):
    """T5-style RMS layer norm: no mean subtraction, no bias, fp32 statistics.

    Matches HF T5LayerNorm semantics used throughout the reference T5 encoder
    (vima/nn/prompt_encoder/prompt_encoder.py:157-159).
    """

    eps: float = 1e-6
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        scale = self.param("scale", nn.initializers.ones, (x.shape[-1],), self.param_dtype)
        x32 = x.astype(jnp.float32)
        var = jnp.mean(jnp.square(x32), axis=-1, keepdims=True)
        y = x32 * jax.lax.rsqrt(var + self.eps)
        return (scale * y.astype(x.dtype)).astype(x.dtype)


class MLP(nn.Module):
    """Configurable MLP, capability-equal to reference build_mlp
    (vima/nn/utils.py:15-111).

    ``hidden_depth`` counts hidden layers (0 -> single Linear). Orthogonal
    weight init with activation-dependent gain, zero bias, optional
    norm layers between hidden layers and optional input/output
    activation/norm hooks, optional small-gain last layer
    (reference action_decoder.py:55-88).
    """

    hidden_dim: int
    output_dim: int
    hidden_depth: int
    activation: str = "relu"
    norm_type: Optional[str] = None  # None | "layernorm" (batchnorm unsupported on purpose)
    add_input_activation: bool | str = False
    add_input_norm: bool = False
    add_output_activation: bool | str = False
    add_output_norm: bool = False
    last_layer_gain: Optional[float] = None
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    def _norm(self, name):
        if self.norm_type is None:
            return None
        if self.norm_type == "layernorm":
            return nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, param_dtype=self.param_dtype, name=name)
        raise ValueError(f"Unsupported norm_type {self.norm_type!r} (TPU build supports layernorm only)")

    @nn.compact
    def __call__(self, x):
        act = get_activation(self.activation)
        gain = orthogonal_gain(self.activation)
        kinit = nn.initializers.orthogonal(scale=gain)
        binit = nn.initializers.zeros

        def dense(features, name, last=False):
            scale = gain
            if last and self.last_layer_gain is not None:
                scale = self.last_layer_gain
            return nn.Dense(
                features,
                kernel_init=nn.initializers.orthogonal(scale=scale),
                bias_init=binit,
                dtype=self.dtype,
                param_dtype=self.param_dtype,
                name=name,
            )

        if self.add_input_norm:
            norm = self._norm("input_norm")
            if norm is not None:
                x = norm(x)
        if self.add_input_activation:
            in_act = (
                get_activation(self.add_input_activation)
                if self.add_input_activation is not True
                else act
            )
            x = in_act(x)

        if self.hidden_depth == 0:
            x = dense(self.output_dim, "layers_0", last=True)(x)
        else:
            x = dense(self.hidden_dim, "layers_0")(x)
            norm = self._norm("norm_0")
            if norm is not None:
                x = norm(x)
            x = act(x)
            for i in range(self.hidden_depth - 1):
                x = dense(self.hidden_dim, f"layers_{i + 1}")(x)
                norm = self._norm(f"norm_{i + 1}")
                if norm is not None:
                    x = norm(x)
                x = act(x)
            x = dense(self.output_dim, f"layers_{self.hidden_depth}", last=True)(x)

        if self.add_output_norm:
            norm = self._norm("output_norm")
            if norm is not None:
                x = norm(x)
        if self.add_output_activation:
            out_act = (
                get_activation(self.add_output_activation)
                if self.add_output_activation is not True
                else act
            )
            x = out_act(x)
        return x
