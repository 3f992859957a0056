"""Unified scaled-dot-product attention with reference-exact masking semantics.

All attention flavors the models need route through :func:`attend`:

1. OpenAI-GPT causal self-attention — scale 1/sqrt(d), causal mask applied as
   ``where(allowed, scores, -1e4)`` (the reference's ``w*b + -1e4*(1-b)``,
   components.py:51-80 / gpt.py:271-301), plus a key-padding mask.
2. Prompt cross-attention (XAttention) — scale 1/sqrt(d), additive
   fp32-min key-padding mask (components.py:184-256).
3. T5 encoder self-attention — **no** scaling, additive relative-position
   bias with the padding mask folded in (prompt_encoder.py:769-800).
4. ViT self-attention (torch nn.MultiheadAttention) — scale 1/sqrt(d), no mask
   (vit.py:199-236).

QK logits and softmax always run in fp32 (parity-critical; every reference
attention casts q,k to fp32); probs are cast back to the value dtype for
the PV matmul so bf16 inference keeps the MXU fed.

Dispatch: the XLA path below is the production default for every
full-sequence flavor — measured honestly (two-chain-length raw totals,
round 4) XLA:TPU's own fusion beats the Pallas flash kernel ~2x at the
largest shapes this framework uses (see _USE_FLASH). The fused kernel
(vima_tpu.ops.flash_attention) remains available via set_flash_enabled.
The KV-cache chunk attends route separately through
ops.decode_attention.cached_attend, whose Pallas kernel DOES win (the XLA
cached path pays a per-step cache relayout copy) and is default-ON.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

NEG_1E4 = -1e4  # reference causal mask constant (components.py:63)
F32_MIN = float(jnp.finfo(jnp.float32).min)  # reference padding mask constant

# Default OFF: the honest two-chain-length raw-total measurement (round 4,
# bench _bench_flash_kernel, production-pattern chains) puts the fused
# kernel at 0.44x (fp32) / 0.49x (bf16) of the XLA path at the
# full-sequence showcase shape (B=8, H=12, L=512, D=64) — XLA:TPU already
# fuses softmax into the attention matmuls at these sizes and never
# materializes the probs in HBM, so the kernel's premise doesn't hold.
# (Round 3's published 1.28x came from a single-chain-minus-RTT method the
# volatile ~30 ms tunnel RTT invalidates.) The kernel stays as an
# explicitly-enable path and for the record; the decode kernel
# (ops/decode_attention) is a different story — it wins 2.3-4.5x and is ON.
_USE_FLASH = False
_FLASH_MIN_Q = 64
_FLASH_MIN_SCORE_TILE = 64 * 64


def set_flash_enabled(flag: bool) -> None:
    global _USE_FLASH
    _USE_FLASH = bool(flag)


def flash_enabled() -> bool:
    return _USE_FLASH


# The fused decode kernel (ops/decode_attention) is gated separately from
# the full-sequence flash kernel. The v2 kernel (one program per batch row,
# head-stacked scores in VMEM) measured 4.0x (bf16) / 2.1x (fp32) faster
# than the XLA cached attend at the production B=64,S=512,C=17 shape on
# v5e — the XLA path pays a (B,S,E)->(B,H,S,D) relayout copy of every
# cache every step (69% of the step's materialized HBM writes in the HLO).
# Default ON; xla_cached_attend remains the numerics oracle and the
# fallback for shapes the kernel doesn't accept.
_USE_DECODE_KERNEL = True


def set_decode_kernel_enabled(flag: bool) -> None:
    global _USE_DECODE_KERNEL
    _USE_DECODE_KERNEL = bool(flag)


def decode_kernel_enabled() -> bool:
    return _USE_DECODE_KERNEL


# Trace-time kernel-dispatch counters: {(path, Lq, Lk, tile_wants_flash): n}.
# ``tile_wants_flash`` is the pure shape test (independent of backend/enable
# flags), so a benchmark can fail loudly when a flash-worthy shape silently
# fell back to XLA (e.g. a backend-detection regression). Counts accumulate
# per trace, not per execution — they answer "which kernel did this shape
# compile to", which is the invariant worth asserting.
_dispatch_counts: dict = {}


def _tile_wants_flash(Lq: int, Lk: int) -> bool:
    return Lq >= _FLASH_MIN_Q and Lq * Lk >= _FLASH_MIN_SCORE_TILE


def _note_dispatch(path: str, Lq: int, Lk: int) -> None:
    key = (path, Lq, Lk, _tile_wants_flash(Lq, Lk))
    _dispatch_counts[key] = _dispatch_counts.get(key, 0) + 1


def dispatch_counts() -> dict:
    """Snapshot of trace-time attention dispatch decisions."""
    return dict(_dispatch_counts)


def reset_dispatch_counts() -> None:
    _dispatch_counts.clear()


def flash_fallbacks() -> list:
    """Shapes that wanted the fused kernel but traced to XLA (should be
    empty on TPU with flash enabled)."""
    return [k for k in _dispatch_counts if k[0] == "xla" and k[3]]


def strict_parity_mode():
    """Context manager: force 'highest' matmul precision.

    TPU fp32 matmuls default to bf16-pass decomposition; with near-uniform
    logits that can flip a rare argmax vs CPU. Under this context the cached
    TPU rollout reproduces CPU/reference actions exactly (verified 480/480
    on random-init policies; trained checkpoints have far larger margins).
    """
    import jax

    return jax.default_matmul_precision("highest")


def padding_bias_from_mask(mask: jnp.ndarray, dtype=jnp.float32) -> jnp.ndarray:
    """bool key mask (B, Lk) -> additive bias (B, 1, 1, Lk) with fp32-min fill
    (HF invert_attention_mask semantics, components.py:230-256)."""
    m = mask.astype(dtype)
    return ((1.0 - m) * F32_MIN)[:, None, None, :]


def _causal_allowed(q_len: int, k_len: int, q_offset) -> jnp.ndarray:
    q_pos = jax.lax.broadcasted_iota(jnp.int32, (q_len, k_len), 0) + q_offset
    k_pos = jax.lax.broadcasted_iota(jnp.int32, (q_len, k_len), 1)
    return k_pos <= q_pos


def _flash_eligible(q, k, q_offset) -> bool:
    if not _USE_FLASH:
        return False
    # Under any elevated matmul precision (strict_parity_mode's 'highest',
    # but also 'float32'/'high'/'tensorfloat32') the fused kernel's
    # bf16-rounded MXU dots would silently downgrade precision; the XLA
    # path honors the precision config, so route there. Checked before the
    # backend so the gate is testable off-TPU.
    if jax.config.jax_default_matmul_precision not in (None, "default", "bfloat16"):
        return False
    try:
        if jax.default_backend() != "tpu":
            return False
    except Exception:
        return False
    # The custom_vjp wrapper needs q_offset static (it is a nondiff arg);
    # traced offsets only occur on KV-cache chunk shapes, which are below
    # the flash gate anyway.
    if q_offset is not None and not isinstance(q_offset, int):
        return False
    Lq, Lk = q.shape[2], k.shape[2]
    return Lq >= _FLASH_MIN_Q and Lq * Lk >= _FLASH_MIN_SCORE_TILE


def attend(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    *,
    scale: Optional[float],
    causal: bool = False,
    q_offset=None,
    key_mask: Optional[jnp.ndarray] = None,
    bias: Optional[jnp.ndarray] = None,
    fp32_logits: bool = True,
) -> jnp.ndarray:
    """Scaled dot-product attention.

    Args:
      q: (B, H, Lq, D); k, v: (B, H, Lk, D).
      scale: logit multiplier; None means 1.0 (T5 flavor).
      causal: apply the GPT causal mask (``where(allowed, w, -1e4)``).
      q_offset: global position of q[0] (KV-cache chunks); defaults to
        Lk - Lq. May be traced.
      key_mask: bool (B, Lk) — True = attend; padding gets fp32-min additive.
      bias: additive fp32 bias broadcastable to (B, H, Lq, Lk) (T5 relative
        position bias).
      fp32_logits: compute QK^T and softmax in fp32 (reference semantics).

    Returns (B, H, Lq, D) in v.dtype.
    """
    Lq, Lk = q.shape[2], k.shape[2]

    if fp32_logits and _flash_eligible(q, k, q_offset):
        _note_dispatch("flash", Lq, Lk)
        return _flash_attend((scale, causal, q_offset), q, k, v, key_mask, bias)

    _note_dispatch("xla", Lq, Lk)
    return _xla_attend(
        q, k, v, scale=scale, causal=causal, q_offset=q_offset,
        key_mask=key_mask, bias=bias,
    )


def _xla_attend(q, k, v, *, scale, causal, q_offset, key_mask, bias):
    """The XLA attention path (also the flash kernel's backward oracle)."""
    out_dtype = v.dtype
    Lq, Lk = q.shape[2], k.shape[2]
    # fp32 logits WITHOUT upcasting the operands: ``preferred_element_type``
    # makes the MXU accumulate in fp32 directly. bf16 -> fp32 upcast is
    # value-exact, so explicit ``astype`` would only (a) materialize fp32
    # copies of the whole KV cache in HBM each cached step and (b) turn the
    # QK matmul into a multi-pass fp32 dot — measured 25% slower at batch
    # with zero numeric effect. (fp32 inputs are untouched either way;
    # ``strict_parity_mode`` still forces highest matmul precision.)
    scores = jnp.einsum("bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32)
    if scale is not None:
        scores = scores * scale

    if causal:
        offset = Lk - Lq if q_offset is None else q_offset
        allowed = _causal_allowed(Lq, Lk, offset)
        scores = jnp.where(allowed[None, None], scores, NEG_1E4)

    if key_mask is not None:
        scores = scores + padding_bias_from_mask(key_mask).astype(scores.dtype)

    if bias is not None:
        scores = scores + bias.astype(scores.dtype)

    probs = jax.nn.softmax(scores, axis=-1).astype(out_dtype)
    out = jnp.einsum("bhqk,bhkd->bhqd", probs, v, preferred_element_type=jnp.float32)
    return out.astype(out_dtype)


# --- flash dispatch with a defined VJP -------------------------------------
# pallas_call has no JVP rule, so differentiating through the fused kernel
# (BC training's T5/decoder full-sequence attends) would raise
# NotImplementedError. custom_vjp: forward runs the kernel; backward
# recomputes attention through the XLA path (same math — module docstring)
# and differentiates that. Net effect vs a pure-XLA forward: the fwd pass
# never materializes the (B, H, Lq, Lk) probs in HBM; the bwd recompute is
# what jax.checkpoint-style remat would do anyway.
# ``static`` = (scale, causal, q_offset) — hashable by construction
# (_flash_eligible rejects traced q_offset).


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _flash_attend(static, q, k, v, key_mask, bias):
    from vima_tpu.ops.flash_attention import fused_attention

    scale, causal, q_offset = static
    return fused_attention(
        q, k, v, scale=scale, causal=causal, q_offset=q_offset,
        key_mask=key_mask, bias=bias,
    )


def _flash_attend_fwd(static, q, k, v, key_mask, bias):
    return _flash_attend(static, q, k, v, key_mask, bias), (q, k, v, key_mask, bias)


def _flash_attend_bwd(static, res, g):
    import numpy as np

    scale, causal, q_offset = static
    q, k, v, key_mask, bias = res

    def ref(q, k, v, *rest):
        b = rest[0] if bias is not None else None
        return _xla_attend(
            q, k, v, scale=scale, causal=causal, q_offset=q_offset,
            key_mask=key_mask, bias=b,
        )

    diff_args = (q, k, v) + ((bias,) if bias is not None else ())
    _, vjp = jax.vjp(ref, *diff_args)
    grads = vjp(g)
    dq, dk, dv = grads[:3]
    dbias = grads[3] if bias is not None else None
    # bool key_mask has no cotangent space; float0 is the JAX convention
    dmask = (
        np.zeros(key_mask.shape, dtype=jax.dtypes.float0)
        if key_mask is not None
        else None
    )
    return dq, dk, dv, dmask, dbias


_flash_attend.defvjp(_flash_attend_fwd, _flash_attend_bwd)


def split_heads(x: jnp.ndarray, n_heads: int) -> jnp.ndarray:
    """(B, L, E) -> (B, H, L, E/H)."""
    B, L, E = x.shape
    return x.reshape(B, L, n_heads, E // n_heads).transpose(0, 2, 1, 3)


def merge_heads(x: jnp.ndarray) -> jnp.ndarray:
    """(B, H, L, D) -> (B, L, H*D)."""
    B, H, L, D = x.shape
    return x.transpose(0, 2, 1, 3).reshape(B, L, H * D)
