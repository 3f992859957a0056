"""Fused attention Pallas kernel for TPU. **Not dispatched by default.**

Status (round-4 honest measurement, two-chain-length raw totals at the
full-sequence showcase shape B=8, H=12, L=512, D=64 on v5e): this kernel
runs at 0.44x (fp32) / 0.49x (bf16) of the XLA path — XLA:TPU's own
fusion already keeps scores/probs in VMEM at these sizes, so the kernel's
founding premise (that XLA round-trips the probs through HBM) is false
here, and the XLA path is the production default
(ops.attention._USE_FLASH = False; enable explicitly via
set_flash_enabled). Kept because it is correct, tested, and the starting
point for shapes where single-pass VMEM attention *does* win (much longer
sequences than this framework's 512-cap needs).

Design: at this framework's sequence lengths (stream <= 512, prompt <= 256
— hard caps inherited from the reference, xattn_gpt.py:18,25) the whole K/V
for one (batch, head) fits comfortably in VMEM, so the kernel is a
single-pass fused attention: per (b, h, q-block) grid cell, compute the
full fp32 score row block in VMEM, softmax exactly (no online/streaming
rescaling needed), and hit the MXU twice (QK^T and PV).

Numerics: fp32 logits/softmax, causal fill ``-1e4`` (reference
components.py:63), fp32-min additive key-padding mask. With
``mxu_bf16=False`` the kernel is bit-compatible with
vima_tpu.ops.attention.attend's XLA path under 'highest' precision (probs
cast to the value dtype before PV); that mode exists for exactness tests.
The production default ``mxu_bf16=True`` instead reproduces XLA's
*default* matmul precision semantics — fp32 operands rounded to bf16, one
MXU pass, fp32 accumulation — because true-fp32 MXU matmuls run as ~6 slow
passes (measured round 2: 0.75x vs XLA at L=512). In that mode the softmax
numerator is normalized *after* the PV matmul (cheaper by ~Lk/D on the
VPU; same relative bf16 rounding error), so outputs agree with XLA's
default-precision path to bf16 tolerance, not bitwise. The dispatcher
(:func:`vima_tpu.ops.attention._flash_eligible`) routes to XLA under any
elevated matmul precision (``strict_parity_mode``) so parity runs stay
exact.

The causal q_offset arrives as a scalar-prefetch argument (SMEM), so the
kernel itself supports a traced offset; the *dispatcher* requires a static
(Python int / None) q_offset because the custom_vjp wrapper needs it
hashable — traced offsets only occur on KV-cache chunk shapes, which are
below the flash gate anyway and use ops.decode_attention instead.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_1E4 = -1e4
F32_MIN = float(jnp.finfo(jnp.float32).min)


def _kernel(
    # scalar prefetch
    q_offset_ref,
    # operands (some optional, controlled by flags)
    *refs,
    scale: float,
    causal: bool,
    has_kmask: bool,
    has_bias: bool,
    block_q: int,
    mxu_bf16: bool,
):
    idx = 0
    q_ref = refs[idx]; idx += 1
    k_ref = refs[idx]; idx += 1
    v_ref = refs[idx]; idx += 1
    kmask_ref = None
    bias_ref = None
    if has_kmask:
        kmask_ref = refs[idx]; idx += 1
    if has_bias:
        bias_ref = refs[idx]; idx += 1
    o_ref = refs[idx]

    # fp32 operands optionally round to bf16 for a single MXU pass with fp32
    # accumulation (exactly XLA default-precision semantics — module doc).
    mxu_dt = jnp.bfloat16 if mxu_bf16 else jnp.float32
    q = q_ref[0, 0].astype(mxu_dt)  # (BQ, D)
    k = k_ref[0, 0].astype(mxu_dt)  # (Lk, D)
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    if scale != 1.0:
        s = s * scale

    Lk = k.shape[0]
    bq = q.shape[0]
    if causal:
        qi = pl.program_id(2)
        q_pos = (
            jax.lax.broadcasted_iota(jnp.int32, (bq, Lk), 0)
            + qi * block_q
            + q_offset_ref[0]
        )
        k_pos = jax.lax.broadcasted_iota(jnp.int32, (bq, Lk), 1)
        s = jnp.where(k_pos <= q_pos, s, NEG_1E4)

    if kmask_ref is not None:
        km = kmask_ref[0, 0].astype(jnp.float32)  # (Lk,)
        s = s + ((1.0 - km) * F32_MIN)[None, :]

    if bias_ref is not None:
        s = s + bias_ref[0, 0].astype(jnp.float32)

    m = jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp(s - m)
    l = jnp.sum(e, axis=-1, keepdims=True)  # (BQ, 1)

    # Normalize AFTER the PV matmul: dividing the (BQ, D) output is ~Lk/D
    # cheaper on the VPU than scaling the (BQ, Lk) probs, and e in [0, 1]
    # carries the same relative error through bf16 rounding as p would.
    v = v_ref[0, 0]
    pv_dt = mxu_dt if v.dtype == jnp.float32 else v.dtype
    out = jax.lax.dot_general(
        e.astype(pv_dt),
        v.astype(pv_dt),
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    o_ref[0, 0] = (out / l).astype(o_ref.dtype)


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def fused_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    *,
    scale: Optional[float],
    causal: bool = False,
    q_offset=None,
    key_mask: Optional[jnp.ndarray] = None,
    bias: Optional[jnp.ndarray] = None,
    mxu_bf16: bool = True,
    block_q: Optional[int] = None,
    interpret: bool = False,
) -> jnp.ndarray:
    """Fused attention. q: (B,H,Lq,D); k/v: (B,H,Lk,D);
    key_mask: bool (B, Lk); bias: (1|B, H, Lq, Lk) additive fp32.
    mxu_bf16: round fp32 matmul operands to bf16 for single-pass MXU dots
    (XLA default-precision semantics — module docstring); pass False for
    true-fp32 dots (exactness tests; ~6x slower on fp32 inputs).
    Returns (B, H, Lq, D) in v.dtype."""
    B, H, Lq, D = q.shape
    Lk = k.shape[2]
    scale = 1.0 if scale is None else float(scale)
    out_dtype = v.dtype

    # Round fp32 operands to bf16 BEFORE the pallas_call: the kernel would
    # round them at the MXU anyway (module docstring), and casting outside
    # halves the HBM->VMEM DMA bytes (XLA usually fuses the cast into the
    # producer). Accumulation and the output stay fp32.
    if mxu_bf16 and q.dtype == jnp.float32:
        q = q.astype(jnp.bfloat16)
        k = k.astype(jnp.bfloat16)
        if v.dtype == jnp.float32:
            v = v.astype(jnp.bfloat16)

    if block_q is None:
        block_q = min(128, _round_up(Lq, 8))
    block_q = min(block_q, _round_up(Lq, 8))
    Lq_p = _round_up(Lq, block_q)
    Lk_p = _round_up(Lk, 128)

    if q_offset is None:
        q_offset = Lk - Lq
    q_offset = jnp.asarray([q_offset], dtype=jnp.int32)

    # pad sequence dims; padded keys are masked (or causal-excluded)
    if Lq_p != Lq:
        q = jnp.pad(q, ((0, 0), (0, 0), (0, Lq_p - Lq), (0, 0)))
    if Lk_p != Lk:
        k = jnp.pad(k, ((0, 0), (0, 0), (0, Lk_p - Lk), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, 0), (0, Lk_p - Lk), (0, 0)))
        if key_mask is None and not causal:
            key_mask = jnp.ones((B, Lk), bool)
    if key_mask is not None:
        key_mask = key_mask.astype(jnp.float32)
        if key_mask.shape[-1] != Lk_p:
            key_mask = jnp.pad(key_mask, ((0, 0), (0, Lk_p - Lk)))
        # (B, 1, Lk): TPU blocks constrain the last two dims, and a
        # (1, Lk) block over a (B, Lk) array is illegal for B > 1.
        key_mask = key_mask[:, None, :]
    if bias is not None:
        bias = bias.astype(jnp.float32)
        bias = jnp.pad(
            bias,
            ((0, 0), (0, 0), (0, Lq_p - bias.shape[2]), (0, Lk_p - bias.shape[3])),
        )

    grid = (B, H, Lq_p // block_q)
    in_specs = [
        pl.BlockSpec((1, 1, block_q, D), lambda b, h, i, *_: (b, h, i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, Lk_p, D), lambda b, h, i, *_: (b, h, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, Lk_p, D), lambda b, h, i, *_: (b, h, 0, 0), memory_space=pltpu.VMEM),
    ]
    operands = [q, k, v]
    if key_mask is not None:
        in_specs.append(
            pl.BlockSpec(
                (1, 1, Lk_p), lambda b, h, i, *_: (b, 0, 0), memory_space=pltpu.VMEM
            )
        )
        operands.append(key_mask)
    if bias is not None:
        bias_b = bias.shape[0]
        bias_h = bias.shape[1]
        in_specs.append(
            pl.BlockSpec(
                (1, 1, block_q, Lk_p),
                lambda b, h, i, *_, bb=bias_b, bh=bias_h: (
                    b if bb > 1 else 0,
                    h if bh > 1 else 0,
                    i,
                    0,
                ),
                memory_space=pltpu.VMEM,
            )
        )
        operands.append(bias)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (1, 1, block_q, D), lambda b, h, i, *_: (b, h, i, 0), memory_space=pltpu.VMEM
        ),
    )

    kernel = functools.partial(
        _kernel,
        scale=scale,
        causal=causal,
        has_kmask=key_mask is not None,
        has_bias=bias is not None,
        block_q=block_q,
        mxu_bf16=mxu_bf16,
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, H, Lq_p, D), out_dtype),
        interpret=interpret,
    )(q_offset, *operands)
    return out[:, :, :Lq, :]
