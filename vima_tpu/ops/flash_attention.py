"""Fused attention Pallas kernel for TPU.

Design: at this framework's sequence lengths (stream <= 512, prompt <= 256
— hard caps inherited from the reference, xattn_gpt.py:18,25) the whole K/V
for one (batch, head) fits comfortably in VMEM, so the optimal kernel is a
single-pass fused attention: per (b, h, q-block) grid cell, compute the
full fp32 score row block in VMEM, softmax exactly (no online/streaming
rescaling needed), and hit the MXU twice (QK^T and PV) — zero HBM traffic
for scores/probs, which is what the unfused XLA path pays (the probs
round-trip is the dominant HBM cost at these sizes).

Numerics are bit-compatible with vima_tpu.ops.attention.attend's XLA path:
fp32 logits, causal fill ``-1e4`` (reference components.py:63), fp32-min
additive key-padding mask, probs cast to the value dtype before PV.

MXU precision (``mxu_bf16``, default True): with fp32 operands the TPU MXU
runs true-fp32 matmuls as ~6 slow passes, while XLA's *default* matmul
precision rounds fp32 operands to bf16 and does ONE pass with fp32
accumulation — so a kernel that feeds the MXU raw fp32 loses to the XLA
path on speed while being *more* precise than it (measured round 2:
0.75x at L=512). ``mxu_bf16=True`` reproduces XLA's default-precision
semantics (operands rounded to bf16, fp32 accumulate) inside the kernel;
the dispatcher disables the fused path entirely under
``strict_parity_mode`` (highest precision) so parity runs stay exact.

The causal q_offset for KV-cache chunks arrives as a scalar-prefetch
argument (SMEM), so the cached rollout path uses the same kernel with a
traced write index.
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
