"""Fused KV-cache decode attention for TPU (Pallas).

The cached rollout's hot op: a small query chunk (C = 1 + n_obj tokens,
~17) attends to a fixed-capacity KV cache (S <= 512 slots).

Two kernels live here. **v2** (``fused_cached_attention_v2``, dispatched in
production) runs one grid program per batch row, streams the whole (S, E)
K/V block through VMEM once, and stacks all heads' fp32 scores as one
(H, Cp, S) value so the mask/softmax chain is a handful of large vector
ops. It exists because the XLA path must relayout every E-contiguous cache
to head-split (B, H, S, D) before its dot — a 100 MB copy per cache per
step at B=64 that the round-3 HLO audit measured at 69% of the step's
materialized HBM writes — while alternative cache layouts that avoid the
copy ((B,H,S,D), (B,H,D,S)) measured 2.3x *worse* due to lane padding or
relayouts inside the dots. v2 on v5e, measured at the production access
pattern (chunk DUS into the cache at a moving write index + barrier +
attend, caches threaded through the scan carry; two-chain-length raw
totals, round 4): 0.168 ms bf16 / 0.366 fp32 per attend vs 0.761 / 0.848
for the barrier+XLA path — **4.5x / 2.3x**, which is why the dispatch
default is ON (ops.attention._USE_DECODE_KERNEL). **v1**
(``fused_cached_attention``) is the earlier k-blocked online-softmax kernel
with valid-prefix block skipping; it loses in-context (grid B x n_kb
programs each running per-head op chains — issue-overhead bound) and is
kept as the block-skipping reference implementation.

v1 design notes, all driven by v5e measurements of the round-2 code:

  * **E-contiguous cache layout** ``(B, S, E)``. The round-2 caches were
    head-split ``(B, H, S, D)`` with D = 64: TPU tiles pad the minor
    dimension to 128 lanes, so every cache read/write moved 2x the bytes.
    E = H*D = 768 fills six (8, 128) tiles exactly — zero padding. Heads
    are sliced out of the lane dimension *inside* the kernel (free in
    VMEM).
  * **Valid-prefix block skipping.** The cache is written append-only
    (``write_index`` grows by C per env step); keys past
    ``write_index + C`` can never be attended (causally excluded and
    mask-invalid — exp underflows to exactly 0.0 in fp32, so skipping is
    bit-neutral). The kernel receives the valid length as a
    scalar-prefetch argument; k-blocks past it are skipped: their
    BlockSpec index_map clamps to the last valid block, Pallas's pipeline
    sees an unchanged index and issues **no DMA**, and ``pl.when`` skips
    the compute. Early-episode steps therefore pay O(written), not
    O(capacity) — the dynamic version of the "attend over the valid
    prefix only" plan.
  * **Online softmax** across k-blocks (exact softmax per row up to fp32
    re-association), fp32 logits, the reference's masking constants:
    causal fill ``-1e4`` (components.py:63), fp32-min additive key-padding
    (HF invert_attention_mask semantics). Probabilities are cast to the
    value dtype before the PV matmul, like ops.attention.attend.

The same kernel serves the prompt cross-attention (causal=False,
valid = Lp): the prompt K/V also live E-contiguous per layer.

Reference semantics being reproduced: the per-step attention of
vima/nn/seq_modeling/xattn_gpt/components.py:51-80 (causal) and :184-256
(cross), which the reference recomputes over the full history every env
step (scripts/example.py:111-240); here it runs O(chunk x valid-prefix).

``cached_attend`` falls back to an XLA implementation (head reshape +
ops.attention.attend) off-TPU — that path is the numerics oracle for the
kernel tests and keeps CPU tests / parity checks exact.
"""

from __future__ import annotations

import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_1E4 = -1e4
F32_MIN = float(jnp.finfo(jnp.float32).min)
_NEG_INIT = 0.7 * F32_MIN  # online-max init (F32_MIN < 0); below any real logit


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _decode_kernel(
    # scalar prefetch: [0] = valid length, [1] = q_offset (global pos of row 0)
    scalars_ref,
    q_ref,  # (1, H, Cp, D)
    k_ref,  # (1, BK, E)
    v_ref,  # (1, BK, E)
    mask_ref,  # (1, 1, BK) f32
    o_ref,  # (1, H, Cp, D)
    acc_ref,  # (H, Cp, D) f32 scratch
    m_ref,  # (H, Cp, 128) f32 scratch
    l_ref,  # (H, Cp, 128) f32 scratch
    *,
    scale: float,
    causal: bool,
    n_heads: int,
    head_dim: int,
    block_k: int,
    n_kb: int,
):
    kb = pl.program_id(1)
    valid = scalars_ref[0]
    last_kb = jax.lax.div(jnp.maximum(valid - 1, 0), jnp.int32(block_k))

    @pl.when(kb == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)
        m_ref[...] = jnp.full_like(m_ref, _NEG_INIT)
        l_ref[...] = jnp.zeros_like(l_ref)

    @pl.when(kb <= last_kb)
    def _compute():
        Cp = q_ref.shape[2]
        km = mask_ref[0, 0].astype(jnp.float32)  # (BK,)
        pad_bias = (1.0 - km) * F32_MIN  # (BK,)
        if causal:
            q_pos = (
                jax.lax.broadcasted_iota(jnp.int32, (Cp, block_k), 0)
                + scalars_ref[1]
            )
            k_pos = (
                jax.lax.broadcasted_iota(jnp.int32, (Cp, block_k), 1)
                + kb * block_k
            )
            allowed = k_pos <= q_pos

        for h in range(n_heads):
            q_h = q_ref[0, h].astype(jnp.float32)  # (Cp, D)
            k_h = k_ref[0, :, h * head_dim : (h + 1) * head_dim]  # (BK, D)
            s = jax.lax.dot_general(
                q_h,
                k_h.astype(jnp.float32),
                (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # (Cp, BK)
            if scale != 1.0:
                s = s * scale
            # Same op order as ops.attention.attend: causal fill first,
            # padding bias added after.
            if causal:
                s = jnp.where(allowed, s, NEG_1E4)
            s = s + pad_bias[None, :]

            m_prev = m_ref[h][:, :1]  # (Cp, 1)
            m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
            alpha = jnp.exp(m_prev - m_new)  # (Cp, 1)
            p = jnp.exp(s - m_new)  # (Cp, BK)
            l_new = l_ref[h][:, :1] * alpha + jnp.sum(p, axis=-1, keepdims=True)

            v_h = v_ref[0, :, h * head_dim : (h + 1) * head_dim]  # (BK, D)
            pv = jax.lax.dot_general(
                p.astype(v_h.dtype),
                v_h,
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # (Cp, D)
            acc_ref[h] = acc_ref[h] * alpha + pv
            m_ref[h] = jnp.broadcast_to(m_new, m_ref[h].shape)
            l_ref[h] = jnp.broadcast_to(l_new, l_ref[h].shape)

    @pl.when(kb == n_kb - 1)
    def _finalize():
        l = l_ref[...][:, :, :1]  # (H, Cp, 1)
        l = jnp.where(l == 0.0, 1.0, l)
        o_ref[0] = (acc_ref[...] / l).astype(o_ref.dtype)


def _decode_kernel_v2(
    # scalar prefetch: [0] = q_offset (global pos of row 0)
    scalars_ref,
    q_ref,  # (1, H, Cp, D)
    k_ref,  # (1, S, E)
    v_ref,  # (1, S, E)
    mask_ref,  # (1, 1, S) f32
    o_ref,  # (1, H, Cp, D)
    *,
    scale: float,
    causal: bool,
    n_heads: int,
    head_dim: int,
):
    """One program per batch row; K/V streamed whole; scores for ALL heads
    stacked (H, Cp, S) so the mask/softmax chain runs as a handful of big
    vector ops instead of H per-head chains (v1's failure mode: 256 programs
    x 12 head-loops of tiny VPU ops = issue-overhead bound; round-4
    production-pattern numbers: v1 0.549-0.593 ms vs v2 0.168 bf16 /
    0.366 fp32 vs XLA 0.761/0.848 at B=64,S=512,E=768,C=17). The op is
    memory-bound (17 FLOP/byte vs v5e's 240), so whole-cache streaming with
    one pass and VMEM-resident scores is ~speed-of-light."""
    wi = scalars_ref[0]
    k = k_ref[0]  # (S, E)
    v = v_ref[0]
    q = q_ref[0]  # (H, Cp, D)
    H, Cp, D = n_heads, q.shape[1], head_dim
    S = k.shape[0]

    s = jnp.stack([
        jax.lax.dot_general(
            q[h], k[:, h * D:(h + 1) * D], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        for h in range(H)
    ])  # (H, Cp, S) fp32, VMEM-resident
    if scale != 1.0:
        s = s * scale
    # Same op order as ops.attention.attend: causal fill first, padding
    # bias added after.
    if causal:
        qp = jax.lax.broadcasted_iota(jnp.int32, (H, Cp, S), 1) + wi
        kp = jax.lax.broadcasted_iota(jnp.int32, (H, Cp, S), 2)
        s = jnp.where(kp <= qp, s, NEG_1E4)
    km = mask_ref[0, 0].astype(jnp.float32)  # (S,)
    s = s + ((1.0 - km) * F32_MIN)[None, None, :]
    # clamp m to a finite floor so fully-masked rows (step-0 dummy slot
    # against an empty cache) yield 0, not NaN (same guard as v1)
    m = jnp.maximum(jnp.max(s, axis=-1, keepdims=True), _NEG_INIT)
    e = jnp.exp(s - m)
    l = jnp.sum(e, axis=-1, keepdims=True)
    l = jnp.where(l == 0.0, 1.0, l)
    p = (e / l).astype(v.dtype)  # probs cast to value dtype, like attend()
    o_ref[0] = jnp.stack([
        jax.lax.dot_general(
            p[h], v[:, h * D:(h + 1) * D], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        for h in range(H)
    ]).astype(o_ref.dtype)


def fused_cached_attention_v2(
    q: jnp.ndarray,
    cache_k: jnp.ndarray,
    cache_v: jnp.ndarray,
    *,
    scale: Optional[float],
    slot_mask: jnp.ndarray,
    q_offset=None,
    causal: bool = True,
    interpret: bool = False,
) -> jnp.ndarray:
    """q: (B, H, C, D); cache_k/v: (B, S, H*D) E-contiguous; slot_mask: bool
    (B, S). One grid program per batch row; the whole (S, E) K/V block
    streams through VMEM once (no (B,S,E)->(B,H,S,D) relayout copies — the
    XLA path's dominant HBM cost at batch). q_offset defaults to S - C
    (attend's Lk - Lq convention, so omitting it gives the same causal mask
    as the XLA fallback). Returns (B, H, C, D) in cache_v.dtype."""
    B, H, C, D = q.shape
    S, E = cache_k.shape[1], cache_k.shape[2]
    assert E == H * D, (E, H, D)
    scale = 1.0 if scale is None else float(scale)

    Cp = _round_up(C, 8)
    if Cp != C:
        q = jnp.pad(q, ((0, 0), (0, 0), (0, Cp - C), (0, 0)))
    if q_offset is None:
        q_offset = S - C
    scalars = jnp.asarray(q_offset, jnp.int32).reshape(1)
    mask_f = slot_mask.astype(jnp.float32)[:, None, :]  # (B, 1, S)

    kernel = functools.partial(
        _decode_kernel_v2,
        scale=scale,
        causal=causal,
        n_heads=H,
        head_dim=D,
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(B,),
            in_specs=[
                pl.BlockSpec((1, H, Cp, D), lambda b, s: (b, 0, 0, 0)),
                pl.BlockSpec((1, S, E), lambda b, s: (b, 0, 0)),
                pl.BlockSpec((1, S, E), lambda b, s: (b, 0, 0)),
                pl.BlockSpec((1, 1, S), lambda b, s: (b, 0, 0)),
            ],
            out_specs=pl.BlockSpec((1, H, Cp, D), lambda b, s: (b, 0, 0, 0)),
        ),
        out_shape=jax.ShapeDtypeStruct((B, H, Cp, D), cache_v.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=interpret,
    )(scalars, q, cache_k, cache_v, mask_f)
    return out[:, :, :C, :]


def _decode_kernel_v3(
    # scalar prefetch: [0] = valid length, [1] = q_offset (global pos of row 0)
    scalars_ref,
    q_ref,  # (1, H, Cp, D)
    k_ref,  # (1, BK, E)
    v_ref,  # (1, BK, E)
    mask_ref,  # (1, 1, BK) f32
    o_ref,  # (1, H, Cp, D)
    acc_ref,  # (H, Cp, D) f32 scratch
    m_ref,  # (H, Cp, 128) f32 scratch
    l_ref,  # (H, Cp, 128) f32 scratch
    *,
    scale: float,
    causal: bool,
    n_heads: int,
    head_dim: int,
    block_k: int,
    n_kb: int,
):
    """v2's head-stacked score math + v1's valid-prefix block skipping.

    The cache is append-only (write_index grows by C per env step), so on
    an average episode step only ~half the capacity holds attendable keys
    — but v2 streams all S slots every call (its whole-cache single-pass
    design). v3 restores v1's k-block grid: blocks past the valid prefix
    re-request the previous block in their BlockSpec index_map (no DMA)
    and skip compute, so per-step HBM traffic is O(written), not
    O(capacity). Unlike v1, the mask/online-softmax chain runs once over
    all heads stacked (H, Cp, BK) — v1's per-head chains of tiny VPU ops
    were why it lost in-context (see the module docstring). Exact softmax
    (fp32 online re-association), identical masking constants.
    """
    kb = pl.program_id(1)
    valid = scalars_ref[0]
    last_kb = jax.lax.div(jnp.maximum(valid - 1, 0), jnp.int32(block_k))

    @pl.when(kb == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)
        m_ref[...] = jnp.full_like(m_ref, _NEG_INIT)
        l_ref[...] = jnp.zeros_like(l_ref)

    @pl.when(kb <= last_kb)
    def _compute():
        H, Cp, D = n_heads, q_ref.shape[2], head_dim
        k = k_ref[0]  # (BK, E)
        v = v_ref[0]
        q = q_ref[0]  # (H, Cp, D)

        # No operand casts: bf16 inputs take one MXU pass with fp32
        # accumulation (same numerics contract as v2 — the dispatch gate
        # only routes here at default matmul precision).
        s = jnp.stack([
            jax.lax.dot_general(
                q[h],
                k[:, h * D:(h + 1) * D],
                (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            for h in range(H)
        ])  # (H, Cp, BK) fp32
        if scale != 1.0:
            s = s * scale
        # Same op order as ops.attention.attend: causal fill first, padding
        # bias added after.
        if causal:
            qp = jax.lax.broadcasted_iota(jnp.int32, (H, Cp, block_k), 1) + scalars_ref[1]
            kp = (
                jax.lax.broadcasted_iota(jnp.int32, (H, Cp, block_k), 2)
                + kb * block_k
            )
            s = jnp.where(kp <= qp, s, NEG_1E4)
        km = mask_ref[0, 0].astype(jnp.float32)  # (BK,)
        s = s + ((1.0 - km) * F32_MIN)[None, None, :]

        m_prev = m_ref[...][:, :, :1]  # (H, Cp, 1)
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
        alpha = jnp.exp(m_prev - m_new)
        p = jnp.exp(s - m_new)  # (H, Cp, BK)
        l_new = l_ref[...][:, :, :1] * alpha + jnp.sum(p, axis=-1, keepdims=True)

        pv = jnp.stack([
            jax.lax.dot_general(
                p[h].astype(v.dtype),
                v[:, h * D:(h + 1) * D],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            for h in range(H)
        ])  # (H, Cp, D) f32
        acc_ref[...] = acc_ref[...] * alpha + pv
        m_ref[...] = jnp.broadcast_to(m_new, m_ref.shape)
        l_ref[...] = jnp.broadcast_to(l_new, l_ref.shape)

    @pl.when(kb == n_kb - 1)
    def _finalize():
        l = l_ref[...][:, :, :1]
        l = jnp.where(l == 0.0, 1.0, l)
        o_ref[0] = (acc_ref[...] / l).astype(o_ref.dtype)


def fused_cached_attention_v3(
    q: jnp.ndarray,
    cache_k: jnp.ndarray,
    cache_v: jnp.ndarray,
    *,
    scale: Optional[float],
    slot_mask: jnp.ndarray,
    valid_len,
    q_offset=None,
    causal: bool = True,
    block_k: int = 128,
    interpret: bool = False,
) -> jnp.ndarray:
    """q: (B, H, C, D); cache_k/v: (B, S, H*D) E-contiguous; slot_mask bool
    (B, S); valid_len: traced int32 — k-blocks whose slots all sit at index
    >= valid_len are neither DMA'd nor computed (they must be causally or
    mask excluded: exp underflows to exactly 0 there, so skipping is
    bit-neutral). q_offset defaults to valid_len - C. Returns (B, H, C, D)
    in cache_v.dtype.

    STAGED, not in the production dispatch: ``ops.attention.cached_attend``
    routes to v2 or XLA only. The block-skipping O(written)-vs-O(capacity)
    saving measured SLOWER than v2 at the production pattern in the cache's
    production dtype (BENCH_r04 decode probe: bf16 0.285 ms v3 vs 0.177 v2;
    fp32 0.348 vs 0.359 — a wash) — the head-stacked layout's extra
    relayout outweighs the skipped DMA at S=512. Revisit if capacities grow
    past the architecture's 512 cap."""
    B, H, C, D = q.shape
    S, E = cache_k.shape[1], cache_k.shape[2]
    assert E == H * D, (E, H, D)
    scale = 1.0 if scale is None else float(scale)

    Cp = _round_up(C, 8)
    if Cp != C:
        q = jnp.pad(q, ((0, 0), (0, 0), (0, Cp - C), (0, 0)))
    bk = min(block_k, S)
    assert S % bk == 0, (S, bk)
    n_kb = S // bk

    if q_offset is None:
        q_offset = valid_len - C
    scalars = jnp.stack(
        [jnp.asarray(valid_len, jnp.int32), jnp.asarray(q_offset, jnp.int32)]
    )
    mask_f = slot_mask.astype(jnp.float32)[:, None, :]  # (B, 1, S)

    def _clamped(kb, scalars):
        last = jnp.maximum(
            jax.lax.div(jnp.maximum(scalars[0] - 1, 0), jnp.int32(bk)), 0
        )
        return jnp.minimum(kb, last)

    kernel = functools.partial(
        _decode_kernel_v3,
        scale=scale,
        causal=causal,
        n_heads=H,
        head_dim=D,
        block_k=bk,
        n_kb=n_kb,
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(B, n_kb),
            in_specs=[
                pl.BlockSpec((1, H, Cp, D), lambda b, kb, s: (b, 0, 0, 0)),
                pl.BlockSpec((1, bk, E), lambda b, kb, s: (b, _clamped(kb, s), 0)),
                pl.BlockSpec((1, bk, E), lambda b, kb, s: (b, _clamped(kb, s), 0)),
                pl.BlockSpec((1, 1, bk), lambda b, kb, s: (b, 0, _clamped(kb, s))),
            ],
            out_specs=pl.BlockSpec((1, H, Cp, D), lambda b, kb, s: (b, 0, 0, 0)),
            scratch_shapes=[
                pltpu.VMEM((H, Cp, D), jnp.float32),
                pltpu.VMEM((H, Cp, 128), jnp.float32),
                pltpu.VMEM((H, Cp, 128), jnp.float32),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((B, H, Cp, D), cache_v.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(scalars, q, cache_k, cache_v, mask_f)
    return out[:, :, :C, :]


# Conservative VMEM budget for one v2 program: K/V blocks + fp32 scores and
# their exp (2 live (H, Cp, S) fp32 values) + double-buffered streaming.
_V2_VMEM_BUDGET = 10 << 20


def _v2_fits(B, H, Cp, D, S, E, itemsize) -> bool:
    kv = 2 * S * E * itemsize
    scores = 2 * H * Cp * S * 4
    return 2 * kv + scores <= _V2_VMEM_BUDGET


def fused_cached_attention(
    q: jnp.ndarray,
    cache_k: jnp.ndarray,
    cache_v: jnp.ndarray,
    *,
    scale: Optional[float],
    slot_mask: jnp.ndarray,
    valid_len,
    q_offset=None,
    causal: bool = True,
    block_k: int = 128,
    interpret: bool = False,
) -> jnp.ndarray:
    """q: (B, H, C, D); cache_k/v: (B, S, H*D) E-contiguous; slot_mask: bool
    (B, S); valid_len: traced int32 — keys at slot >= valid_len are never
    attended (must be causally/mask excluded; asserted only in fallback
    tests). q_offset: global position of q row 0 (defaults to
    valid_len - C). Returns (B, H, C, D) in cache_v.dtype."""
    B, H, C, D = q.shape
    S, E = cache_k.shape[1], cache_k.shape[2]
    assert E == H * D, (E, H, D)
    scale = 1.0 if scale is None else float(scale)

    Cp = _round_up(C, 8)
    if Cp != C:
        q = jnp.pad(q, ((0, 0), (0, 0), (0, Cp - C), (0, 0)))
    bk = min(block_k, S)
    assert S % bk == 0, (S, bk)
    n_kb = S // bk

    if q_offset is None:
        q_offset = valid_len - C
    scalars = jnp.stack(
        [jnp.asarray(valid_len, jnp.int32), jnp.asarray(q_offset, jnp.int32)]
    )
    # (B, 1, S): TPU blocks constrain the last two dims; a (1, bk) block
    # over (B, S) is illegal for B > 1 (same workaround as flash_attention).
    mask_f = slot_mask.astype(jnp.float32)[:, None, :]

    def _clamped(kb, scalars):
        # Index maps receive (*grid_indices, *scalar_prefetch_args): clamp
        # the k-block to the last valid one so skipped iterations re-request
        # the same block (no DMA) while pl.when skips their compute.
        # lax.div (truncating), not //: jnp's floor-div emits sign-fixup ops
        # Mosaic rejects in index maps; valid >= 1 so they agree.
        last = jnp.maximum(
            jax.lax.div(jnp.maximum(scalars[0] - 1, 0), jnp.int32(bk)), 0
        )
        return jnp.minimum(kb, last)

    grid = (B, n_kb)
    kernel = functools.partial(
        _decode_kernel,
        scale=scale,
        causal=causal,
        n_heads=H,
        head_dim=D,
        block_k=bk,
        n_kb=n_kb,
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, H, Cp, D), lambda b, kb, s: (b, 0, 0, 0)),
                pl.BlockSpec((1, bk, E), lambda b, kb, s: (b, _clamped(kb, s), 0)),
                pl.BlockSpec((1, bk, E), lambda b, kb, s: (b, _clamped(kb, s), 0)),
                pl.BlockSpec((1, 1, bk), lambda b, kb, s: (b, 0, _clamped(kb, s))),
            ],
            out_specs=pl.BlockSpec((1, H, Cp, D), lambda b, kb, s: (b, 0, 0, 0)),
            scratch_shapes=[
                pltpu.VMEM((H, Cp, D), jnp.float32),
                pltpu.VMEM((H, Cp, 128), jnp.float32),
                pltpu.VMEM((H, Cp, 128), jnp.float32),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((B, H, Cp, D), cache_v.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(scalars, q, cache_k, cache_v, mask_f)
    return out[:, :, :C, :]


def xla_cached_attend(
    q: jnp.ndarray,
    cache_k: jnp.ndarray,
    cache_v: jnp.ndarray,
    *,
    scale: Optional[float],
    slot_mask: jnp.ndarray,
    q_offset=None,
    causal: bool = True,
) -> jnp.ndarray:
    """XLA oracle/fallback: reshape the E-contiguous cache to heads and run
    the reference-exact ops.attention.attend. Used on CPU (tests, strict
    parity) and for any shape the kernel doesn't accept."""
    from vima_tpu.ops.attention import attend

    B, H, C, D = q.shape
    S = cache_k.shape[1]
    k = cache_k.reshape(B, S, H, D).transpose(0, 2, 1, 3)
    v = cache_v.reshape(B, S, H, D).transpose(0, 2, 1, 3)
    return attend(
        q, k, v, scale=scale, causal=causal, q_offset=q_offset, key_mask=slot_mask
    )


def cached_attend(
    q: jnp.ndarray,
    cache_k: jnp.ndarray,
    cache_v: jnp.ndarray,
    *,
    scale: Optional[float],
    slot_mask: jnp.ndarray,
    valid_len=None,
    q_offset=None,
    causal: bool = True,
) -> jnp.ndarray:
    """Dispatching entry: fused Pallas kernel (v2) on TPU, XLA oracle
    elsewhere.

    q: (B, H, C, D); cache_k/v: (B, S, H*D); slot_mask: bool (B, S).
    valid_len: traced int32 — number of slots that may be attended (keys
    past it must be masked/causally excluded). None means all S slots.
    Only the v1 kernel (kept as the block-skipping reference) uses it; the
    dispatched v2 kernel streams the full capacity, which measured faster
    at every production shape (see _decode_kernel_v2 docstring).
    """
    from vima_tpu.ops import attention as attn_mod

    B, H, C, D = q.shape
    S, E = cache_k.shape[1], cache_k.shape[2]
    Cp = _round_up(C, 8)
    use_kernel = (
        attn_mod.decode_kernel_enabled()
        # Any elevated matmul precision (strict_parity_mode's 'highest',
        # 'float32', 'high', 'tensorfloat32', ...) means the caller wants
        # more than bf16-pass dots; the kernel's MXU dots are always
        # default (bf16-pass) precision, so only dispatch at default.
        and jax.config.jax_default_matmul_precision in (None, "default", "bfloat16")
        # at B=1 the XLA relayout copy is ~1 MB and the per-call pallas
        # overhead outweighs it (measured +0.07 ms/step at B=1 on v5e)
        and B >= 2
        and E == H * D
        and E % 128 == 0
        # No S alignment requirement: the v2 BlockSpecs cover the whole S
        # extent, which Mosaic pads/masks internally (prompt caches sit at
        # unaligned lengths like 36; round-4 lab: kernel ~0.00-0.08 ms vs
        # 0.17-0.20 ms for the XLA cross attend at B=64, Lp=36 — the XLA
        # path's batched 17x36x64 dots are as MXU-hostile as its relayout)
        and _v2_fits(B, H, Cp, D, S, E, cache_k.dtype.itemsize)
    )
    if use_kernel:
        try:
            use_kernel = jax.default_backend() == "tpu"
        except Exception:
            use_kernel = False
    if use_kernel:
        attn_mod._note_dispatch("decode", C, S)
        return fused_cached_attention_v2(
            q,
            cache_k,
            cache_v,
            scale=scale,
            slot_mask=slot_mask,
            q_offset=q_offset,
            causal=causal,
        )
    # Distinct counter key for PRODUCTION cached attends that fell back:
    # bench probes call xla_cached_attend directly (comparison arms), so
    # "xla-cached" unambiguously means the serving path routed off-kernel
    # (bench asserts zero of these on TPU; see bench._run_section).
    attn_mod._note_dispatch("xla-cached", C, S)
    return xla_cached_attend(
        q,
        cache_k,
        cache_v,
        scale=scale,
        slot_mask=slot_mask,
        q_offset=q_offset,
        causal=causal,
    )
