"""Fused decode-attention kernel vs the XLA oracle (interpret mode on CPU).

The kernel (ops/decode_attention.py) must reproduce ops.attention.attend's
masking semantics exactly: causal fill -1e4 (reference components.py:63),
fp32-min additive key padding, fp32 logits/softmax. Interpret mode emulates
TPU matmul precision (bf16 passes for fp32 inputs), so the tight-tolerance
checks run under jax.default_matmul_precision('highest').
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vima_tpu.ops.decode_attention import (
    fused_cached_attention,
    fused_cached_attention_v2,
    fused_cached_attention_v3,
    xla_cached_attend,
)


def _mk(rng, B=2, H=4, C=17, D=64, S=256):
    E = H * D
    q = jnp.asarray(rng.normal(size=(B, H, C, D)), jnp.float32)
    ck = jnp.asarray(rng.normal(size=(B, S, E)), jnp.float32)
    cv = jnp.asarray(rng.normal(size=(B, S, E)), jnp.float32)
    return q, ck, cv


def _fused(impl):
    """Uniform call shim: v2 takes no valid_len/block_k."""
    if impl == "v1":
        return fused_cached_attention
    if impl == "v3":
        return fused_cached_attention_v3

    def v2(q, ck, cv, *, valid_len=None, block_k=None, **kw):
        return fused_cached_attention_v2(q, ck, cv, **kw)

    return v2


@pytest.mark.parametrize("impl", ["v1", "v2", "v3"])
@pytest.mark.parametrize("write_index", [0, 5, 37, 239])
def test_causal_matches_oracle(rng, write_index, impl):
    q, ck, cv = _mk(rng)
    B, H, C, D = q.shape
    S = ck.shape[1]
    valid = write_index + C
    sm = np.zeros((B, S), bool)
    sm[:, :valid] = True
    sm[:, 3] = False  # masked dummy slot
    if write_index > 10:
        sm[0, 10:14] = False
    sm = jnp.asarray(sm)
    with jax.default_matmul_precision("highest"):
        out_k = _fused(impl)(
            q, ck, cv, scale=1 / np.sqrt(D), slot_mask=sm,
            valid_len=jnp.int32(valid), q_offset=jnp.int32(write_index),
            causal=True, interpret=True,
        )
        out_x = xla_cached_attend(
            q, ck, cv, scale=1 / np.sqrt(D), slot_mask=sm,
            q_offset=jnp.int32(write_index), causal=True,
        )
    np.testing.assert_allclose(np.asarray(out_k), np.asarray(out_x), atol=2e-5)


@pytest.mark.parametrize("Lp", [32, 36])  # 36: unaligned prompt length
@pytest.mark.parametrize("impl", ["v1", "v2", "v3"])
def test_cross_matches_oracle(rng, impl, Lp):
    if impl in ("v1", "v3") and Lp % 8:
        pytest.skip("blocked kernels require block-aligned S")
    q, _, _ = _mk(rng)
    B, H, C, D = q.shape
    E = H * D
    pk = jnp.asarray(rng.normal(size=(B, Lp, E)), jnp.float32)
    pv = jnp.asarray(rng.normal(size=(B, Lp, E)), jnp.float32)
    pm = np.ones((B, Lp), bool)
    pm[:, Lp - 12 :] = False
    pm = jnp.asarray(pm)
    with jax.default_matmul_precision("highest"):
        out_k = _fused(impl)(
            q, pk, pv, scale=1 / np.sqrt(D), slot_mask=pm,
            valid_len=jnp.int32(Lp), causal=False, interpret=True,
        )
        out_x = xla_cached_attend(
            q, pk, pv, scale=1 / np.sqrt(D), slot_mask=pm, causal=False
        )
    np.testing.assert_allclose(np.asarray(out_k), np.asarray(out_x), atol=2e-5)


@pytest.mark.parametrize("impl", ["v1", "v2", "v3"])
def test_block_skipping_is_exact(rng, impl):
    """Keys past valid_len are causally/mask-excluded (exp underflows to
    exactly 0), so skipping whole k-blocks must be bit-neutral vs attending
    over the full capacity."""
    q, ck, cv = _mk(rng)
    B, H, C, D = q.shape
    S = ck.shape[1]
    wi = 5
    valid = wi + C  # 22 of 256 slots -> only k-block 0 is live
    sm = np.zeros((B, S), bool)
    sm[:, :valid] = True
    sm = jnp.asarray(sm)
    with jax.default_matmul_precision("highest"):
        out_k = _fused(impl)(
            q, ck, cv, scale=1 / np.sqrt(D), slot_mask=sm,
            valid_len=jnp.int32(valid), q_offset=jnp.int32(wi),
            causal=True, interpret=True,
        )
        out_x = xla_cached_attend(
            q, ck, cv, scale=1 / np.sqrt(D), slot_mask=sm,
            q_offset=jnp.int32(wi), causal=True,
        )
    np.testing.assert_allclose(np.asarray(out_k), np.asarray(out_x), atol=2e-5)


@pytest.mark.parametrize("impl", ["v1", "v2", "v3"])
def test_bf16_cache(rng, impl):
    q, ck, cv = _mk(rng)
    B, H, C, D = q.shape
    S = ck.shape[1]
    ck, cv = ck.astype(jnp.bfloat16), cv.astype(jnp.bfloat16)
    wi = 37
    valid = wi + C
    sm = np.zeros((B, S), bool)
    sm[:, :valid] = True
    sm = jnp.asarray(sm)
    with jax.default_matmul_precision("highest"):
        out_k = _fused(impl)(
            q, ck, cv, scale=1 / np.sqrt(D), slot_mask=sm,
            valid_len=jnp.int32(valid), q_offset=jnp.int32(wi),
            causal=True, interpret=True,
        )
        out_x = xla_cached_attend(
            q, ck, cv, scale=1 / np.sqrt(D), slot_mask=sm,
            q_offset=jnp.int32(wi), causal=True,
        )
    assert out_k.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(out_k, np.float32), np.asarray(out_x, np.float32), atol=3e-2
    )


@pytest.mark.parametrize("impl", ["v1", "v2", "v3"])
def test_step0_all_masked_row_is_finite(rng, impl):
    """Step 0's dummy action slot: its row attends only to masked keys; the
    output must stay finite (it is never consumed downstream), and the real
    rows must match the oracle."""
    q, ck, cv = _mk(rng)
    B, H, C, D = q.shape
    S = ck.shape[1]
    sm = np.zeros((B, S), bool)
    sm[:, 1:C] = True  # slot 0 (dummy action) masked forever
    sm = jnp.asarray(sm)
    with jax.default_matmul_precision("highest"):
        out_k = _fused(impl)(
            q, ck, cv, scale=1 / np.sqrt(D), slot_mask=sm,
            valid_len=jnp.int32(C), q_offset=jnp.int32(0),
            causal=True, interpret=True,
        )
        out_x = xla_cached_attend(
            q, ck, cv, scale=1 / np.sqrt(D), slot_mask=sm,
            q_offset=jnp.int32(0), causal=True,
        )
    assert bool(jnp.all(jnp.isfinite(out_k)))
    np.testing.assert_allclose(
        np.asarray(out_k)[:, :, 1:], np.asarray(out_x)[:, :, 1:], atol=2e-5
    )
