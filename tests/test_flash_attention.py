"""Pallas fused-attention kernel vs the XLA attend path (interpret mode on
CPU; the same kernel runs compiled on TPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vima_tpu.ops import attention
from vima_tpu.ops.flash_attention import fused_attention


def _mk(rng, B, H, Lq, Lk, D):
    q = rng.normal(size=(B, H, Lq, D)).astype(np.float32)
    k = rng.normal(size=(B, H, Lk, D)).astype(np.float32)
    v = rng.normal(size=(B, H, Lk, D)).astype(np.float32)
    return jnp.asarray(q), jnp.asarray(k), jnp.asarray(v)


def xla_ref(q, k, v, **kw):
    prev = attention.flash_enabled()
    attention.set_flash_enabled(False)
    try:
        return attention.attend(q, k, v, **kw)
    finally:
        attention.set_flash_enabled(prev)


@pytest.mark.parametrize(
    "case",
    ["plain", "causal", "causal_offset", "key_mask", "bias", "bias_mask", "ragged"],
)
def test_fused_matches_xla(case):
    rng = np.random.default_rng(hash(case) % 2**32)
    B, H, D = 2, 3, 32
    Lq, Lk = 128, 128
    kw_f, kw_x = {}, {}
    if case == "plain":
        pass
    elif case == "causal":
        kw_f = kw_x = dict(causal=True)
    elif case == "causal_offset":
        Lq, Lk = 32, 256
        kw_f = kw_x = dict(causal=True, q_offset=64)
    elif case == "key_mask":
        mask = np.ones((B, Lk), bool)
        mask[0, 100:] = False
        mask[1, 50:70] = False
        kw_f = kw_x = dict(key_mask=jnp.asarray(mask))
    elif case == "bias":
        bias = rng.normal(size=(1, H, Lq, Lk)).astype(np.float32)
        kw_f = kw_x = dict(bias=jnp.asarray(bias))
    elif case == "bias_mask":
        bias = rng.normal(size=(1, H, Lq, Lk)).astype(np.float32)
        mask = np.ones((B, Lk), bool)
        mask[1, 90:] = False
        kw_f = kw_x = dict(bias=jnp.asarray(bias), key_mask=jnp.asarray(mask))
    elif case == "ragged":
        Lq, Lk = 100, 187  # forces padding
        mask = np.ones((B, Lk), bool)
        mask[0, 150:] = False
        kw_f = kw_x = dict(key_mask=jnp.asarray(mask))

    q, k, v = _mk(rng, B, H, Lq, Lk, D)
    scale = 1.0 / np.sqrt(D)
    ref = xla_ref(q, k, v, scale=scale, **kw_x)
    out = fused_attention(q, k, v, scale=scale, mxu_bf16=False, interpret=True, **kw_f)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=2e-5)


def test_fused_batched_bias():
    """bias with a real batch dim (B > 1) exercises the b-indexed block map."""
    rng = np.random.default_rng(42)
    B, H, Lq, Lk, D = 3, 2, 64, 128, 32
    q, k, v = _mk(rng, B, H, Lq, Lk, D)
    bias = jnp.asarray(rng.normal(size=(B, H, Lq, Lk)).astype(np.float32))
    mask = np.ones((B, Lk), bool)
    mask[2, 77:] = False
    scale = 1.0 / np.sqrt(D)
    ref = xla_ref(q, k, v, scale=scale, bias=bias, key_mask=jnp.asarray(mask))
    out = fused_attention(
        q, k, v, scale=scale, bias=bias, key_mask=jnp.asarray(mask),
        mxu_bf16=False, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=2e-5)


def test_fused_bf16_values():
    """bf16 q/k/v with fp32 logits: matches the XLA path bit-for-bit."""
    rng = np.random.default_rng(7)
    B, H, Lq, Lk, D = 2, 2, 128, 128, 32
    q, k, v = _mk(rng, B, H, Lq, Lk, D)
    q, k, v = q.astype(jnp.bfloat16), k.astype(jnp.bfloat16), v.astype(jnp.bfloat16)
    scale = 1.0 / np.sqrt(D)
    ref = xla_ref(q, k, v, scale=scale, causal=True)
    out = fused_attention(q, k, v, scale=scale, causal=True, interpret=True)
    assert out.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32), atol=2e-2, rtol=2e-2
    )


def test_fused_traced_q_offset():
    """q_offset arrives via scalar prefetch — must work traced (KV-cache)."""
    rng = np.random.default_rng(0)
    B, H, D = 1, 2, 32
    Lq, Lk = 16, 128
    q, k, v = _mk(rng, B, H, Lq, Lk, D)
    mask = np.zeros((B, Lk), bool)
    mask[:, :48] = True
    mask_j = jnp.asarray(mask)
    scale = 1.0 / np.sqrt(D)

    def f(off):
        return fused_attention(
            q, k, v, scale=scale, causal=True, q_offset=off, key_mask=mask_j,
            mxu_bf16=False, interpret=True,
        )

    out = jax.jit(f)(jnp.int32(32))
    ref = xla_ref(q, k, v, scale=scale, causal=True, q_offset=32, key_mask=mask_j)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=2e-5)


def test_fused_mxu_bf16_matches_rounded_xla():
    """The production TPU config (mxu_bf16=True, the default) reproduces
    XLA's *default* matmul precision semantics: fp32 operands rounded to
    bf16, one MXU pass, fp32 accumulation. Reference: the XLA attend over
    pre-rounded operands (probs rounding differs by accumulation order, so
    the tolerance is bf16-scale rather than exact)."""
    rng = np.random.default_rng(123)
    B, H, Lq, Lk, D = 2, 3, 128, 128, 32
    q, k, v = _mk(rng, B, H, Lq, Lk, D)
    scale = 1.0 / np.sqrt(D)

    def rd(x):
        return x.astype(jnp.bfloat16).astype(jnp.float32)

    ref = xla_ref(rd(q), rd(k), rd(v), scale=scale, causal=True)
    out = fused_attention(q, k, v, scale=scale, causal=True, interpret=True)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), atol=5e-3, rtol=5e-3
    )


def test_flash_gate_respects_strict_parity(monkeypatch):
    """strict_parity_mode (highest matmul precision) must route every shape
    to the XLA path — the fused kernel's bf16-rounded MXU dots would
    silently degrade a parity run. The backend is monkeypatched to 'tpu' so
    the assertion exercises the precision gate, not the backend gate (on
    the CPU test host _flash_eligible would return False regardless)."""
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    q = jnp.zeros((1, 1, 128, 32), jnp.float32)
    prev = attention.flash_enabled()
    attention.set_flash_enabled(True)  # round-4 default is OFF (XLA faster)
    try:
        # sanity: the shape IS flash-eligible at default precision on "tpu"
        assert attention._flash_eligible(q, q, None)
        with attention.strict_parity_mode():
            assert not attention._flash_eligible(q, q, None)
        # intermediate elevated precisions must also route to XLA
        with jax.default_matmul_precision("tensorfloat32"):
            assert not attention._flash_eligible(q, q, None)
    finally:
        attention.set_flash_enabled(prev)


def test_decode_gate_respects_strict_parity(monkeypatch):
    """Same precision gate for the decode kernel's cached_attend dispatch:
    under elevated matmul precision the fused v2 kernel must not be used."""
    from vima_tpu.ops import decode_attention as da

    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    calls = []
    monkeypatch.setattr(
        da, "fused_cached_attention_v2", lambda *a, **k: calls.append("kernel")
    )
    monkeypatch.setattr(da, "xla_cached_attend", lambda *a, **k: calls.append("xla"))
    B, H, C, D, S = 4, 12, 17, 64, 512
    q = jnp.zeros((B, H, C, D), jnp.float32)
    ck = jnp.zeros((B, S, H * D), jnp.float32)
    sm = jnp.ones((B, S), bool)
    with attention.strict_parity_mode():
        da.cached_attend(q, ck, ck, scale=1.0, slot_mask=sm, q_offset=0)
    assert calls == ["xla"]
    da.cached_attend(q, ck, ck, scale=1.0, slot_mask=sm, q_offset=0)
    assert calls == ["xla", "kernel"]


@pytest.mark.parametrize("flavor", ["causal", "t5_bias"])
def test_flash_grad_matches_xla(flavor, monkeypatch):
    """Differentiating through the flash dispatch must work (pallas_call has
    no JVP; attention._flash_attend supplies a custom_vjp whose backward is
    the XLA path) and match the all-XLA gradients. Exercises the BC-training
    path on TPU, where T5/decoder full-sequence attends hit the flash gate."""
    import functools as ft

    from vima_tpu.ops import flash_attention as fa

    # run the kernel forward in interpret mode + exact fp32 dots on CPU
    monkeypatch.setattr(
        fa,
        "fused_attention",
        ft.partial(fa.fused_attention, interpret=True, mxu_bf16=False),
    )

    rng = np.random.default_rng(11)
    B, H, Lq, Lk, D = 2, 2, 64, 64, 16
    q, k, v = _mk(rng, B, H, Lq, Lk, D)
    mask = np.ones((B, Lk), bool)
    mask[1, 50:] = False
    mask_j = jnp.asarray(mask)
    scale = None if flavor == "t5_bias" else 1.0 / np.sqrt(D)
    bias = (
        jnp.asarray(rng.normal(size=(1, H, Lq, Lk)).astype(np.float32))
        if flavor == "t5_bias"
        else None
    )
    causal = flavor == "causal"

    def loss_flash(q, k, v, bias):
        out = attention._flash_attend((scale, causal, None), q, k, v, mask_j, bias)
        return (out**2).sum()

    def loss_xla(q, k, v, bias):
        out = attention._xla_attend(
            q, k, v, scale=scale, causal=causal, q_offset=None,
            key_mask=mask_j, bias=bias,
        )
        return (out**2).sum()

    argnums = (0, 1, 2, 3) if bias is not None else (0, 1, 2)
    gf = jax.grad(loss_flash, argnums=argnums)(q, k, v, bias)
    gx = jax.grad(loss_xla, argnums=argnums)(q, k, v, bias)
    for a, b in zip(gf, gx):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4, rtol=1e-4)
