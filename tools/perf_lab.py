#!/usr/bin/env python
"""TPU perf lab: isolated timings of the cached-rollout hot paths.

Timing method: two chained-scan lengths (n1, n2) compiled separately; the
per-iteration time is the difference divided by (n2 - n1). This cancels
the tunnel RTT, dispatch, and any constant prologue exactly (the tunneled
TPU's RTT is ~30 ms and volatile — see CLAUDE.md). Inputs vary with the
carry so XLA cannot CSE iterations.

Usage: python tools/perf_lab.py [experiment ...]
Experiments: step, chunk, vit, misc, kernel (default: all)
"""

from __future__ import annotations

import functools
import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).parent.parent))

B = int(__import__("os").environ.get("LAB_B", "64"))
N_OBJS = 8
VIEWS = ("front", "top")
MODEL = __import__("os").environ.get("LAB_MODEL", "vima-200m")
N1, N2 = 6, 26
REPS = 5


def timed(make_fn, args, label, n1=N1, n2=N2, reps=REPS):
    """make_fn(n) -> jitted callable over args returning a fetchable scalar.

    Pass every large array (params, states, caches) through ``args`` — a
    closure capture would inline it into the HLO as a literal constant
    (multi-GB uploads per compile on the tunneled TPU; jax warns at 3.3 GB
    for the 200M params alone)."""
    f1, f2 = make_fn(n1), make_fn(n2)
    float(f1(*args))
    float(f2(*args))
    d = []
    for _ in range(reps):
        t0 = time.perf_counter()
        float(f1(*args))
        t1 = time.perf_counter()
        float(f2(*args))
        t2 = time.perf_counter()
        d.append(((t2 - t1) - (t1 - t0)) / (n2 - n1) * 1e3)
    p50 = float(np.percentile(d, 50))
    print(f"{label}: {p50:.3f} ms/iter  (p90 {float(np.percentile(d, 90)):.3f})")
    return p50


def _policy(dtype):
    import jax.numpy as jnp
    from vima_tpu.ckpt.registry import get_config
    from vima_tpu.policy import init_params
    from vima_tpu.ckpt.convert import cast_params

    pol = get_config(MODEL).build(dtype=dtype)
    params = init_params(get_config(MODEL).build())
    if dtype == jnp.bfloat16:
        params = cast_params(params, jnp.bfloat16)
    return pol, params


def _step_inputs(rng):
    import jax.numpy as jnp

    objects = {
        "cropped_img": {
            v: jnp.asarray(rng.integers(3, 255, size=(B, N_OBJS, 3, 32, 32)), jnp.uint8)
            for v in VIEWS
        },
        "bbox": {
            v: jnp.asarray(rng.integers(5, 120, size=(B, N_OBJS, 4)), jnp.int32)
            for v in VIEWS
        },
        "mask": {v: jnp.ones((B, N_OBJS), bool) for v in VIEWS},
    }
    ee = jnp.zeros((B,), jnp.int32)
    return objects, ee


def _encode(pol, params, capacity, cache_dtype=None):
    import jax, jax.numpy as jnp
    from vima_tpu.bridge.prompt_prep import prompt_gather_indices
    from vima_tpu.policy.rollout import encode_prompt

    rng = np.random.default_rng(0)
    PW = 20
    token_types = [[0] * PW + [1] for _ in range(B)]
    wb = jnp.asarray(rng.integers(0, pol.vocab_size, size=(PW * B,)))
    ib = {
        "cropped_img": {
            v: jnp.asarray(rng.integers(3, 255, size=(B, N_OBJS, 3, 32, 32)), jnp.uint8)
            for v in VIEWS
        },
        "bbox": {v: jnp.asarray(rng.integers(5, 120, size=(B, N_OBJS, 4)), jnp.int32) for v in VIEWS},
        "mask": {v: np.ones((B, N_OBJS), bool) for v in VIEWS},
    }
    idx, pmask = prompt_gather_indices(token_types, PW * B, ib["mask"], N_OBJS * 2)
    gather = {"idx": jnp.asarray(idx), "mask": jnp.asarray(pmask)}
    ib["mask"] = {v: jnp.asarray(m) for v, m in ib["mask"].items()}
    _, state = encode_prompt(pol, params, wb, ib, gather, capacity, cache_dtype)
    return state


def exp_step():
    """Full rollout step at B=64, fp32 vs bf16, capacity 512."""
    import jax, jax.numpy as jnp
    from vima_tpu.policy.rollout import _rollout_step_core

    rng = np.random.default_rng(1)
    objects, ee = _step_inputs(rng)

    def make(pol):
        def mk(n):
            @jax.jit
            def f(params, state0, objects, ee):
                def body(carry, _):
                    state, acc = carry
                    e = (ee + acc % 2) % 2
                    actions, state = _rollout_step_core(pol, params, state, objects, e)
                    return (state, acc + actions["pose0_position"][:, 0].sum()), ()

                (_, acc), _ = jax.lax.scan(body, (state0, jnp.int32(0)), None, length=n)
                return acc

            return f

        return mk

    for dtype_name, dtype in (("fp32", jnp.float32), ("bf16", jnp.bfloat16)):
        pol, params = _policy(dtype)
        state = _encode(pol, params, 512)
        timed(
            make(pol), (params, state, objects, ee),
            f"full step B={B} {dtype_name} cap512",
        )


def exp_chunk():
    """Decoder chunk only (no ViT/action) through step_chunk, 11 layers."""
    import jax, jax.numpy as jnp

    rng = np.random.default_rng(2)
    C = 1 + 2 * N_OBJS

    def make(pol):
        def mk(n):
            @jax.jit
            def f(params, state0, chunk, pos):
                def body(carry, _):
                    st, x, acc = carry
                    out, nk, nv = pol.apply(
                        params, x, pos, st.prompt_k, st.prompt_v, st.prompt_mask,
                        st.cache_k, st.cache_v, st.slot_mask, st.write_index,
                        method="step_chunk",
                    )
                    st = st.replace(cache_k=nk, cache_v=nv)
                    return (st, out.astype(x.dtype), acc + out[0, -1, 0].astype(jnp.float32)), ()

                (_, _, acc), _ = jax.lax.scan(
                    body, (state0, chunk, jnp.float32(0)), None, length=n
                )
                return acc

            return f

        return mk

    for dtype_name, dtype in (("fp32", jnp.float32), ("bf16", jnp.bfloat16)):
        pol, params = _policy(dtype)
        for cap in (512, 128):
            state = _encode(pol, params, cap)
            state = state.replace(
                slot_mask=jnp.ones_like(state.slot_mask),
                write_index=jnp.int32(cap - C),
            )
            chunk = jnp.asarray(rng.normal(size=(B, C, pol.embed_dim)), dtype)
            pos = jnp.broadcast_to(jnp.arange(C, dtype=jnp.int32)[None], (B, C))
            timed(
                make(pol), (params, state, chunk, pos),
                f"decoder chunk x11L B={B} {dtype_name} cap{cap}",
            )


def exp_vit():
    """Obs path only: ObjEncoder (ViT over crops) + fusion at B=64."""
    import jax, jax.numpy as jnp

    rng = np.random.default_rng(3)
    objects, ee = _step_inputs(rng)

    def make(pol):
        def mk(n):
            @jax.jit
            def f(params, objects, ee):
                def body(acc, _):
                    obj = jax.tree_util.tree_map(
                        lambda x: x + acc.astype(jnp.uint8) if x.dtype == jnp.uint8 else x,
                        objects,
                    )
                    tok, mask = pol.apply(params, obj, ee, method="forward_obs_token")
                    return acc + tok[0, 0, 0].astype(jnp.float32), ()

                acc, _ = jax.lax.scan(body, jnp.float32(0), None, length=n)
                return acc

            return f

        return mk

    for dtype_name, dtype in (("fp32", jnp.float32), ("bf16", jnp.bfloat16)):
        pol, params = _policy(dtype)
        timed(make(pol), (params, objects, ee), f"obs(ViT) B={B} {dtype_name}")


def exp_misc():
    """Action embed + decode only at B=64."""
    import jax, jax.numpy as jnp
    from vima_tpu.policy.rollout import zero_actions
    from vima_tpu.nn.action import action_mode
    from vima_tpu.policy.base import ACTION_DIMS

    def make(pol, actions0):
        def mk(n):
            @jax.jit
            def f(params, tok):
                def body(carry, _):
                    actions, acc = carry
                    emb = pol.apply(params, actions, method="forward_action_token")
                    logits = pol.apply(params, tok + emb, method="forward_action_decoder")
                    actions = {
                        k: v.astype(jnp.int32)
                        for k, v in action_mode(
                            logits, {k: list(v) for k, v in ACTION_DIMS.items()}
                        ).items()
                    }
                    return (actions, acc + actions["pose0_position"][:, 0].sum()), ()

                (_, acc), _ = jax.lax.scan(body, (actions0, jnp.int32(0)), None, length=n)
                return acc

            return f

        return mk

    for dtype_name, dtype in (("fp32", jnp.float32), ("bf16", jnp.bfloat16)):
        pol, params = _policy(dtype)
        actions0 = zero_actions(B)
        tok = jnp.zeros((B, pol.embed_dim), dtype)
        timed(make(pol, actions0), (params, tok), f"action embed+decode B={B} {dtype_name}")


def exp_kernel():
    """Decode kernel vs XLA oracle at the production chunk shape."""
    import jax, jax.numpy as jnp
    from vima_tpu.ops.decode_attention import fused_cached_attention, xla_cached_attend

    rng = np.random.default_rng(4)
    H, D, S, C = 12, 64, 512, 17
    E = H * D
    sm = jnp.ones((B, S), bool)
    wi = jnp.int32(S - C)

    def make(fn, q):
        def mk(n):
            @jax.jit
            def f(q, k, v):
                def body(c, _):
                    out = fn(c, k, v)
                    return (out[:, :, :C, :] * 0.999).astype(q.dtype) + c * 0.001, ()

                out, _ = jax.lax.scan(body, q, None, length=n)
                return out.sum()

            return f

        return mk

    for dtn, dt in (("fp32", jnp.float32), ("bf16", jnp.bfloat16)):
        q = jnp.asarray(rng.normal(size=(B, H, C, D)), dt)
        ck = jnp.asarray(rng.normal(size=(B, S, E)), dt)
        cv = jnp.asarray(rng.normal(size=(B, S, E)), dt)
        kfn = lambda c, k, v: fused_cached_attention(
            c, k, v, scale=1 / 8.0, slot_mask=sm, valid_len=wi + C, q_offset=wi, causal=True
        )
        xfn = lambda c, k, v: xla_cached_attend(
            c, k, v, scale=1 / 8.0, slot_mask=sm, q_offset=wi, causal=True
        )
        kfn_e = lambda c, k, v: fused_cached_attention(
            c, k, v, scale=1 / 8.0, slot_mask=sm, valid_len=jnp.int32(2 * C),
            q_offset=jnp.int32(C), causal=True,
        )
        timed(make(kfn, q), (q, ck, cv), f"decode-attn kernel {dtn} full-512")
        timed(make(xfn, q), (q, ck, cv), f"decode-attn xla    {dtn} full-512")
        timed(make(kfn_e, q), (q, ck, cv), f"decode-attn kernel {dtn} valid=34")


def exp_vitpack():
    """Crop-packed ViT attention (attn_pack) vs unpacked, full obs path."""
    import jax, jax.numpy as jnp
    from vima_tpu.ckpt.registry import get_config
    from vima_tpu.policy import init_params
    from vima_tpu.ckpt.convert import cast_params
    import dataclasses

    rng = np.random.default_rng(7)
    objects, ee = _step_inputs(rng)

    def make(pol):
        def mk(n):
            @jax.jit
            def f(params, objects, ee):
                def body(acc, _):
                    obj = jax.tree_util.tree_map(
                        lambda x: x + acc.astype(jnp.uint8) if x.dtype == jnp.uint8 else x,
                        objects,
                    )
                    tok, mask = pol.apply(params, obj, ee, method="forward_obs_token")
                    return acc + tok[0, 0, 0].astype(jnp.float32), ()

                acc, _ = jax.lax.scan(body, jnp.float32(0), None, length=n)
                return acc

            return f

        return mk

    for dtype_name, dtype in (("fp32", jnp.float32), ("bf16", jnp.bfloat16)):
        pol, params = _policy(dtype)
        for pack in (1, 8, 16, 32):
            pol2 = dataclasses.replace(pol, vit_attn_pack=pack)
            timed(make(pol2), (params, objects, ee), f"obs(ViT) pack={pack} B={B} {dtype_name}")


def exp_xattn():
    """Cross-attend (prompt KV, Lk=36) alone: XLA fallback vs v2 kernel."""
    import jax, jax.numpy as jnp
    from vima_tpu.ops.decode_attention import (
        fused_cached_attention_v2, xla_cached_attend,
    )

    rng = np.random.default_rng(5)
    H, D, C = 12, 64, 17
    E = H * D
    for Lp in (36, 128):
        sm = jnp.ones((B, Lp), bool)
        for dtn, dt in (("fp32", jnp.float32), ("bf16", jnp.bfloat16)):
            q = jnp.asarray(rng.normal(size=(B, H, C, D)), dt)
            pk = jnp.asarray(rng.normal(size=(B, Lp, E)), dt)
            pv = jnp.asarray(rng.normal(size=(B, Lp, E)), dt)

            def make(fn):
                def mk(n):
                    @jax.jit
                    def f(q, pk, pv):
                        def body(c, _):
                            out = fn(c, pk, pv)
                            return (out * 0.999 + c * 0.001).astype(q.dtype), ()

                        out, _ = jax.lax.scan(body, q, None, length=n)
                        return out.sum()

                    return f

                return mk

            xfn = lambda c, k, v: xla_cached_attend(
                c, k, v, scale=1 / 8.0, slot_mask=sm, causal=False
            )
            timed(make(xfn), (q, pk, pv), f"xattn xla    {dtn} Lp={Lp} B={B}")
            try:
                kfn = lambda c, k, v: fused_cached_attention_v2(
                    c, k, v, scale=1 / 8.0, slot_mask=sm, causal=False
                )
                timed(make(kfn), (q, pk, pv), f"xattn kernel {dtn} Lp={Lp} B={B}")
            except Exception as e:
                print(f"xattn kernel {dtn} Lp={Lp}: FAILED {type(e).__name__}: {e}")


def exp_mlponly():
    """The decoder's dense stack alone (no attends): 12x(qkv+proj+GEGLU)."""
    import jax, jax.numpy as jnp

    rng = np.random.default_rng(6)
    C = 1 + 2 * N_OBJS
    E = 768

    for dtn, dt in (("fp32", jnp.float32), ("bf16", jnp.bfloat16)):
        x0 = jnp.asarray(rng.normal(size=(B, C, E)), dt)
        Ws = [
            tuple(
                jnp.asarray(rng.normal(size=shp) * 0.02, dt)
                for shp in ((E, 3 * E), (E, E), (E, 4 * E), (4 * E, E), (E, 4 * E))
            )
            for _ in range(12)
        ]

        def mk(n):
            @jax.jit
            def f(x, Ws):
                from vima_tpu.ops.layers import gelu_exact

                def body(x, _):
                    y = x
                    for qkv, proj, fc, out_w, gate in Ws:
                        h = y @ qkv
                        q, k, v = jnp.split(h, 3, axis=-1)
                        y = (q + k + v) @ proj + y
                        n1 = gelu_exact(y @ fc) * (y @ gate)
                        y = n1 @ out_w + y
                    return (y * 0.999 + x * 0.001).astype(x.dtype), ()

                y, _ = jax.lax.scan(body, x, None, length=n)
                return y.sum()

            return f

        timed(mk, (x0, Ws), f"dense stack 12L {dtn} B={B}")


def main():
    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        str(pathlib.Path(__file__).parent.parent / ".cache" / "jax_comp_cache"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    which = sys.argv[1:] or ["all"]
    print(f"device {jax.devices()[0].device_kind}")
    table = {
        "step": exp_step,
        "chunk": exp_chunk,
        "vit": exp_vit,
        "misc": exp_misc,
        "kernel": exp_kernel,
        "xattn": exp_xattn,
        "vitpack": exp_vitpack,
        "mlponly": exp_mlponly,
    }
    for name, fn in table.items():
        if "all" in which or name in which:
            print(f"--- {name}")
            fn()


if __name__ == "__main__":
    main()
