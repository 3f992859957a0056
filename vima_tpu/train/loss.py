"""Behavior-cloning loss for all four policy families.

The reference ships inference only — its 650K-trajectory BC training ran in
an unreleased external harness (survey §1, model-card.md:27). This module
supplies the TPU-native training path: teacher-forced decoder over expert
episodes, cross-entropy on every discretized action component, masked over
episode padding.

Family dispatch: the flagship consumes cropped-object tokens + an object
mask (``batch["objects"]``, 5-arg parity ``__call__``); the baselines
consume raw-RGB frames (``batch["rgb"]``, 4-arg ``__call__``, all obs
tokens valid — reference vima_gato_policy.py:120-191 et al.).
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp

from vima_tpu.policy.base import ACTION_DIMS


def assemble_prompt_batch(policy, params_rngs_apply, batch):
    """Per-sample prompt gather: word + asset-object embeddings -> (B, Lp, d)."""
    apply = params_rngs_apply
    word_embs = apply("embed_prompt_words", batch["prompt_word_ids"])  # (B, Lw, d)
    img_embs = apply("embed_prompt_images", batch["prompt_assets"])  # (B, A, Qp, d) or (B, A*Qp, d)
    B = word_embs.shape[0]
    d = word_embs.shape[-1]
    img_flat = img_embs.reshape(B, -1, d)
    src = jnp.concatenate(
        [word_embs, img_flat, jnp.zeros((B, 1, d), word_embs.dtype)], axis=1
    )
    idx = batch["prompt_gather_idx"]  # (B, Lp)
    return jnp.take_along_axis(src, idx[..., None], axis=1)


def bc_loss(
    policy,
    params,
    batch: Dict[str, Any],
    *,
    rngs: Dict[str, jnp.ndarray] | None = None,
    train: bool = True,
):
    """Returns (loss, metrics).

    batch:
      objects         per-view dicts, leading (B, T)
      ee              (B, T) int
      prompt_word_ids (B, Lw) int
      prompt_assets   policy-specific prompt asset pytree
      prompt_gather_idx  (B, Lp) int — per-sample gather into
                         [words | asset objs | zero]
      prompt_mask     (B, Lp) bool
      actions         dict key -> (B, T, n_components) int32 targets
      action_mask     (B, T) bool — valid env steps
    """
    det = not train

    def apply(method, *a, **kw):
        return policy.apply(params, *a, method=method, rngs=rngs or {}, **kw)

    prompt_tokens = assemble_prompt_batch(policy, apply, batch)
    prompt = apply(
        "encode_prompt_assembled", prompt_tokens, batch["prompt_mask"], deterministic=det
    )  # (B, Lp, E)

    flagship = "objects" in batch
    if flagship:
        obs_tok, obs_mask = apply("forward_obs_token", batch["objects"], batch["ee"])
    else:
        # raw-RGB families: (B, T, Q, E) (gato/flamingo) or (B, T, E) (gpt)
        obs_tok = apply("forward_obs_token", batch["rgb"], batch["ee"])
        obs_mask = None
    # Teacher forcing: actions 0..T-2 feed the stream (action t sits after
    # obs-group t); predictions at obs-group ends supervise action t.
    T = obs_tok.shape[1]
    shifted = {k: v[:, : T - 1] for k, v in batch["actions"].items()}
    act_emb = apply("forward_action_token", shifted)  # (B, T-1, E)

    obs_sf = jnp.moveaxis(obs_tok, 1, 0)  # stream-first (T, B, [Q,] E)
    if flagship:
        pred = apply(
            "__call__",
            obs_sf,
            obs_mask.transpose(1, 0, 2),
            act_emb.transpose(1, 0, 2),
            prompt.transpose(1, 0, 2),
            batch["prompt_mask"],
        ).transpose(1, 0, 2)  # (B, T, E)
    else:
        pred = apply(
            "__call__",
            obs_sf,
            act_emb.transpose(1, 0, 2),
            prompt.transpose(1, 0, 2),
            batch["prompt_mask"],
        ).transpose(1, 0, 2)  # (B, T, E)

    logits = apply("forward_action_decoder", pred)  # dict key -> (B, T, sum(dims))

    step_mask = batch["action_mask"].astype(jnp.float32)  # (B, T)
    denom = jnp.maximum(step_mask.sum(), 1.0)
    total = 0.0
    metrics = {}
    for key, dims in ACTION_DIMS.items():
        lg = logits[key]
        start = 0
        key_loss = 0.0
        correct = 0.0
        for i, d in enumerate(dims):
            comp = lg[..., start : start + d]
            start += d
            labels = batch["actions"][key][..., i]
            logp = jax.nn.log_softmax(comp.astype(jnp.float32), axis=-1)
            nll = -jnp.take_along_axis(logp, labels[..., None], axis=-1)[..., 0]
            key_loss += (nll * step_mask).sum() / denom
            correct += (
                ((jnp.argmax(comp, axis=-1) == labels) * step_mask).sum() / denom
            )
        total += key_loss
        metrics[f"loss/{key}"] = key_loss
        metrics[f"acc/{key}"] = correct / len(dims)
    metrics["loss/total"] = total
    return total, metrics
