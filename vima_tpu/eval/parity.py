"""Converted-checkpoint action-parity check against the PyTorch reference.

    python -m vima_tpu.eval.parity --ckpt 200M.ckpt [--episodes 2] [--steps 3] \
        [--max-objs 3] [--strict]

Operator tool for the BASELINE acceptance criterion ("action-token parity
on recorded episodes"): loads the torch checkpoint twice — once into the
offline-built PyTorch reference policy with the reference loader semantics
(vima/__init__.py:7-16), once through this framework's converter — then
drives identical synthetic recorded episodes through

  (a) the reference harness semantics: per-step full recompute of the
      growing sequence, greedy mode actions (scripts/example.py:111-240);
  (b) our jitted KV-cached rollout (policy/rollout.py);

and requires exact discrete-action agreement at every step. Prints one
JSON line per episode and a summary; exits nonzero on any mismatch.

Only the flagship family is supported here because only it has released
checkpoints and a reference loader; the baseline families' parity is
covered by tests/test_parity_baselines.py + test_rollout_families.py.

``--strict`` wraps our side in ops.attention.strict_parity_mode() (highest
matmul precision) — needed on TPU only for near-uniform logits (random
init); trained checkpoints have far larger argmax margins.
"""

from __future__ import annotations

import argparse
import contextlib
import json
import sys

import numpy as np


class _DataDictish(dict):
    """Minimal stand-in for the reference DataDict: dict + map_structure."""

    def map_structure(self, func):
        def rec(x):
            if isinstance(x, dict):
                return _DataDictish({k: rec(v) for k, v in x.items()})
            return func(x)

        return rec(self)


def _load_reference_policy(ckpt_path):
    """torch.load + offline reference construction at the ckpt's geometry
    (vima/__init__.py:7-16 semantics, no network)."""
    import torch

    from vima_tpu.ckpt.convert import _detect_geometry, detect_family
    from vima_tpu.eval.reference_compat import build_reference_vima_policy

    ckpt = torch.load(ckpt_path, map_location="cpu", weights_only=False)
    sd = {k.removeprefix("policy."): v for k, v in ckpt["state_dict"].items()}
    family = detect_family(sd)
    if family != "vima":
        raise SystemExit(
            f"checkpoint is a {family!r}-family policy; the reference loader "
            "only instantiates VIMAPolicy (vima/__init__.py:10) — baseline "
            "parity is covered by the test suite"
        )
    geo = _detect_geometry(sd)
    ref, _, _ = build_reference_vima_policy(
        **ckpt["cfg"],
        t5_num_layers=geo["t5_num_layers"],
        t5_d_ff=geo.get("t5_d_ff", 3072),
        vocab_size=geo.get("t5_vocab", 32128),
    )
    ref.load_state_dict({k: v.float() for k, v in sd.items()}, strict=True)
    ref.eval()
    return ref


def _reference_episode_actions(ref, word_ids, token_types, image_batch, prepared):
    """Reference harness semantics: full recompute each step, greedy mode."""
    import torch as t

    with t.no_grad():
        t_imgbatch = {
            k: {v: t.tensor(arr) for v, arr in d.items()} for k, d in image_batch.items()
        }
        prompt_tokens, prompt_masks = ref.forward_prompt_assembly(
            (token_types, t.tensor(np.asarray(word_ids, np.int64)), _DataDictish(t_imgbatch))
        )
        obs_hist, mask_hist, act_hist = [], [], []
        actions = []
        for p in prepared:
            objs = {
                k: {v: t.tensor(arr)[None] for v, arr in d.items()}
                for k, d in p["objects"].items()
            }
            obs_t = {"objects": _DataDictish(objs), "ee": t.tensor(p["ee"][None])}
            tok, msk = ref.forward_obs_token(obs_t)
            obs_hist.append(tok[0, 0])
            mask_hist.append(msk[0, 0])
            obs_stack = t.stack(obs_hist)[:, None]
            msk_stack = t.stack(mask_hist)[:, None]
            act_stack = None if not act_hist else t.stack(act_hist)[:, None]
            pred = ref.forward(
                obs_token=obs_stack,
                obs_mask=msk_stack,
                action_token=act_stack,
                prompt_token=prompt_tokens,
                prompt_token_mask=prompt_masks,
            )
            dists = ref.forward_action_decoder(pred[-1:].squeeze(0))
            acts = {k: v.mode() for k, v in dists.items()}
            actions.append({k: v.numpy()[0] for k, v in acts.items()})
            act_hist.append(
                ref.forward_action_token({k: v[None] for k, v in acts.items()})[0, 0]
            )
    return actions, prompt_masks.numpy()


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--ckpt", required=True, help="reference-format torch checkpoint")
    p.add_argument("--episodes", type=int, default=2)
    p.add_argument("--steps", type=int, default=3)
    p.add_argument("--max-objs", type=int, default=3)
    p.add_argument("--strict", action="store_true", help="highest matmul precision")
    cfg = p.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from vima_tpu import create_policy_from_ckpt
    from vima_tpu.bridge.fake_env import FakeVimaEnv
    from vima_tpu.bridge.obs_prep import prepare_obs, prepare_prompt_assets
    from vima_tpu.bridge.prompt_prep import prompt_gather_indices
    from vima_tpu.ops.attention import strict_parity_mode
    from vima_tpu.policy.rollout import encode_prompt, rollout_step

    ref = _load_reference_policy(cfg.ckpt)
    ours, params = create_policy_from_ckpt(cfg.ckpt)

    mismatches = 0
    for ep in range(cfg.episodes):
        env = FakeVimaEnv(n_objects=cfg.max_objs, seed=100 + ep, oracle_max_steps=cfg.steps)
        recorded = [env.reset()]
        for _ in range(cfg.steps - 1):
            o, *_ = env.step(None)
            recorded.append(o)
        prepared = [prepare_obs(o, env.meta_info, max_objs=cfg.max_objs) for o in recorded]

        # same token ids on both sides (ids are inputs, not semantics)
        rng = np.random.default_rng(ep)
        word_ids = rng.integers(0, ours.vocab_size, size=(3,))
        names = list(env.prompt_assets.keys())[:1]
        token_types = [[0, 1, 0, 0]]
        image_batch, obj_masks = prepare_prompt_assets(env.prompt_assets, names)
        n_objs_prompt = image_batch["mask"]["front"].shape[1]

        ref_actions, ref_pmask = _reference_episode_actions(
            ref, word_ids, token_types, image_batch, prepared
        )

        idx, pmask = prompt_gather_indices(
            token_types, len(word_ids), obj_masks, n_objs_prompt * 2
        )
        np.testing.assert_array_equal(pmask, ref_pmask)
        gather = {"idx": jnp.asarray(idx), "mask": jnp.asarray(pmask)}
        capacity = cfg.steps * (cfg.max_objs * 2 + 1) + 1

        ctx = strict_parity_mode() if cfg.strict else contextlib.nullcontext()
        ep_mismatch = []
        with ctx:
            _, state = encode_prompt(
                ours, params, jnp.asarray(word_ids),
                jax.tree.map(jnp.asarray, image_batch), gather, capacity,
            )
            for step in range(cfg.steps):
                acts, state = rollout_step(
                    ours, params, state,
                    jax.tree.map(jnp.asarray, prepared[step]["objects"]),
                    jnp.asarray(prepared[step]["ee"]),
                )
                for k, v in acts.items():
                    got = np.asarray(v)[0]
                    want = np.asarray(ref_actions[step][k]).reshape(got.shape)
                    if not np.array_equal(got, want):
                        ep_mismatch.append(
                            {"step": step, "key": k, "ours": got.tolist(), "ref": want.tolist()}
                        )
        mismatches += len(ep_mismatch)
        print(json.dumps({
            "episode": ep, "steps": cfg.steps, "actions_compared": cfg.steps * 8,
            "mismatches": ep_mismatch,
        }))
    summary = {"episodes": cfg.episodes, "total_mismatches": mismatches,
               "parity": mismatches == 0}
    print(json.dumps({"summary": summary}))
    if mismatches:
        sys.exit(1)


if __name__ == "__main__":
    main()
