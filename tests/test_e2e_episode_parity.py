"""End-to-end recorded-episode action parity (BASELINE goal: "action-token
parity on recorded episodes"): the same synthetic episode is driven through

  (a) the PyTorch reference policy with the reference harness semantics
      (per-step full recompute, history re-padding, greedy mode actions —
      scripts/example.py:111-240), and
  (b) our converted policy through the jitted KV-cached rollout,

and every discrete action at every step must agree exactly.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tests.reference_loader import build_reference_vima_policy, reference_available
from vima_tpu.bridge.fake_env import FakeVimaEnv
from vima_tpu.bridge.obs_prep import prepare_obs, prepare_prompt_assets
from vima_tpu.bridge.prompt_prep import prompt_gather_indices
from vima_tpu.ckpt import convert as C
from vima_tpu.nn.t5 import T5Config
from vima_tpu.policy.rollout import encode_prompt, rollout_step

pytestmark = pytest.mark.skipif(
    not reference_available(), reason="PyTorch reference not available"
)

T5_LAYERS, T5_FF, VOCAB = 2, 512, 100
CFG = dict(embed_dim=256, xf_n_layers=2, sattn_n_heads=4, xattn_n_heads=4)


def test_episode_action_parity():
    import torch

    ref, cfg, _ = build_reference_vima_policy(
        **CFG, t5_num_layers=T5_LAYERS, t5_d_ff=T5_FF, vocab_size=VOCAB
    )
    params = C.convert_vima_policy(ref.state_dict(), cfg, t5_num_layers=T5_LAYERS)
    from vima_tpu.policy.vima import VIMAPolicy

    ours = VIMAPolicy(
        **cfg,
        t5_cfg=T5Config(
            d_model=768, d_ff=T5_FF, num_layers=T5_LAYERS, num_heads=12, d_kv=64,
            vocab_size=VOCAB,
        ),
        vocab_size=VOCAB,
    )
    params = {"params": jax.tree.map(jnp.asarray, params["params"] if "params" in params else params)}

    # ---------------- recorded episode from the synthetic env
    env = FakeVimaEnv(n_objects=3, seed=7, oracle_max_steps=3)
    obs0 = env.reset()
    max_objs = 3
    steps = 3
    recorded = [obs0]
    for _ in range(steps - 1):
        o, *_ = env.step(None)
        recorded.append(o)

    # prompt: two words + one asset (token ids faked — parity needs identical
    # ids on both sides, not a real tokenizer)
    word_ids = np.asarray([5, 17], dtype=np.int64)
    token_types = [[0, 1, 0]]
    image_batch, obj_masks = prepare_prompt_assets(
        env.prompt_assets, ["dragged_obj"]
    )
    n_objs_prompt = image_batch["mask"]["front"].shape[1]

    prepared = [prepare_obs(o, env.meta_info, max_objs=max_objs) for o in recorded]

    # ---------------- reference side (harness semantics)
    t = torch
    with t.no_grad():
        t_imgbatch = {
            k: {v: t.tensor(arr) for v, arr in d.items()} for k, d in image_batch.items()
        }
        prompt_tokens_t, prompt_masks_t = ref.forward_prompt_assembly(
            (token_types, t.tensor(word_ids), _DataDictish(t_imgbatch))
        )
        obs_hist, mask_hist, act_hist = [], [], []
        ref_actions = []
        for step in range(steps):
            p = prepared[step]
            # reference expects stream-first leading (L=1, B=1)
            objs = {
                k: {v: t.tensor(arr)[None] for v, arr in d.items()}
                for k, d in p["objects"].items()
            }
            obs_t = {
                "objects": _DataDictish(objs),
                "ee": t.tensor(p["ee"][None]),  # (L=1, B=1)
            }
            tok, msk = ref.forward_obs_token(obs_t)
            obs_hist.append(tok[0, 0])
            mask_hist.append(msk[0, 0])
            obs_stack = t.stack(obs_hist)[:, None]  # (T, 1, Q, E)
            msk_stack = t.stack(mask_hist)[:, None]
            act_stack = None if step == 0 else t.stack(act_hist)[:, None]
            pred = ref.forward(
                obs_token=obs_stack,
                obs_mask=msk_stack,
                action_token=act_stack,
                prompt_token=prompt_tokens_t,
                prompt_token_mask=prompt_masks_t,
            )
            dists = ref.forward_action_decoder(pred[-1:].squeeze(0))
            acts = {k: v.mode() for k, v in dists.items()}
            ref_actions.append({k: v.numpy() for k, v in acts.items()})
            act_hist.append(ref.forward_action_token({k: v[None] for k, v in acts.items()})[0, 0])

    # ---------------- our side (cached rollout)
    idx, pmask = prompt_gather_indices(
        token_types, len(word_ids), obj_masks, n_objs_prompt * 2
    )
    np.testing.assert_array_equal(pmask, prompt_masks_t.numpy())
    gather = {"idx": jnp.asarray(idx), "mask": jnp.asarray(pmask)}
    capacity = steps * (max_objs * 2 + 1) + 1
    _, state = encode_prompt(
        ours,
        params,
        jnp.asarray(word_ids),
        jax.tree.map(jnp.asarray, image_batch),
        gather,
        capacity,
    )
    for step in range(steps):
        p = prepared[step]
        acts, state = rollout_step(
            ours,
            params,
            state,
            jax.tree.map(jnp.asarray, p["objects"]),
            jnp.asarray(p["ee"]),
        )
        for k, v in acts.items():
            np.testing.assert_array_equal(
                np.asarray(v)[0], ref_actions[step][k].reshape(-1, ref_actions[step][k].shape[-1])[0],
                err_msg=f"step {step} action {k}",
            )


class _DataDictish(dict):
    """Minimal stand-in for the reference DataDict: dict + map_structure."""

    def map_structure(self, func):
        import torch

        def rec(x):
            if isinstance(x, dict):
                return _DataDictish({k: rec(v) for k, v in x.items()})
            return func(x)

        return rec(self)
