"""End-to-end train->act: data -> BC training -> checkpointed params ->
closed-loop rollout -> SUCCESS.

Round-4 verdict: loss-decrease on one batch was the only learning
evidence; nothing showed a trained policy *acting*. Here a scripted
visuomotor demonstrator (bridge/fake_env.scripted_target_bins) records
episodes on ``ScriptedTargetEnv`` — an env whose success flag is defined
as "every step's action matched the demonstration for the observation it
acted on" — a tiny policy BC-overfits them, and the closed loop must then
succeed on the same seeds. Reference: model-card.md:27 (behavior cloning
objective), scripts/example.py:111-240 (closed-loop success protocol).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vima_tpu.bridge.fake_env import ScriptedTargetEnv, scripted_target_bins
from vima_tpu.bridge.tokenizer import PromptTokenizer

MAX_OBJS = 4
EP_STEPS = 3
N_ENVS = 8


def _tiny_policy():
    from vima_tpu.nn.t5 import T5Config
    from vima_tpu.policy import VIMAPolicy

    return VIMAPolicy(
        embed_dim=64, xf_n_layers=1, sattn_n_heads=4, xattn_n_heads=4,
        vit_width=32, vit_layers=1, vit_heads=2, vit_output_dim=64,
        bbox_mlp_hidden_dim=64,
        t5_cfg=T5Config(
            d_model=48, d_ff=96, num_layers=1, num_heads=4, d_kv=12,
            vocab_size=32128,
        ),
    )


def _make_envs():
    return [
        ScriptedTargetEnv(
            seed=i, n_objects=3, oracle_max_steps=EP_STEPS, img_hw=(64, 128)
        )
        for i in range(N_ENVS)
    ]


def test_bc_trained_policy_succeeds_closed_loop(tmp_path):
    from vima_tpu.eval.record import record_episode
    from vima_tpu.parallel import make_mesh
    from vima_tpu.policy import init_params
    from vima_tpu.train.data import TrajectoryDataset, save_episode
    from vima_tpu.train.trainer import Trainer

    policy = _tiny_policy()
    tok = PromptTokenizer(None, vocab_size=policy.vocab_size, offline=True)

    # 1. record demonstrations from the scripted oracle (same-seed envs
    # replay identical obs, so these are exact closed-loop targets)
    for i, env in enumerate(_make_envs()):
        ep = record_episode(
            env, tok, max_objs=MAX_OBJS,
            action_sampler=lambda obs: scripted_target_bins(obs),
            seed=i,
        )
        # sanity: the oracle's own actions succeed on its env
        save_episode(tmp_path / f"episode_{i:05d}.npz", ep)

    # 2. BC-overfit the tiny policy on the demonstrations
    ds = TrajectoryDataset(
        str(tmp_path), max_steps=EP_STEPS, max_objs=MAX_OBJS, prompt_len=32
    )
    batch = jax.tree_util.tree_map(jnp.asarray, next(ds.batches(N_ENVS)))
    trainer = Trainer(policy, make_mesh(), learning_rate=2e-3)
    trainer.init(init_params(policy))
    metrics = {}
    # train until every action component is argmax-correct on the batch,
    # then keep going: the closed loop recomputes the same logits through
    # the cached-rollout path (different op order), so first-perfect-step
    # margins can be within numeric noise — extra overfitting steps widen
    # every argmax gap far past it
    extra_after_perfect = 60
    for step in range(400):
        metrics = trainer.fetch(trainer.step(batch))
        accs = [v for k, v in metrics.items() if k.startswith("acc/")]
        if accs and min(accs) >= 1.0:
            if extra_after_perfect <= 0:
                break
            extra_after_perfect -= 1
    assert metrics, "no training steps ran"
    accs = {k: v for k, v in metrics.items() if k.startswith("acc/")}
    assert accs and min(accs.values()) >= 1.0, (
        f"BC failed to overfit the demonstrations: {accs} "
        f"(loss {metrics.get('loss/total')})"
    )

    # 3. the trained policy must now ACT: closed loop on the same seeds,
    # success defined by matching the demonstrated behavior every step
    from vima_tpu.bridge.env_loop import run_episode_batch

    # pull the trained params off the (virtual) mesh — serving uses plain
    # single-device jits
    trained = jax.device_get(trainer.params)
    results = run_episode_batch(
        policy, trained, _make_envs(),
        tokenize_prompt=tok, max_objs=MAX_OBJS, capacity=64,
    )
    assert all(r["done"] for r in results)
    n_success = sum(r["success"] for r in results)
    assert n_success == N_ENVS, (
        f"only {n_success}/{N_ENVS} episodes reproduced the demonstrated "
        f"behavior: {results}"
    )


def test_scripted_env_oracle_succeeds_and_random_fails():
    """The env's success semantics themselves: the oracle's actions (via
    the same de-discretize + bounds conversion the loop applies) succeed;
    a wrong-bin policy fails."""
    from vima_tpu.bridge.env_loop import _actions_to_env

    env = ScriptedTargetEnv(seed=0, n_objects=3, oracle_max_steps=EP_STEPS)
    lo = np.asarray(env.meta_info["action_bounds"]["low"], np.float32)
    hi = np.asarray(env.meta_info["action_bounds"]["high"], np.float32)

    obs = env.reset()
    done = False
    while not done:
        bins = scripted_target_bins(obs)
        act = _actions_to_env(
            {k: v[None].astype(np.int32) for k, v in bins.items()}, lo, hi
        )
        obs, _, done, info = env.step({k: v[0] for k, v in act.items()})
    assert info["success"]

    env = ScriptedTargetEnv(seed=0, n_objects=3, oracle_max_steps=EP_STEPS)
    obs = env.reset()
    done = False
    while not done:
        bins = scripted_target_bins(obs)
        bins["pose0_position"] = (bins["pose0_position"] + 7) % 50  # wrong
        act = _actions_to_env(
            {k: v[None].astype(np.int32) for k, v in bins.items()}, lo, hi
        )
        obs, _, done, info = env.step({k: v[0] for k, v in act.items()})
    assert not info["success"]
