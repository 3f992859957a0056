"""BC training for the baseline families: record rgb episodes -> dataset
rgb mode -> sharded train step (loss finite, decreases over a few steps).

The reference cannot train anything (survey §1); family training is this
framework's extension of the same BC recipe (model-card.md:27) to the
baseline architectures (vima_gato_policy.py / vima_gpt_policy.py /
vima_flamingo_policy.py)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vima_tpu.bridge.fake_env import FakeVimaEnv
from vima_tpu.bridge.tokenizer import PromptTokenizer
from vima_tpu.eval.record import record_episode
from vima_tpu.nn.t5 import T5Config
from vima_tpu.policy import (
    VIMAFlamingoPolicy,
    VIMAGPTPolicy,
    init_params,
)
from vima_tpu.parallel import make_mesh
from vima_tpu.train.data import (
    TrajectoryDataset,
    dataset_kwargs_for_policy,
    save_episode,
)
from vima_tpu.train.trainer import Trainer

TINY_T5 = T5Config(d_model=48, d_ff=96, num_layers=1, num_heads=4, d_kv=12, vocab_size=64)
COMMON = dict(
    embed_dim=64, img_size=(32, 64), vit_patch_size=16, vit_width=32,
    vit_layers=1, vit_heads=2, t5_cfg=TINY_T5, vocab_size=64,
)


def _make_policy(family):
    if family == "gpt":
        return VIMAGPTPolicy(n_layer=1, n_head=4, **COMMON)
    return VIMAFlamingoPolicy(
        dt_n_layers=1, dt_n_heads=4, xattn_n_heads=4,
        perceiver_num_blocks=1, perceiver_num_self_attends_per_block=1,
        perceiver_num_self_attention_heads=4,
        perceiver_num_cross_attention_heads=4, **COMMON,
    )


@pytest.mark.parametrize("family", ["gpt", "flamingo"])
def test_family_train_step(tmp_path, family):
    tok = PromptTokenizer(tokenizer_path=None, vocab_size=64)
    tok._tok = None
    for i in range(2):
        env = FakeVimaEnv(seed=i, n_objects=3, oracle_max_steps=3)
        ep = record_episode(env, tok, max_objs=4, seed=i, record_rgb=True)
        save_episode(tmp_path / f"episode_{i:05d}.npz", ep)

    policy = _make_policy(family)
    kwargs = dataset_kwargs_for_policy(policy)
    assert kwargs["obs_mode"] == "rgb"
    assert kwargs["img_hw"] == (32, 64)
    ds = TrajectoryDataset(tmp_path, max_steps=4, max_objs=4, prompt_len=64, **kwargs)
    batch = next(ds.batches(2))
    assert batch["rgb"]["front"].shape == (2, 4, 3, 32, 64)
    assert "objects" not in batch

    mesh = make_mesh(n_devices=2, dp=2, tp=1)
    trainer = Trainer(policy, mesh, learning_rate=1e-3).init(init_params(policy))
    losses = []
    for _ in range(3):
        metrics = trainer.fetch(trainer.step(jax.tree_util.tree_map(jnp.asarray, batch)))
        losses.append(float(metrics["loss/total"]))
    assert all(np.isfinite(l) for l in losses), losses
    # same batch 3x: the loss must move in the right direction
    assert losses[-1] < losses[0], losses
