"""Trajectory dataset round-trip + end-to-end training on saved episodes."""

import numpy as np

import jax
import jax.numpy as jnp

from vima_tpu.train.data import TrajectoryDataset, load_episode, save_episode


def make_episode(rng, T=3, n_objs=2, A=1, Lw=3, R=16):
    views = ("front", "top")
    return {
        "objects": {
            "cropped_img": {
                v: rng.integers(3, 255, size=(T, n_objs, 3, R, R)).astype(np.uint8)
                for v in views
            },
            "bbox": {v: rng.integers(5, 120, size=(T, n_objs, 4)).astype(np.int32) for v in views},
            "mask": {v: np.ones((T, n_objs), bool) for v in views},
        },
        "ee": rng.integers(0, 2, size=(T,)).astype(np.int32),
        "actions": {
            "pose0_position": rng.integers(0, 50, size=(T, 2)).astype(np.int32),
            "pose0_rotation": rng.integers(0, 50, size=(T, 4)).astype(np.int32),
            "pose1_position": rng.integers(0, 50, size=(T, 2)).astype(np.int32),
            "pose1_rotation": rng.integers(0, 50, size=(T, 4)).astype(np.int32),
        },
        "prompt_word_ids": rng.integers(0, 64, size=(Lw,)).astype(np.int32),
        "prompt_token_types": np.asarray([0, 0, 1, 0], dtype=np.int32),
        "prompt_assets": {
            "cropped_img": {
                v: rng.integers(3, 255, size=(A, n_objs, 3, R, R)).astype(np.uint8)
                for v in views
            },
            "bbox": {v: rng.integers(5, 120, size=(A, n_objs, 4)).astype(np.int32) for v in views},
            "mask": {v: np.ones((A, n_objs), bool) for v in views},
        },
    }


def test_roundtrip_and_training(tmp_path):
    rng = np.random.default_rng(0)
    for i in range(4):
        save_episode(tmp_path / f"ep_{i}.npz", make_episode(rng, T=2 + i % 2))

    ep = load_episode(tmp_path / "ep_0.npz")
    assert ep["objects"]["cropped_img"]["front"].shape[0] == 2

    ds = TrajectoryDataset(tmp_path, max_steps=3, max_objs=3, prompt_len=12)
    batches = list(ds.batches(batch_size=2))
    assert len(batches) == 2
    batch = batches[0]
    assert batch["objects"]["cropped_img"]["front"].shape == (2, 3, 3, 3, 16, 16)
    assert batch["prompt_gather_idx"].shape == (2, 12)

    # feeds the trainer end-to-end
    from tests.test_train_parallel import tiny_policy
    from vima_tpu.policy import init_params
    from vima_tpu.train.loss import bc_loss

    policy = tiny_policy()
    params = init_params(policy)
    loss, metrics = bc_loss(policy, params, jax.tree.map(jnp.asarray, batch), train=False)
    assert np.isfinite(float(loss))
