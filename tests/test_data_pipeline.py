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


def test_sharded_pack_and_stream(tmp_path):
    """Pack heterogeneous episodes into shards; streamed batches must be
    (a) uniform-shape, (b) a permutation of the packed rows with no loss
    across shard boundaries, (c) identical in content to the bucketed
    TrajectoryDataset samples they were packed from."""
    from vima_tpu.train.shards import (
        ShardedTrajectoryDataset,
        is_packed_root,
        pack_shards,
    )

    rng = np.random.default_rng(1)
    src = tmp_path / "episodes"
    src.mkdir()
    # heterogeneous: word counts and asset counts differ across episodes
    for i in range(7):
        ep = make_episode(rng, T=2 + i % 2, Lw=3 + (i % 2), A=1 + i % 2)
        ep["prompt_token_types"] = np.asarray(
            [0] * (3 + i % 2) + [1] * (1 + i % 2), np.int32
        )
        save_episode(src / f"ep_{i}.npz", ep)

    out = tmp_path / "packed"
    kw = dict(max_steps=3, max_objs=3, prompt_len=24, word_len=6, max_assets=2)
    meta = pack_shards(src, out, episodes_per_shard=3, **kw)
    assert is_packed_root(out)
    assert meta["n_per_shard"] == [3, 3, 1]

    sds = ShardedTrajectoryDataset(out, seed=0)
    assert len(sds) == 7
    batches = list(sds.batches(2, epochs=1, shuffle=True))
    assert len(batches) == 3  # 7 rows -> 3 full batches, 1 dropped
    b = batches[0]
    assert b["objects"]["cropped_img"]["front"].shape == (2, 3, 3, 3, 16, 16)
    assert b["prompt_word_ids"].shape == (2, 6)
    # asset axis padded to max_assets=2; per-asset object slots keep their
    # natural count (interior padding would shift T5 relative positions)
    assert b["prompt_assets"]["cropped_img"]["front"].shape == (2, 2, 2, 3, 16, 16)
    assert b["prompt_gather_idx"].shape == (2, 24)

    # content identity vs the bucketed per-episode samples
    from vima_tpu.train.data import TrajectoryDataset, load_episode

    ref_ds = TrajectoryDataset(src, **kw)
    ref = {}
    for path in ref_ds.paths:
        s = ref_ds._episode_to_sample(load_episode(path))
        ref[s["prompt_word_ids"].tobytes() + s["ee"].tobytes()] = s
    seen = 0
    for b in sds.batches(2, epochs=1, shuffle=True):
        for r in range(2):
            row = jax.tree_util.tree_map(lambda x: x[r], b)
            want = ref[row["prompt_word_ids"].tobytes() + row["ee"].tobytes()]
            jax.tree_util.tree_map(np.testing.assert_array_equal, row, want)
            seen += 1
    assert seen == 6

    # deterministic order without shuffle; batches cross the shard boundary
    ees = [b["ee"][j, 0] for b in sds.batches(2, epochs=1, shuffle=False) for j in range(2)]
    want = [ref_ds._episode_to_sample(load_episode(p))["ee"][0] for p in ref_ds.paths[:6]]
    assert [int(x) for x in ees] == [int(x) for x in want]


def test_sharded_validate_against_mismatch(tmp_path):
    from vima_tpu.train.shards import ShardedTrajectoryDataset, pack_shards
    import pytest

    rng = np.random.default_rng(2)
    src = tmp_path / "eps"
    src.mkdir()
    save_episode(src / "ep_0.npz", make_episode(rng))
    out = tmp_path / "packed"
    pack_shards(src, out, max_steps=3, max_objs=3, prompt_len=12, word_len=4,
                max_assets=1, episodes_per_shard=8)
    with pytest.raises(ValueError, match="repack"):
        ShardedTrajectoryDataset(out, validate_against={"obs_mode": "rgb"})
