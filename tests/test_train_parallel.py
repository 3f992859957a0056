"""Sharded BC training-step tests on the virtual 8-device CPU mesh."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vima_tpu.nn.t5 import T5Config
from vima_tpu.parallel import make_mesh, param_shardings
from vima_tpu.policy import VIMAPolicy, init_params
from vima_tpu.train import Trainer
from vima_tpu.train.loss import bc_loss

TINY_T5 = T5Config(d_model=48, d_ff=96, num_layers=1, num_heads=4, d_kv=12, vocab_size=64)


def tiny_policy():
    return VIMAPolicy(
        embed_dim=64,
        xf_n_layers=1,
        sattn_n_heads=4,
        xattn_n_heads=4,
        vit_resolution=16,
        vit_patch_size=8,
        vit_width=32,
        vit_layers=1,
        vit_heads=2,
        vit_output_dim=32,
        bbox_mlp_hidden_dim=32,
        bbox_mlp_hidden_depth=2,
        t5_cfg=TINY_T5,
        vocab_size=64,
    )


def make_batch(rng, B=8, T=2, n_objs=2, n_assets=1, Lw=3, R=16):
    views = ("front", "top")
    Qp = n_objs * 2
    Lp = Lw + n_assets * Qp
    idx = np.zeros((B, Lp), dtype=np.int32)
    for b in range(B):
        idx[b, :Lw] = np.arange(Lw)
        idx[b, Lw:] = Lw + np.arange(n_assets * Qp)
    return {
        "objects": {
            "cropped_img": {
                v: rng.integers(3, 255, size=(B, T, n_objs, 3, R, R)).astype(np.uint8)
                for v in views
            },
            "bbox": {
                v: rng.integers(5, 120, size=(B, T, n_objs, 4)).astype(np.int32)
                for v in views
            },
            "mask": {v: np.ones((B, T, n_objs), bool) for v in views},
        },
        "ee": rng.integers(0, 2, size=(B, T)).astype(np.int32),
        "prompt_word_ids": rng.integers(0, 64, size=(B, Lw)).astype(np.int32),
        "prompt_assets": {
            "cropped_img": {
                v: rng.integers(3, 255, size=(B, n_assets, n_objs, 3, R, R)).astype(np.uint8)
                for v in views
            },
            "bbox": {
                v: rng.integers(5, 120, size=(B, n_assets, n_objs, 4)).astype(np.int32)
                for v in views
            },
            "mask": {v: np.ones((B, n_assets, n_objs), bool) for v in views},
        },
        "prompt_gather_idx": idx,
        "prompt_mask": np.ones((B, Lp), bool),
        "actions": {
            "pose0_position": rng.integers(0, 50, size=(B, T, 2)).astype(np.int32),
            "pose0_rotation": rng.integers(0, 50, size=(B, T, 4)).astype(np.int32),
            "pose1_position": rng.integers(0, 50, size=(B, T, 2)).astype(np.int32),
            "pose1_rotation": rng.integers(0, 50, size=(B, T, 4)).astype(np.int32),
        },
        "action_mask": np.ones((B, T), bool),
    }


def test_bc_loss_finite():
    policy = tiny_policy()
    params = init_params(policy)
    batch = jax.tree.map(jnp.asarray, make_batch(np.random.default_rng(0), B=2))
    loss, metrics = bc_loss(policy, params, batch, train=False)
    assert np.isfinite(float(loss))
    assert float(loss) > 0
    assert "acc/pose0_position" in metrics


def test_sharded_train_step_8dev():
    assert len(jax.devices()) == 8, "conftest should give 8 CPU devices"
    policy = tiny_policy()
    params = init_params(policy)
    mesh = make_mesh(dp=4, tp=2)

    # TP rules actually shard the big kernels
    sh = param_shardings(params, mesh)
    qkv_spec = sh["params"]["xattn_gpt"]["h_0"]["c_attn"]["kernel"].spec
    assert "tp" in tuple(qkv_spec), qkv_spec

    trainer = Trainer(policy, mesh, learning_rate=1e-3).init(params)
    batch = jax.tree.map(jnp.asarray, make_batch(np.random.default_rng(1), B=8))
    m1 = trainer.step(batch)
    m2 = trainer.step(batch)
    assert np.isfinite(m1["loss/total"])
    assert m2["loss/total"] < m1["loss/total"]  # optimizes on a repeated batch


def test_mixed_precision_train_step():
    """bf16 compute / fp32 params+optimizer (the TPU training default: fp32
    MXU matmuls run multi-pass at <1/30th bf16 throughput): params must
    stay fp32 through the update, loss finite and decreasing."""
    policy = tiny_policy().clone(dtype=jnp.bfloat16)
    params = init_params(policy)
    mesh = make_mesh(dp=4, tp=2)
    trainer = Trainer(policy, mesh, learning_rate=1e-3).init(params)
    batch = jax.tree.map(jnp.asarray, make_batch(np.random.default_rng(2), B=8))
    m1 = trainer.step(batch)
    m2 = trainer.step(batch)
    assert np.isfinite(m1["loss/total"])
    assert m2["loss/total"] < m1["loss/total"]
    leaf_dtypes = {x.dtype for x in jax.tree.leaves(trainer.params)}
    assert jnp.bfloat16 not in leaf_dtypes, leaf_dtypes


def test_trainer_evaluate():
    """Validation pass: deterministic (no dropout), no param update."""
    policy = tiny_policy()
    params = init_params(policy)
    mesh = make_mesh(dp=4, tp=2)
    trainer = Trainer(policy, mesh, learning_rate=1e-3).init(params)
    batch = jax.tree.map(jnp.asarray, make_batch(np.random.default_rng(3), B=8))

    before = jax.tree_util.tree_leaves(trainer.params)[0]
    m1 = trainer.evaluate([batch])
    m2 = trainer.evaluate([batch])
    assert m1["val/loss/total"] == pytest.approx(m2["val/loss/total"], rel=1e-6)
    assert np.isfinite(m1["val/loss/total"])
    after = jax.tree_util.tree_leaves(trainer.params)[0]
    np.testing.assert_array_equal(np.asarray(before), np.asarray(after))
    assert trainer.step_count == 0  # eval does not advance training


def test_lr_schedule_warmup_cosine():
    from vima_tpu.train.trainer import make_schedule

    sched = make_schedule(1e-3, schedule="cosine", warmup_steps=10, total_steps=110)
    assert float(sched(0)) == 0.0
    assert abs(float(sched(10)) - 1e-3) < 1e-9  # warmup peak
    assert float(sched(5)) == pytest.approx(5e-4, rel=1e-6)
    assert float(sched(110)) == pytest.approx(0.0, abs=1e-9)  # decayed to alpha*lr
    assert float(sched(60)) < float(sched(20))  # monotone decay after warmup

    # the host-math mirror (used for the lr metric, no device dispatch)
    # matches the optax schedule the optimizer actually applies
    from vima_tpu.train.trainer import schedule_value

    for kind in ("constant", "cosine", "linear"):
        opt_sched = make_schedule(1e-3, schedule=kind, warmup_steps=10, total_steps=110)
        for step in (0, 3, 10, 42, 109, 110, 200):
            assert schedule_value(
                1e-3, step, schedule=kind, warmup_steps=10, total_steps=110
            ) == pytest.approx(  # optax computes in fp32; host mirror in float64
                float(opt_sched(step)), rel=1e-4, abs=1e-9
            ), (kind, step)


def test_train_state_save_resume(tmp_path):
    """Full train-state round-trip: params, optimizer moments, step, rng."""
    policy = tiny_policy()
    params = init_params(policy)
    mesh = make_mesh(dp=4, tp=2)
    batch = jax.tree.map(jnp.asarray, make_batch(np.random.default_rng(2), B=8))

    kw = dict(learning_rate=1e-3, schedule="cosine", warmup_steps=2, total_steps=10)
    t1 = Trainer(policy, mesh, **kw).init(params)
    t1.step(batch)
    t1.step(batch)
    t1.save_state(tmp_path / "state")
    m_ref = t1.step(batch)  # the step a resumed trainer must reproduce

    t2 = Trainer(policy, mesh, **kw).restore_state(tmp_path / "state")
    assert t2.step_count == 2
    # optimizer moments survived (adam mu is nonzero after 2 steps)
    mu_leaves = [
        np.asarray(x)
        for x in jax.tree_util.tree_leaves(t2.opt_state)
        if hasattr(x, "dtype") and np.issubdtype(np.asarray(x).dtype, np.floating)
    ]
    assert any(np.abs(l).max() > 0 for l in mu_leaves)
    m_resumed = t2.step(batch)
    assert m_resumed["loss/total"] == pytest.approx(m_ref["loss/total"], rel=1e-5)
    assert m_resumed["lr"] == pytest.approx(m_ref["lr"], rel=1e-6)
