"""dp-sharded batched rollout on the virtual 8-device mesh: same actions as
the unsharded run, and the state actually shards."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vima_tpu.bridge.prompt_prep import prompt_gather_indices
from vima_tpu.nn.t5 import T5Config
from vima_tpu.parallel import make_mesh
from vima_tpu.parallel.inference import replicate_params, shard_batch, shard_rollout_state
from vima_tpu.policy import VIMAPolicy, init_params
from vima_tpu.policy.rollout import encode_prompt, rollout_step

TINY_T5 = T5Config(d_model=48, d_ff=96, num_layers=1, num_heads=4, d_kv=12, vocab_size=64)


def test_dp_sharded_rollout_matches_single_device():
    assert len(jax.devices()) == 8
    mesh = make_mesh(dp=8, tp=1)

    policy = VIMAPolicy(
        embed_dim=64, xf_n_layers=1, sattn_n_heads=4, xattn_n_heads=4,
        vit_resolution=16, vit_patch_size=8, vit_width=32, vit_layers=1,
        vit_heads=2, vit_output_dim=32, bbox_mlp_hidden_dim=32,
        t5_cfg=TINY_T5, vocab_size=64,
    )
    params = init_params(policy)

    rng = np.random.default_rng(0)
    B, n = 8, 2
    token_types = [[0, 1] for _ in range(B)]
    wb = jnp.asarray(rng.integers(0, 64, size=(B,)))
    ib = {
        "cropped_img": {
            v: jnp.asarray(rng.integers(3, 255, size=(B, n, 3, 16, 16)), jnp.uint8)
            for v in ("front", "top")
        },
        "bbox": {v: jnp.asarray(rng.integers(5, 120, size=(B, n, 4)), jnp.int32) for v in ("front", "top")},
        "mask": {v: jnp.ones((B, n), bool) for v in ("front", "top")},
    }
    idx, pm = prompt_gather_indices(token_types, B, {v: np.ones((B, n), bool) for v in ("front", "top")}, n * 2)
    gather = {"idx": jnp.asarray(idx), "mask": jnp.asarray(pm)}

    objects = {
        "cropped_img": {
            v: jnp.asarray(rng.integers(3, 255, size=(B, n, 3, 16, 16)), jnp.uint8)
            for v in ("front", "top")
        },
        "bbox": {v: jnp.asarray(rng.integers(5, 120, size=(B, n, 4)), jnp.int32) for v in ("front", "top")},
        "mask": {v: jnp.ones((B, n), bool) for v in ("front", "top")},
    }
    ee = jnp.asarray(rng.integers(0, 2, size=(B,)))

    # --- unsharded
    _, st = encode_prompt(policy, params, wb, ib, gather, 64)
    acts_ref = []
    for _ in range(3):
        a, st = rollout_step(policy, params, st, objects, ee)
        acts_ref.append(jax.tree.map(np.asarray, a))

    # --- sharded over dp=8
    p_sh = replicate_params(params, mesh)
    _, st2 = encode_prompt(policy, p_sh, wb, shard_batch(ib, mesh), gather, 64)
    st2 = shard_rollout_state(st2, mesh)
    obj_sh = shard_batch(objects, mesh)
    ee_sh = shard_batch(ee, mesh)
    acts_sh = []
    for _ in range(3):
        a, st2 = rollout_step(policy, p_sh, st2, obj_sh, ee_sh)
        acts_sh.append(jax.tree.map(np.asarray, a))

    # caches actually shard over dp
    sh = st2.cache_k[0].sharding
    assert "dp" in tuple(getattr(sh, "spec", ())) or sh.is_fully_replicated is False

    for t in range(3):
        for k in acts_ref[t]:
            np.testing.assert_array_equal(acts_ref[t][k], acts_sh[t][k], err_msg=f"step {t} {k}")
