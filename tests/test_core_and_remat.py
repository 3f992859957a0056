"""core/pytree utilities + remat training knob."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vima_tpu.core import (
    add_batch_dim,
    any_concat,
    any_slice,
    any_stack,
    any_transpose_first_two_axes,
    get_batch_size,
    to_device,
)


def test_pytree_utils():
    a = {"x": np.ones((2, 3)), "y": {"z": np.zeros((2, 5))}}
    b = {"x": np.ones((4, 3)), "y": {"z": np.zeros((4, 5))}}
    c = any_concat([a, b], axis=0)
    assert c["x"].shape == (6, 3) and c["y"]["z"].shape == (6, 5)

    s = any_stack([a, a], axis=0)
    assert s["x"].shape == (2, 2, 3)

    sl = any_slice(s, np.s_[0])
    assert sl["x"].shape == (2, 3)

    t = any_transpose_first_two_axes({"x": np.zeros((2, 7, 3))})
    assert t["x"].shape == (7, 2, 3)

    bd = add_batch_dim(a)
    assert bd["x"].shape == (1, 2, 3)

    assert get_batch_size(a) == 2
    with pytest.raises(ValueError):
        get_batch_size({"x": np.ones((2,)), "y": np.ones((3,))}, strict=True)

    dev = to_device({"rgb": np.zeros((2, 2), np.uint8), "bbox": np.zeros((2, 4))},
                    dtype_map={"rgb": jnp.float32})
    assert dev["rgb"].dtype == jnp.float32


def test_remat_training_step():
    """remat=True must produce identical losses and still train."""
    from vima_tpu.nn.t5 import T5Config
    from vima_tpu.policy import VIMAPolicy, init_params
    from vima_tpu.train.loss import bc_loss
    from tests.test_train_parallel import make_batch, TINY_T5

    common = dict(
        xf_n_layers=1, sattn_n_heads=4, xattn_n_heads=4,
        vit_resolution=16, vit_patch_size=8, vit_width=32, vit_layers=1,
        vit_heads=2, vit_output_dim=32, bbox_mlp_hidden_dim=32,
        bbox_mlp_hidden_depth=2, t5_cfg=TINY_T5, vocab_size=64,
    )
    p_plain = VIMAPolicy(embed_dim=64, **common)
    p_remat = VIMAPolicy(embed_dim=64, remat=True, **common)
    params = init_params(p_plain)
    batch = jax.tree.map(jnp.asarray, make_batch(np.random.default_rng(0), B=2))

    rngs = {"dropout": jax.random.PRNGKey(0)}
    l1, _ = bc_loss(p_plain, params, batch, rngs=rngs, train=True)
    l2, _ = bc_loss(p_remat, params, batch, rngs=rngs, train=True)
    np.testing.assert_allclose(float(l1), float(l2), rtol=1e-6)

    g1 = jax.grad(lambda p: bc_loss(p_plain, p, batch, rngs=rngs, train=True)[0])(params)
    g2 = jax.grad(lambda p: bc_loss(p_remat, p, batch, rngs=rngs, train=True)[0])(params)
    for a, b in zip(jax.tree_util.tree_leaves(g1), jax.tree_util.tree_leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5, rtol=1e-4)
