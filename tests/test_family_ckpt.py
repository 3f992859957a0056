"""Public checkpoint-loader coverage:

  * family auto-detection + round-trip for all four policy families
    through ``create_policy_from_ckpt`` (the reference can only load the
    flagship, vima/__init__.py:7-16);
  * a RELEASED-FORMAT full-geometry fixture: a real ``torch.save`` file
    with ``{"cfg": ..., "state_dict": {"policy.*": ...}}`` at released-2M
    geometry (t5-base 12-layer/3072-ff/32128-vocab, 4-layer 768-wide ViT)
    round-tripped through the public loader with prompt-encode parity —
    proving the loader against real-file geometry, not just the reduced
    test shapes.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tests.reference_loader import reference_available

pytestmark = pytest.mark.skipif(
    not reference_available(), reason="PyTorch reference not available"
)

T5_LAYERS, T5_FF, VOCAB = 2, 512, 100
E = 256


def _save_released_format(tmp_path, ref, cfg, name):
    import torch

    sd = {f"policy.{k}": v for k, v in ref.state_dict().items()}
    path = tmp_path / name
    torch.save({"cfg": cfg, "state_dict": sd}, path)
    return path


@pytest.mark.parametrize(
    "family,cls_name,ctor",
    [
        ("gato", "VIMAGatoPolicy", dict(embed_dim=E, n_layer=2, n_head=4)),
        ("gpt", "VIMAGPTPolicy", dict(embed_dim=E, n_layer=2, n_head=4)),
        (
            "flamingo",
            "VIMAFlamingoPolicy",
            dict(embed_dim=E, dt_n_layers=2, dt_n_heads=4, xattn_n_heads=4),
        ),
    ],
)
def test_family_roundtrip(tmp_path, family, cls_name, ctor):
    """torch.save a baseline-family ckpt, load through the public API with
    family AUTO-DETECTED, and verify the params match the direct converter
    output exactly (converter numerics are parity-tested elsewhere)."""
    from vima_tpu import create_policy_from_ckpt
    from vima_tpu.ckpt import convert as C
    from vima_tpu.eval.reference_compat import build_reference_policy

    ref = build_reference_policy(
        family, t5_num_layers=T5_LAYERS, t5_d_ff=T5_FF, vocab_size=VOCAB, **ctor
    )
    path = _save_released_format(tmp_path, ref, dict(ctor), f"{family}.ckpt")

    assert C.detect_family(ref.state_dict()) == family
    policy, params = create_policy_from_ckpt(path)
    assert type(policy).__name__ == cls_name
    assert policy.t5_cfg.num_layers == T5_LAYERS
    assert policy.t5_cfg.d_ff == T5_FF
    assert policy.vocab_size == VOCAB

    conv = {
        "gato": C.convert_gato_policy,
        "gpt": C.convert_gpt_policy,
        "flamingo": C.convert_flamingo_policy,
    }[family]
    direct = conv(ref.state_dict(), dict(ctor), t5_num_layers=T5_LAYERS)
    direct_leaves = jax.tree_util.tree_leaves_with_path(direct)
    loaded_leaves = dict(jax.tree_util.tree_leaves_with_path(params["params"]))
    assert len(direct_leaves) == len(loaded_leaves)
    for key, leaf in direct_leaves:
        np.testing.assert_array_equal(np.asarray(loaded_leaves[key]), np.asarray(leaf))


def test_released_format_full_geometry(tmp_path):
    """Released-2M-geometry fixture through the public loader: full t5-base
    (12 layers, d_ff 3072, vocab 32128), 4-layer 768-wide ViT, with
    prompt-encode numerics checked against the torch reference."""
    import torch

    from vima_tpu import create_policy_from_ckpt
    from vima_tpu.eval.reference_compat import build_reference_vima_policy

    ref, cfg, _ = build_reference_vima_policy(
        embed_dim=256,
        xf_n_layers=1,
        sattn_n_heads=8,
        xattn_n_heads=8,
        t5_num_layers=12,
        t5_d_ff=3072,
        vocab_size=32128,
    )
    path = _save_released_format(tmp_path, ref, cfg, "vima_2m.ckpt")
    policy, params = create_policy_from_ckpt(path)

    assert type(policy).__name__ == "VIMAPolicy"
    assert policy.t5_cfg.num_layers == 12
    assert policy.t5_cfg.d_ff == 3072
    assert policy.t5_cfg.d_model == 768
    assert policy.vocab_size == 32128
    assert policy.vit_layers == 4

    # prompt-encode parity at full geometry (word embed + 12-layer t5 +
    # gather assembly), eager apply so no CPU jit compile is paid
    from vima_tpu.bridge.fake_env import FakeVimaEnv
    from vima_tpu.bridge.obs_prep import prepare_prompt_assets
    from vima_tpu.bridge.prompt_prep import prompt_gather_indices
    from vima_tpu.policy.rollout import assemble_prompt

    env = FakeVimaEnv(n_objects=2, seed=11)
    word_ids = np.asarray([37, 5001, 12, 31090], dtype=np.int64)
    token_types = [[0, 0, 1, 0, 0]]
    image_batch, obj_masks = prepare_prompt_assets(env.prompt_assets, ["dragged_obj"])

    with torch.no_grad():
        t_imgbatch = {
            k: {v: torch.tensor(arr) for v, arr in d.items()} for k, d in image_batch.items()
        }
        ref_tokens, ref_mask = ref.forward_prompt_assembly(
            (token_types, torch.tensor(word_ids), _DataDictish(t_imgbatch))
        )

    n_objs_max = image_batch["mask"]["front"].shape[1] * 2
    idx, mask = prompt_gather_indices(token_types, len(word_ids), obj_masks, n_objs_max)
    apply = lambda method, *a, **kw: policy.apply(params, *a, method=method, **kw)
    tokens, pmask = assemble_prompt(
        apply,
        jnp.asarray(word_ids.astype(np.int32)),
        jax.tree_util.tree_map(jnp.asarray, image_batch),
        {"idx": jnp.asarray(idx), "mask": jnp.asarray(mask)},
    )
    encoded = apply("encode_prompt_assembled", tokens, pmask)

    # reference returns stream-first (Lp, B, E)
    np.testing.assert_allclose(
        np.asarray(encoded)[0],
        ref_tokens.numpy()[:, 0, :],
        atol=3e-4,
        rtol=3e-4,
    )
    np.testing.assert_array_equal(np.asarray(pmask)[0], ref_mask.numpy()[0])


class _DataDictish(dict):
    """Minimal stand-in for the reference DataDict: dict + map_structure
    (same shim as tests/test_e2e_episode_parity.py)."""

    def map_structure(self, func):
        def rec(x):
            if isinstance(x, dict):
                return _DataDictish({k: rec(v) for k, v in x.items()})
            return func(x)

        return rec(self)
