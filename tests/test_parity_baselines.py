"""Golden parity for the three baseline policy families (Gato / Flamingo /
GPT) vs the PyTorch reference, weights carried by the converter."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tests.reference_loader import load_reference, reference_available
from vima_tpu.ckpt import convert as C
from vima_tpu.nn.t5 import T5Config

pytestmark = pytest.mark.skipif(
    not reference_available(), reason="PyTorch reference not available"
)

E = 256
T5_LAYERS, T5_FF, VOCAB = 2, 1024, 100
T5_CFG = T5Config(d_model=768, d_ff=T5_FF, num_layers=T5_LAYERS, num_heads=12, d_kv=64, vocab_size=VOCAB)


def _ref(family, **kw):
    import torch

    from vima_tpu.eval.reference_compat import build_reference_policy

    ref = build_reference_policy(
        family, t5_num_layers=T5_LAYERS, t5_d_ff=T5_FF, vocab_size=VOCAB, **kw
    )
    ref.device = torch.device("cpu")  # reference baselines assume a wrapper
    return ref


def _rgb(rng, shape):
    return rng.integers(3, 255, size=shape).astype(np.uint8)


# ----------------------------------------------------------------- Gato


@pytest.fixture(scope="module")
def gato():
    ref = _ref("gato", embed_dim=E, n_layer=2, n_head=4)
    params = C.convert_gato_policy(
        ref.state_dict(), {"embed_dim": E, "n_layer": 2}, t5_num_layers=T5_LAYERS
    )
    from vima_tpu.policy import VIMAGatoPolicy

    ours = VIMAGatoPolicy(embed_dim=E, n_layer=2, n_head=4, t5_cfg=T5_CFG, vocab_size=VOCAB)
    return ref, ours, {"params": jax.tree.map(jnp.asarray, params)}


def test_gato_obs_and_forward(gato):
    import torch

    from vima.utils import any_to_datadict

    ref, ours, params = gato
    rng = np.random.default_rng(0)
    B, T = 1, 2
    Q = ours.obj_xf_num_queries
    rgb = {v: _rgb(rng, (T, B, 3, 64, 128)) for v in ("front", "top")}
    ee = rng.integers(0, 2, size=(T, B))

    with torch.no_grad():
        t_obs = {
            "rgb": any_to_datadict({v: torch.tensor(a) for v, a in rgb.items()}),
            "ee": torch.tensor(ee),
        }
        ref_tok = ref.forward_obs_token(t_obs).numpy()  # (T, B, Q, E)
    tok = ours.apply(
        params,
        {v: jnp.asarray(np.swapaxes(a, 0, 1)) for v, a in rgb.items()},
        jnp.asarray(np.swapaxes(ee, 0, 1)),
        method="forward_obs_token",
    )
    np.testing.assert_allclose(
        np.swapaxes(np.asarray(tok), 0, 1), ref_tok, atol=3e-4, rtol=3e-4
    )

    Lp = 7
    prompt = rng.normal(size=(Lp, B, E)).astype(np.float32)
    pmask = np.ones((B, Lp), bool)
    pmask[0, 5:] = False
    act = rng.normal(size=(T - 1, B, E)).astype(np.float32)
    with torch.no_grad():
        ref_out = ref.forward(
            obs_token=torch.tensor(ref_tok),
            action_token=torch.tensor(act),
            prompt_token=torch.tensor(prompt),
            prompt_token_mask=torch.tensor(pmask),
        ).numpy()
    out = ours.apply(
        params,
        jnp.asarray(ref_tok),
        jnp.asarray(act),
        jnp.asarray(prompt),
        jnp.asarray(pmask),
    )
    np.testing.assert_allclose(np.asarray(out), ref_out, atol=3e-4, rtol=3e-4)


# ----------------------------------------------------------------- GPT


@pytest.fixture(scope="module")
def gpt():
    ref = _ref("gpt", embed_dim=E, n_layer=2, n_head=4)
    params = C.convert_gpt_policy(
        ref.state_dict(), {"embed_dim": E, "n_layer": 2}, t5_num_layers=T5_LAYERS
    )
    from vima_tpu.policy import VIMAGPTPolicy

    ours = VIMAGPTPolicy(embed_dim=E, n_layer=2, n_head=4, t5_cfg=T5_CFG, vocab_size=VOCAB)
    return ref, ours, {"params": jax.tree.map(jnp.asarray, params)}


def test_gpt_obs_and_forward(gpt):
    import torch

    from vima.utils import any_to_datadict

    ref, ours, params = gpt
    rng = np.random.default_rng(1)
    B, T = 1, 3
    rgb = {v: _rgb(rng, (T, B, 3, 64, 128)) for v in ("front", "top")}
    ee = rng.integers(0, 2, size=(T, B))

    with torch.no_grad():
        t_obs = {
            "rgb": any_to_datadict({v: torch.tensor(a) for v, a in rgb.items()}),
            "ee": torch.tensor(ee),
        }
        ref_tok = ref.forward_obs_token(t_obs).numpy()  # (T, B, E)
    tok = ours.apply(
        params,
        {v: jnp.asarray(np.swapaxes(a, 0, 1)) for v, a in rgb.items()},
        jnp.asarray(np.swapaxes(ee, 0, 1)),
        method="forward_obs_token",
    )
    np.testing.assert_allclose(
        np.swapaxes(np.asarray(tok), 0, 1), ref_tok, atol=3e-4, rtol=3e-4
    )

    Lp = 6
    prompt = rng.normal(size=(Lp, B, E)).astype(np.float32)
    pmask = np.ones((B, Lp), bool)
    pmask[0, 4:] = False
    act = rng.normal(size=(T - 1, B, E)).astype(np.float32)
    with torch.no_grad():
        ref_out = ref.forward(
            obs_token=torch.tensor(ref_tok),
            action_token=torch.tensor(act),
            prompt_token=torch.tensor(prompt),
            prompt_token_mask=torch.tensor(pmask),
        ).numpy()
    out = ours.apply(
        params,
        jnp.asarray(ref_tok),
        jnp.asarray(act),
        jnp.asarray(prompt),
        jnp.asarray(pmask),
    )
    np.testing.assert_allclose(np.asarray(out), ref_out, atol=3e-4, rtol=3e-4)


# ----------------------------------------------------------------- Flamingo


@pytest.fixture(scope="module")
def flamingo():
    ref = _ref("flamingo", embed_dim=E, dt_n_layers=2, dt_n_heads=4, xattn_n_heads=4)
    params = C.convert_flamingo_policy(
        ref.state_dict(), {"embed_dim": E, "dt_n_layers": 2}, t5_num_layers=T5_LAYERS
    )
    from vima_tpu.policy import VIMAFlamingoPolicy

    ours = VIMAFlamingoPolicy(
        embed_dim=E, dt_n_layers=2, dt_n_heads=4, xattn_n_heads=4,
        t5_cfg=T5_CFG, vocab_size=VOCAB,
    )
    return ref, ours, {"params": jax.tree.map(jnp.asarray, params)}


def test_flamingo_obs_and_forward(flamingo):
    import torch

    from vima.utils import any_to_datadict

    ref, ours, params = flamingo
    rng = np.random.default_rng(2)
    B, T = 1, 2
    rgb = {v: _rgb(rng, (T, B, 3, 64, 128)) for v in ("front", "top")}
    ee = rng.integers(0, 2, size=(T, B))

    with torch.no_grad():
        t_obs = {
            "rgb": any_to_datadict({v: torch.tensor(a) for v, a in rgb.items()}),
            "ee": torch.tensor(ee),
        }
        ref_tok = ref.forward_obs_token(t_obs).numpy()  # (T, B, 4, E)
    tok = ours.apply(
        params,
        {v: jnp.asarray(np.swapaxes(a, 0, 1)) for v, a in rgb.items()},
        jnp.asarray(np.swapaxes(ee, 0, 1)),
        method="forward_obs_token",
    )
    np.testing.assert_allclose(
        np.swapaxes(np.asarray(tok), 0, 1), ref_tok, atol=3e-4, rtol=3e-4
    )

    Lp = 7
    prompt = rng.normal(size=(Lp, B, E)).astype(np.float32)
    pmask = np.ones((B, Lp), bool)
    pmask[0, 6:] = False
    act = rng.normal(size=(T - 1, B, E)).astype(np.float32)
    with torch.no_grad():
        ref_out = ref.forward(
            obs_token=torch.tensor(ref_tok),
            action_token=torch.tensor(act),
            prompt_token=torch.tensor(prompt),
            prompt_token_mask=torch.tensor(pmask),
        ).numpy()
    out = ours.apply(
        params,
        jnp.asarray(ref_tok),
        jnp.asarray(act),
        jnp.asarray(prompt),
        jnp.asarray(pmask),
    )
    np.testing.assert_allclose(np.asarray(out), ref_out, atol=3e-4, rtol=3e-4)


def test_family_call_rejects_short_action_history(gato):
    """T_a outside {T-1, T} must raise: the interleaved stream would keep
    dummy slots as valid tokens and cut real trailing tokens."""
    _, ours, params = gato
    rng = np.random.default_rng(9)
    T, B, Q = 3, 1, ours.obj_encoder_img_patch_len if hasattr(ours, "obj_encoder_img_patch_len") else 8
    obs = jnp.asarray(rng.normal(size=(T, B, Q, E)), jnp.float32)
    act = jnp.asarray(rng.normal(size=(T - 2, B, E)), jnp.float32)  # too short
    prompt = jnp.asarray(rng.normal(size=(4, B, E)), jnp.float32)
    pmask = jnp.ones((B, 4), bool)
    with pytest.raises(ValueError, match="T-1 or T"):
        ours.apply(params, obs, act, prompt, pmask)
