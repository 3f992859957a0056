from vima_tpu.policy.vima import VIMAPolicy
from vima_tpu.policy.gato import VIMAGatoPolicy
from vima_tpu.policy.flamingo import VIMAFlamingoPolicy
from vima_tpu.policy.gpt import VIMAGPTPolicy


def init_params(policy, seed: int = 0):
    """Random-init the full param tree of any policy (via its warmup
    method, which touches every submodule)."""
    import jax

    return policy.init(jax.random.PRNGKey(seed), method="warmup")


__all__ = [
    "VIMAPolicy",
    "VIMAGatoPolicy",
    "VIMAFlamingoPolicy",
    "VIMAGPTPolicy",
    "init_params",
]
