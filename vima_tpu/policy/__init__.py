from vima_tpu.policy.vima import VIMAPolicy
from vima_tpu.policy.gato import VIMAGatoPolicy
from vima_tpu.policy.flamingo import VIMAFlamingoPolicy
from vima_tpu.policy.gpt import VIMAGPTPolicy


def init_params(policy, seed: int = 0):
    """Random-init the full param tree of any policy (via its warmup
    method, which touches every submodule). Jitted: one dispatch instead of
    thousands of eager ops (which crawl on remote/tunneled devices)."""
    import jax

    return jax.jit(lambda rng: policy.init(rng, method="warmup"))(
        jax.random.PRNGKey(seed)
    )


__all__ = [
    "VIMAPolicy",
    "VIMAGatoPolicy",
    "VIMAFlamingoPolicy",
    "VIMAGPTPolicy",
    "init_params",
]
