"""vima_tpu: a TPU-native (JAX/Flax/Pallas) robot-manipulation policy framework.

Re-implements the full capability surface of the VIMA reference
(multimodal-prompt manipulation policies; see /root/reference) with a
TPU-first design: static shapes, batch-first layouts, fp32 logit islands,
fused Pallas attention, cached-KV autoregressive rollout, and pjit/mesh
parallelism.

Public API parity: `create_policy_from_ckpt` mirrors
reference `vima/__init__.py:7-16` (torch ckpt -> policy, `policy.` prefix
stripped, strict key coverage), returning a (policy, params) pair.
"""

from vima_tpu.version import __version__

__all__ = [
    "__version__",
    "create_policy_from_ckpt",
]


def create_policy_from_ckpt(ckpt_path, device=None, family=None):
    """Load a reference PyTorch checkpoint and return (policy, params).

    Mirrors reference vima/__init__.py:7-16: reads ``{"cfg": ..., "state_dict": ...}``,
    builds the policy from cfg, strips the ``policy.`` prefix and converts
    every tensor (strict coverage) into a Flax param tree.

    Beyond the reference (which can only load the flagship VIMAPolicy),
    ``family`` selects 'vima' | 'gato' | 'gpt' | 'flamingo'; None
    auto-detects from the state-dict structure.

    The ``device`` argument is accepted for CLI compatibility and ignored:
    JAX array placement is controlled by jit/sharding.
    """
    from vima_tpu.ckpt.convert import load_policy_from_torch_ckpt

    return load_policy_from_torch_ckpt(ckpt_path, family=family)
