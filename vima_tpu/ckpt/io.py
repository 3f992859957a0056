"""Native checkpoint save/load (orbax) + torch-ckpt import entry points.

The reference is load-only (torch.save files, vima/__init__.py:7-16). This
framework adds first-class saving: orbax checkpoints carrying the param
tree and the policy config, so converted-or-trained policies round-trip
without torch.
"""

from __future__ import annotations

import dataclasses
import json
import pathlib
from typing import Any, Dict, Optional, Tuple

import jax


def save_checkpoint(path, policy, params, *, extra: Optional[Dict] = None) -> None:
    """Save params + policy config to ``path`` (a directory)."""
    import orbax.checkpoint as ocp

    path = pathlib.Path(path).absolute()
    path.mkdir(parents=True, exist_ok=True)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path / "params", jax.tree_util.tree_map(lambda x: x, params), force=True)
    ckptr.wait_until_finished()
    meta = {
        "policy_class": type(policy).__name__,
        "config": _policy_config_dict(policy),
        "extra": extra or {},
    }
    (path / "policy.json").write_text(json.dumps(meta, indent=2))


def load_policy_meta(path) -> Any:
    """Rebuild just the policy module from ``policy.json`` (no param I/O)."""
    import vima_tpu.policy as vp
    from vima_tpu.nn.t5 import T5Config

    path = pathlib.Path(path).absolute()
    meta = json.loads((path / "policy.json").read_text())
    cfg = dict(meta["config"])
    if "t5_cfg" in cfg:
        cfg["t5_cfg"] = T5Config(**cfg["t5_cfg"])
    for k in ("views", "img_size"):
        if k in cfg and isinstance(cfg[k], list):
            cfg[k] = tuple(cfg[k])
    cfg.pop("dtype", None)
    cfg.pop("param_dtype", None)
    return getattr(vp, meta["policy_class"])(**cfg)


def load_checkpoint(path) -> Tuple[Any, Dict]:
    """Load (policy, params) saved by :func:`save_checkpoint`."""
    import orbax.checkpoint as ocp

    path = pathlib.Path(path).absolute()
    policy = load_policy_meta(path)
    ckptr = ocp.StandardCheckpointer()
    params = ckptr.restore(path / "params")
    return policy, params


def _policy_config_dict(policy) -> Dict:
    out = {}
    for field in dataclasses.fields(policy):
        if field.name in ("parent", "name", "dtype", "param_dtype"):
            continue
        val = getattr(policy, field.name)
        if dataclasses.is_dataclass(val):
            val = dataclasses.asdict(val)
        out[field.name] = val
    return out


def import_torch_checkpoint(torch_ckpt_path, out_path, *, dtype=None, family=None):
    """One-shot: released torch ckpt -> orbax (no torch needed afterwards).

    ``dtype`` optionally casts stored params (e.g. jnp.bfloat16);
    ``family`` picks the policy family (default: auto-detect from keys).
    Returns (policy, params)."""
    from vima_tpu.ckpt.convert import cast_params, load_policy_from_torch_ckpt

    policy, params = load_policy_from_torch_ckpt(torch_ckpt_path, family=family)
    if dtype is not None:
        params = cast_params(params, dtype)
    save_checkpoint(out_path, policy, params, extra={"source": str(torch_ckpt_path)})
    return policy, params
