"""Device mesh construction.

The reference has no distributed backend at all (survey §2.3 — the only
multi-device code is a dead T5 ``parallelize()`` device-map path). The
TPU-native equivalent is a ``jax.sharding.Mesh`` with ``dp`` (data) and
``tp`` (tensor) axes; XLA inserts the ICI collectives implied by the
sharding annotations (scaling-book recipe: pick a mesh, annotate, let XLA
insert collectives).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh


def make_mesh(
    n_devices: Optional[int] = None,
    dp: Optional[int] = None,
    tp: Optional[int] = None,
    devices: Optional[Sequence] = None,
) -> Mesh:
    """Build a ('dp', 'tp') mesh over the available devices.

    Defaults: tp = min(n, 2) when unspecified (attention heads at this model
    scale don't benefit from wider TP), dp = n // tp.
    """
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    n = len(devices)
    if tp is None:
        tp = 2 if (dp is None and n % 2 == 0 and n >= 2) else (n // dp if dp else 1)
    if dp is None:
        dp = n // tp
    if dp * tp != n:
        raise ValueError(f"dp*tp = {dp}*{tp} != n_devices {n}")
    arr = np.asarray(devices).reshape(dp, tp)
    return Mesh(arr, axis_names=("dp", "tp"))
