"""Import the PyTorch reference (read-only, /root/reference) for golden
parity tests. Shims the two environment gaps:
  * kornia is absent (only used by a dead resize path, preprocess.py:36);
  * transformers 4.57 dropped three legacy re-exports the vendored T5 pulls
    in but never exercises at inference (checkpoint / device-map helpers).

Tests that need the reference call ``load_reference()`` and skip if it is
unavailable (e.g. in CI without the mounted reference repo).
"""

import sys
import types

REFERENCE_PATH = "/root/reference"


def load_reference():
    if REFERENCE_PATH not in sys.path:
        sys.path.insert(0, REFERENCE_PATH)
    if "kornia" not in sys.modules:
        k = types.ModuleType("kornia")
        k.geometry = types.SimpleNamespace(
            transform=types.SimpleNamespace(resize=lambda *a, **kw: None)
        )
        sys.modules["kornia"] = k
    import transformers.models.t5.modeling_t5 as t5m

    for name in ("checkpoint", "get_device_map", "assert_device_map"):
        if not hasattr(t5m, name):
            setattr(t5m, name, None)
    import vima  # noqa: F401

    return vima


def reference_available() -> bool:
    try:
        load_reference()
        return True
    except Exception:
        return False
