"""Checkpoint subsystem: torch->Flax converter (convert), orbax IO (io),
size/config registry (registry). Submodules import on demand — keeping this
empty avoids the runpy double-import warning for
``python -m vima_tpu.ckpt.convert``."""
