"""Thin re-export: the reference-compat loader lives in the package so the
benchmark can use it too."""

from vima_tpu.eval.reference_compat import (  # noqa: F401
    REFERENCE_PATH,
    build_reference_vima_policy,
    load_reference,
    reference_available,
)
