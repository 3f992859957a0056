from vima_tpu.core.pytree import (
    any_concat,
    any_stack,
    any_slice,
    any_transpose_first_two_axes,
    add_batch_dim,
    get_batch_size,
    to_device,
    to_numpy,
)

__all__ = [
    "any_concat",
    "any_stack",
    "any_slice",
    "any_transpose_first_two_axes",
    "add_batch_dim",
    "get_batch_size",
    "to_device",
    "to_numpy",
]
