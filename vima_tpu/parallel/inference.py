"""Multi-chip batched inference: shard the rollout over a ``dp`` mesh axis.

BASELINE config 5 scaled out: N parallel envs batch into one policy step;
with a mesh, the batch (and every batch-major leaf of the rollout state)
shards over ``dp`` while parameters replicate (or TP-shard via
``parallel.sharding``). The jitted rollout functions are sharding-agnostic
— XLA partitions them from the committed input shardings, so this module
only places data.
"""

from __future__ import annotations

from typing import Any

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from vima_tpu.parallel.sharding import data_sharding, param_shardings


def shard_batch(tree: Any, mesh: Mesh):
    """Shard every array leaf's leading (batch) axis over ``dp``
    (one placement rule: ``sharding.data_sharding``)."""
    return jax.device_put(tree, data_sharding(mesh, tree))


def shard_rollout_state(state, mesh: Mesh):
    """Place a RolloutState so batch-major leaves shard over ``dp``.

    prompt/self-attn caches are E-contiguous (B, S, E) per layer -> P('dp');
    masks/counters are (B, ...) -> P('dp'); the scalar write_index
    replicates. Same rule as any data batch."""
    return jax.device_put(state, data_sharding(mesh, state))


def replicate_params(params, mesh: Mesh, tensor_parallel: bool = False):
    """Replicate params over the mesh, or TP-shard the big kernels when
    ``tensor_parallel`` (see parallel.sharding rules)."""
    if tensor_parallel:
        return jax.device_put(params, param_shardings(params, mesh))
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, NamedSharding(mesh, P())), params
    )
