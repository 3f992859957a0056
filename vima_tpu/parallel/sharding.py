"""Sharding rules: tensor-parallel parameter layouts + data-parallel batch.

Megatron-style TP over the ``tp`` mesh axis, expressed purely through
``NamedSharding`` annotations — XLA infers the all-reduce after each
row-sharded matmul and keeps activations sharded between the column- and
row-parallel pairs, riding ICI:

  * column-parallel (shard output features): qkv/up projections —
    ``c_attn``, ``qkv``, ``key_value``, ``query``, T5 ``q/k/v``, ``wi``,
    ``linear1``, ``gated_layer``, ``mlp_c_fc``, ``mlp_gated``, perceiver
    ``query/key/value``, ``ff_dense1``.
  * row-parallel (shard input features): down/output projections —
    ``c_proj``, ``mlp_c_proj``, ``attention_out``, ``out_proj``, ``o``,
    ``wo``, ``linear2``, ``ff_dense2``, perceiver ``out``.
  * large embedding tables shard the vocab axis; everything else replicates.

Head counts (4..24) are multiples of the default tp=2; the rules only apply
when the sharded axis divides evenly, so odd shapes fall back to replication
instead of failing.
"""

from __future__ import annotations

from typing import Any

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

COLUMN_PARALLEL = {
    "c_attn", "qkv", "key_value", "query", "key", "value", "q", "k", "v",
    "wi", "linear1", "gated_layer", "mlp_c_fc", "mlp_gated", "ff_dense1",
}
ROW_PARALLEL = {
    "c_proj", "mlp_c_proj", "attention_out", "out_proj", "o", "wo",
    "linear2", "ff_dense2", "out",
}
VOCAB_SHARDED_EMBEDS = {"prompt_embedding", "tokens_embed"}


def _spec_for(path, leaf, tp_size: int) -> P:
    names = [getattr(p, "key", getattr(p, "name", None)) for p in path]
    names = [n for n in names if n is not None]
    kind = names[-1] if names else None
    parent = names[-2] if len(names) >= 2 else None

    ndim = leaf.ndim
    if kind == "kernel" and ndim >= 2:
        if parent in COLUMN_PARALLEL and leaf.shape[-1] % tp_size == 0:
            return P(*([None] * (ndim - 1) + ["tp"]))
        if parent in ROW_PARALLEL and leaf.shape[-2] % tp_size == 0:
            return P(*([None] * (ndim - 2) + ["tp", None]))
    if kind == "bias" and parent in COLUMN_PARALLEL and ndim >= 1 and leaf.shape[-1] % tp_size == 0:
        return P(*([None] * (ndim - 1) + ["tp"]))
    if kind == "embedding" and parent in VOCAB_SHARDED_EMBEDS and leaf.shape[0] % tp_size == 0:
        return P("tp", None)
    return P()


def param_shardings(params: Any, mesh: Mesh):
    """NamedSharding tree for a policy param tree under ``mesh``."""
    tp_size = mesh.shape["tp"]

    def to_sharding(path, leaf):
        return NamedSharding(mesh, _spec_for(path, leaf, tp_size))

    return jax.tree_util.tree_map_with_path(to_sharding, params)


def data_sharding(mesh: Mesh, tree: Any):
    """Shard every leaf's leading (batch) axis over ``dp``; scalars replicate."""
    dp_size = mesh.shape["dp"]

    def to_sharding(leaf):
        if hasattr(leaf, "ndim") and leaf.ndim >= 1 and leaf.shape[0] % dp_size == 0:
            return NamedSharding(mesh, P("dp"))
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map(to_sharding, tree)


def replicated(mesh: Mesh):
    return NamedSharding(mesh, P())
