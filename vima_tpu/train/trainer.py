"""Sharded training step + minimal trainer loop.

The train step is a single jitted function whose parameters, optimizer
state, and batch all carry explicit NamedShardings over a ('dp', 'tp') mesh
(vima_tpu.parallel): data parallel over ``dp``, Megatron-style tensor
parallel over ``tp``. XLA inserts the psum/all-gather collectives implied
by the annotations (the reference has no training loop or distributed
backend at all — survey §1, §2.3).
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from vima_tpu.parallel.sharding import data_sharding, param_shardings, replicated
from vima_tpu.train.loss import bc_loss


def make_optimizer(
    learning_rate: float = 1e-4,
    weight_decay: float = 0.0,
    max_grad_norm: Optional[float] = 1.0,
) -> optax.GradientTransformation:
    txs = []
    if max_grad_norm is not None:
        txs.append(optax.clip_by_global_norm(max_grad_norm))
    txs.append(optax.adamw(learning_rate, weight_decay=weight_decay))
    return optax.chain(*txs)


def make_train_step(policy, optimizer):
    """Returns train_step(params, opt_state, batch, rng) -> (params, opt_state, metrics)."""

    def train_step(params, opt_state, batch, rng):
        def loss_fn(p):
            return bc_loss(policy, p, batch, rngs={"dropout": rng}, train=True)

        (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, new_opt_state = optimizer.update(grads, opt_state, params)
        new_params = optax.apply_updates(params, updates)
        metrics["grad_norm"] = optax.global_norm(grads)
        return new_params, new_opt_state, metrics

    return train_step


class Trainer:
    """Minimal sharded BC trainer.

    Usage:
        trainer = Trainer(policy, mesh=make_mesh())
        trainer.init(params)           # places params on the mesh
        metrics = trainer.step(batch)  # one sharded update
    """

    def __init__(
        self,
        policy,
        mesh: Mesh,
        learning_rate: float = 1e-4,
        weight_decay: float = 0.0,
        max_grad_norm: Optional[float] = 1.0,
        seed: int = 0,
    ):
        self.policy = policy
        self.mesh = mesh
        self.optimizer = make_optimizer(learning_rate, weight_decay, max_grad_norm)
        self._rng = jax.random.PRNGKey(seed)
        self.params = None
        self.opt_state = None
        self._compiled = None

    def init(self, params):
        shardings = param_shardings(params, self.mesh)
        self.params = jax.device_put(params, shardings)
        self.opt_state = self.optimizer.init(self.params)
        self._param_shardings = shardings
        return self

    def _compile(self, batch):
        # params/opt_state/batch are device_put with explicit NamedShardings
        # before the call; jit inherits committed input shardings and GSPMD
        # propagates them (opt state mu/nu were created from sharded params,
        # so they already carry the param shardings).
        step = make_train_step(self.policy, self.optimizer)
        self._compiled = jax.jit(step, donate_argnums=(0, 1))

    def step(self, batch) -> Dict[str, Any]:
        if self.params is None:
            raise RuntimeError("call init(params) first")
        batch = jax.device_put(batch, data_sharding(self.mesh, batch))
        if self._compiled is None:
            self._compile(batch)
        self._rng, sub = jax.random.split(self._rng)
        self.params, self.opt_state, metrics = self._compiled(
            self.params, self.opt_state, batch, sub
        )
        return jax.tree_util.tree_map(float, metrics)
