"""Sharded training step + minimal trainer loop.

The train step is a single jitted function whose parameters, optimizer
state, and batch all carry explicit NamedShardings over a ('dp', 'tp') mesh
(vima_tpu.parallel): data parallel over ``dp``, Megatron-style tensor
parallel over ``tp``. XLA inserts the psum/all-gather collectives implied
by the annotations (the reference has no training loop or distributed
backend at all — survey §1, §2.3).
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh

from vima_tpu.parallel.sharding import data_sharding, param_shardings
from vima_tpu.train.loss import bc_loss


def _abspath(path):
    import pathlib

    return pathlib.Path(path).absolute()


def make_schedule(
    learning_rate: float,
    *,
    schedule: str = "constant",
    warmup_steps: int = 0,
    total_steps: Optional[int] = None,
    end_lr_frac: float = 0.0,
):
    """LR schedule: linear warmup then constant / cosine / linear decay."""
    if schedule == "constant":
        body = optax.constant_schedule(learning_rate)
    elif schedule == "cosine":
        if total_steps is None:
            raise ValueError("cosine schedule needs total_steps")
        body = optax.cosine_decay_schedule(
            learning_rate, max(1, total_steps - warmup_steps), alpha=end_lr_frac
        )
    elif schedule == "linear":
        if total_steps is None:
            raise ValueError("linear schedule needs total_steps")
        body = optax.linear_schedule(
            learning_rate, learning_rate * end_lr_frac, max(1, total_steps - warmup_steps)
        )
    else:
        raise ValueError(f"unknown schedule {schedule!r}")
    if warmup_steps > 0:
        warmup = optax.linear_schedule(0.0, learning_rate, warmup_steps)
        return optax.join_schedules([warmup, body], [warmup_steps])
    return body


def schedule_value(
    learning_rate: float,
    step: int,
    *,
    schedule: str = "constant",
    warmup_steps: int = 0,
    total_steps: Optional[int] = None,
    end_lr_frac: float = 0.0,
) -> float:
    """Host-math mirror of :func:`make_schedule` (same optax semantics).

    Used for the per-step ``lr`` metric: evaluating the optax schedule
    eagerly would dispatch device ops every step, which costs a full
    tunnel round-trip per op on the remote-TPU setup."""
    import math

    if warmup_steps > 0 and step < warmup_steps:
        return learning_rate * step / warmup_steps
    s = step - warmup_steps
    if schedule == "constant":
        return learning_rate
    horizon = max(1, (total_steps or 0) - warmup_steps)
    s = min(s, horizon)
    if schedule == "cosine":
        cos = 0.5 * (1.0 + math.cos(math.pi * s / horizon))
        return learning_rate * ((1.0 - end_lr_frac) * cos + end_lr_frac)
    if schedule == "linear":
        return learning_rate * (1.0 - (1.0 - end_lr_frac) * (s / horizon))
    raise ValueError(f"unknown schedule {schedule!r}")


def make_optimizer(
    learning_rate: float = 1e-4,
    weight_decay: float = 0.0,
    max_grad_norm: Optional[float] = 1.0,
    *,
    schedule: str = "constant",
    warmup_steps: int = 0,
    total_steps: Optional[int] = None,
) -> optax.GradientTransformation:
    lr = make_schedule(
        learning_rate,
        schedule=schedule,
        warmup_steps=warmup_steps,
        total_steps=total_steps,
    )
    txs = []
    if max_grad_norm is not None:
        txs.append(optax.clip_by_global_norm(max_grad_norm))
    txs.append(optax.adamw(lr, weight_decay=weight_decay))
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
        schedule: str = "constant",
        warmup_steps: int = 0,
        total_steps: Optional[int] = None,
    ):
        self.policy = policy
        self.mesh = mesh
        self.optimizer = make_optimizer(
            learning_rate,
            weight_decay,
            max_grad_norm,
            schedule=schedule,
            warmup_steps=warmup_steps,
            total_steps=total_steps,
        )
        self._schedule = lambda step: schedule_value(
            learning_rate,
            step,
            schedule=schedule,
            warmup_steps=warmup_steps,
            total_steps=total_steps,
        )
        self._rng = jax.random.PRNGKey(seed)
        self.params = None
        self.opt_state = None
        self.step_count = 0
        self._compiled = None
        self._eval_compiled = None

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
        """One sharded update. Returned metrics are DEVICE arrays ("lr" is
        host math) — fetching them every step would stall the pipeline one
        host-device round-trip per step (~30 ms on the tunneled TPU); call
        :meth:`fetch` at your logging cadence instead."""
        if self.params is None:
            raise RuntimeError("call init(params) first")
        batch = jax.device_put(batch, data_sharding(self.mesh, batch))
        if self._compiled is None:
            self._compile(batch)
        self._rng, sub = jax.random.split(self._rng)
        self.params, self.opt_state, metrics = self._compiled(
            self.params, self.opt_state, batch, sub
        )
        metrics["lr"] = float(self._schedule(self.step_count))
        self.step_count += 1
        return metrics

    @staticmethod
    def fetch(metrics: Dict[str, Any]) -> Dict[str, float]:
        """Materialize device metrics to host floats (one blocking sync)."""
        return {k: float(v) for k, v in metrics.items()}

    def prefetch_batches(self, iterable):
        """Device-put each batch (with its dp sharding) one step ahead, so
        the host->device transfer of batch t+1 overlaps the device running
        step t (transfers are async; the jit call picks up committed
        arrays without a second copy)."""
        prev = None
        for batch in iterable:
            batch = jax.device_put(batch, data_sharding(self.mesh, batch))
            if prev is not None:
                yield prev
            prev = batch
        if prev is not None:
            yield prev

    def eval_step(self, batch) -> Dict[str, Any]:
        """Validation pass: bc_loss with train=False (no dropout, no update)."""
        if self.params is None:
            raise RuntimeError("call init(params) first")
        batch = jax.device_put(batch, data_sharding(self.mesh, batch))
        if self._eval_compiled is None:
            self._eval_compiled = jax.jit(
                lambda p, b: bc_loss(self.policy, p, b, train=False)[1]
            )
        metrics = self._eval_compiled(self.params, batch)
        return jax.tree_util.tree_map(float, metrics)

    def _eval_step_device(self, batch):
        batch = jax.device_put(batch, data_sharding(self.mesh, batch))
        if self._eval_compiled is None:
            self._eval_compiled = jax.jit(
                lambda p, b: bc_loss(self.policy, p, b, train=False)[1]
            )
        return self._eval_compiled(self.params, batch)

    def evaluate(self, batches) -> Dict[str, Any]:
        """Mean metrics over an iterable of validation batches.

        Per-batch metrics stay on device (summed host-side as async arrays);
        the single blocking fetch happens in the final float conversion.

        Raises if the iterable is empty (an eval set smaller than the
        batch size yields zero batches — silently logging nothing would
        mask a misconfiguration)."""
        sums: Dict[str, Any] = {}
        n = 0
        for batch in batches:
            for k, v in self._eval_step_device(batch).items():
                sums[k] = sums.get(k, 0.0) + v
            n += 1
        if n == 0:
            raise ValueError(
                "evaluate() received no batches — is the eval set smaller "
                "than the batch size? (the dataset drops partial batches)"
            )
        return {
            "val/num_batches": float(n),
            **{f"val/{k}": float(v) / n for k, v in sums.items()},
        }

    # -- full train-state checkpointing (params + opt state + step + rng) --
    # The reference cannot save or resume at all (load-only torch ckpts,
    # vima/__init__.py:7-16); this is a framework addition.

    def save_state(self, path) -> None:
        import orbax.checkpoint as ocp

        from vima_tpu.ckpt.io import save_checkpoint

        path = _abspath(path)
        save_checkpoint(
            path, self.policy, self.params, extra={"train_steps": self.step_count}
        )
        # opt_state holds optax namedtuples; persist leaves and rebuild the
        # treedef from optimizer.init at restore time.
        leaves = jax.tree_util.tree_leaves(self.opt_state)
        ckptr = ocp.StandardCheckpointer()
        ckptr.save(
            path / "train_state",
            {
                "opt_leaves": {str(i): leaf for i, leaf in enumerate(leaves)},
                "rng": self._rng,
            },
            force=True,
        )
        ckptr.wait_until_finished()

    def restore_state(self, path) -> "Trainer":
        """Restore params/opt_state/step/rng saved by :meth:`save_state`."""
        import json

        import orbax.checkpoint as ocp

        from vima_tpu.ckpt.io import load_checkpoint

        path = _abspath(path)
        _, params = load_checkpoint(path)
        self.init(params)
        meta = json.loads((path / "policy.json").read_text())
        self.step_count = int(meta.get("extra", {}).get("train_steps", 0))
        ckptr = ocp.StandardCheckpointer()
        state = ckptr.restore(path / "train_state")
        leaves = [state["opt_leaves"][str(i)] for i in range(len(state["opt_leaves"]))]
        import numpy as np
        from jax.sharding import NamedSharding

        init_leaves, treedef = jax.tree_util.tree_flatten(self.opt_state)
        if len(leaves) != len(init_leaves):
            raise ValueError(
                f"train_state has {len(leaves)} optimizer leaves but this "
                f"optimizer expects {len(init_leaves)} — optimizer config "
                "changed since the checkpoint was saved"
            )
        placed = []
        for leaf, ref in zip(leaves, init_leaves):
            sh = getattr(ref, "sharding", None)
            if isinstance(sh, NamedSharding):
                placed.append(jax.device_put(leaf, sh))
            else:
                # orbax returns committed single-device arrays; hand jit an
                # uncommitted host value so GSPMD places it like eager init
                placed.append(np.asarray(leaf))
        self.opt_state = jax.tree_util.tree_unflatten(treedef, placed)
        self._rng = jnp.asarray(np.asarray(state["rng"]), dtype=jnp.uint32)
        return self
