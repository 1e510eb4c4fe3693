"""Sharded training step: dp over batch + fsdp/tp sharding of weights.

The reference trains its networks with per-GPU DataParallel / DeepSpeed
ZeRO-1 over NCCL (SURVEY.md §2.6). TPU-native equivalent: one jitted train
step over a ``Mesh`` with

- batch sharded over the ``data`` axis,
- parameters sharded over the ``model`` axis on their largest divisible
  dimension (FSDP-style; 1x1-conv kernels shard on output channels = tensor
  parallel for the channel-mixing matmuls),

and XLA inserting the all-reduce / all-gather collectives.
"""

from __future__ import annotations

from typing import Any, Callable

import flax.struct
import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


@flax.struct.dataclass
class TrainState:
    params: Any
    opt_state: Any
    step: jnp.ndarray


def charbonnier_loss(pred: jnp.ndarray, target: jnp.ndarray,
                     eps: float = 1e-3) -> jnp.ndarray:
    """Charbonnier (smooth L1) — the standard restoration training loss."""
    return jnp.mean(jnp.sqrt(jnp.square(pred - target) + eps * eps))


def param_sharding_rule(path, leaf, mesh: Mesh, axis: str = "model"):
    """Shard the largest dim divisible by the axis size; replicate otherwise."""
    size = mesh.shape[axis]
    spec = [None] * leaf.ndim
    dims = sorted(range(leaf.ndim), key=lambda d: -leaf.shape[d])
    for d in dims:
        if leaf.shape[d] % size == 0 and leaf.shape[d] >= size:
            spec[d] = axis
            break
    return NamedSharding(mesh, P(*spec))


def make_train_state(model, rng, sample, tx: optax.GradientTransformation):
    params = model.init(rng, sample)
    return TrainState(params=params, opt_state=tx.init(params),
                      step=jnp.zeros((), jnp.int32))


def make_sharded_train_step(
    model,
    tx: optax.GradientTransformation,
    mesh: Mesh,
    data_axis: str = "data",
    model_axis: str = "model",
    loss_fn: Callable = charbonnier_loss,
):
    """Returns (train_step, shard_state, shard_batch).

    ``train_step(state, lq, hq) -> (state, loss)`` is jitted with explicit
    in/out shardings over the mesh.
    """

    def step(state: TrainState, lq, hq):
        def loss_of(params):
            pred = model.apply(params, lq)
            return loss_fn(pred, hq)

        loss, grads = jax.value_and_grad(loss_of)(state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(params, opt_state, state.step + 1), loss

    def shard_state(state: TrainState) -> TrainState:
        shardings = jax.tree.map(
            lambda l: param_sharding_rule(None, l, mesh, model_axis),
            state.params)
        params = jax.device_put(state.params, shardings)
        opt_shardings = jax.tree.map(
            lambda l: (param_sharding_rule(None, l, mesh, model_axis)
                       if hasattr(l, "ndim") and l.ndim > 0
                       else NamedSharding(mesh, P())),
            state.opt_state)
        opt_state = jax.device_put(state.opt_state, opt_shardings)
        step_ = jax.device_put(state.step, NamedSharding(mesh, P()))
        return TrainState(params, opt_state, step_)

    def shard_batch(batch):
        return jax.device_put(batch, NamedSharding(mesh, P(data_axis)))

    jitted = jax.jit(step, donate_argnums=(0,))
    return jitted, shard_state, shard_batch
