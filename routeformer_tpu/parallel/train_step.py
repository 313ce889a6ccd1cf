"""Jitted, mesh-sharded train/eval step builders.

TPU-native replacement for the reference's Lightning+DDP training loop
(reference ``experiments/full_comparison.py:470-531,794-842``): the model is
split into (graphdef, params, state), the step is a pure function jitted
with explicit shardings — batch over the ``data`` axis, params replicated or
tensor-sharded over ``model`` — and GSPMD inserts the gradient psum that DDP
did with NCCL all-reduce.

Epoch enters as a traced scalar (discount schedule, dense-loss activation),
so one compiled program covers the entire 200-epoch schedule.
"""

from typing import Callable, Optional

import jax
import optax
from flax import nnx
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from routeformer_tpu.parallel.mesh import DATA_AXIS, param_shardings


def _batch_sharding(mesh: Mesh):
    def spec(x):
        return NamedSharding(mesh, P(DATA_AXIS, *([None] * (max(x.ndim, 1) - 1))))

    return spec


def make_train_step(
    model: nnx.Module,
    tx: optax.GradientTransformation,
    loss_fn: Callable,
    mesh: Optional[Mesh] = None,
    min_shard_dim: int = 512,
    fsdp: bool = False,
):
    """Build ``(step_fn, params, state, opt_state)`` for a model.

    ``loss_fn(model, input_batch, target_batch, epoch) -> (loss, metrics)``.

    The returned ``step_fn(params, state, opt_state, input_batch,
    target_batch, epoch)`` returns ``(params, state, opt_state, metrics)``
    and is jitted; with a mesh, inputs/outputs carry NamedShardings.

    ``fsdp=True`` additionally shards large parameters and their optimizer
    slots over the ``data`` axis (ZeRO-3 memory regime): per-rank HBM for
    params/optimizer drops ~n_data-fold on eligible tensors, at the cost
    of GSPMD-inserted all-gathers in forward/backward and a gradient
    reduce-scatter — identical math to plain DP.
    """
    model.train()
    graphdef, params, state = nnx.split(model, nnx.Param, ...)

    def step(params, state, opt_state, input_batch, target_batch, epoch):
        # Merge at the jit trace level, differentiate with nnx.value_and_grad
        # (plain jax.grad over the state pytree would mutate rng counters
        # across trace levels — flax forbids that).
        model = nnx.merge(graphdef, params, state)

        def compute_loss(m):
            return loss_fn(m, input_batch, target_batch, epoch)

        grad_fn = nnx.value_and_grad(compute_loss, has_aux=True)
        (loss, metrics), grads = grad_fn(model)
        # Re-extract params (unchanged) and mutated state (rng counters,
        # batch stats) after the forward.
        _, cur_params, new_state = nnx.split(model, nnx.Param, ...)
        updates, new_opt_state = tx.update(grads, opt_state, cur_params)
        new_params = optax.apply_updates(cur_params, updates)
        metrics = dict(metrics)
        metrics["total_loss"] = loss
        metrics["grad_norm"] = optax.global_norm(grads)
        return new_params, new_state, new_opt_state, metrics


    opt_state = tx.init(params)

    if mesh is None:
        return jax.jit(step, donate_argnums=(0, 1, 2)), params, state, opt_state

    # Shardings: params per TP (+optional FSDP) rule, state/opt-state
    # mirroring params where shaped alike, batch over data axis, epoch
    # replicated.
    p_shard = param_shardings(params, mesh, min_shard_dim, fsdp=fsdp)
    replicated = NamedSharding(mesh, P())
    s_shard = jax.tree.map(lambda x: replicated, state)
    o_shard = param_shardings(opt_state, mesh, min_shard_dim, fsdp=fsdp)
    b_spec = _batch_sharding(mesh)

    params = jax.tree.map(jax.device_put, params, p_shard)
    state = jax.tree.map(jax.device_put, state, s_shard)
    opt_state = jax.tree.map(jax.device_put, opt_state, o_shard)

    def place_batches(input_batch, target_batch):
        put = lambda x: jax.device_put(x, b_spec(x))
        return jax.tree.map(put, input_batch), jax.tree.map(put, target_batch)

    step_fn = jax.jit(
        step,
        in_shardings=(p_shard, s_shard, o_shard, None, None, None),
        donate_argnums=(0, 1, 2),
    )
    step_fn.place_batches = place_batches
    return step_fn, params, state, opt_state


def make_eval_step(
    model: nnx.Module,
    eval_fn: Callable,
    mesh: Optional[Mesh] = None,
):
    """Build a jitted eval step: ``eval_fn(model, batch, ...) -> pytree``."""
    model.eval()
    graphdef, params, state = nnx.split(model, nnx.Param, ...)

    def step(params, state, *args):
        m = nnx.merge(graphdef, params, state)
        return eval_fn(m, *args)

    return jax.jit(step), params, state
