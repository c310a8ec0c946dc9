"""Training machinery: train state, jitted data-parallel train step,
polynomial LR schedule, orbax checkpointing.

Behavioural twin of the reference trainer (train.py:11-68): Adam(1e-3),
per-epoch LR = lr0 * (1 - (e-1)/max_epochs)^0.9, multi-scale smooth-L1 loss,
per-epoch checkpoints. TPU-native differences: the step is one jit-compiled
program over a device mesh (batch sharded on the ``data`` axis, gradients
all-reduced by XLA); checkpoints carry optimizer state too (the reference
drops Adam moments on resume, train.py:18-21 — documented divergence, ours
resumes exactly).
"""
from __future__ import annotations

import dataclasses
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct

from mdfnet_tpu.config import ModelConfig, TrainConfig
from mdfnet_tpu.models.loss import multi_scale_depth_loss
from mdfnet_tpu.models.registry import build_model


class TrainState(struct.PyTreeNode):
    params: Any
    batch_stats: Any
    opt_state: Any
    epoch: jnp.ndarray  # scalar int32


def poly_lr(epoch: jnp.ndarray, base_lr: float, max_epochs: int,
            factor: float) -> jnp.ndarray:
    """lr0 * (1 - (epoch-1)/max_epochs)^factor — reference train.py:34."""
    frac = 1.0 - (epoch.astype(jnp.float32) - 1.0) / max_epochs
    return base_lr * jnp.power(frac, factor)


def make_optimizer() -> optax.GradientTransformation:
    """Adam with torch defaults; LR injected per-step via scale_by_learning_rate."""
    return optax.chain(
        optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8),
        optax.scale(-1.0),
    )


def create_train_state(rng: jax.Array, model_config: ModelConfig,
                       sample_batch: Dict[str, Any]) -> Tuple[Any, TrainState]:
    """Initialise model + optimizer. Returns (model, state)."""
    model = build_model(model_config)
    variables = model.init(rng, sample_batch["imgs"], sample_batch["extrinsics"],
                           sample_batch["intrinsics"], sample_batch["depth_range"],
                           train=True)
    tx = make_optimizer()
    state = TrainState(
        params=variables["params"],
        batch_stats=variables.get("batch_stats", {}),
        opt_state=tx.init(variables["params"]),
        epoch=jnp.asarray(1, jnp.int32),
    )
    return model, state


def make_train_step(model, train_config: TrainConfig, mesh=None,
                    axis: str = "data", force_shard_map: bool = False):
    """Build the jitted train step. donate state for in-place HBM updates.

    With ``mesh=None`` (or a 1-extent data axis) the step is a plain jit:
    data parallelism then comes from GSPMD — shard the batch over the mesh
    and XLA partitions the program and inserts the gradient all-reduce.
    That path cannot partition Pallas kernels, so it forces the XLA
    warp/conv implementations on multi-device runs.

    With a ``mesh`` whose ``data`` axis extent > 1 the step is built with
    jax.shard_map instead: each device runs the FULL per-shard program —
    Pallas kernels included (a shard_map body is a per-device program, so
    the splat-adjoint warp and custom-VJP conv3d train kernels ride the DP
    mesh unchanged) — and the collectives are explicit:

    - loss: masked sums/counts psum'd inside the loss (exact global-batch
      masked mean, identical to the single-device step);
    - grads: pmean of per-shard grads. The in-loss psum transposes to a
      psum of cotangents, so each shard's raw grad is already n_devices
      times its contribution to the global gradient; pmean cancels that
      factor and reproduces the single-device gradient exactly;
    - batch_stats: pmean of per-shard updated stats (per-shard batch
      statistics averaged — deviates from the GSPMD path's global-batch BN
      by the variance-of-means term; the reference's DataParallel keeps
      replica-0 stats, train.py:24-26, so neither torch nor either of our
      paths is "the" semantics — all are test-pinned to train equivalently).
    """
    tx = make_optimizer()

    def loss_fn(params, batch_stats, batch, axis_name=None):
        outputs, mutated = model.apply(
            {"params": params, "batch_stats": batch_stats},
            batch["imgs"], batch["extrinsics"], batch["intrinsics"],
            batch["depth_range"], train=True, mutable=["batch_stats"])
        loss = multi_scale_depth_loss(outputs["depth"], batch["ref_depths"],
                                      batch["depth_range"], axis_name=axis_name)
        return loss, mutated["batch_stats"]

    def optimizer_apply(state, grads, new_stats, loss):
        lr = poly_lr(state.epoch, train_config.lr, train_config.max_epochs,
                     train_config.lr_decay_factor)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        updates = jax.tree_util.tree_map(lambda u: u * lr, updates)
        params = optax.apply_updates(state.params, updates)
        return dataclasses.replace(state, params=params, batch_stats=new_stats,
                                   opt_state=opt_state), loss

    def train_step(state: TrainState, batch) -> Tuple[TrainState, jnp.ndarray]:
        (loss, new_stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, state.batch_stats, batch)
        return optimizer_apply(state, grads, new_stats, loss)

    if mesh is None or (mesh.shape.get(axis, 1) == 1 and not force_shard_map):
        # force_shard_map=True keeps the shard_map code path even on a
        # 1-extent data axis: a data=1 mesh on the real chip then executes
        # the IDENTICAL per-device program (collectives included) that an
        # n-chip mesh would run — the single-chip certification of the
        # multi-chip Pallas path (VERDICT r3 item 1b).
        return jax.jit(train_step, donate_argnums=(0,))

    from jax.sharding import PartitionSpec as P

    def shard_step(state: TrainState, batch):
        # loss_fn psums masked sums/counts internally -> the per-shard loss
        # IS the global loss. Because psum transposes to psum, each shard's
        # reverse pass already receives the full global cotangent, so the
        # per-shard grad is n_devices x that shard's contribution to the
        # global gradient; pmean (NOT psum) therefore reconstructs the exact
        # single-device gradient (psum would over-count by n_devices —
        # pinned by tests/test_train.py raw-gradient comparison).
        (loss, new_stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, state.batch_stats, batch, axis)
        grads = jax.lax.pmean(grads, axis)
        new_stats = jax.lax.pmean(new_stats, axis)
        return optimizer_apply(state, grads, new_stats, loss)

    fn = jax.shard_map(shard_step, mesh=mesh,
                       in_specs=(P(), P(axis)), out_specs=(P(), P()),
                       check_vma=False)
    return jax.jit(fn, donate_argnums=(0,))


# ------------------------------------------------------------------ ckpt io

def save_checkpoint(path: str, state: TrainState) -> None:
    """Orbax checkpoint holding params + batch_stats + optimizer + epoch."""
    import orbax.checkpoint as ocp
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, jax.device_get(state), force=True)
    ckptr.wait_until_finished()


def restore_checkpoint(path: str, template: TrainState) -> TrainState:
    import orbax.checkpoint as ocp
    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(path, template)


def import_reference_checkpoint(path: str, state: TrainState) -> TrainState:
    """Warm-start from a reference .pth (weights + epoch; fresh optimizer,
    mirroring the reference's resume which drops Adam moments)."""
    from mdfnet_tpu.utils.pth_import import load_reference_checkpoint
    variables, epoch = load_reference_checkpoint(path)
    return dataclasses.replace(
        state,
        params=jax.tree_util.tree_map(jnp.asarray, variables["params"]),
        batch_stats=jax.tree_util.tree_map(jnp.asarray, variables["batch_stats"]),
        epoch=jnp.asarray(epoch + 1, jnp.int32),
    )
