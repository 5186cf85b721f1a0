"""Data-parallel training step (jit + sharding over a device Mesh).

Optimizer parity with the reference drivers (main_flow.py:209-210, :391-398,
:444-454): AdamW, OneCycle cosine LR with 5% warmup (pct_start=0.05),
global-norm gradient clipping at 1.0, and NaN-step skipping
(main_flow.py:438-439 — here via optax.apply_if_finite).

The train step is a pure function jit'd with NamedShardings: params/opt-state
replicated, batch sharded on the `data` axis. XLA derives the gradient
all-reduce over ICI from the output sharding — the DDP-equivalent collective,
no hand-written communication.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct
from jax.sharding import Mesh

from unimatch_tpu.config import ModelConfig, InferenceConfig
from unimatch_tpu.losses import flow_loss, stereo_loss, depth_loss, depth_grad_loss
from unimatch_tpu.parallel.mesh import replicated, batch_sharded


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    opt_state: Any
    tx: optax.GradientTransformation = struct.field(pytree_node=False)

    def apply_gradients(self, grads):
        updates, new_opt_state = self.tx.update(grads, self.opt_state, self.params)
        new_params = optax.apply_updates(self.params, updates)
        return self.replace(step=self.step + 1, params=new_params, opt_state=new_opt_state)


def make_lr_schedule(
    lr: float = 4e-4,
    total_steps: int = 100_000,
    pct_start: float = 0.05,
) -> optax.Schedule:
    """OneCycle cosine schedule, matching torch OneCycleLR defaults.

    optax's onecycle emits NaN for every step when a phase rounds to zero
    steps; keep the warmup phase >= 1 step for tiny (smoke-run) step counts.
    """
    total_steps = max(total_steps, 2)
    pct_start = max(pct_start, 1.0 / total_steps)
    return optax.cosine_onecycle_schedule(
        transition_steps=total_steps,
        peak_value=lr,
        pct_start=pct_start,
        div_factor=25.0,
        final_div_factor=1e4,
    )


def make_optimizer(
    lr: float = 4e-4,
    total_steps: int = 100_000,
    weight_decay: float = 1e-4,
    grad_clip: float = 1.0,
    pct_start: float = 0.05,
) -> optax.GradientTransformation:
    """AdamW + OneCycle schedule + clip + NaN-skip (reference main_flow.py:209-210)."""
    schedule = make_lr_schedule(lr, total_steps, pct_start)
    tx = optax.chain(
        optax.clip_by_global_norm(grad_clip),
        optax.adamw(schedule, weight_decay=weight_decay),
    )
    # skip non-finite steps (reference NaN-loss skip, main_flow.py:438)
    return optax.apply_if_finite(tx, max_consecutive_errors=100)


def create_train_state(
    model,
    rng: jax.Array,
    example_batch: Dict[str, jnp.ndarray],
    infer: InferenceConfig,
    tx: Optional[optax.GradientTransformation] = None,
    **model_kwargs,
) -> TrainState:
    tx = tx or make_optimizer()
    for key in ("intrinsics", "pose"):  # depth task needs camera geometry at init
        if key in example_batch and key not in model_kwargs:
            model_kwargs[key] = example_batch[key]
    params = model.init(
        rng, example_batch["img0"], example_batch["img1"], infer=infer, training=True,
        **model_kwargs,
    )["params"]
    return TrainState(step=jnp.zeros((), jnp.int32), params=params, opt_state=tx.init(params), tx=tx)


def task_loss(task: str, preds, batch, gamma: float = 0.9, max_flow: float = 400.0,
              depth_loss_weight: float = 20.0,
              depth_grad_loss_weight: float = 20.0) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    if task == "flow":
        return flow_loss(preds, batch["flow_gt"], batch["valid"], gamma=gamma, max_flow=max_flow)
    if task == "stereo":
        return stereo_loss(preds, batch["disp_gt"], batch["valid"], gamma=gamma)
    if task == "depth":
        # reference main_depth.py:381-401: weighted L1 + optional gradient loss
        l1 = depth_loss(preds, batch["depth_gt"], batch["valid"])
        metrics = {"depth_l1": l1}
        total = depth_loss_weight * l1
        if depth_grad_loss_weight > 0:
            gr = depth_grad_loss(preds, batch["depth_gt"], batch["valid"])
            total = total + depth_grad_loss_weight * gr
            metrics["depth_grad"] = gr
        return total, metrics
    raise ValueError(task)


def make_train_step(
    model,
    infer: InferenceConfig,
    mesh: Optional[Mesh] = None,
    **loss_kwargs,
) -> Callable[[TrainState, Dict[str, jnp.ndarray]], Tuple[TrainState, Dict[str, jnp.ndarray]]]:
    """Build the jit'd data-parallel train step for the model's task."""
    task = model.config.task

    def loss_fn(params, batch):
        kwargs = {}
        if task == "depth":
            kwargs = {"intrinsics": batch["intrinsics"], "pose": batch["pose"]}
        preds = model.apply(
            {"params": params}, batch["img0"], batch["img1"], infer=infer, training=True, **kwargs
        )["flow_preds"]
        loss, metrics = task_loss(task, preds, batch, **loss_kwargs)
        # final prediction rides along for image summaries; the train loop
        # pops it before pushing scalar metrics (reference logger.py:39-71)
        metrics = dict(metrics, _pred=preds[-1])
        return loss, metrics

    def step_fn(state: TrainState, batch):
        (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params, batch)
        new_state = state.apply_gradients(grads)
        metrics = dict(metrics)
        metrics["loss"] = loss
        return new_state, metrics

    if mesh is None:
        return jax.jit(step_fn, donate_argnums=(0,))

    rep = replicated(mesh)
    shd = batch_sharded(mesh)
    return jax.jit(
        step_fn,
        in_shardings=(rep, shd),
        out_shardings=(rep, rep),
        donate_argnums=(0,),
    )
