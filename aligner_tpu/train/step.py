"""Jitted / sharded training step for the OTA aligner — K8.

The reference has no training loop (SURVEY.md §5: ABSENT); the capability
contract is BASELINE.json config 5 — MAS inside a jitted train step at
batch=64, T_mel=2048, no host callback. This module provides that step:
one XLA program containing encoders, lattice, forward-sum loss (custom
VJP), Pallas MAS binarisation, bin loss, and the optimizer update.

Multi-chip: `make_train_step(model, mesh=...)` shards the batch over the
``data`` axis and the encoder channel dims over ``model`` (see
parallel/mesh.py); XLA inserts the gradient psum and any tensor-parallel
collectives over ICI.
"""
from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import optax
from flax.training import train_state

from ..parallel.mesh import batch_sharding, replicated, shard_params


class TrainState(train_state.TrainState):
    pass


def _shard_opt_state(opt_state, params, param_shardings, mesh):
    """Shard optimizer-state subtrees that mirror the param pytree (adam
    mu/nu) exactly like the params; everything else (step counts, scalar
    schedule state) is replicated. Keeps the moments co-located with
    model-sharded params instead of resharding them every step."""
    params_def = jax.tree_util.tree_structure(params)
    rep = replicated(mesh)

    def rec(node):
        if jax.tree_util.tree_structure(node) == params_def:
            return jax.device_put(node, param_shardings)
        if isinstance(node, tuple):  # optax chains / NamedTuple states
            children = [rec(c) for c in node]
            return (type(node)(*children) if hasattr(node, "_fields")
                    else tuple(children))
        if isinstance(node, (list,)):
            return [rec(c) for c in node]
        if isinstance(node, dict):
            return {k: rec(v) for k, v in node.items()}
        return jax.device_put(node, rep)

    return rec(opt_state)


def make_lr_schedule(learning_rate: float, *, warmup_steps: int = 0,
                     decay_steps: int | None = None,
                     schedule: str = "constant",
                     final_scale: float = 0.1):
    """Learning-rate schedule factory.

    schedule: "constant" (optionally with linear warmup) or "cosine"
    (linear warmup -> cosine decay to final_scale * learning_rate over
    decay_steps). Returns an optax schedule (callable step -> lr).
    """
    if schedule == "constant":
        if warmup_steps <= 0:
            return optax.constant_schedule(learning_rate)
        return optax.linear_schedule(0.0, learning_rate, warmup_steps)
    if schedule == "cosine":
        if decay_steps is None:
            raise ValueError("cosine schedule requires decay_steps")
        return optax.warmup_cosine_decay_schedule(
            init_value=0.0, peak_value=learning_rate,
            warmup_steps=max(warmup_steps, 1),
            decay_steps=max(decay_steps, warmup_steps + 1),
            end_value=final_scale * learning_rate)
    raise ValueError(f"unknown schedule: {schedule!r}")


def create_train_state(rng, model, example_batch, learning_rate=1e-4,
                       weight_decay: float = 1e-6, mesh=None,
                       grad_clip_norm: float | None = None) -> TrainState:
    """Init params and the optimizer.

    learning_rate: float (constant) or an optax schedule from
    make_lr_schedule. grad_clip_norm: clip gradients by global norm
    before the adamw update (None = no clipping).
    """
    params = model.init(rng, example_batch["tokens"], example_batch["mel"],
                        example_batch["text_lengths"],
                        example_batch["mel_lengths"])["params"]
    tx = optax.adamw(learning_rate, weight_decay=weight_decay)
    if grad_clip_norm is not None:
        tx = optax.chain(optax.clip_by_global_norm(grad_clip_norm), tx)
    state = TrainState.create(apply_fn=model.apply, params=params, tx=tx)
    if mesh is not None:
        sh = shard_params(state.params, mesh)
        params = jax.device_put(state.params, sh)
        opt_state = _shard_opt_state(state.opt_state, state.params, sh, mesh)
        state = state.replace(params=params, opt_state=opt_state)
    return state


def bin_loss_weight(step, start: int = 1000, ramp: int = 10000,
                    max_weight: float = 1.0):
    """OTA-style annealing: binarisation loss off until `start`, then
    linear ramp to `max_weight` over `ramp` steps."""
    w = (step - start) / max(ramp, 1)
    return jnp.clip(w, 0.0, 1.0) * max_weight


def make_train_step(model, mesh=None, *, bin_start: int = 1000,
                    bin_ramp: int = 10000, recon_weight: float = 1.0,
                    donate: bool = True, objective=None,
                    apply_extra=None):
    """Returns step(state, batch) -> (state, metrics), fully jitted.

    The default objective is the OTA schedule (forward-sum + annealed bin
    loss + optional reconstruction). For other model families pass
    `objective(out, step) -> (loss, extra_metrics)` — e.g. for
    MoBoAligner `lambda out, _: (out["loss_mobo"], {})` or for
    RoMoAligner `lambda out, _: (out["loss"], {})`.

    apply_extra: optional `fn(step_no) -> dict` of extra keyword args
    for model.apply, evaluated on the traced step counter inside the
    jitted program (so step-dependent schedules — e.g. a pause-bias
    curriculum — cost no recompiles). Must be jax-traceable.
    """

    obj = objective or make_default_objective(bin_start, bin_ramp,
                                              recon_weight)

    def step(state: TrainState, batch: dict[str, Any]):
        extra_kw = apply_extra(state.step) if apply_extra else {}

        def loss_fn(params):
            out = model.apply({"params": params}, batch["tokens"],
                              batch["mel"], batch["text_lengths"],
                              batch["mel_lengths"], **extra_kw)
            loss, extra = obj(out, state.step)
            return loss, extra

        (loss, extra), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        new_state = state.apply_gradients(grads=grads)
        metrics = {"loss": loss, **extra}
        return new_state, metrics

    donate_argnums = (0,) if donate else ()
    if mesh is None:
        return jax.jit(step, donate_argnums=donate_argnums)
    data = batch_sharding(mesh)
    return jax.jit(step, in_shardings=(None, data),
                   donate_argnums=donate_argnums)


def make_default_objective(bin_start: int = 1000, bin_ramp: int = 10000,
                           recon_weight: float = 1.0):
    """The OTA loss schedule as a standalone objective(out, step) — shared
    by make_train_step and make_eval_step so validation uses the same
    weighting as training at the current step."""

    def objective(out, step_no):
        w_bin = bin_loss_weight(step_no, bin_start, bin_ramp)
        loss = (out["loss_forward_sum"] + w_bin * out["loss_bin"]
                + recon_weight * out.get("loss_recon", 0.0))
        return loss, {
            "loss_forward_sum": out["loss_forward_sum"],
            "loss_bin": out["loss_bin"],
            "bin_weight": w_bin,
            "mean_max_attn": jnp.mean(
                jnp.max(jnp.exp(out["log_attn"]), axis=-1)),
        }

    return objective


def make_eval_step(model, mesh=None, *, bin_start: int = 1000,
                   bin_ramp: int = 10000, recon_weight: float = 1.0,
                   objective=None, apply_extra=None):
    """Returns eval(state, batch) -> metrics: the training objective
    evaluated at the state's current step, no gradient, no update.
    apply_extra: as in make_train_step."""
    obj = objective or make_default_objective(bin_start, bin_ramp,
                                              recon_weight)

    def evaluate(state: TrainState, batch: dict[str, Any]):
        extra_kw = apply_extra(state.step) if apply_extra else {}
        out = model.apply({"params": state.params}, batch["tokens"],
                          batch["mel"], batch["text_lengths"],
                          batch["mel_lengths"], **extra_kw)
        loss, extra = obj(out, state.step)
        return {"loss": loss, **extra}

    if mesh is None:
        return jax.jit(evaluate)
    data = batch_sharding(mesh)
    return jax.jit(evaluate, in_shardings=(None, data))
