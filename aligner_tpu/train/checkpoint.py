"""Orbax checkpoint / resume for aligner training (SURVEY.md §5).

The reference has no checkpointing (no training loop in-snapshot); the
TPU framework uses Orbax — the idiomatic JAX checkpointing layer, async-
and multi-host-capable — to persist the full TrainState.
"""
from __future__ import annotations

import dataclasses
import json
import os

import orbax.checkpoint as ocp

CONFIG_FILENAME = "config.json"


def save_run_config(directory: str, model_config, extra: dict | None = None):
    """Persist the model config (a dataclass) next to the checkpoints so
    `align`/restore is self-contained — no need to re-pass matching
    --dim/--hidden/... flags (round-1 verdict item 4)."""
    os.makedirs(os.path.abspath(directory), exist_ok=True)
    rec = {
        "model_class": type(model_config).__name__.removesuffix("Config"),
        "model_config": dataclasses.asdict(model_config),
    }
    if extra:
        rec.update(extra)
    path = os.path.join(os.path.abspath(directory), CONFIG_FILENAME)
    with open(path, "w") as f:
        json.dump(rec, f, indent=1, sort_keys=True)
    return path


def load_run_config(directory: str) -> dict | None:
    """The dict written by `save_run_config`, or None for pre-config
    checkpoints."""
    path = os.path.join(os.path.abspath(directory), CONFIG_FILENAME)
    if not os.path.exists(path):
        return None
    with open(path) as f:
        rec = json.load(f)
    mc = rec.get("model_config")
    if (rec.get("model_class") == "OTA" and isinstance(mc, dict)
            and mc.get("model_pauses") and "pause_prior" not in mc):
        # Pause-aware checkpoints saved before the pause_prior knob
        # existed were trained under the then-only "inherit" prior;
        # letting OTAConfig's new default ("bridge") fill the gap would
        # silently change the prior lattice the restored params see.
        mc["pause_prior"] = "inherit"
    return rec


def latest_step(directory: str) -> int | None:
    """The newest checkpoint step under `directory`, or None if the
    directory holds no checkpoints. The single source of truth for what
    counts as a checkpoint entry (a digit-named subdirectory)."""
    directory = os.path.abspath(directory)
    if not os.path.isdir(directory):
        return None
    steps = [int(d) for d in os.listdir(directory) if d.isdigit()]
    return max(steps) if steps else None


def save_checkpoint(directory: str, state, step: int | None = None,
                    wait: bool = True):
    """Save a TrainState (or any pytree) under `directory/<step>`."""
    step = int(state.step) if step is None else step
    path = os.path.join(os.path.abspath(directory), str(step))
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, state, force=True)
    if wait:
        ckptr.wait_until_finished()
    return path


def restore_checkpoint(directory: str, target, step: int | None = None):
    """Restore into the structure of `target` (an abstract or concrete
    TrainState). If step is None, restores the latest."""
    directory = os.path.abspath(directory)
    if step is None:
        step = latest_step(directory)
        if step is None:
            raise FileNotFoundError(f"no checkpoints under {directory}")
    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(os.path.join(directory, str(step)), target)


def restore_params(directory: str, params_target, step: int | None = None):
    """Restore only the `params` subtree of a saved TrainState.

    Inference consumers (e.g. `aligner-tpu align`) don't know — and must
    not need to know — which optimizer/schedule the training run used:
    the opt_state pytree differs between a float LR, a schedule, and a
    clipping chain, and a full-TrainState restore would reject the
    mismatch. `params_target` is a concrete or abstract params pytree.
    """
    directory = os.path.abspath(directory)
    if step is None:
        step = latest_step(directory)
        if step is None:
            raise FileNotFoundError(f"no checkpoints under {directory}")
    ckptr = ocp.PyTreeCheckpointer()
    restored = ckptr.restore(
        os.path.join(directory, str(step)),
        args=ocp.args.PyTreeRestore(
            item={"params": params_target},
            restore_args=ocp.checkpoint_utils.construct_restore_args(
                {"params": params_target}),
            partial_restore=True))
    return restored["params"]
