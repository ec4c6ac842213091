"""Training loop: bucketed batches, per-shape jit caching, metrics,
periodic checkpointing. The reference has no training loop (SURVEY.md §5);
this is the K8 integration layer driven by the demo CLI."""
from __future__ import annotations

import time
from collections.abc import Iterable

import jax
import jax.numpy as jnp
import numpy as np

from .checkpoint import save_checkpoint, save_run_config
from .step import create_train_state, make_train_step


def train_aligner(model, batches: Iterable[dict], *, steps: int,
                  learning_rate: float = 3e-4, mesh=None,
                  bin_start: int = 500, bin_ramp: int = 2000,
                  log_every: int = 50, checkpoint_dir: str | None = None,
                  checkpoint_every: int = 1000, log_fn=print,
                  config_extra: dict | None = None):
    """Train on an iterable of padded batch dicts (cycled). Returns the
    final TrainState and a list of metric records. When checkpointing,
    the model config (and any `config_extra`, e.g. tokenizer info) is
    serialized alongside so restore is self-contained."""
    batches = list(batches)
    if checkpoint_dir is not None and hasattr(model, "config"):
        save_run_config(checkpoint_dir, model.config, config_extra)
    first = {k: jnp.asarray(v) for k, v in batches[0].items()}
    state = create_train_state(jax.random.PRNGKey(0), model, first,
                               learning_rate=learning_rate, mesh=mesh)
    step_fn = make_train_step(model, mesh=mesh, bin_start=bin_start,
                              bin_ramp=bin_ramp, donate=False)
    history = []
    t0 = time.time()
    i = 0
    while i < steps:
        for b in batches:
            if i >= steps:
                break
            batch = {k: jnp.asarray(v) for k, v in b.items()}
            state, metrics = step_fn(state, batch)
            i += 1
            if i % log_every == 0 or i == steps:
                rec = {k: float(v) for k, v in metrics.items()}
                rec.update(step=i, wall_s=round(time.time() - t0, 1))
                history.append(rec)
                detail = "  ".join(
                    f"{k.removeprefix('loss_')} {v:8.4f}"
                    for k, v in rec.items()
                    if k not in ("loss", "step", "wall_s") )
                log_fn(f"step {i:6d}  loss {rec['loss']:8.4f}  "
                       f"{detail}  [{rec['wall_s']}s]")
            if checkpoint_dir and i % checkpoint_every == 0:
                save_checkpoint(checkpoint_dir, state)
    if checkpoint_dir:
        save_checkpoint(checkpoint_dir, state)
    return state, history
