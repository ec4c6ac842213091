"""Batch alignment serving helper.

`BatchAligner` wraps the fastest kernel path (time-major Pallas MAS,
docs/PERF.md) behind a production-shaped interface: callers hand over
ragged per-utterance lattices; the aligner pads them to a fixed bucket
shape (one compiled program per bucket), runs the single-launch kernels,
and returns per-utterance durations (and optionally paths) trimmed back
to true lengths.

    aligner = BatchAligner(max_text=128, max_mel=1024)
    durations = aligner.align_durations(lattices)   # list of [t_x, t_y]

Design notes (measured in docs/PERF.md):
* The kernels are fed time-major ([T_mel, B, T_text]) — the layout that
  avoids the reference-layout conversion which dominates at large B.
* Every kernel call uses the exact (max_mel, max_batch, max_text) bucket
  shape: larger requests are sliced, and the final partial slice is
  padded with t_x = 0 rows (which the kernels' validity gate turns into
  all-zero paths), so there is exactly ONE compiled program per bucket
  and no mid-request recompiles.
* `align_durations` runs a durations-only program (the [B, T_x] frame
  counts), so only ~0.5 KB per utterance crosses the device boundary;
  `align` additionally fetches the full paths.
* Paths are bit-identical to the reference kernel (the framework-wide
  contract); durations are their frame counts.
"""
from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from .ops.mas_pallas import mas_pallas_tm


class BatchAligner:
    """Padded-bucket MAS serving over the time-major kernel path.

    max_text / max_mel: bucket shape every request is padded to (pick
    the corpus maxima; requests beyond them raise). max_batch: slice
    size per kernel call (compiled once). interpret: forced interpreter
    mode for tests/CPU.
    """

    def __init__(self, max_text: int = 128, max_mel: int = 1024,
                 max_batch: int = 64, interpret: bool | None = None):
        self.max_text = int(max_text)
        self.max_mel = int(max_mel)
        self.max_batch = int(max_batch)
        self._interpret = interpret

        def _paths(value_tm, t_x, t_y):
            path_tm = mas_pallas_tm(value_tm, t_x, t_y,
                                    interpret=self._interpret)
            return path_tm, path_tm.astype(jnp.int32).sum(0)

        def _durations(value_tm, t_x, t_y):
            path_tm = mas_pallas_tm(value_tm, t_x, t_y,
                                    interpret=self._interpret)
            return path_tm.astype(jnp.int32).sum(0)     # [B, T_x]

        self._paths = jax.jit(_paths)
        self._durations = jax.jit(_durations)

    def _pad_slice(self, lattices):
        """Pad a group of <= max_batch lattices to the full bucket shape
        (batch included — padded rows get t_x = 0, which the kernels'
        validity gate maps to all-zero paths)."""
        B = self.max_batch
        vt = np.zeros((self.max_mel, B, self.max_text), np.float32)
        t_x = np.zeros((B,), np.int32)
        t_y = np.zeros((B,), np.int32)
        for i, lat in enumerate(lattices):
            lat = np.asarray(lat, np.float32)
            tx, ty = lat.shape
            if tx > self.max_text or ty > self.max_mel:
                raise ValueError(
                    f"lattice {i} is {tx}x{ty}, exceeds the bucket "
                    f"{self.max_text}x{self.max_mel}; build a larger "
                    f"BatchAligner")
            vt[:ty, i, :tx] = lat.T
            t_x[i], t_y[i] = tx, ty
        return jnp.asarray(vt), jnp.asarray(t_x), jnp.asarray(t_y)

    def _slices(self, lattices):
        for s in range(0, len(lattices), self.max_batch):
            group = lattices[s:s + self.max_batch]
            yield group, self._pad_slice(group)

    def align(self, lattices):
        """lattices: sequence of [t_x_i, t_y_i] log-likelihood arrays
        (the reference's per-utterance orientation). Returns a list of
        (path [t_x_i, t_y_i] int8, durations [t_x_i] int32) tuples."""
        out = []
        for group, (vt, t_x, t_y) in self._slices(lattices):
            path_tm, durs = self._paths(vt, t_x, t_y)
            path_np = np.asarray(path_tm)      # [T_mel, B, T_text]
            durs_np = np.asarray(durs)
            for i, lat in enumerate(group):
                tx, ty = np.shape(lat)
                out.append((path_np[:ty, i, :tx].T.copy(),
                            durs_np[i, :tx].copy()))
        return out

    def align_durations(self, lattices):
        """Durations only (the cheap path — no full-path transfer):
        list of int32 arrays [t_x_i] summing to t_y_i each."""
        out = []
        for group, (vt, t_x, t_y) in self._slices(lattices):
            durs_np = np.asarray(self._durations(vt, t_x, t_y))
            for i, lat in enumerate(group):
                tx = np.shape(lat)[0]
                out.append(durs_np[i, :tx].copy())
        return out
