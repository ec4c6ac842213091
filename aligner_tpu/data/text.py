"""Minimal text front-end: character tokenizer with a stable vocabulary.

The reference delegates text processing to its (unmounted) ESPnet-based
branches; for a self-contained framework we provide a deterministic
character tokenizer sufficient for alignment training. Id 0 is reserved
for padding; unknown characters map to id 1.
"""
from __future__ import annotations

import dataclasses
import functools

import numpy as np

_DEFAULT_CHARS = (" abcdefghijklmnopqrstuvwxyz"
                  "ABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789"
                  ".,!?;:'\"-()")


@dataclasses.dataclass(frozen=True)
class CharTokenizer:
    chars: str = _DEFAULT_CHARS

    @property
    def pad_id(self) -> int:
        return 0

    @property
    def unk_id(self) -> int:
        return 1

    @property
    def vocab_size(self) -> int:
        return len(self.chars) + 2  # pad + unk

    def encode(self, text: str) -> np.ndarray:
        table = _char_table(self.chars)
        return np.asarray([table.get(c, self.unk_id) for c in text],
                          np.int32)

    def decode(self, ids) -> str:
        return "".join(self.chars[i - 2] if 2 <= i < self.vocab_size
                       else ("␣" if i == self.pad_id else "�")
                       for i in np.asarray(ids))


@functools.lru_cache(maxsize=8)
def _char_table(chars: str) -> dict:
    return {c: i + 2 for i, c in enumerate(chars)}
