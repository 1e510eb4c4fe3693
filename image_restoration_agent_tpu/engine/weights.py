"""Weight residency manager: the TPU-native GPUServiceManager.

The reference keeps one Flask process per model per conda env and, when GPU
util/memory crosses a threshold, kills the least-used service (min call
count, tie-break newest start — AgentApp/utils/GPUServiceManager.py:117-157).
Here all models live in one process; what gets managed is *HBM residency of
parameter pytrees*. Same policy, but eviction frees device buffers instead of
killing processes — reload is an orbax read / re-init, not a conda spawn.
"""

from __future__ import annotations

import threading
import time
from dataclasses import dataclass, field
from pathlib import Path
from typing import Any, Callable, Optional

import jax
import numpy as np


def params_nbytes(params) -> int:
    return sum(x.nbytes for x in jax.tree.leaves(params)
               if hasattr(x, "nbytes"))


@dataclass
class _Entry:
    params: Any
    nbytes: int
    call_count: int = 0
    loaded_at: float = field(default_factory=time.monotonic)
    last_used: float = field(default_factory=time.monotonic)


class WeightStore:
    """LRU-by-call-count parameter cache with an HBM byte budget.

    ``loader(name)`` produces the parameter pytree (orbax checkpoint, torch
    conversion, or deterministic random init). Eviction picks the minimum
    call_count and breaks ties by *newest* load time, matching the
    reference's kill_least_used_service selection.
    """

    def __init__(self, loader: Callable[[str], Any],
                 budget_bytes: int = 12 * 1024 ** 3):
        self._loader = loader
        self._budget = budget_bytes
        self._entries: dict[str, _Entry] = {}
        self._lock = threading.Lock()
        self.evictions: list[str] = []  # observability: eviction history

    @property
    def budget_bytes(self) -> int:
        return self._budget

    @property
    def resident(self) -> list[str]:
        return list(self._entries)

    @property
    def resident_bytes(self) -> int:
        return sum(e.nbytes for e in self._entries.values())

    def get(self, name: str):
        with self._lock:
            entry = self._entries.get(name)
            if entry is not None:
                entry.call_count += 1
                entry.last_used = time.monotonic()
                return entry.params
        # load outside the lock (may be slow)
        params = self._loader(name)
        nbytes = params_nbytes(params)
        with self._lock:
            self._evict_for(nbytes, incoming=name)
            self._entries[name] = _Entry(params, nbytes, call_count=1)
            return params

    def _evict_for(self, nbytes: int, incoming: str) -> None:
        while self._entries and self.resident_bytes + nbytes > self._budget:
            victim = min(
                self._entries.items(),
                key=lambda kv: (kv[1].call_count, -kv[1].loaded_at))[0]
            del self._entries[victim]
            self.evictions.append(victim)

    def drop(self, name: str) -> None:
        with self._lock:
            self._entries.pop(name, None)

    def stats(self) -> dict:
        with self._lock:
            return {
                name: {"nbytes": e.nbytes, "calls": e.call_count}
                for name, e in self._entries.items()
            }
