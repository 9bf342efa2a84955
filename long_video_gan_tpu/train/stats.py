"""Training statistics bus.

Functional replacement for the reference's global `training_stats` registry
(torch_utils/training_stats.py): update steps return dicts of
(count, sum, sum-of-squares) moment triples already reduced over the global
batch (cross-device reduction is implicit under pjit), and a host-side
Collector accumulates them between ticks and reports mean/std deltas —
same semantics as Collector.update()/as_dict() (training_stats.py:113-230)
without a process-global bus or an extra all_reduce.
"""

from __future__ import annotations

import re
from typing import Optional

import jax.numpy as jnp
import numpy as np


def moments(x) -> jnp.ndarray:
    """[count, sum, sum of squares] of all elements, as float32 (the same
    triple the reference accumulates per stat, training_stats.py:79-99)."""
    x = jnp.asarray(x, jnp.float32)
    return jnp.stack([jnp.asarray(x.size, jnp.float32), jnp.sum(x), jnp.sum(jnp.square(x))])


def scalar_moments(value) -> jnp.ndarray:
    v = jnp.asarray(value, jnp.float32)
    return jnp.stack([jnp.ones(()), v, jnp.square(v)])


class Collector:
    """Accumulates moment dicts host-side; mean/std over the window since the
    previous update() call."""

    def __init__(self, regex: str = ".*"):
        self._regex = re.compile(regex)
        self._totals: dict[str, np.ndarray] = {}
        self._deltas: dict[str, np.ndarray] = {}

    def report(self, stats: dict[str, jnp.ndarray]) -> None:
        for name, m in stats.items():
            if not self._regex.fullmatch(name):
                continue
            m = np.asarray(m, np.float64)
            self._totals[name] = self._totals.get(name, np.zeros(3)) + m

    def update(self) -> None:
        """Snapshot the window: deltas since the last update."""
        if not hasattr(self, "_prev"):
            self._prev = {}
        self._deltas = {
            name: total - self._prev.get(name, np.zeros(3))
            for name, total in self._totals.items()
        }
        self._prev = {name: total.copy() for name, total in self._totals.items()}

    def names(self):
        return list(self._deltas.keys())

    def mean(self, name: str) -> float:
        d = self._deltas.get(name)
        if d is None or d[0] == 0:
            return float("nan")
        return float(d[1] / d[0])

    def std(self, name: str) -> float:
        d = self._deltas.get(name)
        if d is None or d[0] == 0 or not np.isfinite(d[1] / d[0]):
            return 0.0
        if d[0] == 1:
            return 0.0
        mean = d[1] / d[0]
        raw_var = d[2] / d[0]
        return float(np.sqrt(max(raw_var - mean ** 2, 0)))

    def __getitem__(self, name: str) -> float:
        return self.mean(name)

    def as_dict(self) -> dict[str, dict[str, float]]:
        return {name: dict(mean=self.mean(name), std=self.std(name), num=float(self._deltas[name][0]))
                for name in self._deltas}
