"""Training observability: EMA-smoothed progress display + append-only CSV.

Parity target: style/utils/misc.py:17-82 (ProgressBar with momentum-.99 EMA)
and style/utils/data.py:27-46 + train-model.py:143-149 (flattened loss dict to
training.csv, one row per iteration, header on create). Adds step timing and an
optional jax profiler trace hook — the reference has no profiling at all
(SURVEY.md §5)."""

from __future__ import annotations

import contextlib
import math
import time
from typing import Dict, Optional

from tqdm import tqdm

from mst_tpu.utils.data import save_to_csv


class EmaMeter:
    """Biased EMA metric tracker (parity: ProgressBar's update_values,
    utils/misc.py:49-63: sum/seen pairs each decayed by momentum)."""

    def __init__(self, momentum: float = 0.99):
        self.momentum = momentum
        self.sums: Dict[str, float] = {}
        self.seen: Dict[str, float] = {}

    def update(self, n: float = 1, **values):
        for key, value in values.items():
            if value is None or (isinstance(value, float) and math.isnan(value)):
                continue
            self.sums[key] = self.sums.get(key, 0.0) * self.momentum + value * n
            self.seen[key] = self.seen.get(key, 0.0) * self.momentum + n

    @property
    def averages(self) -> Dict[str, float]:
        return {k: self.sums[k] / self.seen[k] for k in self.sums}


class ProgressBar:
    """tqdm wrapper showing the EMA averages as a postfix, with per-metric
    min/max tracking (parity: utils/misc.py:17-82, incl. show_min_for /
    show_max_for, the ``biased``/``initial_values`` EMA variant, and
    auto-close when n_iterations is reached).

    NOTE: the reference's min/max update uses ``self.min_values.get(k) or
    math.inf`` (utils/misc.py:61-64) — a truthiness bug that RESETS a
    min/max of exactly 0.0 on the next update. This keeps the intended
    behavior (a 0.0 extremum sticks), not the bug."""

    def __init__(self, n_iterations: Optional[int] = None,
                 momentum: float = 0.99, biased: bool = False,
                 show_min_for=(), show_max_for=()):
        self.n_iterations = n_iterations
        self.momentum = momentum
        self.biased = biased
        self.meter = EmaMeter(momentum)
        self.avg_values: Dict[str, float] = {}
        self.show_min_for = show_min_for
        self.show_max_for = show_max_for
        self.min_values: Dict[str, float] = {}
        self.max_values: Dict[str, float] = {}
        self.pbar = tqdm(total=n_iterations)

    def initial_values(self, **values):
        """Seed the EMA and switch to the biased update
        (parity: utils/misc.py:39-41)."""
        self.avg_values.update(values)
        self.biased = True

    def add(self, n: int = 1, **values):
        self.pbar.update(n)
        self.update_values(n, **values)
        if self.pbar.n == self.n_iterations:
            self.close()

    def update_values(self, n: int = 1, **values):
        if self.biased:
            # plain biased EMA toward the seeded values (utils/misc.py:51-54)
            for key, value in values.items():
                if value is None:
                    continue
                self.avg_values[key] = (self.avg_values.get(key, 0.0)
                                        * self.momentum
                                        + value * (1 - self.momentum))
        else:
            self.meter.update(n, **values)
            self.avg_values = self.meter.averages
        for key, avg in self.avg_values.items():
            self.min_values[key] = min(avg, self.min_values.get(key,
                                                               math.inf))
            self.max_values[key] = max(avg, self.max_values.get(key,
                                                               -math.inf))
        parts = [f"{k}: {v:.2f}" for k, v in self.avg_values.items()]
        parts += [f"min {k}: {v:.2f}" for k, v in self.min_values.items()
                  if k in self.show_min_for]
        parts += [f"max {k}: {v:.2f}" for k, v in self.max_values.items()
                  if k in self.show_max_for]
        self.pbar.set_postfix_str(", ".join(parts))

    def close(self):
        self.pbar.close()

    def __getitem__(self, key):
        return self.avg_values[key]

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


class CsvLogger:
    """Append-mode dict-row CSV with header-on-create — a thin stateful
    wrapper over mst_tpu.utils.data.save_to_csv (parity: train-model.py:143-144
    feeding utils/data.py:27-46)."""

    def __init__(self, path: str):
        self.path = path

    def append(self, **row):
        # pass the row via `data`, not **row: row keys named like
        # save_to_csv's own parameters (path/data/fieldnames/when_exists)
        # must land in the CSV, not collide with them
        save_to_csv(self.path, data=[row])


def flatten_losses(losses, prefix: str = "") -> Dict[str, float]:
    """LossDict -> the reference's flattened CSV column names
    (flatten_dict(..., reducer='underscore'), train-model.py:148)."""
    nested = losses.as_nested_dict() if hasattr(losses, "as_nested_dict") \
        else losses
    out: Dict[str, float] = {}

    def walk(d, path):
        for key, value in d.items():
            name = f"{path}_{key}" if path else key
            if isinstance(value, dict):
                walk(value, name)
            elif value is None:
                out[name] = None
            else:
                out[name] = float(value)
    walk(nested, prefix)
    return out


class StepTimer:
    """Wall-clock per-step timing with warmup discard (new capability)."""

    def __init__(self, warmup: int = 2):
        self.warmup = warmup
        self.times = []
        self._t0 = None

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        self.times.append(time.perf_counter() - self._t0)

    @property
    def mean(self) -> float:
        steady = self.times[self.warmup:] or self.times
        return sum(steady) / max(len(steady), 1)


@contextlib.contextmanager
def profiler_trace(log_dir: Optional[str]):
    """jax.profiler trace scope; no-op when log_dir is None."""
    if log_dir is None:
        yield
        return
    import jax
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
