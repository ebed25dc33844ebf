"""Tracing / profiling hooks (SURVEY.md §5.1).

Reference repo has none (``/root/reference/README.md:1-2``). Build:
``jax.profiler.trace`` context around N steps behind a flag (xprof /
TensorBoard-viewable), ``annotate`` scopes per layer, and the NaN watchdog
used by the training loops (SURVEY §5.3 failure detection).
"""

from __future__ import annotations

import contextlib
from typing import Iterator, Optional

import jax
import jax.numpy as jnp
import numpy as np


@contextlib.contextmanager
def maybe_trace(logdir: Optional[str]) -> Iterator[None]:
    """Profile the enclosed steps into logdir when set; no-op otherwise."""
    if logdir:
        with jax.profiler.trace(logdir):
            yield
    else:
        yield


def annotate(name: str):
    """Named scope visible in xprof traces (per-layer attribution)."""
    return jax.profiler.TraceAnnotation(name)


class NaNWatchdog:
    """Halts training when a watched scalar goes non-finite (SURVEY §5.3).

    The check batches with the regular metrics host-pull, so it adds no
    extra device round-trips.
    """

    def __init__(self, keys=("loss",)):
        self.keys = keys

    def check(self, step: int, metrics: dict) -> None:
        for k in self.keys:
            if k not in metrics:
                continue
            v = np.asarray(jax.device_get(metrics[k]))
            if not np.all(np.isfinite(v)):
                raise FloatingPointError(
                    f"non-finite {k!r}={v} at step {step}; halting "
                    f"(metrics dump: { {m: np.asarray(jax.device_get(x)).tolist() for m, x in metrics.items()} })"
                )


def corrupt_symbols(z: jnp.ndarray, mode: str = "nan") -> jnp.ndarray:
    """Fault-injection hook: corrupt channel output (SURVEY §5.3 tests)."""
    if mode == "nan":
        return z.at[..., 0].set(jnp.nan)
    if mode == "inf":
        return z.at[..., 0].set(jnp.inf)
    if mode == "burst":
        return z.at[:, : z.shape[1] // 4].set(100.0)
    raise ValueError(f"unknown corruption mode {mode!r}")
