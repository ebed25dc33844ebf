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


class CollapseWatchdog:
    """Flags greedy-policy collapse from the executed-action entropy
    (SURVEY §5.3 failure detection; the r3 cold-c4 pathology — argmax
    constant on every state — BASELINE.md config-4).

    At exploration rate eps, a collapsed policy's executed actions are
    ~(1-eps) one action + eps uniform, whose entropy has a known value;
    a healthy policy sits well above it. `consecutive` debounces the
    normal early-training greedy phase (entropy is legitimately near the
    floor while epsilon is still high — the floor check only arms once
    epsilon has annealed low). Warns loudly (stderr) rather than halting:
    collapse is a training outcome, not a corrupted state."""

    def __init__(self, num_actions: int = 9, margin: float = 0.15,
                 eps_armed: float = 0.2, consecutive: int = 3):
        self.num_actions = num_actions
        self.margin = margin
        self.eps_armed = eps_armed
        self.consecutive = consecutive
        self._hits = 0
        self.tripped = False

    @staticmethod
    def collapsed_entropy(eps: float, num_actions: int) -> float:
        """Entropy of the executed-action histogram for a constant-argmax
        policy under eps-greedy exploration."""
        p_top = (1.0 - eps) + eps / num_actions
        p_rest = eps / num_actions
        h = -p_top * np.log(p_top + 1e-12)
        h -= (num_actions - 1) * p_rest * np.log(p_rest + 1e-12)
        return float(h)

    def check(self, step: int, metrics: dict) -> None:
        if "action_entropy" not in metrics or "epsilon" not in metrics:
            return
        eps = float(np.asarray(jax.device_get(metrics["epsilon"])).reshape(-1)[-1])
        ent = float(np.asarray(jax.device_get(metrics["action_entropy"])).reshape(-1)[-1])
        if eps > self.eps_armed:
            self._hits = 0
            return
        floor = self.collapsed_entropy(eps, self.num_actions)
        if ent < floor + self.margin:
            self._hits += 1
        else:
            self._hits = 0
        if self._hits >= self.consecutive and not self.tripped:
            self.tripped = True
            import sys

            print(
                f"WARNING: greedy-collapse telltale at step {step}: "
                f"executed-action entropy {ent:.3f} is within "
                f"{self.margin} of the constant-argmax floor "
                f"{floor:.3f} (eps={eps:.3f}) for {self._hits} "
                f"consecutive checks. The learned Q-function has likely "
                f"collapsed to a constant action (BASELINE.md config-4); "
                f"greedy eval will sit at random level. Consider the "
                f"JSCC warm start (--init-from).",
                file=sys.stderr, flush=True)


def corrupt_symbols(z: jnp.ndarray, mode: str = "nan") -> jnp.ndarray:
    """Fault-injection hook: corrupt channel output (SURVEY §5.3 tests)."""
    if mode == "nan":
        return z.at[..., 0].set(jnp.nan)
    if mode == "inf":
        return z.at[..., 0].set(jnp.inf)
    if mode == "burst":
        return z.at[:, : z.shape[1] // 4].set(100.0)
    raise ValueError(f"unknown corruption mode {mode!r}")
