"""Lightweight metrics / observability (SURVEY.md §5.5).

JSONL + stdout table writer; scalars are gathered on device and host-pulled
in one ``device_get`` every K steps to honor the no-host-round-trips rule
(BASELINE.json:5). The north-star counter is agent steps/sec/chip
(BASELINE.json:2). Reference repo has no observability (``README.md:1-2``).
"""

from __future__ import annotations

import json
import os
import sys
import time
from typing import Dict, Optional

import jax
import numpy as np


class MetricsWriter:
    def __init__(self, path: Optional[str] = None, stdout: bool = True,
                 config_json: Optional[str] = None):
        self.path = path
        self.stdout = stdout
        self._fh = None
        if path:
            os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
            self._fh = open(path, "a")
            if config_json:
                # First record pins the exact experiment config (SURVEY
                # §5.6 reproducibility rule).
                self._fh.write(json.dumps(
                    {"config": json.loads(config_json)}) + "\n")
                self._fh.flush()
        self._t0 = time.time()

    def write(self, step: int, scalars: Dict[str, float]) -> None:
        # One host pull for the whole dict.
        host = jax.device_get(scalars)
        host = {k: float(np.asarray(v)) for k, v in host.items()}
        rec = {"step": int(step), "t": round(time.time() - self._t0, 3), **host}
        if self._fh:
            self._fh.write(json.dumps(rec) + "\n")
            self._fh.flush()
        if self.stdout:
            kv = " ".join(f"{k}={v:.4g}" for k, v in host.items())
            print(f"[step {step:>7d}] {kv}", file=sys.stderr)

    def close(self) -> None:
        if self._fh:
            self._fh.close()
            self._fh = None


class Timer:
    """block_until_ready-bracketed wall-clock timer for steps/sec metrics."""

    def __init__(self):
        self.t0 = None
        self.elapsed = 0.0

    def __enter__(self):
        self.t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        self.elapsed = time.perf_counter() - self.t0
        return False


def steps_per_sec_per_chip(num_steps: int, elapsed_s: float,
                           n_chips: Optional[int] = None) -> float:
    n = n_chips if n_chips is not None else jax.device_count()
    return num_steps / max(elapsed_s, 1e-9) / max(n, 1)
