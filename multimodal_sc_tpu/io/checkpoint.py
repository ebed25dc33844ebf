"""Checkpoint / resume via orbax (SURVEY.md §5.4).

Saves the full train-state pytree (params, opt state, step; for RL also the
replay buffer and PRNG key — any pytree works); restore re-establishes
shardings from the live mesh via the abstract-target path. Reference repo
has no checkpointing (``/root/reference/README.md:1-2``).
"""

from __future__ import annotations

import os
import warnings
from typing import Any, Optional

import jax
import jax.numpy as jnp
import orbax.checkpoint as ocp

_MISSING = object()

# Leaf names (the last path component) that may legally be absent in an
# OLDER checkpoint and are then filled from the fresh-init target value.
# "fog" entered EnvState in r4 (runtime fog scalar, VERDICT r3 item 5);
# pre-r4 FULL-state checkpoints miss the leaf, and without this shim the
# restore dies with a raw orbax tree-structure error (ADVICE r4 /
# VERDICT r4 item 8). The target's value is the right default: the
# driver's freshly-reset env states carry fog seeded from cfg.env.fog_range.
UPGRADE_FILL_LEAVES = ("fog",)


def _merge_raw_into(target: Any, raw: Any, path: str = ""):
    """Recursively overlay a raw orbax restore (nested dicts/lists of host
    arrays) onto a live ``target`` pytree, preserving the target's dtypes
    and shardings. Leaves missing from ``raw`` whose name is in
    :data:`UPGRADE_FILL_LEAVES` keep the target's (fresh-init) value with
    a warning; any other missing leaf raises a clear error naming it."""
    if hasattr(target, "_fields"):                    # NamedTuple node
        vals = {}
        for f in target._fields:
            sub = raw.get(f, _MISSING) if isinstance(raw, dict) else _MISSING
            vals[f] = _merge_raw_into(getattr(target, f), sub,
                                      f"{path}/{f}")
        return type(target)(**vals)
    if isinstance(target, dict):
        return {k: _merge_raw_into(
            v, raw.get(k, _MISSING) if isinstance(raw, dict) else _MISSING,
            f"{path}/{k}") for k, v in target.items()}
    if isinstance(target, (tuple, list)):
        if raw is _MISSING or raw is None:
            raw = [_MISSING] * len(target)
        return type(target)(
            _merge_raw_into(t, r, f"{path}/{i}")
            for i, (t, r) in enumerate(zip(target, raw)))
    # Leaf.
    if raw is _MISSING or (raw is None and target is not None):
        name = path.rsplit("/", 1)[-1]
        if name in UPGRADE_FILL_LEAVES:
            warnings.warn(
                f"checkpoint upgrade: leaf {path!r} missing from the saved "
                "state (pre-r4 format) — filled from the fresh-init value",
                stacklevel=2)
            return target
        raise ValueError(
            f"checkpoint is missing leaf {path!r} and no upgrade rule "
            "covers it — the saved state predates an incompatible format "
            "change; re-train or add the leaf to UPGRADE_FILL_LEAVES")
    if not hasattr(target, "dtype"):                  # python scalar/static
        return raw
    if jnp.issubdtype(target.dtype, jax.dtypes.prng_key):
        v = raw                                       # typed PRNG key leaf
    else:
        v = jnp.asarray(raw, dtype=target.dtype)
    if hasattr(target, "sharding"):
        v = jax.device_put(v, target.sharding)
    return v


class CheckpointManager:
    def __init__(self, directory: str, max_to_keep: int = 3):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self._mgr = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep, create=True
            ),
        )

    def save_config(self, config_json: str) -> None:
        """Pin the experiment config beside the checkpoints (SURVEY §5.6)."""
        with open(os.path.join(self.directory, "config.json"), "w") as f:
            f.write(config_json)

    def save(self, step: int, state: Any, wait: bool = False) -> None:
        self._mgr.save(step, args=ocp.args.StandardSave(state))
        if wait:
            self._mgr.wait_until_finished()

    def restore_latest(self, target: Any) -> Optional[Any]:
        """Restore the newest checkpoint, resharded like `target` (a live
        pytree whose shardings define placement). None if no checkpoint."""
        step = self._mgr.latest_step()
        if step is None:
            return None
        abstract = jax.tree_util.tree_map(ocp.utils.to_shape_dtype_struct, target)
        return self._mgr.restore(step, args=ocp.args.StandardRestore(abstract))

    def restore_latest_upgrading(self, target: Any) -> Optional[Any]:
        """:meth:`restore_latest`, plus a format-upgrade fallback: if the
        strict restore fails (e.g. a pre-r4 FULL-state checkpoint missing
        the ``EnvState.fog`` leaf), re-read the checkpoint WITHOUT a
        target and overlay it onto ``target`` leaf by leaf — leaves named
        in :data:`UPGRADE_FILL_LEAVES` fall back to the target's
        fresh-init value with a warning, anything else missing raises a
        clear error instead of a raw orbax tree-structure dump."""
        step = self._mgr.latest_step()
        if step is None:
            return None
        try:
            return self.restore_latest(target)
        except Exception as strict_err:  # orbax raises assorted types here
            raw = self._mgr.restore(step, args=ocp.args.StandardRestore())
            try:
                return _merge_raw_into(target, raw)
            except ValueError:
                raise
            except Exception:
                raise strict_err

    def restore_params_latest(self, params_target: Any,
                              field: str = "params") -> Optional[Any]:
        """Restore ONLY one param-tree subtree of the newest checkpoint.

        ``field="params"`` works for any saved state whose top level has a
        ``params`` field (the TrainState dataclasses and the RL NamedTuples
        all do — orbax stores NamedTuples keyed by field name);
        ``field="target_params"`` restores a DQN state's target network —
        under soft updates (``rl.target_tau``) that tree IS the Polyak
        average of the online params, i.e. the smoothed deployment policy.
        Unlike :meth:`restore_raw_latest`, only the requested leaves are
        read, so a multi-GB replay buffer never touches host memory, and
        shapes are validated against `params_target` (a live or abstract
        pytree)."""
        step = self._mgr.latest_step()
        if step is None:
            return None
        abstract = jax.tree_util.tree_map(ocp.utils.to_shape_dtype_struct,
                                          params_target)
        out = self._mgr.restore(
            step, args=ocp.args.PyTreeRestore(item={field: abstract},
                                              partial_restore=True))
        return out[field]

    def restore_raw_latest(self) -> Optional[Any]:
        """Restore the newest checkpoint WITHOUT a target: returns the saved
        pytree as nested dicts of host arrays (for partial/params-only
        consumers like the JSCC->RL warm-start)."""
        step = self._mgr.latest_step()
        if step is None:
            return None
        return self._mgr.restore(step, args=ocp.args.StandardRestore())

    def save_best_policy(self, tree: Any) -> bool:
        """Persist the best-eval policy snapshot under ``<dir>/best``.

        ``tree`` is a small pytree ``{"params", "target_params", "step",
        "eval_return"}`` (train/dqn.py best-snapshot selection,
        ``rl.eval_snapshot_every``). Kept OUTSIDE the step-keyed manager so
        resume/restore_latest never confuses it with a training state.
        Only overwrites an existing best if ``eval_return`` improves (so a
        resumed run cannot regress the deployed policy); returns whether
        it wrote."""
        path = os.path.join(self.directory, "best")
        ckptr = ocp.StandardCheckpointer()
        if os.path.exists(path):
            prev = ckptr.restore(path)
            if float(prev["eval_return"]) >= float(tree["eval_return"]):
                return False
        ckptr.save(path, tree, force=True)
        ckptr.close()
        return True

    def restore_best_policy(self) -> Optional[Any]:
        """Load the ``<dir>/best`` snapshot (host arrays) or None."""
        path = os.path.join(self.directory, "best")
        if not os.path.exists(path):
            return None
        ckptr = ocp.StandardCheckpointer()
        out = ckptr.restore(path)
        ckptr.close()
        return out

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def close(self) -> None:
        self._mgr.wait_until_finished()
        self._mgr.close()
