"""Checkpoint management with ring-buffer + best-score semantics.

Equivalent behavior to the reference's CheckPointManager
(/root/reference/common/torch_utils.py:34-139): `model_{step}.msgpack` files
holding params + opt state + step, a max_to_keep ring buffer, time-pinned
permanent keeps, a best-by-score copy (`model_best.msgpack`) and a
`checkpoints.txt` manifest. Serialization is flax msgpack (pure pytrees — no
pickle of code).

Also provides the staged partial-restore the reference uses between the
label -> feat -> align training stages (train.py:347-360): load whatever
parameter leaves match by path and shape, keep the rest initialized.
"""
from __future__ import annotations

import logging
import os
import shutil
import time
from typing import Any, Optional, Tuple

import jax
import numpy as np
from flax import serialization
from flax.traverse_util import flatten_dict, unflatten_dict

_logger = logging.getLogger("CheckPointManager")


def save_pytree(path: str, tree: Any) -> None:
    with open(path, "wb") as f:
        f.write(serialization.to_bytes(tree))


def restore_pytree(path: str, target: Any) -> Any:
    with open(path, "rb") as f:
        return serialization.from_bytes(target, f.read())


def partial_restore(path: str, target_params: Any) -> Tuple[Any, int]:
    """Merge stored parameter leaves into `target_params` where the flattened
    path exists and the shape matches. Returns (merged, num_loaded).

    A directory resolves to its model_best.msgpack, like the reference's
    CheckPointManager.load (common/torch_utils.py:120-126) and `load` above.
    """
    if os.path.isdir(path):
        path = os.path.join(path, "model_best.msgpack")
    with open(path, "rb") as f:
        raw = serialization.msgpack_restore(f.read())
    stored = raw.get("state", raw)
    # accept both a bare params tree and a full TrainState payload
    if "params" in stored and "opt_state" in stored:
        stored = stored["params"]
    flat_target = flatten_dict(serialization.to_state_dict(target_params))
    flat_stored = flatten_dict(stored)
    loaded = 0
    for key, val in flat_stored.items():
        if key in flat_target and np.shape(val) == np.shape(flat_target[key]):
            flat_target[key] = val
            loaded += 1
    merged_state = unflatten_dict(flat_target)
    merged = serialization.from_state_dict(target_params, merged_state)
    return merged, loaded


class CheckPointManager:
    def __init__(self, save_dir: str, prefix: str = "model", max_to_keep: int = 5,
                 keep_checkpoint_every_n_hours: float = 10000.0):
        assert max_to_keep >= 1
        self.save_dir = save_dir
        self.prefix = prefix
        self.max_to_keep = max_to_keep
        self.keep_every_s = keep_checkpoint_every_n_hours * 3600.0
        self._buffer = []          # [(path, save_time)]
        self._permanent = []
        self._next_keep_time = time.time()
        self.best_score = -float("inf")
        self.best_step: Optional[int] = None
        os.makedirs(save_dir, exist_ok=True)

    def _path(self, step) -> str:
        return os.path.join(self.save_dir, f"{self.prefix}_{step}.msgpack")

    def save(self, state: Any, step: int, score: float = 0.0) -> str:
        """Serialize `state` (any pytree, e.g. a TrainState) for `step`."""
        path = self._path(step)
        payload = {"state": serialization.to_state_dict(state), "step": step}
        save_pytree(path, payload)
        # re-saving a step (e.g. the unconditional end-of-training save
        # landing on the step the periodic save just wrote) must not leave
        # a duplicate ring entry: the duplicate would consume a keep slot
        # and, once rotation evicts the first copy, delete a file the
        # manifest still lists. A step already PROMOTED to the permanent
        # list stays permanent (freshly overwritten on disk above) and must
        # not re-enter the ring, where a later rotation could os.remove a
        # file _permanent still guarantees.
        if not any(p == path for (p, _) in self._permanent):
            self._buffer = [(p, t) for (p, t) in self._buffer if p != path]
            self._buffer.append((path, time.time()))
        _logger.info("Saved checkpoint: %s (score %.4g, best %.4g)",
                     path, score, self.best_score)
        if score > self.best_score:
            self.best_score = score
            self.best_step = step
            shutil.copyfile(path, self._path("best"))
            _logger.info("Checkpoint is current best")
        self._rotate()
        self._write_manifest()
        return path

    def load(self, path: str, state_template: Any) -> Tuple[Any, int]:
        """Full restore into a template with identical structure.
        Returns (state, step)."""
        if os.path.isdir(path):
            path = os.path.join(path, f"{self.prefix}_best.msgpack")
        payload = {"state": serialization.to_state_dict(state_template), "step": 0}
        restored = restore_pytree(path, payload)
        state = serialization.from_state_dict(state_template, restored["state"])
        _logger.info("Loaded checkpoint from %s (step %d)", path, restored["step"])
        return state, int(restored["step"])

    def _rotate(self) -> None:
        while len(self._buffer) > self.max_to_keep:
            path, saved_at = self._buffer.pop(0)
            if saved_at > self._next_keep_time:
                self._permanent.append((path, saved_at))
                self._next_keep_time = saved_at + self.keep_every_s
            else:
                try:
                    os.remove(path)
                except FileNotFoundError:
                    pass

    def _write_manifest(self) -> None:
        names = [os.path.basename(p) for p, _ in self._permanent + self._buffer]
        with open(os.path.join(self.save_dir, "checkpoints.txt"), "w") as f:
            f.write("\n".join(names))
            f.write(f"\nBest step: {self.best_step}")
