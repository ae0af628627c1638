"""Best-only checkpointing with ``{tag}_{epoch}_{seed}.ckpt`` naming.

Parity with the reference CheckpointSaver (reference vilmedic/executors/
utils.py:237-267): exactly one checkpoint per run — the best — previous best
deleted on improvement; the file holds model/optimizer/scheduler/config/version
(reference trainor.py:194-203). Serialization is flax msgpack instead of
``torch.save`` pickles (single file, framework-neutral numpy leaves).
"""

from __future__ import annotations

import json
import os
import re
from typing import Any, Dict, Optional, Tuple

import numpy as np
from flax import serialization


def save_checkpoint(path: str, payload: Dict[str, Any]) -> None:
    """payload: {'model': vars, 'opt_state': ..., 'training_scheduler': dict,
    'config': dict, '__version__': str}."""
    state = {
        "model": serialization.to_state_dict(payload["model"]),
        "opt_state": serialization.to_state_dict(payload.get("opt_state")),
        "training_scheduler": json.dumps(payload.get("training_scheduler") or {}, default=str),
        "config": json.dumps(payload.get("config") or {}, default=str),
        "__version__": payload.get("__version__", "0"),
    }
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(serialization.msgpack_serialize(state))
    os.replace(tmp, path)


def load_checkpoint(path: str) -> Dict[str, Any]:
    with open(path, "rb") as f:
        state = serialization.msgpack_restore(f.read())
    state["training_scheduler"] = json.loads(state.get("training_scheduler") or "{}")
    state["config"] = json.loads(state.get("config") or "{}")
    return state


def restore_into(target, state_dict):
    """Shape-checked restore of a raw state dict onto a live pytree."""
    return serialization.from_state_dict(target, state_dict)


class CheckpointSaver:
    """Saves run in a background thread: the D2H pull of the params plus the
    msgpack write can take minutes for GB-scale models on tunneled hosts, and
    jax arrays are immutable, so the training loop can keep stepping while the
    snapshot serializes. ``wait()`` joins the in-flight save — the Trainor
    calls it before returning so callers always observe a complete file."""

    def __init__(self, ckpt_dir: str, logger, seed, ckpt: Optional[str] = None):
        self.ckpt_dir = ckpt_dir
        self.seed = seed
        self.logger = logger
        self.current_tag = None
        self.current_epoch = None
        self._thread = None
        if ckpt is not None:
            self.current_tag, self.current_epoch = self.extract_tag_and_step(ckpt)
            logger.settings(
                f"Resuming checkpoint after epoch {self.current_epoch + 1} "
                f"with tag {self.current_tag}."
            )

    def save(self, payload: Dict[str, Any], tag, current_epoch: int) -> str:
        import threading

        self.wait()  # one in-flight save at a time
        if self.current_tag is not None:
            old = os.path.join(
                self.ckpt_dir, f"{self.current_tag}_{self.current_epoch}_{self.seed}.ckpt"
            )
            if os.path.exists(old):
                os.remove(old)
        tag = float(np.round(float(tag), 6))
        path = os.path.join(self.ckpt_dir, f"{tag}_{current_epoch}_{self.seed}.ckpt")

        def _write():
            try:
                save_checkpoint(path, payload)
                self.logger.info(f"{path} saved.")
            except BaseException as e:  # surfaced by the next wait()
                self._error = e

        self._error = None
        self._thread = threading.Thread(target=_write, daemon=True)
        self._thread.start()
        self.current_tag = tag
        self.current_epoch = current_epoch
        return path

    def wait(self) -> None:
        """Join the in-flight background save; re-raise its failure (a
        swallowed write error would otherwise leave the run with NO
        checkpoint — the previous best is already deleted)."""
        if self._thread is not None:
            self._thread.join()
            self._thread = None
            err, self._error = getattr(self, "_error", None), None
            if err is not None:
                raise RuntimeError("background checkpoint write failed") from err

    @staticmethod
    def extract_tag_and_step(ckpt: str) -> Tuple[float, int]:
        groups = re.match(r".*/(.*?)_(.*?)_(.*?)\.(ckpt|pth)", ckpt)
        return float(groups.group(1)), int(groups.group(2))
