"""Checkpoint/resume via orbax (SURVEY.md §5).

The reference's checkpointing is ``torch.save(state_dict)`` + the feature
cache; here params/train-state go through orbax (async-capable, sharding-
aware — pod-ready) and the feature store (data/store.py) remains the
de-facto extraction checkpoint with its resumable manifest.
"""

from __future__ import annotations

import os
from typing import Any

__all__ = ["save_pytree", "load_pytree", "latest_step_dir"]


def _checkpointer():
    import orbax.checkpoint as ocp

    return ocp.StandardCheckpointer()


def save_pytree(path: str, tree: Any) -> None:
    """Durably save a pytree (params / TrainState) at path (a directory)."""
    ckpt = _checkpointer()
    ckpt.save(os.path.abspath(path), tree, force=True)
    ckpt.wait_until_finished()


def load_pytree(path: str, template: Any | None = None) -> Any:
    """Restore a pytree; template (matching structure/shapes) enables
    sharded/typed restoration."""
    ckpt = _checkpointer()
    if template is not None:
        return ckpt.restore(os.path.abspath(path), template)
    return ckpt.restore(os.path.abspath(path))


def latest_step_dir(root: str) -> str | None:
    """Newest ``step_N`` subdirectory under root (train-loop resume)."""
    if not os.path.isdir(root):
        return None
    steps = []
    for d in os.listdir(root):
        if d.startswith("step_") and d[5:].isdigit():
            steps.append(int(d[5:]))
    if not steps:
        return None
    return os.path.join(root, f"step_{max(steps)}")
