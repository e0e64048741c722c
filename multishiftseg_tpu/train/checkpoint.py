"""Orbax checkpointing of params + optimizer state + epoch (+ PRNG).

Upgrades the reference's ``torch.save(model.state_dict())``-on-best-AUPRC scheme
(``train_deeplab.py:249-262``, which never saved optimizer state) to full
checkpoint/resume.
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional

import jax
import numpy as np


class CheckpointManager:
    def __init__(self, directory: str):
        self.directory = os.path.abspath(directory or "ckpts")
        os.makedirs(self.directory, exist_ok=True)

    def _path(self, name: str) -> str:
        return os.path.join(self.directory, name)

    def save(self, name: str, **tree) -> str:
        import orbax.checkpoint as ocp

        path = self._path(name)
        ckptr = ocp.StandardCheckpointer()
        tree = jax.tree_util.tree_map(np.asarray, tree)
        ckptr.save(path, tree, force=True)
        ckptr.wait_until_finished()
        return path

    def restore(self, name: str, template: Optional[Dict[str, Any]] = None):
        """Restore a checkpoint; a template may cover only a subset of the saved
        top-level entries (e.g. params + epoch without opt_state — resume does not
        need the optimizer state of a *best-metric* checkpoint)."""
        import orbax.checkpoint as ocp

        restored = ocp.StandardCheckpointer().restore(self._path(name))
        if template is None:
            return restored
        missing = [k for k in template if k not in restored]
        if missing:
            raise KeyError(f"checkpoint {name} lacks entries {missing}")
        return {k: restored[k] for k in template}

    def restore_typed(self, name: str, target: Dict[str, Any]):
        """Restore with ``target`` as the structural template (orbax target
        restore): required to round-trip non-dict pytree nodes like optax's
        NamedTuple optimizer states — the plain :meth:`restore` returns raw
        dicts whose leaf ORDER need not match the NamedTuple's fields."""
        import orbax.checkpoint as ocp

        return ocp.StandardCheckpointer().restore(self._path(name), target)

    def exists(self, name: str) -> bool:
        return os.path.isdir(self._path(name))
