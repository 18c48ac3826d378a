"""Checkpoint / resume for estimator state (SURVEY.md §5).

The reference has **no** checkpoint-based recovery — its only persistence is
pickled bag caches (make_prettier_graphs.py:736-765) and LOAM's saved submaps
(loam_params.yaml `useSavedSubmapsForInitialization`). Here every estimator
state is a pytree of fixed-shape arrays, so checkpointing is generic:

- :func:`save` / :func:`restore` — one pytree ↔ one ``.npz`` file. Restore
  takes the *template* pytree (e.g. a freshly ``init()``-ed state) so the
  structure, dtypes and NamedTuple classes round-trip exactly.
- :class:`CheckpointManager` — numbered step checkpoints with retention,
  atomic rename, and ``latest_step()`` discovery for resume-after-crash.

No orbax dependency: estimator states are a few MB, single-host; ``.npz``
via a temp-file rename is atomic and dependency-free.
"""

from __future__ import annotations

import os
import re
import tempfile
from typing import Any, Optional

import numpy as np
import jax


_SEP = "//"


def _flatten(tree: Any):
    leaves_with_paths = jax.tree_util.tree_flatten_with_path(tree)[0]
    out = {}
    for path, leaf in leaves_with_paths:
        key = _SEP.join(str(p) for p in path)
        out[key] = np.asarray(leaf)
    return out


def save(path: str, tree: Any) -> None:
    """Write a pytree of arrays to ``path`` (.npz), atomically."""
    flat = _flatten(tree)
    d = os.path.dirname(os.path.abspath(path)) or "."
    os.makedirs(d, exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=d, suffix=".tmp.npz")
    try:
        with os.fdopen(fd, "wb") as f:
            np.savez(f, **flat)
        os.replace(tmp, path)
    except BaseException:
        if os.path.exists(tmp):
            os.unlink(tmp)
        raise


def restore(path: str, template: Any) -> Any:
    """Load a pytree saved by :func:`save` into ``template``'s structure.

    Leaf dtypes/shapes are validated against the template so a config change
    between save and resume fails loudly instead of mis-assembling state.
    """
    with np.load(path) as data:
        flat = {k: data[k] for k in data.files}
    leaves_with_paths, treedef = jax.tree_util.tree_flatten_with_path(template)
    new_leaves = []
    for p, leaf in leaves_with_paths:
        key = _SEP.join(str(x) for x in p)
        if key not in flat:
            raise KeyError(f"checkpoint {path!r} missing leaf {key!r}")
        arr = flat[key]
        tleaf = np.asarray(leaf)
        if arr.shape != tleaf.shape:
            raise ValueError(
                f"checkpoint leaf {key!r} shape {arr.shape} != template "
                f"{tleaf.shape}")
        if arr.dtype.kind != tleaf.dtype.kind:
            raise ValueError(
                f"checkpoint leaf {key!r} dtype {arr.dtype} is a different "
                f"kind than template {tleaf.dtype} — refusing the lossy cast")
        new_leaves.append(arr.astype(tleaf.dtype))
    return jax.tree_util.tree_unflatten(treedef, new_leaves)


class CheckpointManager:
    """Numbered step checkpoints with retention.

    >>> mgr = CheckpointManager(dir, keep=3)
    >>> mgr.save(step, state)          # ckpt_000123.npz (atomic)
    >>> step = mgr.latest_step()       # resume discovery
    >>> state = mgr.restore(step, template)
    """

    _PAT = re.compile(r"^ckpt_(\d{9})\.npz$")

    def __init__(self, directory: str, keep: int = 3):
        self.directory = directory
        self.keep = int(keep)
        os.makedirs(directory, exist_ok=True)

    def _path(self, step: int) -> str:
        return os.path.join(self.directory, f"ckpt_{step:09d}.npz")

    def steps(self):
        out = []
        for name in os.listdir(self.directory):
            m = self._PAT.match(name)
            if m:
                out.append(int(m.group(1)))
        return sorted(out)

    def latest_step(self) -> Optional[int]:
        steps = self.steps()
        return steps[-1] if steps else None

    def save(self, step: int, tree: Any) -> str:
        path = self._path(step)
        save(path, tree)
        if self.keep > 0:
            for old in self.steps()[: -self.keep]:
                os.unlink(self._path(old))
        return path

    def restore(self, step: int, template: Any) -> Any:
        return restore(self._path(step), template)

    def restore_latest(self, template: Any):
        """(step, state) of the newest checkpoint, or (None, template)."""
        step = self.latest_step()
        if step is None:
            return None, template
        return step, self.restore(step, template)
