"""Checkpoint / resume utilities.

Greenfield subsystem (SURVEY.md section 5: the reference has no
checkpointing — weights live at Azure and a crashed sweep loses all
results).  Two halves:

- model weights: orbax-backed save/restore of VLM parameter pytrees and
  TrainStates (sharding-aware: restores onto whatever mesh the arrays
  carried);
- evaluation resume is handled inside ``msc_tpu/eval/runner.py``
  (incremental CSV + (sample, config, question) dedup keys).
"""

from __future__ import annotations

import os
from typing import Any, Optional


def save_params(path: str, params: Any):
    """Save a parameter pytree (orbax if available, else numpy fallback).

    Overwrites are complete-then-swap: orbax's ``force=True`` deletes the
    destination BEFORE its (minutes-long, for large states) tmp write, so
    a crash mid-save would lose the ONLY resume point.  Observed live on
    the m-family trainer: ``<ckpt>__state`` absent for ~3 min per
    500-step save while the ``.orbax-checkpoint-tmp`` dir filled.  We
    instead write to ``<path>__next`` and swap, shrinking the unsafe
    window to one rmtree+rename; a crash between them leaves a complete
    ``__next`` that ``restore_params`` falls back to.
    """
    path = os.path.abspath(path)
    try:
        import orbax.checkpoint as ocp

        ckptr = ocp.StandardCheckpointer()
        if os.path.isdir(path):
            import shutil

            nxt = path + "__next"
            if os.path.isdir(nxt):
                shutil.rmtree(nxt)
            ckptr.save(nxt, params, force=True)
            ckptr.wait_until_finished()
            # swap via two renames, not rmtree(path) then rename: a crash
            # mid-rmtree would leave a partially-deleted dir that
            # restore_params would prefer over the complete __next
            # (round-4 advisor finding).  rename is atomic, so at every
            # instant either `path` or `__next` is a complete checkpoint.
            old = path + "__old"
            if os.path.isdir(old):
                shutil.rmtree(old)
            os.rename(path, old)
            os.rename(nxt, path)
            shutil.rmtree(old)
        else:
            ckptr.save(path, params, force=True)
            ckptr.wait_until_finished()
        return
    except Exception:
        _save_numpy(path, params)


def restore_params(path: str, like: Optional[Any] = None) -> Any:
    path = os.path.abspath(path)
    if not os.path.isdir(path) and os.path.isdir(path + "__next"):
        # a crash between save_params' rmtree and rename left only the
        # completed __next dir — adopt it
        os.rename(path + "__next", path)
    try:
        import orbax.checkpoint as ocp

        ckptr = ocp.StandardCheckpointer()
        if like is not None:
            import jax

            target = jax.tree.map(ocp.utils.to_shape_dtype_struct, like) \
                if hasattr(ocp.utils, "to_shape_dtype_struct") else like
            return ckptr.restore(path, target)
        return ckptr.restore(path)
    except Exception:
        return _load_numpy(path)


# -- numpy fallback ----------------------------------------------------------

def _flatten(tree, prefix=""):
    import jax

    leaves = {}
    flat, treedef = jax.tree.flatten_with_path(tree)
    for path, leaf in flat:
        key = "/".join(str(p) for p in path)
        leaves[key] = leaf
    return leaves, treedef


def _save_numpy(path: str, params: Any):
    import jax
    import numpy as np

    os.makedirs(path, exist_ok=True)
    leaves, treedef = _flatten(params)
    np.savez(os.path.join(path, "params.npz"),
             **{k: np.asarray(v) for k, v in leaves.items()})
    with open(os.path.join(path, "treedef.txt"), "w") as f:
        f.write(str(treedef))


def _load_numpy(path: str) -> Any:
    """Restore the flat {path: array} dict (callers re-assemble; the
    orbax path preserves structure natively)."""
    import numpy as np

    data = np.load(os.path.join(path, "params.npz"))
    return {k: data[k] for k in data.files}
