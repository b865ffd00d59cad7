"""Optional Orbax checkpoint backend.

The default checkpoint format (``engine/checkpoint.py``) keeps the
reference's pickled ``model.pth.tar-{epoch}`` contract.  For large-scale /
preemptible TPU deployments, Orbax offers async, atomic, tensorstore-backed
checkpoints; this module provides a drop-in pytree save/restore used when
``cfg.TRAIN.CHECKPOINT_BACKEND == "orbax"``.

None-placeholder leaves (the trainable/frozen split) are materialized as
empty markers and restored to None.
"""

from __future__ import annotations

import os

import jax
import numpy as np

try:
    import orbax.checkpoint as ocp

    ORBAX_AVAILABLE = True
except Exception:  # pragma: no cover
    ORBAX_AVAILABLE = False

_NONE_MARKER = "__none__"


def _encode(tree):
    return jax.tree_util.tree_map(
        lambda x: np.asarray([0], np.int8) if x is None else x,
        tree,
        is_leaf=lambda x: x is None,
    ), jax.tree_util.tree_map(
        lambda x: x is None, tree, is_leaf=lambda x: x is None
    )


def save_pytree(path: str, tree) -> None:
    """Atomic async save of a (possibly None-holed) pytree."""
    if not ORBAX_AVAILABLE:  # pragma: no cover
        raise RuntimeError("orbax-checkpoint is not installed")
    encoded, _ = _encode(tree)
    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    if os.path.exists(path):
        import shutil

        shutil.rmtree(path)
    ckptr.save(path, encoded)
    ckptr.wait_until_finished()


def restore_pytree(path: str, like):
    """Restore into the structure of ``like`` (None holes preserved)."""
    if not ORBAX_AVAILABLE:  # pragma: no cover
        raise RuntimeError("orbax-checkpoint is not installed")
    encoded_like, none_mask = _encode(like)
    ckptr = ocp.StandardCheckpointer()
    restored = ckptr.restore(os.path.abspath(path), encoded_like)
    return jax.tree_util.tree_map(
        lambda is_none, x: None if is_none else x,
        none_mask,
        restored,
        is_leaf=lambda x: x is None or isinstance(x, bool),
    )
