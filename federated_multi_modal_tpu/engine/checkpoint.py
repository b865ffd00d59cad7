"""Checkpoint I/O and pytree<->flat-name conversion.

Keeps the reference's on-disk contract so tooling and habits transfer
(Dassl checkpoints, ``trainers/maple_fed.py:376-384``):

* files named ``model.pth.tar-{epoch}`` / ``model-best.pth.tar`` under
  ``<dir>/<registered model name>/``
* payload dict ``{epoch, state_dict, optimizer, scheduler, val_result,
  cfg}`` where ``state_dict`` maps dotted names to numpy arrays
* load-time class-set transfer: ``prompt_learner.token_prefix`` /
  ``token_suffix`` are dropped and loading is non-strict so checkpoints
  move across class sets (``trainers/maple.py:709-712``)

Serialization is pickle of numpy arrays (portable, no torch dependency).
"""

from __future__ import annotations

import os
import os.path as osp
import pickle
from typing import Dict

import jax
import numpy as np

from federated_multi_modal_tpu.utils.io import mkdir_if_missing


# -- pytree <-> flat dotted-name dict ---------------------------------------


def _key_str(k) -> str:
    if hasattr(k, "key"):
        return str(k.key)
    if hasattr(k, "idx"):
        return str(k.idx)
    if hasattr(k, "name"):
        return str(k.name)
    return str(k)


def flatten_params(tree, prefix: str = "") -> Dict[str, np.ndarray]:
    # ONE batched device_get for the whole tree: per-leaf transfers are N
    # sequential network round trips on the tunnel backend (CLAUDE.md)
    host_tree = jax.device_get(tree)
    flat = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(host_tree)[0]:
        name = ".".join(_key_str(k) for k in path)
        if prefix:
            name = f"{prefix}.{name}" if name else prefix
        flat[name] = np.asarray(leaf)
    return flat


def unflatten_into(tree, flat: Dict[str, np.ndarray], prefix: str = "",
                   strict: bool = False, strict_shapes: bool = False):
    """Write values from ``flat`` into a copy of ``tree`` by dotted name.

    Names absent from ``flat`` keep their current value (strict=False
    semantics); unknown names are ignored (they were dropped buffers).
    ``strict_shapes`` reproduces torch's ``load_state_dict(strict=False)``
    contract: missing/unexpected keys are tolerated but a PRESENT key with
    the wrong shape raises (the reference fails loudly there, e.g. a CSC
    ctx trained on a different class count) — without it a checkpoint can
    silently "load" onto random-init weights.
    """
    used = set()

    def replace(path, leaf):
        name = ".".join(_key_str(k) for k in path)
        if prefix:
            name = f"{prefix}.{name}" if name else prefix
        if name in flat:
            arr = np.asarray(flat[name])
            if arr.shape != tuple(leaf.shape):
                if strict or strict_shapes:
                    raise ValueError(
                        f"Shape mismatch for {name}: checkpoint {arr.shape} "
                        f"vs model {tuple(leaf.shape)}"
                    )
                print(
                    f"Warning: skipping {name} (checkpoint shape "
                    f"{arr.shape} vs model {tuple(leaf.shape)})"
                )
                return leaf
            used.add(name)
            return jax.numpy.asarray(arr, dtype=leaf.dtype)
        if strict:
            raise KeyError(f"Missing key in checkpoint: {name}")
        return leaf

    new_tree = jax.tree_util.tree_map_with_path(replace, tree)
    return new_tree, used


# -- file I/O -----------------------------------------------------------------


def save_checkpoint(state: dict, save_dir: str, is_best: bool = False,
                    model_name: str = "") -> str:
    mkdir_if_missing(save_dir)
    epoch = state.get("epoch", 0)
    if not model_name:
        model_name = f"model.pth.tar-{epoch}"
    fpath = osp.join(save_dir, model_name)
    with open(fpath, "wb") as f:
        pickle.dump(state, f, protocol=pickle.HIGHEST_PROTOCOL)
    # record the latest checkpoint name (Dassl writes a "checkpoint" file)
    with open(osp.join(save_dir, "checkpoint"), "w") as f:
        f.write(osp.basename(fpath))
    if is_best:
        best = osp.join(save_dir, "model-best.pth.tar")
        with open(best, "wb") as f:
            pickle.dump(state, f, protocol=pickle.HIGHEST_PROTOCOL)
    print(f"Checkpoint saved to {fpath}")
    return fpath


def load_checkpoint(fpath: str) -> dict:
    if not osp.exists(fpath):
        raise FileNotFoundError(f'Checkpoint not found at "{fpath}"')
    with open(fpath, "rb") as f:
        return pickle.load(f)


def find_resume_checkpoint(directory: str):
    """Return the newest checkpoint path recorded in ``<dir>/checkpoint``
    (Dassl ``resume_from_checkpoint`` convention), else None."""
    marker = osp.join(directory, "checkpoint")
    if not osp.exists(marker):
        return None
    with open(marker) as f:
        name = f.read().strip()
    fpath = osp.join(directory, name)
    return fpath if osp.exists(fpath) else None


def drop_class_conditioned(state_dict: Dict[str, np.ndarray]):
    """Remove prompt prefix/suffix buffers so checkpoints transfer across
    class sets (``trainers/maple.py:709-712``, ``trainers/coop.py:319-324``)."""
    out = dict(state_dict)
    for key in list(out):
        leaf = key.rsplit(".", 1)[-1]
        if leaf in ("token_prefix", "token_suffix"):
            del out[key]
    return out
