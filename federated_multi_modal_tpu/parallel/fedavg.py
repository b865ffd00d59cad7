"""Parallel federated training over a ``("client", "data")`` mesh.

Replaces the reference's sequential client loop
(``trainers/maple_fed.py:247-260``) with genuinely parallel clients:

* per-client trainable pytrees and optimizer states are **stacked** along a
  leading client axis and sharded over the mesh's ``client`` axis;
* the frozen CLIP tower is **replicated** (every chip keeps one copy);
* batches are ``(C, B, ...)`` — client axis sharded over ``client``, batch
  axis sharded over ``data``;
* one jitted program runs ``vmap(local_sgd_step)`` over the client axis —
  XLA partitions the vmapped dimension across chip groups and inserts the
  gradient all-reduce over the ``data`` axis automatically;
* FedAvg (``safe_average_weights``, ``maple_fed.py:309-315``) is a mean
  over the client axis — a single ``all_reduce`` over ICI.

This module is deliberately model-agnostic: it takes the same
``loss_fn(trainable, frozen, batch) -> (loss, aux)`` contract the trainers
already define.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
from jax.sharding import Mesh


def _is_none(x):
    return x is None


def stack_client_trees(trees):
    """Stack N same-structure client pytrees along a new leading axis."""

    def stack(*leaves):
        if leaves[0] is None:
            return None
        return jnp.stack(leaves)

    return jax.tree_util.tree_map(stack, *trees, is_leaf=_is_none)


def unstack_client_trees(stacked, n: int):
    """Inverse of :func:`stack_client_trees`."""
    out = []
    for i in range(n):
        out.append(
            jax.tree_util.tree_map(
                lambda x: None if x is None else x[i], stacked, is_leaf=_is_none
            )
        )
    return out


def fedavg_over_clients(stacked_trainable, scrub: bool = True):
    """FedAvg over the leading client axis, with the reference's non-finite
    scrubbing; returns the averaged tree broadcast back to (C, ...)."""

    def avg(x):
        if x is None:
            return None
        x32 = x.astype(jnp.float32)
        if scrub:
            x32 = jnp.nan_to_num(x32, nan=0.0, posinf=1e4, neginf=-1e4)
        mean = jnp.mean(x32, axis=0, keepdims=True).astype(x.dtype)
        return jnp.broadcast_to(mean, x.shape)

    return jax.tree_util.tree_map(avg, stacked_trainable, is_leaf=_is_none)


def build_parallel_fed_step(
    loss_fn: Callable,
    tx,
    mesh: Mesh,
    fedavg_every_step: bool = False,
    impl: str = "auto",
):
    """Compile one SPMD program: every client takes a local SGD step on its
    own shard of data; optionally FedAvg afterwards (for LOCAL_EPOCHS-step
    rounds, call the step repeatedly and ``fedavg_over_clients`` at round
    end instead).

    ``impl`` selects how the client axis is parallelized:

    * ``"vmap"`` — batch the client axis and let GSPMD partition it.  The
      size-1 batching dim each device ends up with is not free (~8%
      end-to-end on a v5e), so a single global client skips the vmap.
    * ``"shard_map"`` — per-device manual SPMD: each client group runs the
      UNBATCHED local step on its own data shard with an explicit
      ``pmean`` gradient all-reduce over the ``data`` axis; FedAvg stays
      a mean over ``client``.  Collectives ride ICI by construction and
      no device ever sees a batched parameter tree.
    * ``"auto"`` (default) — ``shard_map`` on a multi-device mesh when the
      shapes divide it evenly, ``vmap`` otherwise (single chip, uneven
      shards).

    Returns ``step(stacked_trainable, frozen, stacked_opt_state, batch) ->
    (stacked_trainable, stacked_opt_state, loss (C,))``.
    """
    if impl not in ("auto", "vmap", "shard_map"):
        raise ValueError(f"unknown fed-step impl {impl!r}")

    def local_step(trainable, frozen, opt_state, batch, data_axis=None):
        def wrapped(tr):
            return loss_fn(tr, frozen, batch)

        (loss, _aux), grads = jax.value_and_grad(wrapped, has_aux=True)(trainable)
        if data_axis is not None:
            # explicit data-parallel gradient all-reduce (shard_map path;
            # under vmap GSPMD inserts the equivalent collective itself)
            grads = jax.lax.pmean(grads, data_axis)
            loss = jax.lax.pmean(loss, data_axis)
        # per-client skip-batch gate on non-finite gradients: keep params
        # AND momentum untouched, mirroring the single-site recovery
        # (reference ``trainers/maple.py:617-627``) — without it one NaN
        # batch corrupts the client for the rest of the round, and with
        # ``fedavg_every_step`` the scrubbed zeros would be averaged into
        # every other client
        finite = jnp.stack([
            jnp.all(jnp.isfinite(g))
            for g in jax.tree_util.tree_leaves(grads)
        ]).all()
        updates, new_opt_state = tx.update(grads, opt_state, trainable)

        def keep(new, old):
            if new is None:
                return None
            return jnp.where(finite, new, old)

        trainable = jax.tree_util.tree_map(
            lambda p, u: p if u is None else keep(p + u, p),
            trainable,
            updates,
            is_leaf=_is_none,
        )
        opt_state = jax.tree_util.tree_map(
            keep, new_opt_state, opt_state, is_leaf=_is_none
        )
        return trainable, opt_state, loss

    def _sq(tree):
        return jax.tree_util.tree_map(
            lambda x: None if x is None else x[0], tree, is_leaf=_is_none
        )

    def _ex(tree):
        return jax.tree_util.tree_map(
            lambda x: None if x is None else x[None], tree, is_leaf=_is_none
        )

    n_mesh_dev = int(mesh.devices.size)
    nc = int(mesh.shape.get("client", 1))
    nd = int(mesh.shape.get("data", 1))

    def _shard_map_fits(C, batch):
        if "client" not in mesh.axis_names or "data" not in mesh.axis_names:
            return False
        if C % nc:
            return False
        return all(
            x.ndim >= 2 and x.shape[0] == C and x.shape[1] % nd == 0
            for x in jax.tree_util.tree_leaves(batch)
        )

    def _step_shard_map(stacked_trainable, frozen, stacked_opt_state, batch):
        def shard_body(tr, opt, b, frozen):
            C_l = jax.tree_util.tree_leaves(tr)[0].shape[0]
            if C_l == 1:
                t, o, loss = local_step(
                    _sq(tr), frozen, _sq(opt), _sq(b), data_axis="data"
                )
                return _ex(t), _ex(o), loss[None]
            return jax.vmap(
                lambda tr1, opt1, b1: local_step(
                    tr1, frozen, opt1, b1, data_axis="data"
                )
            )(tr, opt, b)

        from jax.sharding import PartitionSpec as P

        tr, opt, losses = jax.shard_map(
            shard_body,
            mesh=mesh,
            in_specs=(P("client"), P("client"), P("client", "data"), P()),
            out_specs=(P("client"), P("client"), P("client")),
            check_vma=False,
        )(stacked_trainable, stacked_opt_state, batch, frozen)
        if fedavg_every_step:
            tr = fedavg_over_clients(tr)
        return tr, opt, losses

    def step(stacked_trainable, frozen, stacked_opt_state, batch):
        C = jax.tree_util.tree_leaves(stacked_trainable)[0].shape[0]
        if impl == "shard_map" or (
            impl == "auto" and n_mesh_dev > 1 and _shard_map_fits(C, batch)
        ):
            return _step_shard_map(
                stacked_trainable, frozen, stacked_opt_state, batch
            )
        if C == 1:
            # Single client: skip the vmap.  The size-1 batching dim is not
            # free — it turns every activation matmul into a batched dot
            # and every Pallas call into an extra grid dimension, measured
            # ~10% end-to-end on a v5e (1177 vs 1301+ img/s at batch 512).
            # This is also what each device computes when C == #devices on
            # a client-axis mesh, so the plain graph is the honest shape.
            trainable, opt_state, loss = local_step(
                _sq(stacked_trainable), frozen, _sq(stacked_opt_state),
                _sq(batch),
            )
            return _ex(trainable), _ex(opt_state), loss[None]
        vstep = jax.vmap(local_step, in_axes=(0, None, 0, 0))
        stacked_trainable, stacked_opt_state, losses = vstep(
            stacked_trainable, frozen, stacked_opt_state, batch
        )
        if fedavg_every_step:
            stacked_trainable = fedavg_over_clients(stacked_trainable)
        return stacked_trainable, stacked_opt_state, losses

    # vmap-path sharding comes entirely from the NamedSharding-committed
    # inputs at call time; the shard_map path binds the mesh explicitly
    return jax.jit(step, donate_argnums=(0, 2))
