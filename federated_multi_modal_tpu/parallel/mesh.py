"""Device-mesh construction for federated + data parallelism.

The reference has no real communication layer — clients run sequentially
in-process and "broadcast" is ``load_state_dict``
(``trainers/maple_fed.py:247-260, 327-339``).  The TPU-native replacement
is a 2-D ``jax.sharding.Mesh`` with axes ``("client", "data")``: client
parallelism across chip groups, data parallelism within each group, and
FedAvg as a mean over the ``client`` axis riding ICI.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh


def make_client_mesh(
    num_clients: int,
    devices: Optional[Sequence] = None,
    axis_names=("client", "data"),
) -> Mesh:
    """Mesh of shape ``(num_clients, n_devices // num_clients)``.

    Works on any device count divisible by ``num_clients`` (single chip ->
    1x1 mesh, still a valid SPMD program).
    """
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if n % num_clients != 0:
        # fall back to a 1-client-group mesh; the program stays correct,
        # clients just share devices
        num_clients = 1
    per_client = n // num_clients
    arr = np.asarray(devices).reshape(num_clients, per_client)
    return Mesh(arr, axis_names)


def make_mesh_from_cfg(cfg, num_clients: int) -> Mesh:
    """Mesh for the federated SPMD loop, honoring an explicit
    ``TPU.MESH_SHAPE``/``TPU.MESH_AXES`` override (e.g. ``(2, 4)`` with
    ``("client", "data")`` pins clients to specific chip groups on a
    multi-slice topology); empty shape = the automatic
    ``(num_clients, rest)`` layout."""
    shape = tuple(getattr(cfg.TPU, "MESH_SHAPE", ()) or ())
    if not shape:
        return make_client_mesh(num_clients)
    axes = tuple(getattr(cfg.TPU, "MESH_AXES", ("client", "data")))
    if len(shape) != len(axes):
        raise ValueError(
            f"TPU.MESH_SHAPE {shape} and TPU.MESH_AXES {axes} differ in rank"
        )
    if "client" not in axes or "data" not in axes:
        # the SPMD round loop hard-codes these axis names in its
        # PartitionSpecs; fail here with a config message, not deep inside
        # jax.sharding with an unbound-axis error
        raise ValueError(
            f'TPU.MESH_AXES {axes} must contain "client" and "data"'
        )
    devices = jax.devices()
    if int(np.prod(shape)) != len(devices):
        raise ValueError(
            f"TPU.MESH_SHAPE {shape} needs {int(np.prod(shape))} devices, "
            f"have {len(devices)}"
        )
    if "client" in axes and shape[axes.index("client")] != num_clients:
        raise ValueError(
            f"TPU.MESH_SHAPE client axis {shape[axes.index('client')]} != "
            f"FED.NUM_CLIENTS {num_clients}"
        )
    arr = np.asarray(devices).reshape(shape)
    return Mesh(arr, axes)
