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
