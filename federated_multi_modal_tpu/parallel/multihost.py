"""Multi-host (pod / multi-slice) runtime support.

The reference has no distributed runtime at all (SURVEY §2.4: no
torch.distributed, NCCL or MPI anywhere); scaling past one host is a new
capability of this framework.  The JAX model: every host runs the same
program, `jax.distributed.initialize` wires the coordinator, `jax.devices()`
then returns the GLOBAL device list, and the SPMD programs (client/data
meshes, `parallel/mesh.py`) span hosts transparently — collectives ride ICI
within a slice and DCN across slices.

Host-side effects (logging, checkpoint writes, metric prints) are guarded
to process 0 via :func:`is_main_process`.
"""

from __future__ import annotations

import os


def initialize_multihost(
    coordinator_address: str = None,
    num_processes: int = None,
    process_id: int = None,
) -> bool:
    """Initialize ``jax.distributed`` when a multi-host run is configured.

    Safe to call unconditionally: single-host runs (no coordinator env, no
    TPU pod metadata) are a no-op.  Returns True when a multi-process
    runtime is active after the call.

    Configuration sources, in order:
      * explicit arguments
      * ``JAX_COORDINATOR_ADDRESS`` / ``JAX_NUM_PROCESSES`` /
        ``JAX_PROCESS_ID`` environment variables
      * TPU pod metadata (``jax.distributed.initialize()`` auto-detects on
        Cloud TPU when no arguments are given)
    """
    import jax

    # NOTE: do NOT probe jax.process_count()/jax.devices() here — any
    # backend query initializes XLA and makes jax.distributed.initialize
    # raise unconditionally afterwards.
    if jax.distributed.is_initialized():
        return jax.process_count() > 1

    coordinator_address = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS"
    )
    env_np = os.environ.get("JAX_NUM_PROCESSES")
    env_pid = os.environ.get("JAX_PROCESS_ID")
    if num_processes is None and env_np is not None:
        num_processes = int(env_np)
    if process_id is None and env_pid is not None:
        process_id = int(env_pid)

    workers = [
        w for w in os.environ.get("TPU_WORKER_HOSTNAMES", "").split(",") if w
    ]
    pod = len(workers) > 1 or bool(
        os.environ.get("MEGASCALE_COORDINATOR_ADDRESS")
    )
    if not coordinator_address and not pod:
        return False
    try:
        if coordinator_address:
            jax.distributed.initialize(
                coordinator_address=coordinator_address,
                num_processes=num_processes,
                process_id=process_id,
            )
        else:
            # Cloud TPU pod: runtime metadata carries the topology, but an
            # explicitly pinned topology is passed through, not dropped
            jax.distributed.initialize(
                num_processes=num_processes, process_id=process_id
            )
    except RuntimeError as e:
        # tolerate ONLY the genuinely-already-initialized case (e.g. the
        # distributed runtime was wired up by the environment before us).
        # "must be called before backends are initialized" does NOT mean
        # that: it means some earlier backend query (a preloading
        # sitecustomize, an early jax.devices()) made initialization
        # impossible while jax.distributed was never initialized at all.
        # Swallowing it on an explicitly configured coordinator would
        # degrade to N independent "process 0" runs that all write the
        # same OUTPUT_DIR — so that case must raise.
        if jax.distributed.is_initialized():
            import warnings

            warnings.warn(f"multi-host initialize skipped: {e}")
            return jax.process_count() > 1
        raise RuntimeError(
            "jax.distributed.initialize failed and the distributed runtime "
            "is NOT active; a multi-host run was explicitly configured, so "
            "continuing would produce independent single-host processes "
            "all acting as process 0. Ensure initialize_multihost() runs "
            "before any JAX backend query (jax.devices(), array creation, "
            "sitecustomize preloads)."
        ) from e
    return jax.process_count() > 1


def is_main_process() -> bool:
    """True on the host that should write checkpoints/logs (process 0)."""
    import jax

    try:
        return jax.process_index() == 0
    except Exception:
        return True


def process_count() -> int:
    import jax

    try:
        return jax.process_count()
    except Exception:
        return 1


def sync_hosts(tag: str = "barrier") -> None:
    """Cross-host barrier (e.g. before reading a checkpoint another host
    wrote).  No-op on single-host runs."""
    if process_count() <= 1:
        return
    from jax.experimental import multihost_utils

    multihost_utils.sync_global_devices(tag)
