"""Multi-process smoke for parallel/multihost.py: two real CPU
``jax.distributed`` processes (coordinator + worker on localhost) exercise
init, barrier and the process-0 guards — the layer the reference never had
(SURVEY §2.4: no torch.distributed anywhere)."""

import os
import socket
import subprocess
import sys
import textwrap

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CHILD = textwrap.dedent(
    """
    import os, sys
    import jax
    jax.config.update("jax_platforms", "cpu")

    from federated_multi_modal_tpu.parallel import multihost

    ok = multihost.initialize_multihost()  # env-configured coordinator
    assert ok, "expected an active multi-process runtime"
    assert jax.process_count() == 2, jax.process_count()
    pid = jax.process_index()
    assert multihost.process_count() == 2
    assert multihost.is_main_process() == (pid == 0)

    multihost.sync_hosts("smoke-1")
    out = os.environ["SMOKE_OUT"]
    if multihost.is_main_process():
        with open(out, "w") as f:
            f.write("written-by-process-0")
    multihost.sync_hosts("smoke-2")
    # after the barrier BOTH processes must see process 0's write
    with open(out) as f:
        assert f.read() == "written-by-process-0"
    print(f"CHILD_OK {pid}", flush=True)
    """
)


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_two_process_distributed_smoke(tmp_path):
    port = _free_port()
    out_file = str(tmp_path / "proc0.txt")
    script = str(tmp_path / "child.py")
    with open(script, "w") as f:
        f.write(CHILD)

    procs = []
    for pid in range(2):
        env = dict(os.environ)
        env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
        env["JAX_COORDINATOR_ADDRESS"] = f"127.0.0.1:{port}"
        env["JAX_NUM_PROCESSES"] = "2"
        env["JAX_PROCESS_ID"] = str(pid)
        env["JAX_PLATFORMS"] = "cpu"
        env["SMOKE_OUT"] = out_file
        # one virtual device per process keeps the global topology tiny
        env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
        procs.append(
            subprocess.Popen(
                [sys.executable, script],
                env=env,
                stdout=subprocess.PIPE,
                stderr=subprocess.STDOUT,
                text=True,
            )
        )
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=100)
            outs.append(out)
    except subprocess.TimeoutExpired:
        for p in procs:
            p.kill()
        pytest.fail("multihost smoke hung:\n" + "\n---\n".join(outs))

    joined = "\n---\n".join(outs)
    if any(p.returncode != 0 for p in procs):
        # the container preloads jax via sitecustomize; if that preload
        # initializes a backend before jax.distributed can start, this
        # environment cannot run the smoke — skip, don't fail
        if "must be called before" in joined:
            pytest.skip("backend preloaded before jax.distributed: " + joined)
        pytest.fail("multihost smoke failed:\n" + joined)
    assert "CHILD_OK 0" in joined
    assert "CHILD_OK 1" in joined
    with open(out_file) as f:
        assert f.read() == "written-by-process-0"


def test_explicit_coordinator_after_backend_init_raises():
    """ADVICE r1 (medium): with a coordinator explicitly configured but the
    local backend already initialized (jax.distributed can never start),
    initialize_multihost must RAISE — silently returning False would let N
    processes each act as process 0 on the same OUTPUT_DIR."""
    import jax

    from federated_multi_modal_tpu.parallel import multihost

    jax.devices()  # ensure the backend is up (conftest already does this)
    if jax.distributed.is_initialized():  # pragma: no cover
        pytest.skip("distributed runtime already active")
    with pytest.raises(RuntimeError, match="process 0"):
        multihost.initialize_multihost(
            coordinator_address="127.0.0.1:1",
            num_processes=2,
            process_id=0,
        )


def test_single_host_initialize_is_noop():
    """No coordinator configured anywhere -> returns False, no exception."""
    from federated_multi_modal_tpu.parallel import multihost

    for var in ("JAX_COORDINATOR_ADDRESS", "JAX_NUM_PROCESSES",
                "JAX_PROCESS_ID"):
        assert var not in os.environ or not os.environ[var], var
    assert multihost.initialize_multihost() is False
