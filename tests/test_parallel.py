"""Multi-chip SPMD tests on the 8-virtual-device CPU mesh: the parallel
federated step, FedAvg collective, and the parallel MaPLeFederated path."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

import federated_multi_modal_tpu.trainers  # noqa: F401
from federated_multi_modal_tpu.config import get_cfg_default
from federated_multi_modal_tpu.engine import build_trainer
from federated_multi_modal_tpu.flagship import (
    build_fed_optimizer,
    build_maple_program,
    example_batch,
)
from federated_multi_modal_tpu.parallel import (
    build_parallel_fed_step,
    fedavg_over_clients,
    stack_client_trees,
    unstack_client_trees,
)
from federated_multi_modal_tpu.parallel.mesh import make_client_mesh


def test_mesh_shape():
    mesh = make_client_mesh(2)
    assert dict(mesh.shape) == {"client": 2, "data": 4}
    mesh3 = make_client_mesh(3)  # 8 % 3 != 0 -> falls back to one group
    assert dict(mesh3.shape) == {"client": 1, "data": 8}


def test_stack_unstack_roundtrip():
    t1 = {"a": jnp.ones((2, 3)), "b": None}
    t2 = {"a": jnp.zeros((2, 3)), "b": None}
    stacked = stack_client_trees([t1, t2])
    assert stacked["a"].shape == (2, 2, 3)
    back = unstack_client_trees(stacked, 2)
    np.testing.assert_allclose(np.asarray(back[0]["a"]), 1.0)
    np.testing.assert_allclose(np.asarray(back[1]["a"]), 0.0)
    assert back[0]["b"] is None


def test_parallel_fed_step_runs_and_diverges():
    """Two clients with different data must produce different updates;
    FedAvg must replicate the average."""
    prog = build_maple_program(backbone="Tiny", depth=3, use_captions=False)
    tx = build_fed_optimizer(lr=0.05)
    mesh = make_client_mesh(2)

    C = 2
    stacked = stack_client_trees([prog["trainable"]] * C)
    opt = stack_client_trees([tx.init(prog["trainable"])] * C)

    def shard(tree, spec):
        return jax.tree_util.tree_map(
            lambda x: None if x is None
            else jax.device_put(x, NamedSharding(mesh, spec)),
            tree, is_leaf=lambda x: x is None,
        )

    stacked = shard(stacked, P("client"))
    frozen = shard(prog["frozen"], P())

    b0 = example_batch(prog["arch"], batch_size=4, n_cls=prog["n_cls"],
                       use_captions=False, seed=0)
    b1 = example_batch(prog["arch"], batch_size=4, n_cls=prog["n_cls"],
                       use_captions=False, seed=1)
    batch = {
        k: jax.device_put(
            jnp.stack([b0[k], b1[k]]), NamedSharding(mesh, P("client", "data"))
        )
        for k in b0
    }

    step = build_parallel_fed_step(prog["loss_fn"], tx, mesh)
    stacked, opt, losses = step(stacked, frozen, opt, batch)
    losses = np.asarray(jax.device_get(losses))
    assert losses.shape == (2,)
    assert np.isfinite(losses).all()

    # different data -> different client params
    clients = unstack_client_trees(stacked, 2)
    ctx0 = np.asarray(clients[0]["prompt_learner"]["ctx"])
    ctx1 = np.asarray(clients[1]["prompt_learner"]["ctx"])
    assert not np.allclose(ctx0, ctx1)

    # FedAvg replicates the mean
    with mesh:
        averaged = jax.jit(fedavg_over_clients)(stacked)
    avg = unstack_client_trees(averaged, 2)
    a0 = np.asarray(avg[0]["prompt_learner"]["ctx"])
    a1 = np.asarray(avg[1]["prompt_learner"]["ctx"])
    np.testing.assert_allclose(a0, a1)
    np.testing.assert_allclose(a0, (ctx0 + ctx1) / 2, atol=1e-6)


def test_fed_step_impl_equivalence():
    """The vmap and shard_map client-axis implementations must produce the
    same losses, parameter updates, and optimizer state (same math, only
    the partitioning strategy differs)."""
    prog = build_maple_program(backbone="Tiny", depth=3, use_captions=False)
    tx = build_fed_optimizer(lr=0.05)
    mesh = make_client_mesh(2)
    C = 2

    def shard(tree, spec):
        return jax.tree_util.tree_map(
            lambda x: None if x is None
            else jax.device_put(x, NamedSharding(mesh, spec)),
            tree, is_leaf=lambda x: x is None,
        )

    # fp32 towers: per-shard-batch-1 vs batched-4 bf16 matmuls reorder
    # accumulations enough to blur small gradient elements; in fp32 the
    # two implementations must agree to tight tolerance
    frozen32 = jax.tree_util.tree_map(
        lambda x: x.astype(jnp.float32)
        if x is not None and jnp.issubdtype(x.dtype, jnp.floating) else x,
        prog["frozen"], is_leaf=lambda x: x is None,
    )
    frozen = shard(frozen32, P())
    b0 = example_batch(prog["arch"], batch_size=4, n_cls=prog["n_cls"],
                       use_captions=False, seed=0)
    b1 = example_batch(prog["arch"], batch_size=4, n_cls=prog["n_cls"],
                       use_captions=False, seed=1)
    batch = {
        k: jax.device_put(
            jnp.stack([b0[k], b1[k]]), NamedSharding(mesh, P("client", "data"))
        )
        for k in b0
    }

    outs = {}
    for impl in ("vmap", "shard_map"):
        # fresh state per impl: the jitted step donates its inputs
        stacked = shard(stack_client_trees([prog["trainable"]] * C),
                        P("client"))
        opt = shard(stack_client_trees([tx.init(prog["trainable"])] * C),
                    P("client"))
        step = build_parallel_fed_step(prog["loss_fn"], tx, mesh, impl=impl)
        s2, o2, losses = step(stacked, frozen, opt, batch)
        outs[impl] = (
            jax.device_get(losses),
            jax.device_get(jax.tree_util.tree_leaves(s2)),
            jax.device_get(jax.tree_util.tree_leaves(o2)),
        )

    lv, sv, ov = outs["vmap"]
    ls, ss, os_ = outs["shard_map"]
    np.testing.assert_allclose(lv, ls, rtol=1e-5, atol=1e-6)
    assert len(sv) == len(ss) and len(ov) == len(os_)
    for a, b in zip(sv, ss):
        np.testing.assert_allclose(
            np.asarray(a, np.float32), np.asarray(b, np.float32),
            rtol=1e-3, atol=1e-6,  # fp32 accumulation-order noise only
        )
    for a, b in zip(ov, os_):
        np.testing.assert_allclose(
            np.asarray(a, np.float32), np.asarray(b, np.float32),
            rtol=1e-3, atol=1e-6,  # fp32 accumulation-order noise only
        )


@pytest.fixture(scope="module")
def data_root(tmp_path_factory):
    return tmp_path_factory.mktemp("dataroot")


def test_federated_parallel_clients_path(data_root, tmp_path):
    cfg = get_cfg_default()
    cfg.DATASET.ROOT = str(data_root)
    cfg.DATASET.NAME = "Synthetic"
    cfg.MODEL.BACKBONE.NAME = "Tiny"
    cfg.INPUT.SIZE = (32, 32)
    cfg.INPUT.CANVAS_SIZE = 40
    cfg.DATALOADER.TRAIN_X.BATCH_SIZE = 4
    cfg.DATALOADER.TEST.BATCH_SIZE = 8
    cfg.OPTIM.MAX_EPOCH = 2
    cfg.OPTIM.LR = 0.01
    cfg.TRAIN.PRINT_FREQ = 100
    cfg.TRAINER.NAME = "MaPLeFederated"
    cfg.TRAINER.MAPLE.PROMPT_DEPTH = 3
    cfg.OUTPUT_DIR = str(tmp_path)
    cfg.SEED = 1
    cfg.VERBOSE = False
    cfg.FED.NUM_CLIENTS = 2
    cfg.FED.NUM_ROUNDS = 1
    cfg.FED.LOCAL_EPOCHS = 1
    cfg.FED.DATASETS = ("Synthetic", "Synthetic")
    cfg.FED.CLASSNAME_ONLY_DATASETS = ()
    cfg.FED.PARALLEL_CLIENTS = True

    fed = build_trainer(cfg)
    g0 = jax.tree_util.tree_map(
        lambda x: None if x is None else np.asarray(x),
        fed.global_weights, is_leaf=lambda x: x is None,
    )
    fed.train()
    moved = jax.tree_util.tree_map(
        lambda a, b: None if a is None else float(np.abs(np.asarray(a) - b).max()),
        fed.global_weights, g0, is_leaf=lambda x: x is None,
    )
    assert max(v for v in jax.tree_util.tree_leaves(moved)) > 0
    assert fed.nan_stats["total_updates"] == 1


def test_graft_entry_dryrun():
    """Guard the driver hook: dryrun_multichip on the 8-device CPU mesh."""
    import importlib.util
    import os

    spec = importlib.util.spec_from_file_location(
        "graft_entry",
        os.path.join(os.path.dirname(os.path.dirname(__file__)),
                     "__graft_entry__.py"),
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    mod.dryrun_multichip(8)


def test_fed_round_checkpoint_and_resume(data_root, tmp_path):
    """FED.CHECKPOINT_EVERY_ROUND writes model.pth.tar-round{N}; a fresh
    trainer with RESUME pointing at the output dir restarts from the newest
    round (preemption elasticity, SURVEY §5)."""
    import os

    def make(out, resume="", rounds=2):
        cfg = get_cfg_default()
        cfg.DATASET.ROOT = str(data_root)
        cfg.DATASET.NAME = "Synthetic"
        cfg.MODEL.BACKBONE.NAME = "Tiny"
        cfg.INPUT.SIZE = (32, 32)
        cfg.INPUT.CANVAS_SIZE = 40
        cfg.DATALOADER.TRAIN_X.BATCH_SIZE = 4
        cfg.DATALOADER.TEST.BATCH_SIZE = 8
        cfg.OPTIM.MAX_EPOCH = rounds
        cfg.OPTIM.LR = 0.01
        cfg.TRAIN.PRINT_FREQ = 100
        cfg.TRAINER.NAME = "MaPLeFederated"
        cfg.TRAINER.MAPLE.PROMPT_DEPTH = 3
        cfg.OUTPUT_DIR = str(out)
        cfg.RESUME = resume
        cfg.SEED = 1
        cfg.VERBOSE = False
        cfg.FED.NUM_CLIENTS = 2
        cfg.FED.NUM_ROUNDS = rounds
        cfg.FED.LOCAL_EPOCHS = 1
        cfg.FED.DATASETS = ("Synthetic", "Synthetic")
        cfg.FED.CLASSNAME_ONLY_DATASETS = ()
        cfg.FED.CHECKPOINT_EVERY_ROUND = True
        return build_trainer(cfg)

    out = tmp_path / "fedrounds"
    fed = make(out)
    fed.train()
    agg = out / "MultiModalPromptLearner_Aggregator"
    assert os.path.exists(agg / "model.pth.tar-round1")
    assert os.path.exists(agg / "model.pth.tar-round2")

    resumed = make(tmp_path / "fedresume", resume=str(out), rounds=3)
    assert resumed._resume_round() == 2
    # resumed global weights equal the round-2 checkpoint
    w_ckpt = np.asarray(fed.global_weights["prompt_learner"]["ctx"])
    w_res = np.asarray(resumed.global_weights["prompt_learner"]["ctx"])
    np.testing.assert_allclose(w_res, w_ckpt, atol=1e-6)


def test_single_site_data_parallel_equivalence(data_root, tmp_path):
    """TPU.DATA_PARALLEL (nn.DataParallel analog): batch sharded over the
    8-device mesh must produce the same training trajectory as single-device
    execution."""
    import federated_multi_modal_tpu.trainers  # noqa: F401

    def run(dp, out):
        cfg = get_cfg_default()
        cfg.DATASET.ROOT = str(data_root)
        cfg.DATASET.NAME = "Synthetic"
        cfg.MODEL.BACKBONE.NAME = "Tiny"
        cfg.INPUT.SIZE = (32, 32)
        cfg.INPUT.CANVAS_SIZE = 40
        cfg.DATALOADER.TRAIN_X.BATCH_SIZE = 8
        cfg.DATALOADER.TEST.BATCH_SIZE = 8
        cfg.OPTIM.MAX_EPOCH = 1
        cfg.OPTIM.LR = 0.02
        cfg.TRAIN.PRINT_FREQ = 100
        cfg.TRAINER.NAME = "CoOp"
        cfg.OUTPUT_DIR = str(out)
        cfg.SEED = 1
        cfg.VERBOSE = False
        cfg.TPU.DATA_PARALLEL = dp
        trainer = build_trainer(cfg)
        batch = {
            "image": jnp.asarray(
                np.random.default_rng(3).standard_normal((8, 32, 32, 3)),
                jnp.float32,
            ),
            "label": jnp.asarray(np.arange(8) % 4, jnp.int32),
        }
        s1 = trainer.train_step(batch)
        s2 = trainer.train_step(batch)
        return s2["loss"], np.asarray(trainer.trainable["prompt_learner"]["ctx"])

    import jax.numpy as jnp

    loss_dp, ctx_dp = run(True, tmp_path / "dp")
    loss_sd, ctx_sd = run(False, tmp_path / "sd")
    assert abs(loss_dp - loss_sd) < 1e-4
    np.testing.assert_allclose(ctx_dp, ctx_sd, atol=1e-5)


def test_multihost_helpers_single_host():
    """Single-host semantics: initialize is a no-op, this process is main,
    sync_hosts returns immediately."""
    from federated_multi_modal_tpu.parallel import (
        initialize_multihost,
        is_main_process,
        process_count,
        sync_hosts,
    )

    assert initialize_multihost() is False
    assert is_main_process()
    assert process_count() == 1
    sync_hosts("test")  # no-op, must not raise


def test_fed_round_checkpoint_orbax_backend(data_root, tmp_path):
    """TRAIN.CHECKPOINT_BACKEND=orbax: per-round aggregator checkpoints go
    through orbax pytree saves and resume restores the newest round."""
    import os

    pytest.importorskip("orbax.checkpoint")

    def make(out, resume="", rounds=2):
        cfg = get_cfg_default()
        cfg.DATASET.ROOT = str(data_root)
        cfg.DATASET.NAME = "Synthetic"
        cfg.MODEL.BACKBONE.NAME = "Tiny"
        cfg.INPUT.SIZE = (32, 32)
        cfg.INPUT.CANVAS_SIZE = 40
        cfg.DATALOADER.TRAIN_X.BATCH_SIZE = 4
        cfg.DATALOADER.TEST.BATCH_SIZE = 8
        cfg.OPTIM.MAX_EPOCH = rounds
        cfg.OPTIM.LR = 0.01
        cfg.TRAIN.PRINT_FREQ = 100
        cfg.TRAIN.CHECKPOINT_BACKEND = "orbax"
        cfg.TRAINER.NAME = "MaPLeFederated"
        cfg.TRAINER.MAPLE.PROMPT_DEPTH = 3
        cfg.OUTPUT_DIR = str(out)
        cfg.RESUME = resume
        cfg.SEED = 1
        cfg.VERBOSE = False
        cfg.FED.NUM_CLIENTS = 2
        cfg.FED.NUM_ROUNDS = rounds
        cfg.FED.LOCAL_EPOCHS = 1
        cfg.FED.DATASETS = ("Synthetic", "Synthetic")
        cfg.FED.CLASSNAME_ONLY_DATASETS = ()
        cfg.FED.CHECKPOINT_EVERY_ROUND = True
        return build_trainer(cfg)

    out = tmp_path / "fedorbax"
    fed = make(out)
    fed.train()
    agg = out / "MultiModalPromptLearner_Aggregator"
    assert os.path.isdir(agg / "round-1.orbax")
    assert os.path.isdir(agg / "round-2.orbax")

    resumed = make(tmp_path / "fedorbax_resume", resume=str(out), rounds=3)
    assert resumed._resume_round() == 2
    w_ckpt = np.asarray(fed.global_weights["prompt_learner"]["ctx"])
    w_res = np.asarray(resumed.global_weights["prompt_learner"]["ctx"])
    np.testing.assert_allclose(w_res, w_ckpt, atol=1e-6)


def test_mesh_shape_override():
    """TPU.MESH_SHAPE/TPU.MESH_AXES pin the federated mesh layout."""
    from federated_multi_modal_tpu.parallel.mesh import make_mesh_from_cfg

    cfg = get_cfg_default()
    cfg.TPU.MESH_SHAPE = (2, 4)
    cfg.TPU.MESH_AXES = ("client", "data")
    mesh = make_mesh_from_cfg(cfg, num_clients=2)
    assert dict(mesh.shape) == {"client": 2, "data": 4}

    cfg.TPU.MESH_SHAPE = (4, 2)
    with pytest.raises(ValueError):  # client axis != num_clients
        make_mesh_from_cfg(cfg, num_clients=2)

    cfg.TPU.MESH_SHAPE = (3, 4)
    with pytest.raises(ValueError):  # wrong device count
        make_mesh_from_cfg(cfg, num_clients=3)

    cfg.TPU.MESH_SHAPE = ()
    mesh = make_mesh_from_cfg(cfg, num_clients=2)  # automatic layout
    assert dict(mesh.shape)["client"] == 2


def test_parallel_fed_step_pallas_kernels_match_xla():
    """The SPMD parallel fed step (client vmap over the mesh) composed with
    the round-5 fused TRAIN kernels (pallas impl, interpret mode on CPU)
    matches the XLA-impl step: the kernels must batch correctly under
    vmap + shard_map + grad + FedAvg."""
    from federated_multi_modal_tpu.ops import primitives as prim

    def to_fp32(tree):
        return jax.tree_util.tree_map(
            lambda x: x.astype(jnp.float32)
            if x is not None and jnp.issubdtype(x.dtype, jnp.inexact) else x,
            tree, is_leaf=lambda x: x is None,
        )

    C = 2
    mesh = make_client_mesh(C)
    tx = build_fed_optimizer(lr=0.05)

    def shard(tree, spec):
        return jax.tree_util.tree_map(
            lambda x: None if x is None
            else jax.device_put(x, NamedSharding(mesh, spec)),
            tree, is_leaf=lambda x: x is None,
        )

    outs = {}
    batches = None
    for impl in ("xla", "pallas"):
        prim.set_attention_impl(impl)
        prim.set_vision_attn_wgrad_blocks("last")
        try:
            prog = build_maple_program(backbone="Tiny", depth=3,
                                       use_captions=True, seed=0)
            prog["trainable"] = to_fp32(prog["trainable"])
            frozen = shard(to_fp32(prog["frozen"]), P())
            if batches is None:
                b0 = example_batch(prog["arch"], batch_size=4,
                                   n_cls=prog["n_cls"], seed=0)
                b1 = example_batch(prog["arch"], batch_size=4,
                                   n_cls=prog["n_cls"], seed=1)
                batches = (b0, b1)
            b0, b1 = batches
            batch = {
                k: jax.device_put(
                    jnp.stack([b0[k], b1[k]]).astype(jnp.float32)
                    if jnp.issubdtype(b0[k].dtype, jnp.inexact)
                    else jnp.stack([b0[k], b1[k]]),
                    NamedSharding(mesh, P("client", "data")),
                )
                for k in b0
            }
            stacked = shard(stack_client_trees([prog["trainable"]] * C),
                            P("client"))
            opt = shard(stack_client_trees([tx.init(prog["trainable"])] * C),
                        P("client"))
            step = build_parallel_fed_step(prog["loss_fn"], tx, mesh)
            s2, _, losses = step(stacked, frozen, opt, batch)
            outs[impl] = (
                jax.device_get(losses),
                jax.device_get(jax.tree_util.tree_leaves(s2)),
            )
        finally:
            prim.set_attention_impl("xla")
            prim.set_vision_attn_wgrad_blocks(None)

    np.testing.assert_allclose(outs["pallas"][0], outs["xla"][0],
                               rtol=1e-5, atol=1e-6)
    for a, b in zip(outs["pallas"][1], outs["xla"][1]):
        np.testing.assert_allclose(
            np.asarray(a, np.float32), np.asarray(b, np.float32),
            rtol=1e-3, atol=2e-5,
        )
