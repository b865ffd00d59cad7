"""MaPLe trainer + federated aggregator tests (Tiny backbone, synthetic
data, 2 clients)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import federated_multi_modal_tpu.trainers  # noqa: F401
from federated_multi_modal_tpu.config import get_cfg_default
from federated_multi_modal_tpu.engine import build_trainer
from federated_multi_modal_tpu.engine.trainer import path_name, split_tree
from federated_multi_modal_tpu.trainers.maple import maple_trainable_predicate
from federated_multi_modal_tpu.trainers.maple_fed import (
    copy_tree,
    safe_average_trees,
)


def make_cfg(tmp_root, out_dir, trainer="MaPLe", **overrides):
    cfg = get_cfg_default()
    cfg.DATASET.ROOT = str(tmp_root)
    cfg.DATASET.NAME = "Synthetic"
    cfg.MODEL.BACKBONE.NAME = "Tiny"
    cfg.INPUT.SIZE = (32, 32)
    cfg.INPUT.CANVAS_SIZE = 40
    cfg.DATALOADER.TRAIN_X.BATCH_SIZE = 4
    cfg.DATALOADER.TEST.BATCH_SIZE = 8
    cfg.OPTIM.MAX_EPOCH = 2
    cfg.OPTIM.LR = 0.01
    cfg.OPTIM.WARMUP_EPOCH = 1
    cfg.OPTIM.WARMUP_TYPE = "constant"
    cfg.OPTIM.WARMUP_CONS_LR = 1e-3
    cfg.OPTIM.LR_SCHEDULER = "cosine"
    cfg.TRAIN.PRINT_FREQ = 100
    cfg.TRAINER.NAME = trainer
    cfg.TRAINER.MAPLE.PROMPT_DEPTH = 3
    cfg.OUTPUT_DIR = str(out_dir)
    cfg.SEED = 1
    cfg.VERBOSE = False
    cfg.FED.NUM_CLIENTS = 2
    cfg.FED.NUM_ROUNDS = 2
    cfg.FED.LOCAL_EPOCHS = 1
    cfg.FED.DATASETS = ("Synthetic", "Synthetic")
    cfg.FED.CLASSNAME_ONLY_DATASETS = ()
    for k, v in overrides.items():
        node = cfg
        keys = k.split(".")
        for kk in keys[:-1]:
            node = node[kk]
        node[keys[-1]] = v
    return cfg


@pytest.fixture(scope="module")
def data_root(tmp_path_factory):
    return tmp_path_factory.mktemp("dataroot")


def test_trainable_predicate_policy():
    pred = maple_trainable_predicate(3, 3)
    assert pred("prompt_learner.ctx")
    assert pred("clip.visual.blocks.0.ln_1.scale")
    assert pred("clip.text.ln_final.bias")
    assert pred("clip.visual.blocks.2.attn.w_qkv")  # last block
    assert pred("clip.text.blocks.2.mlp.w_fc")
    assert not pred("clip.visual.blocks.1.attn.w_qkv")
    assert not pred("clip.text.token_embedding")
    assert not pred("clip.visual.conv1.w")
    assert not pred("clip.logit_scale")


def test_maple_standalone_trains(data_root, tmp_path):
    cfg = make_cfg(data_root, tmp_path)
    trainer = build_trainer(cfg)

    # trainable partition includes LN + last blocks + prompt learner
    names = [
        path_name(p)
        for p, x in jax.tree_util.tree_flatten_with_path(trainer.trainable)[0]
        if x is not None
    ]
    assert any("prompt_learner.ctx" in n for n in names)
    assert any("couplers" in n for n in names)
    assert any("ln_1" in n for n in names)
    assert any("blocks.2.attn" in n for n in names)

    ctx0 = np.asarray(trainer.trainable["prompt_learner"]["ctx"])
    trainer.train()
    ctx1 = np.asarray(trainer.trainable["prompt_learner"]["ctx"])
    assert not np.allclose(ctx0, ctx1)

    # checkpoint exists under the registered name
    assert os.path.exists(
        os.path.join(str(tmp_path), "MultiModalPromptLearner", "model.pth.tar-2")
    )


def test_maple_caption_branch_changes_loss(data_root, tmp_path):
    cfg = make_cfg(data_root, tmp_path / "cap")
    trainer = build_trainer(cfg)
    batch = next(iter(trainer.train_loader_x))
    step = trainer.parse_batch_train(batch)
    assert "caption_tokens" in step
    loss_with, _ = trainer.loss_fn(trainer.trainable, trainer.frozen, step)
    step_nocap = dict(step)
    del step_nocap["caption_tokens"]
    loss_without, _ = trainer.loss_fn(trainer.trainable, trainer.frozen, step_nocap)
    assert not np.allclose(float(loss_with), float(loss_without))


def test_safe_average_trees_scrubs_nonfinite():
    t1 = {"a": jnp.asarray([1.0, 2.0]), "b": None}
    t2 = {"a": jnp.asarray([3.0, jnp.nan]), "b": None}
    avg = safe_average_trees([t1, t2])
    np.testing.assert_allclose(np.asarray(avg["a"]), [2.0, 1.0])
    assert avg["b"] is None


def test_federated_round_loop(data_root, tmp_path):
    cfg = make_cfg(data_root, tmp_path / "fed", trainer="MaPLeFederated")
    fed = build_trainer(cfg)
    assert len(fed.clients) == 2
    # shared frozen CLIP: identical buffers across clients
    f0 = fed.clients[0].frozen["model"]["clip"]["visual"]["conv1"]["w"]
    f1 = fed.clients[1].frozen["model"]["clip"]["visual"]["conv1"]["w"]
    assert f0 is f1

    g0 = copy_tree(fed.global_weights)
    fed.train()
    g1 = fed.global_weights
    d = jax.tree_util.tree_map(
        lambda a, b: None if a is None else float(jnp.abs(a - b).max()),
        g0, g1, is_leaf=lambda x: x is None,
    )
    assert max(x for x in jax.tree_util.tree_leaves(d)) > 0, "global must move"
    assert fed.nan_stats["total_updates"] == 2
    assert fed.nan_stats["skipped_rounds"] == 0

    # aggregator checkpoint
    agg_dir = os.path.join(
        str(tmp_path / "fed"), "MultiModalPromptLearner_Aggregator"
    )
    files = os.listdir(agg_dir)
    assert any(f.startswith("model.pth.tar") for f in files)

    # reload round-trips
    fed.load_model(str(tmp_path / "fed"), epoch=cfg.OPTIM.MAX_EPOCH)


def test_broadcast_resets_momentum_and_lr(data_root, tmp_path):
    cfg = make_cfg(data_root, tmp_path / "bc", trainer="MaPLeFederated")
    fed = build_trainer(cfg)
    client = fed.clients[0]
    # train one epoch so momentum becomes nonzero
    client.run_epoch(0)
    fed.broadcast_weights(fed.global_weights, round_idx=1)
    # momentum buffers zeroed
    inner = client.opt_state.inner_state
    traces = [
        x for x in jax.tree_util.tree_leaves(inner) if hasattr(x, "shape")
    ]
    assert all(float(jnp.abs(t).max()) == 0.0 for t in traces if t.size > 1)
    # reference scheduler-rebuild quirk: broadcast leaves the LR at the
    # epoch-0 (warmup) value; per-epoch stepping then continues from the
    # global epoch counter
    assert client.get_current_lr() == pytest.approx(client.sched_fn(0))
    assert client.epoch == 1 * cfg.FED.LOCAL_EPOCHS
    client.update_lr()
    assert client.get_current_lr() == pytest.approx(
        client.sched_fn(cfg.FED.LOCAL_EPOCHS + 1)
    )


def test_eval_fast_path_matches_plain_inference(data_root, tmp_path):
    """The cached eval path (prepare once + apply per batch) must produce
    the same logits as the uncached logits_fn."""
    cfg = make_cfg(data_root, tmp_path / "fast")
    trainer = build_trainer(cfg)
    batch = next(iter(trainer.test_loader))
    images = trainer.parse_batch_images(batch)
    fast = np.asarray(trainer.model_inference(images))
    plain = np.asarray(
        trainer.logits_fn(trainer.trainable, trainer.frozen, images)
    )
    # bf16 activations fused differently across programs -> small noise;
    # require tight agreement relative to the logit scale and identical
    # predictions
    np.testing.assert_allclose(fast, plain, atol=0.08, rtol=0.0)
    assert (fast.argmax(1) == plain.argmax(1)).all()
    # weights change -> cache invalidated and still consistent
    trainer.run_epoch(0)
    images2 = trainer.parse_batch_images(next(iter(trainer.test_loader)))
    fast2 = np.asarray(trainer.model_inference(images2))
    plain2 = np.asarray(
        trainer.logits_fn(trainer.trainable, trainer.frozen, images2)
    )
    np.testing.assert_allclose(fast2, plain2, atol=0.08, rtol=0.0)
    assert (fast2.argmax(1) == plain2.argmax(1)).all()
