"""train.py CLI surface: config merge order, flag mapping, INIT_WEIGHTS."""

import sys
from types import SimpleNamespace

import numpy as np
import pytest

sys.path.insert(0, ".")  # repo root for train.py

import train as train_cli  # noqa: E402


def _args(**kw):
    base = dict(
        root="", output_dir="", resume="", seed=0, source_domains=None,
        target_domains=None, transforms=None, trainer="", backbone="",
        head="", eval_only=False, model_dir="", load_epoch=None,
        no_train=False, opts=[], config_file="", dataset_config_file="",
    )
    base.update(kw)
    return SimpleNamespace(**base)


def test_setup_cfg_merge_order(tmp_path):
    ds = tmp_path / "ds.yaml"
    ds.write_text("DATASET:\n  NAME: 'EuroSAT'\nOPTIM:\n  LR: 0.1\n")
    tr = tmp_path / "tr.yaml"
    tr.write_text("OPTIM:\n  LR: 0.2\n  MAX_EPOCH: 7\n")

    args = _args(
        dataset_config_file=str(ds),
        config_file=str(tr),
        trainer="MaPLe",
        root="/data",
        seed=3,
        opts=["OPTIM.LR", "0.3"],
    )
    cfg = train_cli.setup_cfg(args)
    # trainer yaml overrides dataset yaml; opts override both
    assert cfg.OPTIM.LR == 0.3
    assert cfg.OPTIM.MAX_EPOCH == 7
    assert cfg.DATASET.NAME == "EuroSAT"
    assert cfg.TRAINER.NAME == "MaPLe"
    assert cfg.DATASET.ROOT == "/data"
    assert cfg.SEED == 3
    assert cfg.is_frozen()


def test_setup_cfg_backbone_flag():
    cfg = train_cli.setup_cfg(_args(backbone="RN50"))
    assert cfg.MODEL.BACKBONE.NAME == "RN50"


def test_init_weights_loading(tmp_path):
    """MODEL.INIT_WEIGHTS loads a checkpoint into a fresh trainer."""
    import federated_multi_modal_tpu.trainers  # noqa: F401
    from federated_multi_modal_tpu.config import get_cfg_default
    from federated_multi_modal_tpu.engine import build_trainer
    from federated_multi_modal_tpu.engine.checkpoint import save_checkpoint

    def make(init_weights=""):
        cfg = get_cfg_default()
        cfg.DATASET.ROOT = str(tmp_path / "data")
        cfg.DATASET.NAME = "Synthetic"
        cfg.MODEL.BACKBONE.NAME = "Tiny"
        cfg.MODEL.INIT_WEIGHTS = init_weights
        cfg.INPUT.SIZE = (32, 32)
        cfg.INPUT.CANVAS_SIZE = 40
        cfg.TRAINER.NAME = "CoOp"
        cfg.TRAINER.COOP.N_CTX = 4
        cfg.OUTPUT_DIR = str(tmp_path / "out")
        cfg.SEED = 1
        cfg.VERBOSE = False
        return build_trainer(cfg)

    t1 = make()
    ctx = np.full_like(np.asarray(t1.trainable["prompt_learner"]["ctx"]), 0.5)
    ckpt_dir = tmp_path / "init"
    save_checkpoint(
        {"epoch": 1, "state_dict": {"prompt_learner.ctx": ctx}},
        str(ckpt_dir),
    )
    t2 = make(init_weights=str(ckpt_dir / "model.pth.tar-1"))
    np.testing.assert_allclose(
        np.asarray(t2.trainable["prompt_learner"]["ctx"]), 0.5
    )
