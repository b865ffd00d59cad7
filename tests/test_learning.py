"""Integration: the full MaPLe pipeline actually learns.

Synthetic 4-class data is trivially separable; with the Tiny backbone and
enough epochs the trainer must beat chance (25%) by a wide margin —
exercising the whole loop: device preprocessing, prompt coupling, caption
branch, alignment loss, LN/last-block training, scheduler, eval.
"""

import pytest

import federated_multi_modal_tpu.trainers  # noqa: F401
from federated_multi_modal_tpu.config import get_cfg_default
from federated_multi_modal_tpu.engine import build_trainer


@pytest.mark.slow
def test_maple_learns_synthetic(tmp_path):
    cfg = get_cfg_default()
    cfg.DATASET.ROOT = str(tmp_path)
    cfg.DATASET.NAME = "Synthetic"
    cfg.MODEL.BACKBONE.NAME = "Tiny"
    cfg.INPUT.SIZE = (32, 32)
    cfg.INPUT.CANVAS_SIZE = 40
    cfg.DATALOADER.TRAIN_X.BATCH_SIZE = 8
    cfg.DATALOADER.TEST.BATCH_SIZE = 16
    cfg.OPTIM.MAX_EPOCH = 15
    cfg.OPTIM.LR = 0.02
    cfg.OPTIM.WARMUP_EPOCH = 1
    cfg.OPTIM.WARMUP_TYPE = "constant"
    cfg.OPTIM.WARMUP_CONS_LR = 5e-3
    cfg.TRAIN.PRINT_FREQ = 1000
    cfg.TEST.NO_TEST = True
    cfg.TRAINER.NAME = "MaPLe"
    cfg.TRAINER.MAPLE.PROMPT_DEPTH = 3
    cfg.OUTPUT_DIR = str(tmp_path / "out")
    cfg.SEED = 1
    cfg.VERBOSE = False

    trainer = build_trainer(cfg)
    baseline = trainer.test()["accuracy"]
    trainer.train()
    final = trainer.test()["accuracy"]
    # 4 classes, chance = 25%; the separable patterns must be learned
    assert final >= 60.0, f"final accuracy {final} (baseline {baseline})"
    assert final > baseline
