"""Federated label-space unification over fabricated PatternNet + UCMerced
trees: rename map, sorted union, global remap, classname-only vocabulary
(reference trainers/maple_fed.py:48-159)."""

import os

import numpy as np
import pytest
from PIL import Image

import federated_multi_modal_tpu.trainers  # noqa: F401
from federated_multi_modal_tpu.config import get_cfg_default
from federated_multi_modal_tpu.engine import build_trainer


def _img(path):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    Image.fromarray(
        np.random.default_rng(0).integers(0, 255, (8, 8, 3), np.uint8)
    ).save(path)


@pytest.fixture(scope="module")
def remote_sensing_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("rs")
    # PatternNet: airplane, tennis_court
    for cat in ("airplane", "tennis_court"):
        for i in range(10):
            _img(str(root / "PatternNet" / "images" / cat / f"{cat}{i:02d}.jpg"))
            p = root / "PatternNet" / "Captions" / cat / f"{cat}{i:02d}.txt"
            os.makedirs(p.parent, exist_ok=True)
            p.write_text(f"a satellite photo of a {cat}")
    # UCMerced: tenniscourt (merges into tennis_court), harbor
    for cat in ("tenniscourt", "harbor"):
        for i in range(10):
            _img(str(root / "Ucmerced" / "Images" / cat / f"{cat}{i:02d}.jpg"))
            p = root / "Ucmerced" / "Captions" / cat / f"{cat}{i:02d}.txt"
            os.makedirs(p.parent, exist_ok=True)
            p.write_text(f"an aerial photo of a {cat}")
    # EuroSAT (classnames only): Forest, River with captions
    for cat in ("Forest", "River"):
        for i in range(6):
            _img(str(root / "eurosat" / "2750" / cat / f"{cat}_{i}.jpg"))
            p = root / "eurosat" / "captions" / cat / f"{cat}_{i}.txt"
            os.makedirs(p.parent, exist_ok=True)
            p.write_text(f"a satellite photo of {cat.lower()}")
    return root


def test_unified_label_space(remote_sensing_root, tmp_path):
    cfg = get_cfg_default()
    cfg.DATASET.ROOT = str(remote_sensing_root)
    cfg.DATASET.NAME = "EuroSAT"
    cfg.MODEL.BACKBONE.NAME = "Tiny"
    cfg.INPUT.SIZE = (32, 32)
    cfg.INPUT.CANVAS_SIZE = 40
    cfg.TRAINER.NAME = "MaPLeFederated"
    cfg.TRAINER.MAPLE.PROMPT_DEPTH = 3
    cfg.OUTPUT_DIR = str(tmp_path)
    cfg.SEED = 1
    cfg.VERBOSE = False
    cfg.FED.NUM_CLIENTS = 2
    cfg.FED.NUM_ROUNDS = 1
    cfg.FED.LOCAL_EPOCHS = 1
    # defaults: DATASETS = (PatternNet, Ucmerced), classname-only EuroSAT

    fed = build_trainer(cfg)

    # union: airplane, tennis_court (merged), harbor + EuroSAT's remapped
    # vocabulary (Forest, River) = 5 classes, sorted
    names = list(fed.lab2cname.values())
    assert names == sorted(names)
    assert "tennis_court" in names and "tenniscourt" not in names
    assert {"airplane", "harbor", "Forest", "River"} <= set(names)
    assert fed.num_classes == 5
    assert cfg.MODEL.NUM_CLASSES == 5

    # client datums remapped to global ids consistent with lab2cname
    name2gid = {c: i for i, c in fed.lab2cname.items()}
    for dm in fed.client_data_managers:
        for split in (dm.dataset.train_x, dm.dataset.val, dm.dataset.test):
            for d in split:
                assert d.label == name2gid[d.classname]
        # captions carried through the remap
        assert all(d.caption for d in dm.dataset.train_x)

    # UCMerced's tennis images share the global id with PatternNet's
    def ids(dm):
        out = {}
        for split in (dm.dataset.train_x, dm.dataset.val, dm.dataset.test):
            for d in split:
                out[d.classname] = d.label
        return out

    pn_ids, uc_ids = ids(fed.client_data_managers[0]), ids(fed.client_data_managers[1])
    assert pn_ids["tennis_court"] == uc_ids["tennis_court"]

    # clients classify over the full global space
    assert fed.clients[0].const.n_cls == 5
