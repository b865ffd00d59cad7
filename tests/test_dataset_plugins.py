"""Dataset plugin tests over fabricated miniature on-disk trees, covering
each reference layout family: annotation files (OxfordPets), folder
splitter (Caltech101), classnames.txt + split dirs (ImageNet), txt lists
(FGVCAircraft, UCF101), caption trees (EuroSAT required, PatternNet
optional) and the UCMerced folder-merging rename map."""

import os

import numpy as np
import pytest
from PIL import Image

from federated_multi_modal_tpu.config import get_cfg_default
from federated_multi_modal_tpu.engine.registry import DATASET_REGISTRY

import federated_multi_modal_tpu.data.datasets  # noqa: F401


def _img(path):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    Image.fromarray(
        np.random.default_rng(0).integers(0, 255, (8, 8, 3), np.uint8)
    ).save(path)


def _cfg(root, name, shots=-1):
    cfg = get_cfg_default()
    cfg.DATASET.ROOT = str(root)
    cfg.DATASET.NAME = name
    cfg.DATASET.NUM_SHOTS = shots
    cfg.SEED = 1
    cfg.VERBOSE = False
    return cfg


def test_oxford_pets_annotations(tmp_path):
    base = tmp_path / "oxford_pets"
    for i in range(1, 4):
        _img(str(base / "images" / f"abyssinian_{i}.jpg"))
        _img(str(base / "images" / f"beagle_{i}.jpg"))
    os.makedirs(base / "annotations", exist_ok=True)
    trainval, test = [], []
    for i in range(1, 4):
        trainval.append(f"abyssinian_{i} 1 1 1")
        trainval.append(f"beagle_{i} 2 2 1")
    (base / "annotations" / "trainval.txt").write_text("\n".join(trainval))
    (base / "annotations" / "test.txt").write_text(
        "abyssinian_1 1 1 1\nbeagle_1 2 2 1"
    )
    ds = DATASET_REGISTRY.get("OxfordPets")(_cfg(tmp_path, "OxfordPets"))
    assert ds.num_classes == 2
    assert ds.classnames == ["abyssinian", "beagle"]
    # split json written for reuse
    assert (base / "split_zhou_OxfordPets.json").exists()
    # second load goes through the split file
    ds2 = DATASET_REGISTRY.get("OxfordPets")(_cfg(tmp_path, "OxfordPets"))
    assert len(ds2.test) == len(ds.test)


def test_caltech101_folder_split_and_renames(tmp_path):
    base = tmp_path / "caltech-101" / "101_ObjectCategories"
    for cat, n in [("airplanes", 6), ("Faces", 6), ("BACKGROUND_Google", 4),
                   ("ant", 6)]:
        for i in range(n):
            _img(str(base / cat / f"img_{i}.jpg"))
    ds = DATASET_REGISTRY.get("Caltech101")(_cfg(tmp_path, "Caltech101"))
    # ignored category dropped; renames applied
    assert "BACKGROUND_Google" not in ds.classnames
    assert "airplane" in ds.classnames and "face" in ds.classnames
    assert ds.num_classes == 3


def test_imagenet_layout_and_cache(tmp_path):
    base = tmp_path / "imagenet"
    (base / "images").mkdir(parents=True)
    (base / "classnames.txt").write_text(
        "n01440764 tench\nn01443537 goldfish\n"
    )
    for folder in ("n01440764", "n01443537"):
        for split in ("train", "val"):
            for i in range(2):
                _img(str(base / "images" / split / folder / f"{i}.JPEG"))
    ds = DATASET_REGISTRY.get("ImageNet")(_cfg(tmp_path, "ImageNet"))
    assert ds.classnames == ["tench", "goldfish"]
    assert len(ds.test) == 4  # val used as test
    assert (base / "preprocessed.pkl").exists()
    ds2 = DATASET_REGISTRY.get("ImageNet")(_cfg(tmp_path, "ImageNet"))
    assert len(ds2.train_x) == len(ds.train_x)


def test_fgvc_aircraft_lists(tmp_path):
    base = tmp_path / "fgvc_aircraft"
    (base / "images").mkdir(parents=True)
    (base / "variants.txt").write_text("707-320\nA310\n")
    for split in ("train", "val", "test"):
        lines = []
        for i, variant in enumerate(["707-320", "A310"]):
            imname = f"{split}{i}"
            _img(str(base / "images" / f"{imname}.jpg"))
            lines.append(f"{imname} {variant}")
        (base / f"images_variant_{split}.txt").write_text("\n".join(lines))
    ds = DATASET_REGISTRY.get("FGVCAircraft")(_cfg(tmp_path, "FGVCAircraft"))
    assert ds.classnames == ["707-320", "A310"]
    assert len(ds.train_x) == 2 and len(ds.test) == 2


def test_ucf101_lists_and_camelcase(tmp_path):
    base = tmp_path / "ucf101"
    (base / "ucfTrainTestlist").mkdir(parents=True)
    (base / "ucfTrainTestlist" / "classInd.txt").write_text(
        "1 ApplyEyeMakeup\n2 Basketball\n"
    )
    train_lines, test_lines = [], []
    for action, renamed in [("ApplyEyeMakeup", "Apply_Eye_Makeup"),
                            ("Basketball", "Basketball")]:
        for i in range(5):
            fn = f"v_{action}_g{i:02d}.avi"
            _img(str(base / "UCF-101-midframes" / renamed /
                     fn.replace(".avi", ".jpg")))
            (train_lines if i < 4 else test_lines).append(f"{action}/{fn} 1")
    (base / "ucfTrainTestlist" / "trainlist01.txt").write_text(
        "\n".join(train_lines)
    )
    (base / "ucfTrainTestlist" / "testlist01.txt").write_text(
        "\n".join(test_lines)
    )
    ds = DATASET_REGISTRY.get("UCF101")(_cfg(tmp_path, "UCF101"))
    assert set(ds.classnames) == {"Apply_Eye_Makeup", "Basketball"}


def test_eurosat_requires_captions(tmp_path):
    base = tmp_path / "eurosat"
    for cat in ("Forest", "River"):
        for i in range(6):
            _img(str(base / "2750" / cat / f"{cat}_{i}.jpg"))
    with pytest.raises(FileNotFoundError):
        DATASET_REGISTRY.get("EuroSAT")(_cfg(tmp_path, "EuroSAT"))

    # with the parallel caption tree it loads, with NEW_CNAMES applied
    for cat in ("Forest", "River"):
        for i in range(6):
            p = base / "captions" / cat / f"{cat}_{i}.txt"
            os.makedirs(p.parent, exist_ok=True)
            p.write_text(f"a satellite photo of {cat.lower()}")
    ds = DATASET_REGISTRY.get("EuroSAT")(_cfg(tmp_path, "EuroSAT"))
    assert set(ds.classnames) == {"Forest", "River"}
    assert all(d.caption for d in ds.train_x)


def test_ucmerced_rename_merging_and_captions(tmp_path):
    base = tmp_path / "Ucmerced"
    # tenniscourt folder must merge into PatternNet's tennis_court name
    for cat in ("tenniscourt", "harbor"):
        for i in range(10):
            _img(str(base / "Images" / cat / f"{cat}{i:02d}.jpg"))
            p = base / "Captions" / cat / f"{cat}{i:02d}.txt"
            os.makedirs(p.parent, exist_ok=True)
            p.write_text(f"an aerial photo of a {cat}")
    ds = DATASET_REGISTRY.get("Ucmerced")(_cfg(tmp_path, "Ucmerced"))
    names = {d.classname for d in ds.train_x + ds.val + ds.test}
    assert "tennis_court" in names and "tenniscourt" not in names
    assert all(d.caption for d in ds.train_x)
    assert (base / "Ucmerced.json").exists()


def test_patternnet_deterministic_split(tmp_path):
    base = tmp_path / "PatternNet"
    for cat in ("airplane", "beach"):
        for i in range(10):
            _img(str(base / "images" / cat / f"{cat}{i:02d}.jpg"))
    ds = DATASET_REGISTRY.get("PatternNet")(_cfg(tmp_path, "PatternNet"))
    # in-order 50/20/30 split over the flat list (no shuffle)
    assert len(ds.train_x) == 10 and len(ds.val) == 4 and len(ds.test) == 6
    ds2 = DATASET_REGISTRY.get("PatternNet")(_cfg(tmp_path, "PatternNet"))
    assert [d.impath for d in ds2.train_x] == [d.impath for d in ds.train_x]


def test_fewshot_on_plugin(tmp_path):
    base = tmp_path / "PatternNet"
    for cat in ("airplane", "beach", "bridge"):
        for i in range(12):
            _img(str(base / "images" / cat / f"{cat}{i:02d}.jpg"))
    ds = DATASET_REGISTRY.get("PatternNet")(
        _cfg(tmp_path, "PatternNet", shots=2)
    )
    from collections import Counter

    counts = Counter(d.label for d in ds.train_x)
    assert all(v <= 2 for v in counts.values())
    assert (base / "shots" / "shot_2-seed_1.pkl").exists()
