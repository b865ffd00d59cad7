"""Remaining dataset-plugin layout families: .mat annotations
(StanfordCars, OxfordFlowers), hierarchical txt lists (SUN397), the generic
50/20/30 folder splitter owners (DTD, Food101) and the four test-only
ImageNet domain-shift variants."""

import os

import numpy as np

from federated_multi_modal_tpu.config import get_cfg_default
from federated_multi_modal_tpu.engine.registry import DATASET_REGISTRY

import federated_multi_modal_tpu.data.datasets  # noqa: F401


def _touch(path, content=b"x"):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "wb") as f:
        f.write(content)


def _cfg(root, name, shots=-1, subsample="all"):
    cfg = get_cfg_default()
    cfg.DATASET.ROOT = str(root)
    cfg.DATASET.NAME = name
    cfg.DATASET.NUM_SHOTS = shots
    cfg.DATASET.SUBSAMPLE_CLASSES = subsample
    cfg.SEED = 1
    cfg.VERBOSE = False
    return cfg


def test_dtd_generic_folder_split(tmp_path):
    base = tmp_path / "dtd" / "images"
    for cat in ("banded", "dotted"):
        for i in range(10):
            _touch(str(base / cat / f"{cat}_{i:04d}.jpg"))
    ds = DATASET_REGISTRY.get("DescribableTextures")(
        _cfg(tmp_path, "DescribableTextures")
    )
    # 50/20/30 per class
    assert len(ds.train_x) == 10 and len(ds.val) == 4 and len(ds.test) == 6
    assert set(ds.classnames) == {"banded", "dotted"}
    assert (tmp_path / "dtd" / "split_zhou_DescribableTextures.json").exists()


def test_food101_generic_folder_split(tmp_path):
    base = tmp_path / "food-101" / "images"
    for cat in ("apple_pie", "baklava"):
        for i in range(10):
            _touch(str(base / cat / f"{i:07d}.jpg"))
    ds = DATASET_REGISTRY.get("Food101")(_cfg(tmp_path, "Food101"))
    assert set(ds.classnames) == {"apple_pie", "baklava"}
    assert len(ds.train_x) == 10


def test_stanford_cars_mat_annotations(tmp_path):
    from scipy.io import savemat

    base = tmp_path / "stanford_cars"
    (base / "devkit").mkdir(parents=True)

    def annos_mat(prefix, n, n_cls):
        rec = np.zeros((1, n), dtype=[("fname", "O"), ("class", "O")])
        for i in range(n):
            rec[0, i] = (f"{prefix}_{i}.jpg", np.array([[i % n_cls + 1]]))
        return {"annotations": rec}

    savemat(str(base / "devkit" / "cars_train_annos.mat"), annos_mat("tr", 8, 2))
    savemat(str(base / "cars_test_annos_withlabels.mat"), annos_mat("te", 4, 2))
    savemat(
        str(base / "devkit" / "cars_meta.mat"),
        {"class_names": np.array(
            [["Acura TL Sedan 2012", "BMW X3 SUV 2011"]], dtype=object
        )},
    )
    for i in range(8):
        _touch(str(base / "cars_train" / f"tr_{i}.jpg"))
    for i in range(4):
        _touch(str(base / "cars_test" / f"te_{i}.jpg"))

    ds = DATASET_REGISTRY.get("StanfordCars")(_cfg(tmp_path, "StanfordCars"))
    # classname reordered year-first (reference datasets/stanford_cars.py)
    assert set(ds.classnames) == {"2012 Acura TL Sedan", "2011 BMW X3 SUV"}
    assert len(ds.test) == 4


def test_oxford_flowers_mat_labels(tmp_path):
    import json

    from scipy.io import savemat

    base = tmp_path / "oxford_flowers"
    base.mkdir()
    n_per, n_cls = 10, 2
    labels = np.repeat(np.arange(1, n_cls + 1), n_per)
    savemat(str(base / "imagelabels.mat"), {"labels": labels[None]})
    (base / "cat_to_name.json").write_text(
        json.dumps({"1": "pink primrose", "2": "hard-leaved pocket orchid"})
    )
    for i in range(n_per * n_cls):
        _touch(str(base / "jpg" / f"image_{i + 1:05d}.jpg"))

    ds = DATASET_REGISTRY.get("OxfordFlowers")(_cfg(tmp_path, "OxfordFlowers"))
    assert set(ds.classnames) == {"pink primrose", "hard-leaved pocket orchid"}
    # labels are shifted to 0-based
    assert sorted({d.label for d in ds.train_x}) == [0, 1]
    # per-class 50/20/30
    assert len(ds.train_x) == 10 and len(ds.val) == 4 and len(ds.test) == 6


def test_sun397_hierarchical_names(tmp_path):
    base = tmp_path / "sun397"
    base.mkdir()
    classes = ["/a/abbey", "/b/bedroom/indoor"]
    (base / "ClassName.txt").write_text("\n".join(classes) + "\n")
    train_lines, test_lines = [], []
    for cls in classes:
        for i in range(4):
            rel = f"{cls}/sun_{i:03d}.jpg"
            _touch(str(base / "SUN397" / rel.lstrip("/")))
            (train_lines if i < 3 else test_lines).append(rel)
    (base / "Training_01.txt").write_text("\n".join(train_lines) + "\n")
    (base / "Testing_01.txt").write_text("\n".join(test_lines) + "\n")

    ds = DATASET_REGISTRY.get("SUN397")(_cfg(tmp_path, "SUN397"))
    # hierarchical dirs reversed: "bedroom indoor" -> "indoor bedroom"
    assert set(ds.classnames) == {"abbey", "indoor bedroom"}
    assert len(ds.test) == 2


def _imagenet_classnames(path, wnids_names):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        for wnid, name in wnids_names:
            f.write(f"{wnid} {name}\n")


def test_imagenet_sketch(tmp_path):
    base = tmp_path / "imagenet-sketch"
    _imagenet_classnames(
        str(base / "classnames.txt"),
        [("n01440764", "tench"), ("n01443537", "goldfish")],
    )
    for wnid in ("n01440764", "n01443537"):
        for i in range(3):
            _touch(str(base / "images" / wnid / f"{i}.jpg"))
    ds = DATASET_REGISTRY.get("ImageNetSketch")(
        _cfg(tmp_path, "ImageNetSketch")
    )
    assert len(ds.test) == 6
    assert set(d.classname for d in ds.test) == {"tench", "goldfish"}


def test_imagenet_a_ignores_readme(tmp_path):
    base = tmp_path / "imagenet-adversarial"
    _imagenet_classnames(
        str(base / "classnames.txt"), [("n01498041", "stingray")]
    )
    _touch(str(base / "imagenet-a" / "README.txt"))
    for i in range(2):
        _touch(str(base / "imagenet-a" / "n01498041" / f"{i}.jpg"))
    ds = DATASET_REGISTRY.get("ImageNetA")(_cfg(tmp_path, "ImageNetA"))
    assert len(ds.test) == 2


def test_imagenet_r_ignores_readme(tmp_path):
    base = tmp_path / "imagenet-rendition"
    _imagenet_classnames(
        str(base / "classnames.txt"), [("n01443537", "goldfish")]
    )
    _touch(str(base / "imagenet-r" / "README.txt"))
    for i in range(2):
        _touch(str(base / "imagenet-r" / "n01443537" / f"{i}.jpg"))
    ds = DATASET_REGISTRY.get("ImageNetR")(_cfg(tmp_path, "ImageNetR"))
    assert len(ds.test) == 2


def test_imagenetv2_numeric_folders(tmp_path):
    base = tmp_path / "imagenetv2"
    wnids = [(f"n{i:08d}", f"class {i}") for i in range(1000)]
    _imagenet_classnames(str(base / "classnames.txt"), wnids)
    img_root = base / "imagenetv2-matched-frequency-format-val"
    for label in range(1000):
        _touch(str(img_root / str(label) / "0.jpeg"))
    ds = DATASET_REGISTRY.get("ImageNetV2")(_cfg(tmp_path, "ImageNetV2"))
    assert len(ds.test) == 1000
    assert ds.test[5].classname == "class 5"
