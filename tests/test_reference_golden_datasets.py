"""Dataset-layer goldens executed against the reference's own plugin source
(/root/reference/datasets/*.py via tests/reference_harness.py): base/new
subsampling, stratified trainval split, the DTD 50/20/30 splitter, the
caption-aware PatternNet split I/O and the UCMerced rename-map folder
merging.  These are the behavioral contracts behind every base-to-novel
benchmark number.
"""

import json
import os
import random

import pytest

from reference_harness import load_reference

from federated_multi_modal_tpu.data.dataset_base import (
    read_and_split_data,
    split_trainval,
    subsample_classes,
)
from federated_multi_modal_tpu.data.datum import Datum


@pytest.fixture(scope="module")
def ref():
    return load_reference()


def _sig(item):
    return (item.impath, item.label, item.classname)


def _sigs(items):
    return [_sig(i) for i in items]


def _make_items(datum_cls, spec):
    """spec: list of (label, classname, count)."""
    out = []
    for label, cname, count in spec:
        for i in range(count):
            out.append(datum_cls(
                impath=f"/data/{cname}/{i}.jpg", label=label, classname=cname))
    return out


# ---------------------------------------------------------------------------
# subsample_classes (datasets/oxford_pets.py:140-186 executed)
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("mode", ["all", "base", "new"])
def test_subsample_classes_matches_reference(ref, mode):
    import dassl.data.datasets as dds

    spec = [(0, "cat", 3), (2, "dog", 2), (5, "fox", 4), (7, "owl", 1),
            (9, "ant", 2)]  # odd count + non-contiguous labels
    ref_train = _make_items(dds.Datum, spec)
    ref_val = _make_items(dds.Datum, spec[:3])
    our_train = _make_items(Datum, spec)
    our_val = _make_items(Datum, spec[:3])

    ref_out = ref.oxford_pets.OxfordPets.subsample_classes(
        ref_train, ref_val, subsample=mode)
    our_out = subsample_classes(our_train, our_val, subsample=mode)
    assert len(ref_out) == len(our_out) == 2
    for r, o in zip(ref_out, our_out):
        assert _sigs(r) == _sigs(o)


def test_caption_subsample_matches_reference(ref):
    """The caption-aware copy (datasets/patternnet.py:99-146) carries
    captions through relabeling; ours must agree item-for-item."""
    import dassl.data.datasets as dds

    def mk(cls):
        return [cls(impath=f"/d/{c}/{i}.jpg", label=l, classname=c,
                    caption=f"caption {c} {i}")
                for l, c, n in [(0, "river", 2), (1, "beach", 3), (2, "port", 2)]
                for i in range(n)]

    ref_out = ref.patternnet.subsample_classes(mk(dds.Datum), subsample="new")
    our_out = subsample_classes(mk(Datum), subsample="new")
    assert [(i.impath, i.label, i.classname, i.caption) for i in ref_out[0]] \
        == [(i.impath, i.label, i.classname, i.caption) for i in our_out[0]]


# ---------------------------------------------------------------------------
# split_trainval (datasets/oxford_pets.py:76-97 executed): same global-RNG
# protocol => identical stratified split
# ---------------------------------------------------------------------------


def test_split_trainval_matches_reference(ref):
    import dassl.data.datasets as dds

    spec = [(0, "cat", 10), (1, "dog", 7), (2, "fox", 5)]
    random.seed(42)
    ref_train, ref_val = ref.oxford_pets.OxfordPets.split_trainval(
        _make_items(dds.Datum, spec))
    random.seed(42)
    our_train, our_val = split_trainval(_make_items(Datum, spec))
    assert _sigs(ref_train) == _sigs(our_train)
    assert _sigs(ref_val) == _sigs(our_val)


# ---------------------------------------------------------------------------
# DTD read_and_split_data (datasets/dtd.py:54-96 executed): identical tree +
# identical global seed => identical 50/20/30 split, ignored dirs skipped,
# NEW_CNAMES applied after label assignment
# ---------------------------------------------------------------------------


def _build_tree(root, cats, n_per=10, ext=".jpg", captions=False):
    for c in cats:
        d = os.path.join(root, "images", c)
        os.makedirs(d, exist_ok=True)
        for i in range(n_per):
            open(os.path.join(d, f"im{i:02d}{ext}"), "w").close()
            if captions:
                cd = os.path.join(root, "captions", c)
                os.makedirs(cd, exist_ok=True)
                with open(os.path.join(cd, f"im{i:02d}.txt"), "w") as f:
                    f.write(f"a photo of {c} number {i}\n")
    return os.path.join(root, "images"), os.path.join(root, "captions")


def test_dtd_read_and_split_matches_reference(ref, tmp_path):
    cats = ["banded", "dotted", "zigzagged", "SKIPME"]
    image_dir, _ = _build_tree(str(tmp_path), cats)
    new_cnames = {"zigzagged": "zig-zag"}

    random.seed(7)
    ref_out = ref.dtd.DescribableTextures.read_and_split_data(
        image_dir, ignored=["SKIPME"], new_cnames=new_cnames)
    random.seed(7)
    our_out = read_and_split_data(
        image_dir, ignored=["SKIPME"], new_cnames=new_cnames)

    for r, o in zip(ref_out, our_out):
        assert _sigs(r) == _sigs(o)
    assert len(ref_out[0]) == 15 and len(ref_out[1]) == 6  # 50/20/30 of 30


# ---------------------------------------------------------------------------
# PatternNet caption-aware read_split / save_split (datasets/patternnet.py:
# 9-97 executed) — shared JSON format + caption tree resolution
# ---------------------------------------------------------------------------


def test_patternnet_read_split_matches_reference(ref, tmp_path, monkeypatch):
    from federated_multi_modal_tpu.data.datasets.patternnet import (
        read_split_captioned,
        save_split_captioned,
    )

    cats = ["beach", "river"]
    image_dir, caption_dir = _build_tree(
        str(tmp_path), cats, n_per=4, captions=True)
    split = {
        "train": [[f"{c}/im0{i}.jpg", l, c] for l, c in enumerate(cats)
                  for i in range(2)],
        "val": [[f"{c}/im02.jpg", l, c] for l, c in enumerate(cats)],
        "test": [[f"{c}/im03.jpg", l, c] for l, c in enumerate(cats)],
    }
    split_path = str(tmp_path / "split.json")
    with open(split_path, "w") as f:
        json.dump(split, f)

    ref_tr, ref_va, ref_te = ref.patternnet.read_split(
        split_path, image_dir, caption_dir)
    our_tr, our_va, our_te = read_split_captioned(
        split_path, image_dir, caption_dir)
    for r, o in zip((ref_tr, ref_va, ref_te), (our_tr, our_va, our_te)):
        assert [(i.impath, i.label, i.classname, i.caption) for i in r] \
            == [(i.impath, i.label, i.classname, i.caption) for i in o]
    assert ref_tr[0].caption == "a photo of beach number 0"

    # save_split: both writers produce the same JSON payload
    ref_path = str(tmp_path / "ref_out.json")
    our_path = str(tmp_path / "our_out.json")
    ref.patternnet.save_split(ref_tr, ref_va, ref_te, ref_path, image_dir)
    save_split_captioned(our_tr, our_va, our_te, our_path, image_dir)
    with open(ref_path) as f:
        ref_json = json.load(f)
    with open(our_path) as f:
        our_json = json.load(f)
    assert ref_json == our_json


# ---------------------------------------------------------------------------
# UCMerced rename-map folder merging (datasets/ucmerced.py:34-144 executed):
# renamed folders merge into PatternNet vocabulary with shared labels
# ---------------------------------------------------------------------------


def test_ucmerced_rename_split_matches_reference(ref, tmp_path, monkeypatch):
    from federated_multi_modal_tpu.data.datasets.ucmerced import (
        UCMERCED_RENAME_MAP,
        scan_and_split_captioned,
    )

    cats = ["tenniscourt", "golfcourse", "agricultural", "baseballdiamond"]
    image_dir, caption_dir = _build_tree(
        str(tmp_path), cats, n_per=5, captions=True)

    # ours sorts within-folder file lists for determinism; pin the
    # reference's listdir to the same order so the sequential (unshuffled)
    # split boundaries line up — the logic under test is rename/merge/label
    # assignment, not filesystem enumeration order
    monkeypatch.setattr(
        ref.ucmerced, "listdir_nohidden",
        lambda p, sort=False: sorted(
            f for f in os.listdir(p) if not f.startswith(".")))

    ref_out = ref.ucmerced.read_and_split_data(image_dir, caption_dir)
    our_out = scan_and_split_captioned(
        image_dir, caption_dir, rename_map=UCMERCED_RENAME_MAP)
    for r, o in zip(ref_out, our_out):
        assert [(i.impath, i.label, i.classname, i.caption) for i in r] \
            == [(i.impath, i.label, i.classname, i.caption) for i in o]
    # the renamed classnames actually appear
    names = {i.classname for part in ref_out for i in part}
    assert "tennis_court" in names and "golf_course" in names


# ---------------------------------------------------------------------------
# class-rename tables & ignore lists are data contracts: compare ours to the
# reference's executed module constants
# ---------------------------------------------------------------------------


def test_cname_tables_match_reference(ref):
    from federated_multi_modal_tpu.data.datasets import caltech101, eurosat

    assert caltech101.NEW_CNAMES == ref.caltech101.NEW_CNAMES
    assert caltech101.IGNORED == ref.caltech101.IGNORED
    assert eurosat.NEW_CNAMES == ref.eurosat.NEW_CNAMES


def test_fed_rename_map_matches_reference_table(ref):
    """The aggregator's UCMerced->PatternNet rename table
    (trainers/maple_fed.py:84-96) is function-local in the reference; ours
    is the module constant used by both the plugin and the aggregator.
    Assert it against the executed plugin behavior: every original folder
    name maps to the PatternNet name the reference's splitter produced."""
    from federated_multi_modal_tpu.data.datasets.ucmerced import (
        UCMERCED_RENAME_MAP,
    )

    expected = {
        "tenniscourt": "tennis_court",
        "golfcourse": "golf_course",
        "parkinglot": "parking_lot",
        "storagetanks": "storage_tank",
        "mobilehomepark": "mobile_home_park",
        "baseballdiamond": "baseball_field",
        "denseresidential": "dense_residential",
        "sparseresidential": "sparse_residential",
    }
    assert UCMERCED_RENAME_MAP == expected
