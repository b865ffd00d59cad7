"""Data layer tests: few-shot determinism, base/new subsampling, loaders in
both pipelines, IID partition, caption propagation."""

import numpy as np
import pytest

from federated_multi_modal_tpu.config import get_cfg_default
from federated_multi_modal_tpu.data import (
    ClientDataManager,
    DataManager,
    Datum,
    partition_dataset_iid,
    subsample_classes,
)
from federated_multi_modal_tpu.data.dataset_base import fewshot_with_cache
from federated_multi_modal_tpu.utils.seed import set_random_seed


def _mk(n_cls=5, per=6):
    return [
        Datum(impath=f"/x/{c}_{i}.jpg", label=c, classname=f"class{c}",
              caption=f"cap {c} {i}")
        for c in range(n_cls)
        for i in range(per)
    ]


def test_subsample_base_new_partition():
    data = _mk(5, 4)
    (base,) = subsample_classes(data, subsample="base")
    (new,) = subsample_classes(data, subsample="new")
    # ceil(5/2)=3 base classes, 2 new classes, both relabeled from 0
    assert {d.label for d in base} == {0, 1, 2}
    assert {d.label for d in new} == {0, 1}
    assert {d.classname for d in base} == {"class0", "class1", "class2"}
    assert {d.classname for d in new} == {"class3", "class4"}
    # captions preserved (fork caption-aware variant)
    assert all(d.caption for d in base)
    (all_out,) = subsample_classes(data, subsample="all")
    assert all_out is data


def test_fewshot_cache_roundtrip(tmp_path):
    cfg = get_cfg_default()
    cfg.DATASET.NUM_SHOTS = 2
    cfg.SEED = 1
    data = _mk(3, 8)
    set_random_seed(1)
    t1, v1 = fewshot_with_cache(cfg, str(tmp_path), data, data)
    assert len(t1) == 3 * 2
    assert len(v1) == 3 * 2  # min(2, 4) = 2 per class
    # cache file exists and reloading gives identical items
    assert (tmp_path / "shot_2-seed_1.pkl").exists()
    set_random_seed(99)  # different RNG; cache must win
    t2, v2 = fewshot_with_cache(cfg, str(tmp_path), data, data)
    assert [d.impath for d in t2] == [d.impath for d in t1]


def test_partition_iid():
    class DS:
        train_x = _mk(4, 10)
        val = _mk(4, 2)
        test = _mk(4, 3)

    parts = partition_dataset_iid(DS(), 3, seed=0)
    assert len(parts) == 3
    sizes = [len(p["train_x"]) for p in parts]
    assert sum(sizes) == 40
    assert sizes[0] == sizes[1] == 13
    # no overlap
    all_paths = [d.impath for p in parts for d in p["train_x"]]
    assert len(set(all_paths)) == 40
    # val/test shared
    assert parts[0]["val"] is parts[1]["val"]


@pytest.fixture(scope="module")
def synth_cfg(tmp_path_factory):
    cfg = get_cfg_default()
    cfg.DATASET.ROOT = str(tmp_path_factory.mktemp("data"))
    cfg.DATASET.NAME = "Synthetic"
    cfg.DATALOADER.TRAIN_X.BATCH_SIZE = 4
    cfg.DATALOADER.TEST.BATCH_SIZE = 8
    cfg.SEED = 1
    cfg.VERBOSE = False
    return cfg


def test_synthetic_datamanager_device_pipeline(synth_cfg):
    dm = DataManager(synth_cfg)
    assert dm.num_classes == 4
    assert len(dm.dataset.train_x) > 0
    batch = next(iter(dm.train_loader))
    assert batch["canvas"].shape == (4, 256, 256, 3)
    assert batch["canvas"].dtype == np.uint8
    assert batch["box"].shape == (4, 4)
    assert batch["flip"].shape == (4,)
    assert batch["label"].dtype == np.int32
    assert all(isinstance(c, str) and c for c in batch["caption"])


def test_synthetic_datamanager_host_pipeline(synth_cfg):
    cfg = synth_cfg.clone()
    cfg.INPUT.PIPELINE = "host"
    dm = DataManager(cfg)
    batch = next(iter(dm.test_loader))
    img = batch["img"]
    assert img.shape[1:] == (224, 224, 3)
    assert img.dtype == np.float32
    # CLIP normalization: values should be in roughly [-3, 3]
    assert np.abs(img).max() < 4.0


def test_client_datamanager_label_validation(synth_cfg):
    bad = [Datum(impath="/x.jpg", label=-1, classname="x")]
    with pytest.raises(ValueError):
        ClientDataManager(train_x=bad, val=[], test=bad, cfg=synth_cfg)


def test_client_datamanager_lab2cname(synth_cfg):
    data = _mk(3, 2)
    cdm = ClientDataManager(train_x=data, val=data, test=data, cfg=synth_cfg)
    assert cdm.lab2cname == {0: "class0", 1: "class1", 2: "class2"}
    assert cdm.num_classes == 3


def test_loader_drop_last_and_len(synth_cfg):
    from federated_multi_modal_tpu.data import DataLoader, build_transform

    data = _mk(1, 10)
    tfm = build_transform(synth_cfg, is_train=True)
    dl = DataLoader(data, batch_size=4, transform=tfm, is_train=True,
                    prefetch_depth=0)
    assert len(dl) == 2  # drop_last for train
    dl_eval = DataLoader(data, batch_size=4, transform=tfm, is_train=False,
                         prefetch_depth=0)
    assert len(dl_eval) == 3


def test_canvas_cache_is_lossless(synth_cfg):
    """Epoch 2 (cached) must yield byte-identical canvases to epoch 1."""
    from federated_multi_modal_tpu.data import DataLoader, build_transform

    tfm = build_transform(synth_cfg, is_train=True)
    data = None
    dm = DataManager(synth_cfg)
    data = dm.dataset.test
    dl = DataLoader(data, batch_size=4, transform=tfm, is_train=False,
                    prefetch_depth=0, cache_decoded=True, drop_last=False)
    first = [b["canvas"].copy() for b in dl]
    assert dl._canvas_cache  # populated
    second = [b["canvas"] for b in dl]
    for a, b in zip(first, second):
        np.testing.assert_array_equal(a, b)


def test_canvas_cache_budget(tmp_path):
    """The decoded-canvas cache stops inserting at the RAM budget; batches
    stay correct either way."""
    import numpy as np

    from federated_multi_modal_tpu.data.datum import Datum
    from federated_multi_modal_tpu.data.loader import DataLoader

    class FakeDeviceTransform:
        mode = "device"
        calls = 0

        def __call__(self, impath):
            FakeDeviceTransform.calls += 1
            return np.zeros((8, 8, 3), np.uint8)  # 192 bytes

        def sample_params(self, rng, n):
            return np.zeros((n, 4), np.float32), np.zeros(n, bool)

    items = [Datum(impath=f"img{i}", label=0, classname="a") for i in range(8)]
    # budget fits exactly 2 frames
    loader = DataLoader(
        items, batch_size=4, transform=FakeDeviceTransform(), is_train=True,
        sampler_type="SequentialSampler", prefetch_depth=0,
        cache_budget_bytes=2 * 192,
    )
    for _ in loader:
        pass
    assert len(loader._canvas_cache) == 2
    first_epoch_calls = FakeDeviceTransform.calls
    assert first_epoch_calls == 8
    for _ in loader:
        pass
    # epoch 2: only the 6 uncached frames re-decode
    assert FakeDeviceTransform.calls == first_epoch_calls + 6


def _fake_device_items_loader(items, batch_size, **kw):
    from federated_multi_modal_tpu.data.loader import DataLoader

    class FakeDeviceTransform:
        mode = "device"

        def __call__(self, impath):
            return np.zeros((4, 4, 3), np.uint8)

        def sample_params(self, rng, n):
            return np.zeros((n, 4), np.float32), np.zeros(n, bool)

    return DataLoader(items, batch_size=batch_size,
                      transform=FakeDeviceTransform(), prefetch_depth=0, **kw)


def test_random_domain_sampler_batch_structure():
    from federated_multi_modal_tpu.data.datum import Datum

    # 3 domains x 12 images
    items = [
        Datum(impath=f"d{d}i{i}", label=0, domain=d, classname="a")
        for d in range(3) for i in range(12)
    ]
    loader = _fake_device_items_loader(
        items, batch_size=6, is_train=True,
        sampler_type="RandomDomainSampler", n_domain=3,
    )
    seen = []
    for batch in loader:
        assert len(batch["label"]) == 6
        domains = [items[i].domain for i in batch["index"]]
        # 2 images from each of the 3 domains per batch
        assert sorted(domains) == [0, 0, 1, 1, 2, 2]
        seen.extend(int(i) for i in batch["index"])
    # without-replacement within the epoch
    assert len(seen) == len(set(seen))
    # all domains exhausted evenly: 36 images consumable
    assert len(seen) == 36


def test_seq_domain_sampler_deterministic_domains():
    from federated_multi_modal_tpu.data.datum import Datum

    items = [
        Datum(impath=f"d{d}i{i}", label=0, domain=d, classname="a")
        for d in range(2) for i in range(4)
    ]
    loader = _fake_device_items_loader(
        items, batch_size=4, is_train=True,
        sampler_type="SeqDomainSampler", n_domain=2,
    )
    for batch in loader:
        domains = [items[i].domain for i in batch["index"]]
        assert sorted(domains) == [0, 0, 1, 1]


def test_random_class_sampler_identity_batches():
    from federated_multi_modal_tpu.data.datum import Datum

    # 5 classes with uneven sizes (class 4 has fewer than n_ins -> upsampled)
    sizes = {0: 8, 1: 8, 2: 6, 3: 4, 4: 2}
    items = [
        Datum(impath=f"c{c}i{i}", label=c, domain=0, classname=str(c))
        for c, n in sizes.items() for i in range(n)
    ]
    loader = _fake_device_items_loader(
        items, batch_size=8, is_train=True,
        sampler_type="RandomClassSampler", n_ins=4,
    )
    for batch in loader:
        labels = list(batch["label"])
        assert len(labels) == 8
        # 2 classes x 4 instances
        uniq, counts = np.unique(labels, return_counts=True)
        assert len(uniq) == 2
        assert all(c == 4 for c in counts)


def test_structured_samplers_raise_on_bad_config():
    from federated_multi_modal_tpu.data.datum import Datum

    items = [Datum(impath=f"i{i}", label=i % 2, domain=0, classname="a")
             for i in range(8)]
    with pytest.raises(ValueError):
        list(_fake_device_items_loader(
            items, batch_size=2, is_train=True,
            sampler_type="RandomClassSampler", n_ins=4,
        ))


def test_structured_sampler_len_matches_realized_batches():
    from federated_multi_modal_tpu.data.datum import Datum

    sizes = {0: 8, 1: 8, 2: 6, 3: 4, 4: 2}
    items = [
        Datum(impath=f"c{c}i{i}", label=c, domain=0, classname=str(c))
        for c, n in sizes.items() for i in range(n)
    ]
    loader = _fake_device_items_loader(
        items, batch_size=8, is_train=True,
        sampler_type="RandomClassSampler", n_ins=4,
    )
    for _ in range(3):  # len() must agree with the SAME epoch's plan
        expected = len(loader)
        realized = sum(1 for _ in loader)
        assert realized == expected


def test_abandoned_prefetch_iterator_is_safe():
    from federated_multi_modal_tpu.data.datum import Datum
    from federated_multi_modal_tpu.data.loader import DataLoader

    class FakeDeviceTransform:
        mode = "device"

        def __call__(self, impath):
            return np.zeros((4, 4, 3), np.uint8)

        def sample_params(self, rng, n):
            return np.zeros((n, 4), np.float32), np.zeros(n, bool)

    items = [Datum(impath=f"i{i}", label=0, classname="a") for i in range(32)]
    loader = DataLoader(items, batch_size=4, transform=FakeDeviceTransform(),
                        is_train=True, prefetch_depth=2)
    # abandon mid-epoch (NaN hard-raise scenario), then re-iterate fully
    it = iter(loader)
    next(it)
    del it
    for _ in range(2):
        assert sum(1 for _ in loader) == 8


def test_two_live_iterators_newest_wins_no_deadlock():
    from federated_multi_modal_tpu.data.datum import Datum
    from federated_multi_modal_tpu.data.loader import DataLoader

    class FakeDeviceTransform:
        mode = "device"

        def __call__(self, impath):
            return np.zeros((4, 4, 3), np.uint8)

        def sample_params(self, rng, n):
            return np.zeros((n, 4), np.float32), np.zeros(n, bool)

    items = [Datum(impath=f"i{i}", label=0, classname="a") for i in range(32)]
    loader = DataLoader(items, batch_size=4, transform=FakeDeviceTransform(),
                        is_train=True, prefetch_depth=2)
    it1 = iter(loader)
    next(it1)
    assert sum(1 for _ in loader) == 8  # second full iteration
    # it1 must terminate (possibly early) rather than deadlock
    rest = sum(1 for _ in it1)
    assert rest <= 7


def test_no_transform_disables_augmentation():
    """INPUT.NO_TRANSFORM (Dassl semantics): the train transform becomes
    the deterministic eval pipeline."""
    from federated_multi_modal_tpu.data.transforms import build_transform

    cfg = get_cfg_default()
    cfg.INPUT.NO_TRANSFORM = True
    tfm = build_transform(cfg, is_train=True)
    rng = np.random.default_rng(0)
    b1, f1 = tfm.sample_params(rng, 4)
    b2, f2 = tfm.sample_params(rng, 4)
    # deterministic center boxes, no flips
    np.testing.assert_array_equal(b1, b2)
    assert not f1.any() and not f2.any()


def test_domain_sampler_undersized_domain_raises():
    from federated_multi_modal_tpu.data.datum import Datum

    items = [
        Datum(impath=f"d{d}i{i}", label=0, domain=d, classname="a")
        for d, n in [(0, 4), (1, 1)] for i in range(n)
    ]
    loader = _fake_device_items_loader(
        items, batch_size=4, is_train=True,
        sampler_type="RandomDomainSampler", n_domain=2,
    )
    with pytest.raises(ValueError, match="cannot form a single batch"):
        len(loader)


def test_seq_domain_sampler_uses_all_domains():
    """Dassl's SeqDomainSampler ignores N_DOMAIN and cycles every domain."""
    from federated_multi_modal_tpu.data.datum import Datum

    items = [
        Datum(impath=f"d{d}i{i}", label=0, domain=d, classname="a")
        for d in range(4) for i in range(4)
    ]
    loader = _fake_device_items_loader(
        items, batch_size=8, is_train=True,
        sampler_type="SeqDomainSampler", n_domain=2,  # ignored
    )
    seen_domains = set()
    for batch in loader:
        seen_domains.update(items[i].domain for i in batch["index"])
    assert seen_domains == {0, 1, 2, 3}


def test_duplicate_chunk_indices_cache_once():
    """RandomClassSampler upsampling can repeat an index inside one chunk;
    it must decode once and count cache bytes once."""
    from federated_multi_modal_tpu.data.datum import Datum
    from federated_multi_modal_tpu.data.loader import DataLoader

    calls = []

    class FakeDeviceTransform:
        mode = "device"

        def __call__(self, impath):
            calls.append(impath)
            return np.zeros((4, 4, 3), np.uint8)  # 48 bytes

        def sample_params(self, rng, n):
            return np.zeros((n, 4), np.float32), np.zeros(n, bool)

    # class 0 has 2 images but n_ins=4 -> upsampled duplicates in-chunk
    items = [Datum(impath=f"c0i{i}", label=0, classname="a") for i in range(2)]
    items += [Datum(impath=f"c1i{i}", label=1, classname="b") for i in range(4)]
    loader = DataLoader(items, batch_size=8, transform=FakeDeviceTransform(),
                        is_train=True, sampler_type="RandomClassSampler",
                        n_ins=4, prefetch_depth=0)
    for _ in loader:
        pass
    assert len(calls) == len(set(calls))  # no duplicate decodes
    assert loader._cache_bytes == len(loader._canvas_cache) * 48


def test_len_during_live_epoch_is_nondestructive():
    """len(loader) while an epoch is being consumed must not stop the
    prefetch worker or truncate the epoch (rng safety comes from the
    internal lock, not from reaping the worker)."""
    from federated_multi_modal_tpu.data.datum import Datum
    from federated_multi_modal_tpu.data.loader import DataLoader

    class FakeDeviceTransform:
        mode = "device"

        def __call__(self, impath):
            return np.zeros((4, 4, 3), np.uint8)

        def sample_params(self, rng, n):
            return rng.random((n, 4)).astype(np.float32), np.zeros(n, bool)

    items = [
        Datum(impath=f"i{i}", label=i % 4, classname="a") for i in range(64)
    ]
    for sampler in ("RandomSampler", "RandomClassSampler"):
        loader = DataLoader(
            items, batch_size=8, transform=FakeDeviceTransform(),
            is_train=True, prefetch_depth=2, sampler_type=sampler, n_ins=2,
        )
        n_batches = len(loader)
        it = iter(loader)
        got = [next(it)]
        assert len(loader) == n_batches  # mid-epoch len()
        got.extend(it)
        assert len(got) == n_batches, sampler


def test_num_workers_zero_means_single_thread(tmp_path):
    """Reference semantics: DATALOADER.NUM_WORKERS=0 is torch's in-process
    (no-parallelism) loading -> exactly ONE decode thread, never the
    implicit all-cores default; N>0 -> N threads."""
    from federated_multi_modal_tpu.config import get_cfg_default
    from federated_multi_modal_tpu.data.datum import Datum
    from federated_multi_modal_tpu.data.manager import build_data_loader

    cfg = get_cfg_default()
    cfg.DATASET.ROOT = str(tmp_path)
    src = [Datum(impath=str(tmp_path / "x.jpg"), label=0, classname="a")]
    for nw, want in [(0, 1), (1, 1), (3, 3)]:
        cfg.DATALOADER.NUM_WORKERS = nw
        loader = build_data_loader(cfg, data_source=src, batch_size=1,
                                   is_train=False)
        assert loader.decode_threads == want, (nw, loader.decode_threads)
