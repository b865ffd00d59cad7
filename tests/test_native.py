"""Native host-IO codec tests (federated_multi_modal_tpu/native).

The C++ library replaces the host half of the reference's data path (PIL
decodes in torch DataLoader workers, reference
``trainers/client_datamanager.py:65-103``): JPEG via libjpeg with DCT
prescaling, PNG via libpng, PIL-equivalent anti-aliased resampling to the
uint8 canvas, threaded batch decode, and PIL fallback on anything else.
"""

import os

import numpy as np
import pytest
from PIL import Image

from federated_multi_modal_tpu import native

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native codec unavailable (no toolchain)"
)

CANVAS = 128


def _smooth(w, h, seed=0):
    """A smooth RGB test image (JPEG-friendly: codec deltas stay tiny)."""
    x = np.linspace(0, 4, w)
    y = np.linspace(0, 4, h)
    phase = np.asarray([0.0, 1.3, 2.6]) + seed
    img = 127 + 120 * np.sin(x[None, :, None] + y[:, None, None] + phase)
    return img.astype(np.uint8)


def _pil_ref(path, canvas=CANVAS):
    img = Image.open(path).convert("RGB")
    return np.asarray(img.resize((canvas, canvas), Image.BICUBIC), np.uint8)


@pytest.mark.parametrize("shape", [(640, 480), (90, 130), (1600, 1200)])
def test_jpeg_matches_pil(tmp_path, shape):
    w, h = shape
    p = str(tmp_path / "x.jpg")
    Image.fromarray(_smooth(w, h)).save(p, quality=92)
    nat = native.decode_to_canvas(p, CANVAS)
    ref = _pil_ref(p)
    diff = np.abs(nat.astype(int) - ref.astype(int))
    # same libjpeg decode; resampling is float vs PIL's 8-bit fixed point
    assert diff.mean() < 1.0 and diff.max() <= 3


def test_png_modes_match_pil(tmp_path):
    rng = np.random.default_rng(0)
    cases = {
        "rgb.png": Image.fromarray(_smooth(200, 150)),
        "rgba.png": Image.fromarray(
            np.concatenate(
                [_smooth(120, 90), np.full((90, 120, 1), 200, np.uint8)], -1
            ),
            "RGBA",
        ),
        "gray.png": Image.fromarray(
            rng.integers(0, 255, (100, 80), dtype=np.uint8), "L"
        ),
        "pal.png": Image.fromarray(_smooth(64, 64)).convert(
            "P", palette=Image.ADAPTIVE
        ),
    }
    for name, img in cases.items():
        p = str(tmp_path / name)
        img.save(p)
        nat = native.decode_to_canvas(p, CANVAS)
        ref = _pil_ref(p)
        diff = np.abs(nat.astype(int) - ref.astype(int))
        # lossless decode; only the resampler differs (sharp edges in the
        # palette/noise images hit the fixed- vs float-point rounding)
        assert diff.mean() < 1.0, name
        assert diff.max() <= 16, name


def test_decode_batch_statuses_and_order(tmp_path):
    paths = []
    for i, (w, h) in enumerate([(300, 200), (150, 400), (512, 512)]):
        p = str(tmp_path / f"b{i}.jpg")
        Image.fromarray(_smooth(w, h, seed=i)).save(p, quality=95)
        paths.append(p)
    missing = str(tmp_path / "nope.jpg")
    bogus = str(tmp_path / "bogus.jpg")
    with open(bogus, "wb") as f:
        f.write(b"not an image at all")
    all_paths = paths + [missing, bogus]

    out = native.decode_batch(all_paths, CANVAS, n_threads=2)
    assert out is not None
    canvases, statuses = out
    assert canvases.shape == (5, CANVAS, CANVAS, 3)
    assert list(statuses[:3]) == [native.OK] * 3
    assert statuses[3] == native.ERR_OPEN
    assert statuses[4] == native.ERR_FORMAT
    for k, p in enumerate(paths):
        single = native.decode_to_canvas(p, CANVAS)
        np.testing.assert_array_equal(canvases[k], single)


def test_truncated_jpeg_decodes_partially(tmp_path):
    # libjpeg treats premature EOF as a warning and synthesizes the missing
    # scanlines — a truncated file still yields a usable canvas instead of
    # killing the training epoch (PIL would raise here).
    p = str(tmp_path / "t.jpg")
    Image.fromarray(_smooth(400, 300)).save(p, quality=92)
    data = open(p, "rb").read()
    with open(p, "wb") as f:
        f.write(data[: len(data) // 3])
    frame = native.decode_to_canvas(p, CANVAS)
    assert frame is not None and frame.shape == (CANVAS, CANVAS, 3)


def test_device_transform_native_vs_pil_paths(tmp_path):
    from federated_multi_modal_tpu.config import get_cfg_default
    from federated_multi_modal_tpu.data.transforms import build_transform

    p = str(tmp_path / "x.jpg")
    Image.fromarray(_smooth(500, 350)).save(p, quality=92)

    cfg = get_cfg_default()
    cfg.INPUT.CANVAS_SIZE = CANVAS
    tfm_native = build_transform(cfg, is_train=True)
    assert tfm_native.native
    cfg2 = cfg.clone()
    cfg2.INPUT.NATIVE_DECODE = False
    tfm_pil = build_transform(cfg2, is_train=True)
    assert not tfm_pil.native

    a = tfm_native(p)
    b = tfm_pil(p)
    assert a.shape == b.shape == (CANVAS, CANVAS, 3)
    assert np.abs(a.astype(int) - b.astype(int)).mean() < 1.0

    # non-JPEG/PNG content behind a .jpg name: native rejects (ERR_FORMAT),
    # the transform falls back to PIL which sniffs content, not extension
    weird = str(tmp_path / "actually_bmp.jpg")
    Image.fromarray(_smooth(64, 64)).save(weird, format="BMP")
    assert native.decode_to_canvas(weird, CANVAS) is None
    frame = tfm_native(weird)
    assert frame.shape == (CANVAS, CANVAS, 3)


def test_loader_uses_native_batch_decode(tmp_path):
    from federated_multi_modal_tpu.config import get_cfg_default
    from federated_multi_modal_tpu.data.datum import Datum
    from federated_multi_modal_tpu.data.loader import DataLoader
    from federated_multi_modal_tpu.data.transforms import build_transform

    items = []
    for i in range(6):
        p = str(tmp_path / f"d{i}.jpg")
        Image.fromarray(_smooth(200 + 10 * i, 180)).save(p, quality=92)
        items.append(Datum(impath=p, label=i % 3, classname=f"c{i % 3}"))
    # one file the native codec refuses -> per-file PIL fallback inside
    # the batch path
    weird = str(tmp_path / "weird.jpg")
    Image.fromarray(_smooth(100, 100)).save(weird, format="BMP")
    items.append(Datum(impath=weird, label=0, classname="c0"))

    cfg = get_cfg_default()
    cfg.INPUT.CANVAS_SIZE = CANVAS
    tfm = build_transform(cfg, is_train=True)
    loader = DataLoader(
        items, batch_size=4, transform=tfm, is_train=True,
        drop_last=False, prefetch_depth=0,
    )
    batches = list(loader)
    assert sum(len(b["label"]) for b in batches) == 7
    for b in batches:
        assert b["canvas"].dtype == np.uint8
        assert b["canvas"].shape[1:] == (CANVAS, CANVAS, 3)
    # epoch 2 served from the canvas cache, identical content
    again = list(loader)
    assert sum(len(b["label"]) for b in again) == 7


def test_crop_square_canvas_matches_pil(tmp_path):
    """Aspect-preserving canvas (CANVAS_MODE=shorter_crop): native and PIL
    paths agree and match PIL's explicit CenterCrop(shorter)+Resize."""
    from PIL import Image

    from federated_multi_modal_tpu import native
    from federated_multi_modal_tpu.config import get_cfg_default
    from federated_multi_modal_tpu.data.transforms import DeviceTransform

    rng = np.random.default_rng(0)
    arr = rng.integers(0, 255, (60, 100, 3), np.uint8)  # wide image
    p = str(tmp_path / "wide.png")
    Image.fromarray(arr).save(p)

    cfg = get_cfg_default()
    cfg.INPUT.CANVAS_SIZE = 48
    tfm = DeviceTransform(cfg, is_train=False)
    assert tfm.crop_square
    canvas = tfm(p)
    assert canvas.shape == (48, 48, 3)

    # explicit PIL reference: center-crop 60x60, resize to 48
    ref = Image.fromarray(arr).crop((20, 0, 80, 60)).resize(
        (48, 48), Image.BICUBIC
    )
    ref = np.asarray(ref, np.float32)
    assert np.abs(canvas.astype(np.float32) - ref).mean() < 2.0

    # native and PIL decode paths agree on the geometry
    pil_canvas = tfm.decode_pil(p)
    assert np.abs(canvas.astype(np.float32) -
                  pil_canvas.astype(np.float32)).mean() < 2.0

    if native.available():
        nat = native.decode_to_canvas(p, 48, "bicubic", crop_square=True)
        assert nat is not None
        assert np.abs(nat.astype(np.float32) - ref).mean() < 2.0
        # squash mode differs on non-square input
        sq = native.decode_to_canvas(p, 48, "bicubic", crop_square=False)
        assert np.abs(sq.astype(np.float32) - ref).mean() > 2.0


def test_decode_batch_thread_counts_byte_identical(tmp_path):
    """Thread-pool decode (round-3 verdict task 4): n_threads in {1, 2, 4}
    must produce byte-identical canvases and statuses — each file's decode
    is independent, the pool only changes scheduling.  (On this 1-core box
    the >1-thread runs exercise real pthread scheduling but not speedup;
    the throughput claim awaits multi-core hardware, docs/ROADMAP.md.)"""
    sizes = [(300, 200), (150, 400), (512, 512), (90, 130), (640, 480),
             (256, 256), (1024, 768), (111, 222)]
    paths = []
    for i, (w, h) in enumerate(sizes):
        if i % 3 == 2:
            p = str(tmp_path / f"t{i}.png")
            Image.fromarray(_smooth(w, h, seed=i)).save(p)
        else:
            p = str(tmp_path / f"t{i}.jpg")
            Image.fromarray(_smooth(w, h, seed=i)).save(p, quality=95)
        paths.append(p)
    paths.append(str(tmp_path / "missing.jpg"))  # ERR_OPEN
    bogus = str(tmp_path / "bogus.jpg")
    with open(bogus, "wb") as f:
        f.write(b"definitely not an image")
    paths.append(bogus)  # ERR_FORMAT

    results = {}
    for nt in (1, 2, 4):
        out = native.decode_batch(paths, CANVAS, n_threads=nt)
        assert out is not None
        results[nt] = out
    ref_canvases, ref_statuses = results[1]
    assert list(ref_statuses[-2:]) == [native.ERR_OPEN, native.ERR_FORMAT]
    for nt in (2, 4):
        canvases, statuses = results[nt]
        np.testing.assert_array_equal(statuses, ref_statuses)
        np.testing.assert_array_equal(
            canvases[:-2], ref_canvases[:-2],
            err_msg=f"n_threads={nt} diverged from single-thread decode",
        )


def test_threaded_decode_under_prefetch_worker(tmp_path):
    """Threaded batch decode + the loader's prefetch worker: two loaders
    over the same corpus, decode_threads 1 vs 4, with the prefetch thread
    live — batches must be byte-identical (no races between the pool, the
    prefetch worker, and the canvas cache)."""
    from federated_multi_modal_tpu.config import get_cfg_default
    from federated_multi_modal_tpu.data.datum import Datum
    from federated_multi_modal_tpu.data.loader import DataLoader
    from federated_multi_modal_tpu.data.transforms import build_transform

    items = []
    for i in range(10):
        p = str(tmp_path / f"d{i}.jpg")
        Image.fromarray(_smooth(180 + 7 * i, 200, seed=i)).save(p, quality=92)
        items.append(Datum(impath=p, label=i % 2, classname=f"c{i % 2}"))

    cfg = get_cfg_default()
    cfg.INPUT.CANVAS_SIZE = CANVAS

    def run(decode_threads, seed=3):
        tfm = build_transform(cfg, is_train=True)
        loader = DataLoader(
            items, batch_size=4, transform=tfm, is_train=True,
            drop_last=False, prefetch_depth=2, seed=seed,
            decode_threads=decode_threads,
        )
        epochs = []
        for _ in range(2):  # epoch 2 hits the canvas cache
            epochs.append([
                (b["canvas"].copy(), b["label"].copy()) for b in loader
            ])
        return epochs

    e1 = run(1)
    e4 = run(4)
    for ep1, ep4 in zip(e1, e4):
        assert len(ep1) == len(ep4)
        for (c1, l1), (c4, l4) in zip(ep1, ep4):
            np.testing.assert_array_equal(l1, l4)
            np.testing.assert_array_equal(c1, c4)
