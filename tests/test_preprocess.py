"""Fused device preprocessing: correctness against PIL bicubic."""

import numpy as np
import pytest
from PIL import Image

import jax.numpy as jnp

from federated_multi_modal_tpu.ops.preprocess import (
    CLIP_MEAN,
    CLIP_STD,
    center_boxes,
    crop_resize_flip_normalize,
    sample_rrc_boxes,
)


def _denorm(x):
    return np.asarray(x, np.float32) * np.asarray(CLIP_STD) + np.asarray(CLIP_MEAN)


def test_full_canvas_resize_matches_pil():
    rng = np.random.default_rng(0)
    canvas = rng.integers(0, 255, (2, 64, 64, 3), np.uint8)
    boxes, flips = center_boxes(2, canvas_size=64)
    out = crop_resize_flip_normalize(
        jnp.asarray(canvas), jnp.asarray(boxes), jnp.asarray(flips), out_size=32
    )
    got = _denorm(out) * 255.0

    for b in range(2):
        ref = Image.fromarray(canvas[b]).resize((32, 32), Image.BICUBIC)
        ref = np.asarray(ref, np.float32)
        # PIL quantizes to uint8 between passes; allow a couple of levels
        assert np.abs(got[b] - ref).mean() < 1.5
        assert np.abs(got[b] - ref).max() < 8.0


def test_flip_is_horizontal_mirror():
    rng = np.random.default_rng(1)
    canvas = rng.integers(0, 255, (1, 64, 64, 3), np.uint8)
    boxes, _ = center_boxes(1, canvas_size=64)
    out_plain = crop_resize_flip_normalize(
        jnp.asarray(canvas), jnp.asarray(boxes),
        jnp.asarray(np.array([False])), out_size=32,
    )
    out_flip = crop_resize_flip_normalize(
        jnp.asarray(canvas), jnp.asarray(boxes),
        jnp.asarray(np.array([True])), out_size=32,
    )
    np.testing.assert_allclose(
        np.asarray(out_plain, np.float32),
        np.asarray(out_flip, np.float32)[:, :, ::-1, :],
        atol=1e-2,
    )


def test_crop_box_restricts_content():
    # canvas: left half black, right half white; crop right half -> all white
    canvas = np.zeros((1, 64, 64, 3), np.uint8)
    canvas[:, :, 32:, :] = 255
    boxes = np.asarray([[0.0, 32.0, 64.0, 32.0]], np.float32)
    flips = np.zeros(1, bool)
    out = crop_resize_flip_normalize(
        jnp.asarray(canvas), jnp.asarray(boxes), jnp.asarray(flips), out_size=16
    )
    vals = _denorm(out)
    # interior pixels (away from the crop boundary ring) must be white
    assert vals[0, 4:12, 4:12].min() > 0.95


def test_rrc_box_sampler_bounds():
    rng = np.random.default_rng(2)
    boxes, flips = sample_rrc_boxes(rng, 100, canvas_size=256)
    y0, x0, h, w = boxes[:, 0], boxes[:, 1], boxes[:, 2], boxes[:, 3]
    assert (y0 >= 0).all() and (x0 >= 0).all()
    assert (y0 + h <= 256).all() and (x0 + w <= 256).all()
    assert (h > 0).all() and (w > 0).all()
    assert flips.dtype == bool
    # aspect ratio within [3/4, 4/3] (+rounding slack)
    ar = w / h
    assert (ar > 0.70).all() and (ar < 1.43).all()


def test_rrc_jax_sampler_bounds_and_distribution():
    import jax

    from federated_multi_modal_tpu.ops.preprocess import sample_rrc_boxes_jax

    n = 4096
    boxes, flips = jax.jit(sample_rrc_boxes_jax, static_argnums=1)(
        jax.random.PRNGKey(3), n
    )
    boxes = np.asarray(boxes)
    flips = np.asarray(flips)
    y0, x0, h, w = boxes[:, 0], boxes[:, 1], boxes[:, 2], boxes[:, 3]
    assert (y0 >= 0).all() and (x0 >= 0).all()
    assert (y0 + h <= 256).all() and (x0 + w <= 256).all()
    assert (h > 0).all() and (w > 0).all()
    assert flips.dtype == bool
    assert 0.40 < flips.mean() < 0.60

    # distribution parity with the host sampler (same torchvision procedure)
    rng = np.random.default_rng(3)
    ref_boxes, _ = sample_rrc_boxes(rng, n, canvas_size=256)
    for col, tol in ((2, 6.0), (3, 6.0)):  # mean crop height / width
        assert abs(boxes[:, col].mean() - ref_boxes[:, col].mean()) < tol
    # area fraction covers the configured scale range
    frac = (h * w) / (256.0 * 256.0)
    assert frac.min() < 0.15 and frac.max() > 0.8


def test_output_dtype_and_normalization():
    canvas = np.full((1, 64, 64, 3), 128, np.uint8)
    boxes, flips = center_boxes(1, canvas_size=64)
    out = crop_resize_flip_normalize(
        jnp.asarray(canvas), jnp.asarray(boxes), jnp.asarray(flips), out_size=32
    )
    assert out.dtype == jnp.bfloat16
    expected = (128.0 / 255.0 - np.asarray(CLIP_MEAN)) / np.asarray(CLIP_STD)
    np.testing.assert_allclose(
        np.asarray(out, np.float32)[0, 16, 16], expected, atol=2e-2
    )


def test_crop_does_not_bleed_outside_box():
    """torchvision crops FIRST, then resizes — content outside the crop box
    must not influence the output (kernel support clipped at box edges)."""
    rng = np.random.default_rng(7)
    canvas = rng.integers(0, 255, (1, 64, 64, 3), np.uint8)
    boxes = np.asarray([[8.0, 8.0, 32.0, 32.0]], np.float32)
    flips = np.zeros(1, bool)
    out1 = crop_resize_flip_normalize(
        jnp.asarray(canvas), jnp.asarray(boxes), jnp.asarray(flips), out_size=48
    )
    tampered = canvas.copy()
    tampered[:, :8, :, :] = 0
    tampered[:, 40:, :, :] = 255
    out2 = crop_resize_flip_normalize(
        jnp.asarray(tampered), jnp.asarray(boxes), jnp.asarray(flips), out_size=48
    )
    np.testing.assert_array_equal(np.asarray(out1), np.asarray(out2))

    # and the crop itself matches PIL crop-then-resize closely
    from PIL import Image

    ref = Image.fromarray(canvas[0]).crop((8, 8, 40, 40)).resize(
        (48, 48), Image.BICUBIC
    )
    got = _denorm(out1)[0] * 255.0
    assert np.abs(got - np.asarray(ref, np.float32)).mean() < 1.0
