"""Fused on-device image preprocessing (TPU-first input pipeline).

The reference preprocesses on CPU dataloader workers with torchvision
(random_resized_crop -> flip -> normalize, ``configs/trainers/MaPLe/
vit_b16_c2_ep5_batch4_2ctx.yaml:8-14``; eval = Resize(224, bicubic) ->
CenterCrop -> normalize, mirrored at ``clip/clip.py:71-78``).  Here the
host only decodes JPEGs onto a fixed uint8 canvas; the crop-resize (bicubic,
PIL-style antialiasing), horizontal flip and CLIP normalization run **on
device as one fused XLA program**.

Separable bicubic resampling is expressed as two batched matmuls
(``out = Wy @ img @ Wx^T`` per channel) — the MXU-native formulation: for
a 256->224 crop-resize at batch 128 this is ~10 GFLOP, microseconds on a
v5e, and XLA fuses the u8->f32 conversion, flip and normalize into the
same program so the canvas crosses HBM exactly once.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

# CLIP normalization constants (reference clip/clip.py:74-77)
CLIP_MEAN = (0.48145466, 0.4578275, 0.40821073)
CLIP_STD = (0.26862954, 0.26130258, 0.27577711)

DEFAULT_CANVAS = 256


def _cubic_kernel(t: jax.Array, a: float = -0.5) -> jax.Array:
    """Bicubic convolution kernel (Catmull-Rom family, a=-0.5 like PIL)."""
    at = jnp.abs(t)
    at2 = at * at
    at3 = at2 * at
    inner = (a + 2.0) * at3 - (a + 3.0) * at2 + 1.0
    outer = a * at3 - 5.0 * a * at2 + 8.0 * a * at - 4.0 * a
    return jnp.where(at <= 1.0, inner, jnp.where(at < 2.0, outer, 0.0))


def _resample_matrix(
    canvas_size: int, out_size: int, start: jax.Array, length: jax.Array
) -> jax.Array:
    """Interpolation weights ``(out_size, canvas_size)`` for resampling the
    window ``[start, start+length)`` of one axis to ``out_size`` samples,
    with PIL-style antialiasing (kernel stretched by the downscale factor).

    Contributions are CLIPPED to the crop window like PIL's
    ``resize(box=...)`` — without the mask, kernel tails reach pixels
    outside the box and foreign content bleeds into a ~2*kscale-pixel
    border of every crop.
    """
    scale = length / out_size
    kscale = jnp.maximum(scale, 1.0)
    centers = start + (jnp.arange(out_size, dtype=jnp.float32) + 0.5) * scale - 0.5
    pos = jnp.arange(canvas_size, dtype=jnp.float32)
    t = (pos[None, :] - centers[:, None]) / kscale
    w = _cubic_kernel(t)
    inside = (pos + 0.5 >= start) & (pos + 0.5 <= start + length)
    w = w * inside[None, :].astype(w.dtype)
    return w / jnp.sum(w, axis=1, keepdims=True)


@functools.partial(jax.jit, static_argnames=("out_size",))
def crop_resize_flip_normalize(
    canvas: jax.Array,
    boxes: jax.Array,
    flips: jax.Array,
    out_size: int = 224,
    mean=CLIP_MEAN,
    std=CLIP_STD,
) -> jax.Array:
    """Fused device-side preprocessing.

    Args:
        canvas: ``(B, S, S, 3)`` uint8 decoded images.
        boxes: ``(B, 4)`` fp32 crop boxes ``(y0, x0, h, w)`` in canvas px.
        flips: ``(B,)`` bool horizontal-flip flags.
        out_size: output resolution (224).

    Returns:
        ``(B, out_size, out_size, 3)`` bfloat16 CLIP-normalized images.
    """
    S = canvas.shape[1]
    imgs = canvas.astype(jnp.float32) * (1.0 / 255.0)

    def weights(b):
        wy = _resample_matrix(S, out_size, b[0], b[2])
        wx = _resample_matrix(S, out_size, b[1], b[3])
        return wy, wx

    wy, wx = jax.vmap(weights)(boxes)  # (B, O, S) each

    tmp = jnp.einsum("bos,bshc->bohc", wy, imgs)  # rows
    out = jnp.einsum("bwt,botc->bowc", wx, tmp)  # cols

    out = jnp.where(flips[:, None, None, None], out[:, :, ::-1, :], out)

    mean = jnp.asarray(mean, jnp.float32)
    std = jnp.asarray(std, jnp.float32)
    out = (out - mean) / std
    return out.astype(jnp.bfloat16)


# --------------------------------------------------------------------------
# host-side crop-parameter sampling (cheap scalar work; matches torchvision
# RandomResizedCrop's sampling procedure on the canvas coordinates)
# --------------------------------------------------------------------------


def sample_rrc_boxes(
    rng: np.random.Generator,
    n: int,
    canvas_size: int = DEFAULT_CANVAS,
    scale=(0.08, 1.0),
    ratio=(3.0 / 4.0, 4.0 / 3.0),
):
    """Sample ``(n, 4)`` random-resized-crop boxes and ``(n,)`` flip flags."""
    boxes = np.empty((n, 4), np.float32)
    area = canvas_size * canvas_size
    log_ratio = (np.log(ratio[0]), np.log(ratio[1]))
    for i in range(n):
        for _ in range(10):
            target_area = area * rng.uniform(scale[0], scale[1])
            aspect = np.exp(rng.uniform(log_ratio[0], log_ratio[1]))
            w = int(round(np.sqrt(target_area * aspect)))
            h = int(round(np.sqrt(target_area / aspect)))
            if 0 < w <= canvas_size and 0 < h <= canvas_size:
                y0 = rng.integers(0, canvas_size - h + 1)
                x0 = rng.integers(0, canvas_size - w + 1)
                boxes[i] = (y0, x0, h, w)
                break
        else:  # center fallback (torchvision semantics)
            side = canvas_size
            boxes[i] = (0, 0, side, side)
    flips = rng.random(n) < 0.5
    return boxes, flips.astype(bool)


def sample_rrc_boxes_jax(
    key: jax.Array,
    n: int,
    canvas_size: int = DEFAULT_CANVAS,
    scale=(0.08, 1.0),
    ratio=(3.0 / 4.0, 4.0 / 3.0),
    trials: int = 10,
):
    """Device-side random-resized-crop sampling (same distribution as
    :func:`sample_rrc_boxes`, torchvision's 10-trial procedure) — all
    ``trials`` candidates are drawn at once and the first in-bounds one is
    selected, so the whole sampler is a few fused elementwise ops inside
    the jitted program.  This makes fully on-device multi-step training
    loops possible (``lax.scan`` over steps with fresh augmentations and
    zero host round-trips per step).

    Returns ``(boxes (n,4) f32 [y0,x0,h,w], flips (n,) bool)``.
    """
    k_area, k_ratio, k_y, k_x, k_flip = jax.random.split(key, 5)
    area = float(canvas_size * canvas_size)
    log_ratio = (float(np.log(ratio[0])), float(np.log(ratio[1])))
    target_area = area * jax.random.uniform(
        k_area, (n, trials), minval=scale[0], maxval=scale[1]
    )
    aspect = jnp.exp(
        jax.random.uniform(
            k_ratio, (n, trials), minval=log_ratio[0], maxval=log_ratio[1]
        )
    )
    w = jnp.round(jnp.sqrt(target_area * aspect))
    h = jnp.round(jnp.sqrt(target_area / aspect))
    valid = (w > 0) & (w <= canvas_size) & (h > 0) & (h <= canvas_size)
    first = jnp.argmax(valid, axis=1)  # first accepted trial
    any_valid = jnp.any(valid, axis=1)
    rows = jnp.arange(n)
    w_sel = w[rows, first]
    h_sel = h[rows, first]
    # uniform integer origin in [0, canvas - side], drawn once per sample
    # (equivalent to the numpy sampler's integers() on the accepted trial)
    u_y = jax.random.uniform(k_y, (n,))
    u_x = jax.random.uniform(k_x, (n,))
    y0 = jnp.floor(u_y * (canvas_size - h_sel + 1.0))
    x0 = jnp.floor(u_x * (canvas_size - w_sel + 1.0))
    full = jnp.asarray(canvas_size, jnp.float32)
    boxes = jnp.stack(
        [
            jnp.where(any_valid, y0, 0.0),
            jnp.where(any_valid, x0, 0.0),
            jnp.where(any_valid, h_sel, full),
            jnp.where(any_valid, w_sel, full),
        ],
        axis=1,
    ).astype(jnp.float32)
    flips = jax.random.uniform(k_flip, (n,)) < 0.5
    return boxes, flips


def center_boxes(n: int, canvas_size: int = DEFAULT_CANVAS, out_size: int = 224):
    """Eval boxes: emulate Resize(shorter->out) + CenterCrop(out) on a square
    canvas — i.e. the full canvas center (the canvas was already resized
    square on host)."""
    boxes = np.tile(
        np.asarray([[0.0, 0.0, canvas_size, canvas_size]], np.float32), (n, 1)
    )
    flips = np.zeros(n, bool)
    return boxes, flips
