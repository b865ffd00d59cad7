"""ModifiedResNet vision tower (CLIP RN50/RN101 backbones).

Functional rebuild of the reference's ``ModifiedResNet``
(``clip/model.py:10-150``): 3-conv stem with avg-pool, anti-aliased strided
bottlenecks (avg-pool before the strided conv), and the QKV
``AttentionPool2d`` head (``:56-90``).  Used by the CoOp RN50/RN101 configs
(``configs/trainers/CoOp/rn50*.yaml``).

BatchNorm runs with frozen statistics (the reference never trains the
backbone — only prompt vectors — so BN is always in eval mode with running
stats); each BN is therefore a precomputable affine ``scale*x + bias``.
Convolutions are NHWC ``lax.conv_general_dilated`` — XLA lowers them onto
the MXU directly.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class ResNetConfig:
    layers: Tuple[int, int, int, int] = (3, 4, 6, 3)
    output_dim: int = 1024
    width: int = 64
    input_resolution: int = 224

    @property
    def heads(self) -> int:
        return self.width * 32 // 64

    @property
    def embed_dim(self) -> int:
        return self.width * 32


def conv2d(x, w, stride=1, padding="SAME"):
    """NHWC conv with HWIO kernel."""
    return jax.lax.conv_general_dilated(
        x, w.astype(x.dtype),
        window_strides=(stride, stride),
        padding=padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


def bn(x, p):
    """Frozen-statistics BatchNorm as affine (eval semantics)."""
    scale = (p["scale"] / jnp.sqrt(p["var"] + 1e-5)).astype(jnp.float32)
    bias = (p["bias"] - p["mean"] * scale).astype(jnp.float32)
    return (x.astype(jnp.float32) * scale + bias).astype(x.dtype)


def avg_pool(x, k):
    return jax.lax.reduce_window(
        x, 0.0, jax.lax.add, (1, k, k, 1), (1, k, k, 1), "VALID"
    ) / (k * k)


def bottleneck(x, p, stride: int):
    """Anti-aliased bottleneck (``clip/model.py:10-53``): all convs stride 1;
    spatial reduction via avg-pool after conv2."""
    out = jax.nn.relu(bn(conv2d(x, p["conv1"]["w"]), p["bn1"]))
    out = jax.nn.relu(bn(conv2d(out, p["conv2"]["w"]), p["bn2"]))
    if stride > 1:
        out = avg_pool(out, stride)
    out = bn(conv2d(out, p["conv3"]["w"]), p["bn3"])

    identity = x
    if "downsample" in p:
        if stride > 1:
            identity = avg_pool(identity, stride)
        identity = bn(conv2d(identity, p["downsample"]["conv"]["w"]),
                      p["downsample"]["bn"])
    return jax.nn.relu(out + identity)


def attention_pool2d(x, p, n_head: int):
    """QKV attention pooling over spatial positions + mean token
    (``clip/model.py:56-90``).  ``x``: (B, H, W, C)."""
    B, H, W, C = x.shape
    tokens = x.reshape(B, H * W, C)
    mean = jnp.mean(tokens, axis=1, keepdims=True)
    tokens = jnp.concatenate([mean, tokens], axis=1)  # (B, HW+1, C)
    tokens = tokens + p["positional_embedding"].astype(tokens.dtype)[None]

    def proj(t, name):
        return jnp.matmul(t, p[name]["w"].astype(t.dtype)) + p[name]["b"].astype(
            t.dtype
        )

    q = proj(tokens[:, :1], "q_proj")  # query = mean token only
    k = proj(tokens, "k_proj")
    v = proj(tokens, "v_proj")

    head_dim = C // n_head

    def heads(t, T):
        return t.reshape(B, T, n_head, head_dim).transpose(0, 2, 1, 3)

    q, k, v = heads(q, 1), heads(k, H * W + 1), heads(v, H * W + 1)
    scale = 1.0 / np.sqrt(head_dim)
    scores = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                        preferred_element_type=jnp.float32) * scale
    probs = jax.nn.softmax(scores, axis=-1).astype(x.dtype)
    out = jnp.einsum("bhqk,bhkd->bhqd", probs, v)
    out = out.transpose(0, 2, 1, 3).reshape(B, 1, C)[:, 0]
    out = jnp.matmul(out, p["c_proj"]["w"].astype(out.dtype)) + p["c_proj"][
        "b"
    ].astype(out.dtype)
    return out


def encode_image_resnet(params, cfg: ResNetConfig, images: jax.Array) -> jax.Array:
    """(B, H, W, 3) -> (B, output_dim) image features."""
    dtype = params["stem"]["conv1"]["w"].dtype
    x = images.astype(dtype)
    stem = params["stem"]
    # explicit (1,1) padding: lax "SAME" with stride 2 on even inputs pads
    # (0,1), shifting every window one pixel vs torch Conv2d(padding=1)
    x = jax.nn.relu(
        bn(conv2d(x, stem["conv1"]["w"], stride=2,
                  padding=((1, 1), (1, 1))), stem["bn1"])
    )
    x = jax.nn.relu(bn(conv2d(x, stem["conv2"]["w"]), stem["bn2"]))
    x = jax.nn.relu(bn(conv2d(x, stem["conv3"]["w"]), stem["bn3"]))
    x = avg_pool(x, 2)

    for li, blocks in enumerate(params["layers"]):
        stride = 1 if li == 0 else 2
        for bi, blk in enumerate(blocks):
            x = bottleneck(x, blk, stride if bi == 0 else 1)

    feats = attention_pool2d(x, params["attnpool"], cfg.heads)
    return feats.astype(jnp.float32)


# --------------------------------------------------------------------------
# init + torch conversion
# --------------------------------------------------------------------------


def _conv_init(key, kh, kw, cin, cout):
    fan_in = kh * kw * cin
    return jax.random.normal(key, (kh, kw, cin, cout)) * np.sqrt(2.0 / fan_in)


def _bn_init(c):
    return {
        "scale": jnp.ones(c),
        "bias": jnp.zeros(c),
        "mean": jnp.zeros(c),
        "var": jnp.ones(c),
    }


def init_resnet_params(cfg: ResNetConfig, key=None) -> dict:
    if key is None:
        key = jax.random.PRNGKey(0)
    keys = iter(jax.random.split(key, 256))
    w = cfg.width
    stem = {
        "conv1": {"w": _conv_init(next(keys), 3, 3, 3, w // 2)},
        "bn1": _bn_init(w // 2),
        "conv2": {"w": _conv_init(next(keys), 3, 3, w // 2, w // 2)},
        "bn2": _bn_init(w // 2),
        "conv3": {"w": _conv_init(next(keys), 3, 3, w // 2, w)},
        "bn3": _bn_init(w),
    }

    layers = []
    inplanes = w
    for li, n_blocks in enumerate(cfg.layers):
        planes = w * (2 ** li)
        blocks = []
        for bi in range(n_blocks):
            cin = inplanes if bi == 0 else planes * 4
            blk = {
                "conv1": {"w": _conv_init(next(keys), 1, 1, cin, planes)},
                "bn1": _bn_init(planes),
                "conv2": {"w": _conv_init(next(keys), 3, 3, planes, planes)},
                "bn2": _bn_init(planes),
                "conv3": {"w": _conv_init(next(keys), 1, 1, planes, planes * 4)},
                "bn3": _bn_init(planes * 4),
            }
            stride = (1 if li == 0 else 2) if bi == 0 else 1
            if bi == 0 and (stride > 1 or cin != planes * 4):
                blk["downsample"] = {
                    "conv": {"w": _conv_init(next(keys), 1, 1, cin, planes * 4)},
                    "bn": _bn_init(planes * 4),
                }
            blocks.append(blk)
        layers.append(blocks)
        inplanes = planes * 4

    C = cfg.embed_dim
    spacial = cfg.input_resolution // 32
    std = C ** -0.5
    attnpool = {
        "positional_embedding": jax.random.normal(
            next(keys), (spacial ** 2 + 1, C)
        ) * std,
        "q_proj": {"w": jax.random.normal(next(keys), (C, C)) * std,
                   "b": jnp.zeros(C)},
        "k_proj": {"w": jax.random.normal(next(keys), (C, C)) * std,
                   "b": jnp.zeros(C)},
        "v_proj": {"w": jax.random.normal(next(keys), (C, C)) * std,
                   "b": jnp.zeros(C)},
        "c_proj": {"w": jax.random.normal(next(keys), (C, cfg.output_dim)) * std,
                   "b": jnp.zeros(cfg.output_dim)},
    }
    return {"stem": stem, "layers": layers, "attnpool": attnpool}


def _np(t):
    # one torch-tensor coercion helper for both towers
    from federated_multi_modal_tpu.models.params import _np as impl

    return impl(t)


def _conv_t(w):
    # torch OIHW -> HWIO
    return _np(w).transpose(2, 3, 1, 0)


def _bn_t(sd, prefix):
    return {
        "scale": _np(sd[f"{prefix}.weight"]),
        "bias": _np(sd[f"{prefix}.bias"]),
        "mean": _np(sd[f"{prefix}.running_mean"]),
        "var": _np(sd[f"{prefix}.running_var"]),
    }


def convert_torch_resnet(sd, cfg: ResNetConfig) -> dict:
    """Convert the ``visual.*`` subtree of an OpenAI RN CLIP state dict."""
    stem = {
        "conv1": {"w": _conv_t(sd["visual.conv1.weight"])},
        "bn1": _bn_t(sd, "visual.bn1"),
        "conv2": {"w": _conv_t(sd["visual.conv2.weight"])},
        "bn2": _bn_t(sd, "visual.bn2"),
        "conv3": {"w": _conv_t(sd["visual.conv3.weight"])},
        "bn3": _bn_t(sd, "visual.bn3"),
    }
    layers = []
    for li, n_blocks in enumerate(cfg.layers):
        blocks = []
        for bi in range(n_blocks):
            pre = f"visual.layer{li + 1}.{bi}"
            blk = {
                "conv1": {"w": _conv_t(sd[f"{pre}.conv1.weight"])},
                "bn1": _bn_t(sd, f"{pre}.bn1"),
                "conv2": {"w": _conv_t(sd[f"{pre}.conv2.weight"])},
                "bn2": _bn_t(sd, f"{pre}.bn2"),
                "conv3": {"w": _conv_t(sd[f"{pre}.conv3.weight"])},
                "bn3": _bn_t(sd, f"{pre}.bn3"),
            }
            if f"{pre}.downsample.0.weight" in sd:
                blk["downsample"] = {
                    "conv": {"w": _conv_t(sd[f"{pre}.downsample.0.weight"])},
                    "bn": _bn_t(sd, f"{pre}.downsample.1"),
                }
            blocks.append(blk)
        layers.append(blocks)

    attnpool = {
        "positional_embedding": _np(sd["visual.attnpool.positional_embedding"]),
        "q_proj": {"w": _np(sd["visual.attnpool.q_proj.weight"]).T,
                   "b": _np(sd["visual.attnpool.q_proj.bias"])},
        "k_proj": {"w": _np(sd["visual.attnpool.k_proj.weight"]).T,
                   "b": _np(sd["visual.attnpool.k_proj.bias"])},
        "v_proj": {"w": _np(sd["visual.attnpool.v_proj.weight"]).T,
                   "b": _np(sd["visual.attnpool.v_proj.bias"])},
        "c_proj": {"w": _np(sd["visual.attnpool.c_proj.weight"]).T,
                   "b": _np(sd["visual.attnpool.c_proj.bias"])},
    }
    params = {"stem": stem, "layers": layers, "attnpool": attnpool}
    return jax.tree_util.tree_map(jnp.asarray, params)
