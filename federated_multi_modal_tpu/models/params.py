"""CLIP parameter construction: architecture config, random init matching
CLIP's initialization scheme, dtype policy, and conversion from OpenAI
torch checkpoints.

Mirrors the responsibilities of ``clip.build_model`` / ``convert_weights``
(reference ``clip/model.py:726-793``): infer the architecture from a
state-dict's shapes, build parameters, and apply the half-precision policy —
here bf16 matmul weights with fp32 LayerNorm / logit-scale, the TPU
equivalent of the reference's fp16-with-fp32-LN setup.

Parameter tree layout (all arrays, blocks as a list so per-layer trainable
masks are pytree-aligned)::

    {
      "visual": {
        "conv1": {"w": (P*P*3, width)},          # patchify as matmul (MXU)
        "class_embedding": (width,),
        "positional_embedding": (grid^2+1, width),
        "ln_pre": {"scale", "bias"},
        "blocks": [ {ln_1, attn{w_qkv,b_qkv,w_out,b_out}, ln_2,
                     mlp{w_fc,b_fc,w_proj,b_proj}} ... ],
        "ln_post": {"scale", "bias"},
        "proj": (width, embed_dim),
      },
      "text": {
        "token_embedding": (vocab, d),
        "positional_embedding": (ctx_len, d),
        "blocks": [...],
        "ln_final": {"scale", "bias"},
        "text_projection": (d, embed_dim),
      },
      "logit_scale": (),
    }
"""

from __future__ import annotations

import dataclasses
import math
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class CLIPConfig:
    embed_dim: int = 512
    # vision: int layer count = ViT; tuple of 4 = ModifiedResNet stage sizes
    # (the reference distinguishes identically, ``clip/model.py:596-626``)
    image_resolution: int = 224
    vision_layers: object = 12
    vision_width: int = 768
    vision_patch_size: int = 16
    # text
    context_length: int = 77
    vocab_size: int = 49408
    transformer_width: int = 512
    transformer_heads: int = 8
    transformer_layers: int = 12

    @property
    def is_vit(self) -> bool:
        return isinstance(self.vision_layers, int)

    @property
    def vision_heads(self) -> int:
        if self.is_vit:
            return self.vision_width // 64
        return self.vision_width * 32 // 64

    @property
    def grid_size(self) -> int:
        return self.image_resolution // self.vision_patch_size

    @property
    def num_patches(self) -> int:
        return self.grid_size ** 2

    def resnet_config(self):
        from federated_multi_modal_tpu.models.resnet import ResNetConfig

        return ResNetConfig(
            layers=tuple(self.vision_layers),
            output_dim=self.embed_dim,
            width=self.vision_width,
            input_resolution=self.image_resolution,
        )


# Known OpenAI backbones the reference downloads (``clip/clip.py:29-37``),
# plus the miniature test backbone.
BACKBONE_CONFIGS = {
    "ViT-B/16": CLIPConfig(),
    "ViT-B/32": CLIPConfig(vision_patch_size=32),
    "RN50": CLIPConfig(
        embed_dim=1024, vision_layers=(3, 4, 6, 3), vision_width=64,
        vision_patch_size=0,
    ),
    "RN101": CLIPConfig(
        embed_dim=512, vision_layers=(3, 4, 23, 3), vision_width=64,
        vision_patch_size=0,
    ),
    # EfficientNet-style scaled ResNets (reference table clip/clip.py:32-33)
    "RN50x4": CLIPConfig(
        embed_dim=640, image_resolution=288,
        vision_layers=(4, 6, 10, 6), vision_width=80, vision_patch_size=0,
        transformer_width=640, transformer_heads=10,
    ),
    "RN50x16": CLIPConfig(
        embed_dim=768, image_resolution=384,
        vision_layers=(6, 8, 18, 8), vision_width=96, vision_patch_size=0,
        transformer_width=768, transformer_heads=12,
    ),
    "Tiny": None,  # replaced below (tiny_test_config not yet defined here)
    "ViT-L/14": CLIPConfig(
        embed_dim=768,
        vision_layers=24,
        vision_width=1024,
        vision_patch_size=14,
        transformer_width=768,
        transformer_heads=12,
        transformer_layers=12,
    ),
}


def tiny_test_config() -> CLIPConfig:
    """A miniature CLIP for fast CPU tests and multi-chip dry-runs.

    Widths keep CLIP's head-dim-64 convention (heads = width // 64) so
    shape inference from exported state dicts stays consistent.
    """
    return CLIPConfig(
        embed_dim=64,
        image_resolution=32,
        vision_layers=3,
        vision_width=128,
        vision_patch_size=16,
        context_length=77,
        vocab_size=49408,
        transformer_width=128,
        transformer_heads=2,
        transformer_layers=3,
    )


BACKBONE_CONFIGS["Tiny"] = tiny_test_config()


# --------------------------------------------------------------------------
# dtype policy
# --------------------------------------------------------------------------

COMPUTE_DTYPE = jnp.bfloat16


def _is_norm_path(path: str) -> bool:
    if any(k in path for k in ("ln_1", "ln_2", "ln_pre", "ln_post", "ln_final")):
        return True
    # ResNet BatchNorm stats/affines stay fp32 (bn1/bn2/bn3/downsample bn)
    return any(seg.startswith("bn") or seg == "bn" for seg in path.split("/"))


def apply_dtype_policy(params, compute_dtype=COMPUTE_DTYPE):
    """Cast matmul weights to ``compute_dtype``; LN params and the logit
    scale stay fp32 (reference fp32-LN policy, ``clip/model.py:153-159``)."""

    def cast(path, leaf):
        name = "/".join(str(p) for p in path)
        if _is_norm_path(name) or "logit_scale" in name:
            return leaf.astype(jnp.float32)
        return leaf.astype(compute_dtype)

    return jax.tree_util.tree_map_with_path(
        lambda kp, x: cast([getattr(k, "key", getattr(k, "idx", k)) for k in kp], x),
        params,
    )


# --------------------------------------------------------------------------
# random initialization (CLIP scheme, reference clip/model.py:650-677)
# --------------------------------------------------------------------------


def _init_block(key, width: int, n_layers: int = 12) -> dict:
    ks = jax.random.split(key, 4)
    attn_std = width ** -0.5
    # CLIP.initialize_parameters scales the residual projections by the
    # TOWER's depth: (2 * num_layers) ** -0.5
    proj_std = attn_std * (2 * n_layers) ** -0.5
    fc_std = (2 * width) ** -0.5
    return {
        "ln_1": {"scale": jnp.ones(width), "bias": jnp.zeros(width)},
        "attn": {
            "w_qkv": jax.random.normal(ks[0], (width, 3 * width)) * attn_std,
            "b_qkv": jnp.zeros(3 * width),
            "w_out": jax.random.normal(ks[1], (width, width)) * proj_std,
            "b_out": jnp.zeros(width),
        },
        "ln_2": {"scale": jnp.ones(width), "bias": jnp.zeros(width)},
        "mlp": {
            "w_fc": jax.random.normal(ks[2], (width, 4 * width)) * fc_std,
            "b_fc": jnp.zeros(4 * width),
            "w_proj": jax.random.normal(ks[3], (4 * width, width)) * proj_std,
            "b_proj": jnp.zeros(width),
        },
    }


def init_clip_params(
    cfg: CLIPConfig, key: Optional[jax.Array] = None, dtype_policy: bool = True
) -> dict:
    """Random CLIP-shaped parameters (used when no checkpoint is available;
    the numbers follow ``CLIP.initialize_parameters``)."""
    if key is None:
        key = jax.random.PRNGKey(0)
    (kv, kt, kc, kp, kproj, ktok, ktpos, ktxtp,
     kvpos) = jax.random.split(key, 9)

    if cfg.is_vit:
        w = cfg.vision_width
        scale = w ** -0.5
        patch_dim = cfg.vision_patch_size ** 2 * 3
        visual = {
            "conv1": {
                "w": jax.random.normal(kc, (patch_dim, w)) * (patch_dim ** -0.5)
            },
            "class_embedding": jax.random.normal(kp, (w,)) * scale,
            # kvpos is its own split: sampling from kv AND splitting kv for
            # the blocks would correlate the init streams (key reuse)
            "positional_embedding": jax.random.normal(
                kvpos, (cfg.num_patches + 1, w)
            ) * scale,
            "ln_pre": {"scale": jnp.ones(w), "bias": jnp.zeros(w)},
            "blocks": [
                _init_block(k, w, cfg.vision_layers)
                for k in jax.random.split(kv, cfg.vision_layers)
            ],
            "ln_post": {"scale": jnp.ones(w), "bias": jnp.zeros(w)},
            "proj": jax.random.normal(kproj, (w, cfg.embed_dim)) * scale,
        }
    else:
        from federated_multi_modal_tpu.models.resnet import init_resnet_params

        visual = init_resnet_params(cfg.resnet_config(), kv)

    d = cfg.transformer_width
    text = {
        "token_embedding": jax.random.normal(ktok, (cfg.vocab_size, d)) * 0.02,
        "positional_embedding": jax.random.normal(ktpos, (cfg.context_length, d))
        * 0.01,
        "blocks": [
            _init_block(k, d, cfg.transformer_layers)
            for k in jax.random.split(kt, cfg.transformer_layers)
        ],
        "ln_final": {"scale": jnp.ones(d), "bias": jnp.zeros(d)},
        "text_projection": jax.random.normal(ktxtp, (d, cfg.embed_dim))
        * (d ** -0.5),
    }

    params = {
        "visual": visual,
        "text": text,
        "logit_scale": jnp.asarray(math.log(1.0 / 0.07), jnp.float32),
    }
    if dtype_policy:
        params = apply_dtype_policy(params)
    return params


# --------------------------------------------------------------------------
# torch checkpoint conversion
# --------------------------------------------------------------------------


def infer_config_from_state_dict(sd) -> CLIPConfig:
    """Shape inference from an OpenAI CLIP state dict (mirrors
    ``clip.build_model``, reference ``clip/model.py:750-776``; handles both
    ViT and ModifiedResNet checkpoints)."""
    if "visual.proj" in sd:
        vision_width = sd["visual.conv1.weight"].shape[0]
        vision_layers = len(
            [k for k in sd
             if k.startswith("visual.") and k.endswith(".attn.in_proj_weight")]
        )
        vision_patch_size = sd["visual.conv1.weight"].shape[-1]
        grid = round((sd["visual.positional_embedding"].shape[0] - 1) ** 0.5)
        image_resolution = vision_patch_size * grid
    else:
        counts = [
            len({k.split(".")[2] for k in sd if k.startswith(f"visual.layer{b}")})
            for b in (1, 2, 3, 4)
        ]
        vision_layers = tuple(counts)
        vision_width = sd["visual.layer1.0.conv1.weight"].shape[0]
        out_width = round(
            (sd["visual.attnpool.positional_embedding"].shape[0] - 1) ** 0.5
        )
        vision_patch_size = 0
        image_resolution = out_width * 32

    embed_dim = sd["text_projection"].shape[1]
    context_length = sd["positional_embedding"].shape[0]
    vocab_size = sd["token_embedding.weight"].shape[0]
    transformer_width = sd["ln_final.weight"].shape[0]
    transformer_layers = len(
        {k.split(".")[2] for k in sd if k.startswith("transformer.resblocks")}
    )
    return CLIPConfig(
        embed_dim=embed_dim,
        image_resolution=image_resolution,
        vision_layers=vision_layers,
        vision_width=vision_width,
        vision_patch_size=vision_patch_size,
        context_length=context_length,
        vocab_size=vocab_size,
        transformer_width=transformer_width,
        transformer_heads=transformer_width // 64,
        transformer_layers=transformer_layers,
    )


def _np(t):
    try:
        return np.asarray(t.detach().cpu().float().numpy())
    except AttributeError:
        return np.asarray(t, dtype=np.float32)


def _convert_block(sd, prefix: str) -> dict:
    return {
        "ln_1": {
            "scale": _np(sd[f"{prefix}.ln_1.weight"]),
            "bias": _np(sd[f"{prefix}.ln_1.bias"]),
        },
        "attn": {
            "w_qkv": _np(sd[f"{prefix}.attn.in_proj_weight"]).T,
            "b_qkv": _np(sd[f"{prefix}.attn.in_proj_bias"]),
            "w_out": _np(sd[f"{prefix}.attn.out_proj.weight"]).T,
            "b_out": _np(sd[f"{prefix}.attn.out_proj.bias"]),
        },
        "ln_2": {
            "scale": _np(sd[f"{prefix}.ln_2.weight"]),
            "bias": _np(sd[f"{prefix}.ln_2.bias"]),
        },
        "mlp": {
            "w_fc": _np(sd[f"{prefix}.mlp.c_fc.weight"]).T,
            "b_fc": _np(sd[f"{prefix}.mlp.c_fc.bias"]),
            "w_proj": _np(sd[f"{prefix}.mlp.c_proj.weight"]).T,
            "b_proj": _np(sd[f"{prefix}.mlp.c_proj.bias"]),
        },
    }


def convert_torch_state_dict(
    sd, cfg: Optional[CLIPConfig] = None, dtype_policy: bool = True
) -> dict:
    """Convert an OpenAI CLIP (ViT) torch state dict into our pytree.

    The patchify conv weight ``(O, 3, P, P)`` is reshaped into the
    ``(P*P*3, O)`` matmul kernel used by the TPU patch-embedding (the
    patch is flattened in ``(ky, kx, channel)`` order to match NHWC
    extraction).
    """
    if cfg is None:
        cfg = infer_config_from_state_dict(sd)

    if cfg.is_vit:
        conv_w = _np(sd["visual.conv1.weight"])  # (O, I, kH, kW)
        conv_w = conv_w.transpose(2, 3, 1, 0).reshape(-1, conv_w.shape[0])

        visual = {
            "conv1": {"w": conv_w},
            "class_embedding": _np(sd["visual.class_embedding"]),
            "positional_embedding": _np(sd["visual.positional_embedding"]),
            "ln_pre": {
                "scale": _np(sd["visual.ln_pre.weight"]),
                "bias": _np(sd["visual.ln_pre.bias"]),
            },
            "blocks": [
                _convert_block(sd, f"visual.transformer.resblocks.{i}")
                for i in range(cfg.vision_layers)
            ],
            "ln_post": {
                "scale": _np(sd["visual.ln_post.weight"]),
                "bias": _np(sd["visual.ln_post.bias"]),
            },
            "proj": _np(sd["visual.proj"]),
        }
    else:
        from federated_multi_modal_tpu.models.resnet import convert_torch_resnet

        visual = convert_torch_resnet(sd, cfg.resnet_config())
    text = {
        "token_embedding": _np(sd["token_embedding.weight"]),
        "positional_embedding": _np(sd["positional_embedding"]),
        "blocks": [
            _convert_block(sd, f"transformer.resblocks.{i}")
            for i in range(cfg.transformer_layers)
        ],
        "ln_final": {
            "scale": _np(sd["ln_final.weight"]),
            "bias": _np(sd["ln_final.bias"]),
        },
        "text_projection": _np(sd["text_projection"]),
    }
    params = {
        "visual": visual,
        "text": text,
        "logit_scale": np.asarray(_np(sd["logit_scale"]), np.float32),
    }
    params = jax.tree_util.tree_map(jnp.asarray, params)
    if dtype_policy:
        params = apply_dtype_policy(params)
    return params


def load_torch_state_dict(path: str):
    """Load a torch checkpoint (JIT archive or plain state dict) into a
    flat name->tensor dict (reference ``clip/clip.py:124-136`` semantics)."""
    import torch

    try:
        jit_model = torch.jit.load(path, map_location="cpu").eval()
        return jit_model.state_dict()
    except RuntimeError:
        sd = torch.load(path, map_location="cpu", weights_only=False)
        if hasattr(sd, "state_dict"):
            sd = sd.state_dict()
        return sd


def load_clip_backbone(cfg_model, key=None):
    """Resolve a CLIP backbone into ``(CLIPConfig, params)``.

    Order (analog of ``load_clip_to_cpu``, reference ``trainers/maple.py:
    21-40``, minus the network download):
      1. ``MODEL.BACKBONE.WEIGHTS_PATH`` — a local torch ``.pt``/``.pth``
         state dict (JIT archives are unpacked via torch, CPU-only).
      2. Random init with CLIP's scheme for the named backbone.
    """
    name = cfg_model.BACKBONE.NAME
    path = getattr(cfg_model.BACKBONE, "WEIGHTS_PATH", "")
    if path:
        sd = load_torch_state_dict(path)
        arch = infer_config_from_state_dict(sd)
        return arch, convert_torch_state_dict(sd, arch)

    if name not in BACKBONE_CONFIGS:
        raise KeyError(
            f"Unknown backbone {name!r}; known: {sorted(BACKBONE_CONFIGS)} "
            "(or set MODEL.BACKBONE.WEIGHTS_PATH)"
        )
    arch = BACKBONE_CONFIGS[name]
    if name == "Tiny":
        # deterministic small init for tests/dry-runs; cheap enough to skip
        # the "no weights" warning below
        return arch, init_clip_params(arch, key)
    print(
        f"[clip] No local weights for {name}; initializing randomly "
        "(set MODEL.BACKBONE.WEIGHTS_PATH to an OpenAI checkpoint for "
        "pretrained features)."
    )
    return arch, init_clip_params(arch, key)
