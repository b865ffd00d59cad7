"""Standalone builders for the flagship MaPLe program.

Used by ``__graft_entry__.py`` (compile checks, multi-chip dry runs) and
``bench.py`` (TPU throughput measurement) without going through the data
manager / trainer plumbing: pure functions + parameter pytrees only.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import optax

from federated_multi_modal_tpu.config import get_cfg_default
from federated_multi_modal_tpu.engine.optim import build_optimizer
from federated_multi_modal_tpu.engine.trainer import cast_tree, merge_trees, split_tree
from federated_multi_modal_tpu.models.clip_model import (
    encode_image,
    encode_text_embedded,
)
from federated_multi_modal_tpu.models.params import (
    BACKBONE_CONFIGS,
    init_clip_params,
)
from federated_multi_modal_tpu.ops.primitives import l2_normalize
from federated_multi_modal_tpu.tokenizer import tokenize
from federated_multi_modal_tpu.trainers.common import build_prompt_constants
from federated_multi_modal_tpu.trainers.maple import (
    caption_tokens_to_extra,
    init_maple_prompt_learner,
    make_maple_eval_fns,
    maple_prompts,
    maple_trainable_predicate,
)

DEFAULT_CLASSNAMES = [
    "airport", "beach", "bridge", "farmland", "forest",
    "harbor", "parking lot", "river", "runway", "storage tank",
]


def build_maple_program(
    backbone: str = "ViT-B/16",
    classnames=None,
    n_ctx: int = 2,
    depth: int = 9,
    use_captions: bool = True,
    seed: int = 0,
    align_lambda: float = 0.5,
    remat: bool = False,
):
    """Build the pure-functional MaPLe forward/loss and its state.

    Returns a dict with ``arch, trainable, frozen, loss_fn, logits_fn``.
    ``loss_fn(trainable, frozen, batch)`` where batch has ``image (B,H,W,3)``,
    ``label (B,)`` and optionally ``caption_tokens (B,77)``.
    """
    classnames = classnames or DEFAULT_CLASSNAMES
    # MaPLe unfreeze policy: only the last vision block's attention weights
    # train -> frozen blocks may take the fused LN+QKV+attention kernel
    from federated_multi_modal_tpu.ops.primitives import (
        set_vision_attn_wgrad_blocks,
    )

    set_vision_attn_wgrad_blocks("last")
    arch = BACKBONE_CONFIGS[backbone]
    depth = min(depth, arch.vision_layers)
    key = jax.random.PRNGKey(seed)
    clip_params = init_clip_params(arch, key)

    const = build_prompt_constants(
        clip_params["text"], classnames, "a photo of a", n_ctx
    )
    from federated_multi_modal_tpu.trainers.common import ctx_init_vectors

    ctx = ctx_init_vectors(clip_params["text"], "a photo of a", n_ctx)
    pl = init_maple_prompt_learner(key, arch, n_ctx, depth, ctx, use_captions)

    model = {"clip": clip_params, "prompt_learner": pl}
    pred = maple_trainable_predicate(arch.vision_layers, arch.transformer_layers)
    trainable, frozen_model = split_tree(model, pred)
    trainable = cast_tree(trainable, jnp.float32)
    frozen = {
        "model": frozen_model,
        "prompt_const": {
            "token_prefix": const.token_prefix,
            "token_suffix": const.token_suffix,
            "eot_index": const.eot_index,
        },
    }
    text_len = const.text_len

    def features(trainable, frozen, images, caption_tokens=None):
        m = merge_trees(trainable, frozen["model"])
        pc = frozen["prompt_const"]
        prompts, shared_ctx, text_deep, vis_deep = maple_prompts(
            m["prompt_learner"], pc["token_prefix"], pc["token_suffix"], depth
        )
        extra = None
        if caption_tokens is not None and use_captions:
            extra = caption_tokens_to_extra(
                m["prompt_learner"], m["clip"]["text"], caption_tokens
            )
        txt = encode_text_embedded(
            m["clip"]["text"], arch, prompts, pc["eot_index"],
            deep_prompts=text_deep, remat=remat, max_len=text_len,
        )
        img = encode_image(
            m["clip"]["visual"], arch, images,
            shallow_prompts=shared_ctx,
            deep_prompts=vis_deep,
            extra_tokens=extra,
            remat=remat,
        )
        scale = jnp.clip(
            jnp.exp(m["clip"]["logit_scale"].astype(jnp.float32)), None, 100.0
        )
        return l2_normalize(img), l2_normalize(txt), scale

    def logits_fn(trainable, frozen, images):
        img_n, txt_n, scale = features(trainable, frozen, images)
        return scale * img_n @ txt_n.T

    def loss_fn(trainable, frozen, batch):
        img_n, txt_n, scale = features(
            trainable, frozen, batch["image"], batch.get("caption_tokens")
        )
        logits = scale * img_n @ txt_n.T
        labels = batch["label"]
        loss = optax.softmax_cross_entropy_with_integer_labels(
            logits, labels
        ).mean()
        txt_sel = txt_n[labels]
        alignment = 1.0 - jnp.sum(img_n * txt_sel, axis=-1).mean()
        return loss + align_lambda * alignment, {}

    # eval fast path: one shared implementation with the MaPLe trainer
    # (prompt-cached text features; trainers/maple.py::make_maple_eval_fns)
    eval_prepare_fn, eval_apply_fn = make_maple_eval_fns(
        arch, depth, text_len
    )

    return {
        "arch": arch,
        "trainable": trainable,
        "frozen": frozen,
        "loss_fn": loss_fn,
        "logits_fn": logits_fn,
        "eval_prepare_fn": eval_prepare_fn,
        "eval_apply_fn": eval_apply_fn,
        "n_cls": len(classnames),
        "text_len": text_len,
        "n_ctx": n_ctx,
        "use_captions": use_captions,
    }


def example_batch(arch, batch_size: int = 4, n_cls: int = 10,
                  use_captions: bool = True, seed: int = 0):
    rng = np.random.default_rng(seed)
    res = arch.image_resolution
    batch = {
        "image": jnp.asarray(
            rng.standard_normal((batch_size, res, res, 3)), jnp.bfloat16
        ),
        "label": jnp.asarray(rng.integers(0, n_cls, batch_size), jnp.int32),
    }
    if use_captions:
        captions = ["a photo of a test scene"] * batch_size
        batch["caption_tokens"] = jnp.asarray(tokenize(captions))
    return batch


def build_fed_optimizer(lr: float = 0.0026):
    cfg = get_cfg_default()
    cfg.OPTIM.LR = lr
    # MaPLe's trainer-level clip (reference maple.py:577; the cfg default
    # is 0 because the Dassl trainers never clip)
    cfg.OPTIM.GRAD_CLIP_NORM = 1.0
    return build_optimizer(cfg.OPTIM, learning_rate=lr)
