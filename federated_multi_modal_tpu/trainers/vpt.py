"""VPT — deep Vision Prompt Tuning (rebuild of ``trainers/vpt.py``).

Fixed hand-crafted text embeddings are computed once and frozen
(``FixedEmbeddings``, ``trainers/vpt.py:67-89``); only the visual prompt
tokens train (shallow tokens appended after the positional embedding plus
per-layer deep prompts that replace them, ``clip/model.py:437-441,
239-251``).  The reference trains params named "VPT"
(``trainers/vpt.py:139-145``) — here that set is exactly the ``vpt``
subtree.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax

from federated_multi_modal_tpu.engine.checkpoint import flatten_params, unflatten_into
from federated_multi_modal_tpu.engine.registry import TRAINER_REGISTRY
from federated_multi_modal_tpu.engine.trainer import FunctionalTrainerMixin, TrainerX
from federated_multi_modal_tpu.models.clip_model import (
    cosine_logits,
    encode_image,
    encode_text_tokens,
)
from federated_multi_modal_tpu.models.params import load_clip_backbone
from federated_multi_modal_tpu.tokenizer import tokenize


@TRAINER_REGISTRY.register()
class VPT(FunctionalTrainerMixin, TrainerX):

    # only VPT-named params train (reference trainers/vpt.py:139-145)
    ATTN_WGRAD_VISION = frozenset()

    def check_cfg(self, cfg):
        assert cfg.TRAINER.VPT.PREC in ("fp16", "fp32", "amp", "bf16")
        assert cfg.TRAINER.VPT.PROMPT_DEPTH_VISION >= 1, (
            "For Vision Prompting, PROMPT_DEPTH_VISION should be >= 1"
        )

    def build_model(self):
        cfg = self.cfg
        tcfg = cfg.TRAINER.VPT
        classnames = self.dm.dataset.classnames

        print(f"Loading CLIP (backbone: {cfg.MODEL.BACKBONE.NAME})")
        self.arch, clip_params = load_clip_backbone(cfg.MODEL)
        from federated_multi_modal_tpu.trainers.common import apply_prec

        clip_params = apply_prec(cfg.TRAINER.VPT.PREC, clip_params)
        arch = self.arch
        if not arch.is_vit:
            raise ValueError(
                "VPT requires a ViT backbone (vision prompt "
                f"injection); got {cfg.MODEL.BACKBONE.NAME}"
            )

        n_ctx = tcfg.N_CTX_VISION
        depth = tcfg.PROMPT_DEPTH_VISION
        print("Vision Prompting Design")
        print(f'Initial context: "a photo of a"')
        print(f"Number of context words (tokens) for Vision prompting: {n_ctx}")
        print("Using fixed hand crafted prompts")

        # fixed text features from "a photo of a <class>." (vpt.py:73-86)
        prompts = [
            "a photo of a " + name.replace("_", " ") + "." for name in classnames
        ]
        tokens = jnp.asarray(tokenize(prompts))
        text_features = encode_text_tokens(clip_params["text"], arch, tokens)

        key = jax.random.PRNGKey(cfg.SEED if cfg.SEED >= 0 else 0)
        keys = jax.random.split(key, depth)
        vpt = {
            "shallow": jax.random.normal(keys[0], (n_ctx, arch.vision_width))
            * 0.02,
            "deep": [
                jax.random.normal(k, (n_ctx, arch.vision_width)) * 0.02
                for k in keys[1:]
            ],
        }

        self.frozen = {"clip": clip_params, "text_features": text_features}
        self.trainable = {"vpt": jax.tree_util.tree_map(
            lambda x: x.astype(jnp.float32), vpt
        )}

        def logits_fn(trainable, frozen, images):
            img = encode_image(
                frozen["clip"]["visual"], arch, images,
                shallow_prompts=trainable["vpt"]["shallow"],
                deep_prompts=trainable["vpt"]["deep"],
            )
            return cosine_logits(
                img, frozen["text_features"], frozen["clip"]["logit_scale"]
            )

        def loss_fn(trainable, frozen, batch):
            logits = logits_fn(trainable, frozen, batch["image"])
            loss = optax.softmax_cross_entropy_with_integer_labels(
                logits, batch["label"]
            ).mean()
            return loss, {}

        # eval fast path: text features are fixed (frozen), so prepare is
        # trivial — the point is routing the image tower through the fused
        # inference kernels (no cotangents exist at eval time)
        def eval_prepare_fn(trainable, frozen):
            return frozen["text_features"]

        def eval_apply_fn(trainable, frozen, images, txt):
            img = encode_image(
                frozen["clip"]["visual"], arch, images,
                shallow_prompts=trainable["vpt"]["shallow"],
                deep_prompts=trainable["vpt"]["deep"],
                inference=True,
            )
            return cosine_logits(img, txt, frozen["clip"]["logit_scale"])

        self.eval_prepare_fn = eval_prepare_fn
        self.eval_apply_fn = eval_apply_fn

        self.logits_fn = logits_fn
        self.loss_fn = loss_fn
        self.setup_optimization()
        self.load_init_weights()
        self.register_model("prompt_learner", self._get_state, self._set_state)

    def _get_state(self):
        return {
            "state_dict": flatten_params(self.trainable),
            "optimizer": None,
            "scheduler": None,
        }

    def _set_state(self, flat):
        self.invalidate_eval_cache()
        self.trainable, _ = unflatten_into(self.trainable, flat,
                                           strict_shapes=True)

    def forward_backward(self, batch):
        images, labels = self.parse_batch_train(batch)
        summary = self.train_step({"image": images, "label": labels})
        if (self.batch_idx + 1) == self.num_batches:
            self.update_lr()
        return summary
