"""Zero-shot CLIP trainers (rebuild of ``trainers/zsclip.py``):
per-dataset hand templates, precomputed normalized text features, cosine
logits; ``ZeroshotCLIP2`` ensembles the 80-template ImageNet set.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from federated_multi_modal_tpu.engine.registry import TRAINER_REGISTRY
from federated_multi_modal_tpu.engine.trainer import TrainerX
from federated_multi_modal_tpu.models.clip_model import (
    encode_image_auto as encode_image,
    encode_text_tokens,
)
from federated_multi_modal_tpu.models.params import load_clip_backbone
from federated_multi_modal_tpu.ops.primitives import l2_normalize
from federated_multi_modal_tpu.tokenizer import tokenize
from federated_multi_modal_tpu.trainers.templates import (
    CUSTOM_TEMPLATES,
    IMAGENET_TEMPLATES_SELECT,
)


@TRAINER_REGISTRY.register()
class ZeroshotCLIP(TrainerX):
    # eval-only: nothing trains
    ATTN_WGRAD_VISION = frozenset()

    def build_model(self):
        cfg = self.cfg
        classnames = self.dm.dataset.classnames

        print(f"Loading CLIP (backbone: {cfg.MODEL.BACKBONE.NAME})")
        self.arch, self.clip_params = load_clip_backbone(cfg.MODEL)

        temp = CUSTOM_TEMPLATES[cfg.DATASET.NAME]
        prompts = [temp.format(c.replace("_", " ")) for c in classnames]
        print(f"Prompts: {prompts}")
        tokens = jnp.asarray(tokenize(prompts))

        feats = encode_text_tokens(self.clip_params["text"], self.arch, tokens)
        self.text_features = l2_normalize(feats)

        self._infer_fn = self._make_infer(self.arch)

    @staticmethod
    def _make_infer(arch):
        # params/text features are jit ARGUMENTS, not closures: closing
        # over the CLIP pytree bakes it into the HLO as constants and blows
        # the remote-compile HTTP limit on tunnel backends (CLAUDE.md).
        @jax.jit
        def _infer(clip_params, text_features, images):
            img = encode_image(clip_params["visual"], arch, images,
                               inference=True)
            img = l2_normalize(img)
            scale = jnp.exp(clip_params["logit_scale"].astype(jnp.float32))
            return scale * img @ text_features.T

        return _infer

    def model_inference(self, images):
        return self._infer_fn(self.clip_params, self.text_features, images)

    def train(self):
        # zero-shot: evaluation only
        self.test()

    def forward_backward(self, batch):  # pragma: no cover - not trained
        raise RuntimeError("ZeroshotCLIP is evaluation-only")


@TRAINER_REGISTRY.register()
class ZeroshotCLIP2(ZeroshotCLIP):
    """Prompt ensembling over the select ImageNet templates
    (``trainers/zsclip.py:63-99``)."""

    templates = IMAGENET_TEMPLATES_SELECT

    def build_model(self):
        cfg = self.cfg
        classnames = self.dm.dataset.classnames

        print(f"Loading CLIP (backbone: {cfg.MODEL.BACKBONE.NAME})")
        self.arch, self.clip_params = load_clip_backbone(cfg.MODEL)

        templates = list(self.templates)
        if cfg.DATASET.NAME != "ImageNet":
            templates.append(CUSTOM_TEMPLATES[cfg.DATASET.NAME])
        print(f"Prompt ensembling (n={len(templates)})")

        mean_feats = 0.0
        for temp in templates:
            prompts = [temp.format(c.replace("_", " ")) for c in classnames]
            tokens = jnp.asarray(tokenize(prompts))
            feats = encode_text_tokens(self.clip_params["text"], self.arch, tokens)
            mean_feats = mean_feats + l2_normalize(feats)
        mean_feats = mean_feats / len(templates)
        self.text_features = l2_normalize(mean_feats)

        self._infer_fn = self._make_infer(self.arch)
