"""IVLP — Independent Vision-Language Prompting (rebuild of
``trainers/independentVL.py``).

Learnable text context (CoOp-style, init "a photo of a") plus *independent*
per-layer deep prompts in both branches (``ResidualAttentionBlock_IVLP``
semantics: vision layers 1..depth_v-1 replace the trailing tokens, text
layers 1..depth_t-1 replace slots [1:1+n_ctx]; ``clip/model.py:239-266``).
Trained params = prompt_learner + the "VPT" vision prompts
(``trainers/independentVL.py:204-210``).
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
    encode_text_embedded,
)
from federated_multi_modal_tpu.models.params import load_clip_backbone
from federated_multi_modal_tpu.trainers.common import (
    assemble_prompts_end,
    build_prompt_constants,
    ctx_init_vectors,
    random_ctx_vectors,
)


@TRAINER_REGISTRY.register()
class IVLP(FunctionalTrainerMixin, TrainerX):

    # prompt_learner + VPT-named params train (reference
    # trainers/independentVL.py:204-210) — no attention weights
    ATTN_WGRAD_VISION = frozenset()

    def check_cfg(self, cfg):
        assert cfg.TRAINER.IVLP.PREC in ("fp16", "fp32", "amp", "bf16")
        assert cfg.TRAINER.IVLP.PROMPT_DEPTH_TEXT >= 1, (
            "In Independent VL prompting, Language prompt depth should be >=1"
        )

    def build_model(self):
        cfg = self.cfg
        tcfg = cfg.TRAINER.IVLP
        classnames = self.dm.dataset.classnames

        print(f"Loading CLIP (backbone: {cfg.MODEL.BACKBONE.NAME})")
        self.arch, clip_params = load_clip_backbone(cfg.MODEL)
        from federated_multi_modal_tpu.trainers.common import apply_prec

        clip_params = apply_prec(cfg.TRAINER.IVLP.PREC, clip_params)
        arch = self.arch
        if not arch.is_vit:
            raise ValueError(
                "IVLP requires a ViT backbone (vision prompt "
                f"injection); got {cfg.MODEL.BACKBONE.NAME}"
            )
        ctx_dim = arch.transformer_width

        n_ctx_text = tcfg.N_CTX_TEXT
        n_ctx_vis = tcfg.N_CTX_VISION
        depth_text = tcfg.PROMPT_DEPTH_TEXT
        depth_vis = tcfg.PROMPT_DEPTH_VISION
        ctx_init = tcfg.CTX_INIT

        key = jax.random.PRNGKey(cfg.SEED if cfg.SEED >= 0 else 0)
        k_text, k_vis, k_deep_t = jax.random.split(key, 3)

        if ctx_init and n_ctx_text <= 4:
            ctx = ctx_init_vectors(clip_params["text"], ctx_init, n_ctx_text)
            prompt_prefix = ctx_init.replace("_", " ")
        else:
            ctx = random_ctx_vectors(k_text, n_ctx_text, ctx_dim)
            prompt_prefix = " ".join(["X"] * n_ctx_text)
        print("Independent V-L design")
        print(f'Initial text context: "{prompt_prefix}"')
        print(f"Number of context words (tokens) for Language prompting: {n_ctx_text}")
        print(f"Number of context words (tokens) for Vision prompting: {n_ctx_vis}")

        const = build_prompt_constants(
            clip_params["text"], classnames, prompt_prefix, n_ctx_text
        )
        self.const = const

        deep_text_keys = jax.random.split(k_deep_t, max(1, depth_text - 1))
        vis_keys = jax.random.split(k_vis, max(1, depth_vis))
        # N_CTX_VISION=0 / PROMPT_DEPTH_VISION=0 degenerates to deep
        # language prompting only (IVLP/...4ctx_language_only.yaml)
        use_vision = n_ctx_vis > 0 and depth_vis > 0
        vpt = {}
        if use_vision:
            vpt = {
                "shallow": jax.random.normal(
                    vis_keys[0], (n_ctx_vis, arch.vision_width)
                ).astype(jnp.float32) * 0.02,
                "deep": [
                    (jax.random.normal(k, (n_ctx_vis, arch.vision_width)) * 0.02
                     ).astype(jnp.float32)
                    for k in vis_keys[1:depth_vis]
                ],
            }
        self.trainable = {
            "prompt_learner": {
                "ctx": ctx,
                "deep_text": [
                    random_ctx_vectors(k, n_ctx_text, ctx_dim)
                    for k in deep_text_keys[: depth_text - 1]
                ],
            },
            "vpt": vpt,
        }
        self.frozen = {
            "clip": clip_params,
            "prompt_const": {
                "token_prefix": const.token_prefix,
                "token_suffix": const.token_suffix,
                "eot_index": const.eot_index,
            },
        }

        def logits_fn(trainable, frozen, images):
            pc = frozen["prompt_const"]
            prompts = assemble_prompts_end(
                trainable["prompt_learner"]["ctx"],
                pc["token_prefix"],
                pc["token_suffix"],
            )
            txt = encode_text_embedded(
                frozen["clip"]["text"], arch, prompts, pc["eot_index"],
                deep_prompts=trainable["prompt_learner"]["deep_text"],
                max_len=const.text_len,
            )
            img = encode_image(
                frozen["clip"]["visual"], arch, images,
                shallow_prompts=trainable["vpt"].get("shallow"),
                deep_prompts=trainable["vpt"].get("deep"),
            )
            return cosine_logits(img, txt, frozen["clip"]["logit_scale"])

        def loss_fn(trainable, frozen, batch):
            logits = logits_fn(trainable, frozen, batch["image"])
            loss = optax.softmax_cross_entropy_with_integer_labels(
                logits, batch["label"]
            ).mean()
            return loss, {}

        # eval fast path: text features depend only on the prompt learner
        def eval_prepare_fn(trainable, frozen):
            pc = frozen["prompt_const"]
            prompts = assemble_prompts_end(
                trainable["prompt_learner"]["ctx"],
                pc["token_prefix"],
                pc["token_suffix"],
            )
            return encode_text_embedded(
                frozen["clip"]["text"], arch, prompts, pc["eot_index"],
                deep_prompts=trainable["prompt_learner"]["deep_text"],
                max_len=const.text_len,
            )

        def eval_apply_fn(trainable, frozen, images, txt):
            img = encode_image(
                frozen["clip"]["visual"], arch, images,
                shallow_prompts=trainable["vpt"].get("shallow"),
                deep_prompts=trainable["vpt"].get("deep"),
                inference=True,
            )
            return cosine_logits(img, txt, frozen["clip"]["logit_scale"])

        self.eval_prepare_fn = eval_prepare_fn
        self.eval_apply_fn = eval_apply_fn

        self.logits_fn = logits_fn
        self.loss_fn = loss_fn
        self.setup_optimization()
        self.load_init_weights()
        self.register_model("VLPromptLearner", self._get_state, self._set_state)

    def _get_state(self):
        import numpy as np

        sd = flatten_params(self.trainable)
        sd["token_prefix"] = np.asarray(jax.device_get(self.const.token_prefix))
        sd["token_suffix"] = np.asarray(jax.device_get(self.const.token_suffix))
        return {"state_dict": sd, "optimizer": None, "scheduler": None}

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
