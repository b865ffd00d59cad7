"""CoOp — Context Optimization (rebuild of ``trainers/coop.py``).

Learnable text context vectors (shared or class-specific), class token at
end/middle/front, frozen CLIP; only the prompt learner is optimized
(``trainers/coop.py:239-251``).  The per-class python assembly loops of the
reference (``:139-180``) are replaced by a precomputed static scatter so
every position variant is one gather on the MXU.
"""

from __future__ import annotations

import jax.numpy as jnp
import optax

from federated_multi_modal_tpu.engine.checkpoint import flatten_params, unflatten_into
from federated_multi_modal_tpu.engine.registry import TRAINER_REGISTRY
from federated_multi_modal_tpu.engine.trainer import FunctionalTrainerMixin, TrainerX
from federated_multi_modal_tpu.models.clip_model import (
    cosine_logits,
    encode_image_auto as encode_image,
    encode_text_embedded,
)
from federated_multi_modal_tpu.models.params import load_clip_backbone
from federated_multi_modal_tpu.trainers.common import (
    assemble_prompts_positional,
    build_position_layout,
    build_prompt_constants,
    ctx_init_vectors,
    random_ctx_vectors,
)

import jax


@TRAINER_REGISTRY.register()
class CoOp(FunctionalTrainerMixin, TrainerX):
    """Learning to Prompt for Vision-Language Models
    (https://arxiv.org/abs/2109.01134)."""

    # only the prompt learner trains (reference trainers/coop.py:249-251)
    ATTN_WGRAD_VISION = frozenset()


    def check_cfg(self, cfg):
        assert cfg.TRAINER.COOP.PREC in ("fp16", "fp32", "amp", "bf16")

    def build_model(self):
        cfg = self.cfg
        tcfg = cfg.TRAINER.COOP
        classnames = self.dm.dataset.classnames
        n_cls = len(classnames)

        print(f"Loading CLIP (backbone: {cfg.MODEL.BACKBONE.NAME})")
        self.arch, clip_params = load_clip_backbone(cfg.MODEL)
        from federated_multi_modal_tpu.trainers.common import apply_prec

        clip_params = apply_prec(cfg.TRAINER.COOP.PREC, clip_params)
        arch = self.arch
        ctx_dim = arch.transformer_width

        n_ctx = tcfg.N_CTX
        ctx_init = tcfg.CTX_INIT
        if ctx_init:
            ctx_init = ctx_init.replace("_", " ")
            n_ctx = len(ctx_init.split(" "))
            ctx = ctx_init_vectors(clip_params["text"], ctx_init, n_ctx)
            prompt_prefix = ctx_init
        else:
            if tcfg.CSC:
                print("Initializing class-specific contexts")
                ctx = random_ctx_vectors(
                    jax.random.PRNGKey(cfg.SEED if cfg.SEED >= 0 else 0),
                    n_ctx, ctx_dim, n_cls=n_cls,
                )
            else:
                print("Initializing a generic context")
                ctx = random_ctx_vectors(
                    jax.random.PRNGKey(cfg.SEED if cfg.SEED >= 0 else 0),
                    n_ctx, ctx_dim,
                )
            prompt_prefix = " ".join(["X"] * n_ctx)
        print(f'Initial context: "{prompt_prefix}"')
        print(f"Number of context words (tokens): {n_ctx}")

        const = build_prompt_constants(
            clip_params["text"], classnames, prompt_prefix, n_ctx
        )
        layout = build_position_layout(
            tcfg.CLASS_TOKEN_POSITION, n_cls, n_ctx,
            arch.context_length, const.name_lens,
        )

        self.const = const
        # token_prefix/token_suffix stay host-side on self.const (used only
        # by the checkpoint surface): duplicating them into the jitted
        # frozen tree would waste full-embedding-scale HBM for nothing
        self.frozen = {
            "clip": clip_params,
            "prompt_const": {
                "full_embedding": const.full_embedding,
                "eot_index": const.eot_index,
                "layout": tuple(layout),
            },
        }
        self.trainable = {"prompt_learner": {"ctx": ctx}}

        def text_features(trainable, frozen):
            pc = frozen["prompt_const"]
            prompts = assemble_prompts_positional(
                trainable["prompt_learner"]["ctx"],
                pc["full_embedding"],
                pc["layout"],
            )
            return encode_text_embedded(
                frozen["clip"]["text"], arch, prompts, pc["eot_index"],
                max_len=const.text_len,
            )

        def logits_fn(trainable, frozen, images):
            txt = text_features(trainable, frozen)
            # the image tower is frozen AND prompt-free: no cotangent can
            # reach it even under jax.grad -> inference fusion is safe
            img = encode_image(frozen["clip"]["visual"], arch, images,
                               inference=True)
            return cosine_logits(img, txt, frozen["clip"]["logit_scale"])

        def loss_fn(trainable, frozen, batch):
            logits = logits_fn(trainable, frozen, batch["image"])
            loss = optax.softmax_cross_entropy_with_integer_labels(
                logits, batch["label"]
            ).mean()
            acc = jnp.mean(
                (jnp.argmax(logits, axis=-1) == batch["label"]).astype(jnp.float32)
            )
            return loss, {"acc": acc * 100.0}

        # eval fast path: text features depend only on the learned ctx
        def eval_prepare_fn(trainable, frozen):
            return text_features(trainable, frozen)

        def eval_apply_fn(trainable, frozen, images, txt):
            img = encode_image(frozen["clip"]["visual"], arch, images,
                               inference=True)
            return cosine_logits(img, txt, frozen["clip"]["logit_scale"])

        self.eval_prepare_fn = eval_prepare_fn
        self.eval_apply_fn = eval_apply_fn

        self.logits_fn = logits_fn
        self.loss_fn = loss_fn
        self.setup_optimization()
        self.load_init_weights()

        n_train = sum(
            int(jnp.size(x))
            for x in jax.tree_util.tree_leaves(self.trainable)
        )
        print(f"Trainable params: {n_train:,}")

        self.register_model(
            "prompt_learner", self._get_state, self._set_state
        )

    # -- checkpoint surface (reference names: ctx/token_prefix/token_suffix) --
    def _get_state(self):
        import numpy as np

        sd = flatten_params(self.trainable["prompt_learner"])
        sd["token_prefix"] = np.asarray(jax.device_get(self.const.token_prefix))
        sd["token_suffix"] = np.asarray(jax.device_get(self.const.token_suffix))
        return {"state_dict": sd, "optimizer": None, "scheduler": None}

    def _set_state(self, flat):
        self.invalidate_eval_cache()
        new, _ = unflatten_into(self.trainable["prompt_learner"], flat,
                                strict_shapes=True)
        self.trainable = {"prompt_learner": new}

    # -- training ----------------------------------------------------------
    def forward_backward(self, batch):
        images, labels = self.parse_batch_train(batch)
        summary = self.train_step({"image": images, "label": labels})
        if (self.batch_idx + 1) == self.num_batches:
            self.update_lr()
        return summary
