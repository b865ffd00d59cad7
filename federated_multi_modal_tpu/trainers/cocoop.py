"""Co-CoOp — Conditional Context Optimization (rebuild of
``trainers/cocoop.py``).

The meta-net produces a per-image context bias
(``trainers/cocoop.py:98-102, 147-154``).  The reference then loops the
text encoder per image (``:184-192``) — the known bottleneck that forces
``BATCH_SIZE: 1`` in its configs.  Here the per-image conditional prompts
are batched into ONE text-encoder call over ``(B * n_cls)`` sequences —
mathematically identical, MXU-shaped, and it removes the batch-size-1
restriction.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax

from federated_multi_modal_tpu.engine.checkpoint import flatten_params, unflatten_into
from federated_multi_modal_tpu.engine.registry import TRAINER_REGISTRY
from federated_multi_modal_tpu.engine.trainer import FunctionalTrainerMixin, TrainerX
from federated_multi_modal_tpu.models.clip_model import (
    encode_image_auto as encode_image,
    encode_text_embedded,
)
from federated_multi_modal_tpu.models.params import load_clip_backbone
from federated_multi_modal_tpu.ops.primitives import l2_normalize
from federated_multi_modal_tpu.trainers.common import (
    apply_linear,
    build_prompt_constants,
    ctx_init_vectors,
    linear_params,
    random_ctx_vectors,
)


@TRAINER_REGISTRY.register()
class CoCoOp(FunctionalTrainerMixin, TrainerX):

    # only prompt_learner trains (reference trainers/cocoop.py:245-249)
    ATTN_WGRAD_VISION = frozenset()

    def check_cfg(self, cfg):
        assert cfg.TRAINER.COCOOP.PREC in ("fp16", "fp32", "amp", "bf16")

    def build_model(self):
        cfg = self.cfg
        tcfg = cfg.TRAINER.COCOOP
        classnames = self.dm.dataset.classnames

        print(f"Loading CLIP (backbone: {cfg.MODEL.BACKBONE.NAME})")
        self.arch, clip_params = load_clip_backbone(cfg.MODEL)
        from federated_multi_modal_tpu.trainers.common import apply_prec

        clip_params = apply_prec(cfg.TRAINER.COCOOP.PREC, clip_params)
        arch = self.arch
        ctx_dim = arch.transformer_width
        vis_dim = arch.embed_dim

        n_ctx = tcfg.N_CTX
        ctx_init = tcfg.CTX_INIT
        key = jax.random.PRNGKey(cfg.SEED if cfg.SEED >= 0 else 0)
        k_ctx, k_m1, k_m2 = jax.random.split(key, 3)

        if ctx_init:
            ctx_init = ctx_init.replace("_", " ")
            n_ctx = len(ctx_init.split(" "))
            ctx = ctx_init_vectors(clip_params["text"], ctx_init, n_ctx)
            prompt_prefix = ctx_init
        else:
            ctx = random_ctx_vectors(k_ctx, n_ctx, ctx_dim)
            prompt_prefix = " ".join(["X"] * n_ctx)
        print(f'Initial context: "{prompt_prefix}"')
        print(f"Number of context words (tokens): {n_ctx}")

        const = build_prompt_constants(
            clip_params["text"], classnames, prompt_prefix, n_ctx
        )
        self.const = const
        n_cls = const.n_cls

        self.trainable = {
            "prompt_learner": {
                "ctx": ctx,
                "meta_net": {
                    "linear1": linear_params(k_m1, vis_dim, vis_dim // 16),
                    "linear2": linear_params(k_m2, vis_dim // 16, ctx_dim),
                },
            }
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
            pl = trainable["prompt_learner"]
            pc = frozen["prompt_const"]

            # frozen, prompt-free tower: img is a constant wrt the
            # trainable pytree (it only feeds the meta-net's INPUT), so no
            # cotangent reaches encode_image -> inference fusion is safe
            img = encode_image(frozen["clip"]["visual"], arch, images,
                               inference=True)  # (B, E)
            img_n = l2_normalize(img)

            h = apply_linear(pl["meta_net"]["linear1"], img_n)
            h = jax.nn.relu(h)
            bias = apply_linear(pl["meta_net"]["linear2"], h)  # (B, ctx_dim)

            ctx_shift = pl["ctx"][None] + bias[:, None, :]  # (B, n_ctx, d)
            B = images.shape[0]

            # assemble (B, n_cls, 77, d) then fold to one text batch
            prefix = jnp.broadcast_to(
                pc["token_prefix"][None], (B,) + pc["token_prefix"].shape
            )
            suffix = jnp.broadcast_to(
                pc["token_suffix"][None], (B,) + pc["token_suffix"].shape
            )
            ctx_b = jnp.broadcast_to(
                ctx_shift[:, None].astype(prefix.dtype),
                (B, n_cls, n_ctx, ctx_dim),
            )
            prompts = jnp.concatenate([prefix, ctx_b, suffix], axis=2)
            prompts = prompts.reshape(B * n_cls, arch.context_length, ctx_dim)
            eot = jnp.tile(pc["eot_index"], B)

            txt = encode_text_embedded(
                frozen["clip"]["text"], arch, prompts, eot,
                max_len=const.text_len,
            )
            txt = l2_normalize(txt).reshape(B, n_cls, -1)

            scale = jnp.exp(frozen["clip"]["logit_scale"].astype(jnp.float32))
            return scale * jnp.einsum("bd,bcd->bc", img_n, txt)

        def loss_fn(trainable, frozen, batch):
            logits = logits_fn(trainable, frozen, batch["image"])
            loss = optax.softmax_cross_entropy_with_integer_labels(
                logits, batch["label"]
            ).mean()
            return loss, {}

        self.logits_fn = logits_fn
        self.loss_fn = loss_fn
        self.setup_optimization()
        self.load_init_weights()
        self.register_model("prompt_learner", self._get_state, self._set_state)

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

    def forward_backward(self, batch):
        images, labels = self.parse_batch_train(batch)
        summary = self.train_step({"image": images, "label": labels})
        if (self.batch_idx + 1) == self.num_batches:
            self.update_lr()
        return summary
