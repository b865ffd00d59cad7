"""MaPLe — Multi-modal Prompt Learning, fork variant (rebuild of
``trainers/maple.py`` + ``clip/model.py:478-572``).

The fork's distinguishing design, reproduced here:

* learnable joint context (``N_CTX=2`` tokens, init "a photo of a"),
  projected into the vision tower as the shared shallow prompt
  (``proj_lang_to_vis``, ``trainers/maple.py:111, 215``)
* **alternating bidirectional deep coupling** (``:117-131, 194-213``):
  even depths own a text-side parameter (512) projected 512->768 for the
  vision branch; odd depths own a vision-side parameter (768) projected
  768->512 for the text branch.  (``proj_vis_to_lang`` exists in the
  reference's state dict but is unused in its forward; kept for checkpoint
  parity.)
* caption conditioning: BLIP captions are tokenized, embedded with the
  frozen token embedding (no-grad, ``:317-319``), attention-pooled and
  projected 512->768, then injected into the vision sequence.
  **Documented deviation:** the reference re-creates the pooling vector and
  projection randomly on every forward and appends batch-size-many caption
  tokens shared across the whole batch (``clip/model.py:550-561``); here
  they are trained parameters and each image gets exactly one caption
  token (per-sample conditioning, static shapes).
* loss = CE (hard labels) or KL (soft labels) **+ 0.5 x (1 - cos(image,
  text-of-label))** alignment term (``trainers/maple.py:349-372``), with
  the logit scale clamped at 100 (``:325``)
* trainable set (``:447-479``): prompt learner, every LayerNorm in both
  towers, and the **last** transformer block of both towers (block 11 for
  ViT-B/16 — the reference hardcodes ``resblocks.11``)
* non-finite protection: loss NaN raise + per-batch skip semantics
  (``:375-376, 617-627``) — on bf16 TPU these gates are kept as cheap
  validity checks
"""

from __future__ import annotations

import functools
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from federated_multi_modal_tpu.engine.checkpoint import flatten_params, unflatten_into
from federated_multi_modal_tpu.engine.registry import TRAINER_REGISTRY
from federated_multi_modal_tpu.engine.trainer import (
    FunctionalTrainerMixin,
    TrainerX,
    cast_tree,
    count_params,
    merge_trees,
    split_tree,
)
from federated_multi_modal_tpu.models.clip_model import (
    embed_tokens,
    encode_image,
    encode_text_embedded,
)
from federated_multi_modal_tpu.models.params import load_clip_backbone
from federated_multi_modal_tpu.ops.primitives import l2_normalize
from federated_multi_modal_tpu.tokenizer import tokenize
from federated_multi_modal_tpu.trainers.common import (
    apply_linear,
    assemble_prompts_end,
    build_prompt_constants,
    ctx_init_vectors,
    linear_params,
    random_ctx_vectors,
)


@functools.lru_cache(maxsize=65536)
def _tokenize_caption(caption: str) -> np.ndarray:
    """Memoized BPE tokenization: the same dataset captions recur every
    epoch, and re-running python BPE per batch serializes with device
    dispatch on small hosts."""
    return np.asarray(tokenize([caption], truncate=True)[0])


def dataset_provides_captions(dm) -> bool:
    """Whether any item in the manager's splits carries a caption.  Scans
    the FULL split (cheap attribute truthiness) — sampling a prefix would
    silently disable the branch for datasets whose captions start later."""
    for split in (dm.dataset.train_x, dm.dataset.test):
        if split and any(getattr(d, "caption", "") for d in split):
            return True
    return False


def maple_trainable_predicate(visual_layers: int, text_layers: int):
    """Path predicate for the unfreeze policy (``trainers/maple.py:447-479``):
    prompt learner + all LN params + last block of both towers."""
    ln_names = ("ln_1", "ln_2", "ln_pre", "ln_post", "ln_final")
    vis_last = f"visual.blocks.{visual_layers - 1}."
    txt_last = f"text.blocks.{text_layers - 1}."

    def pred(path: str) -> bool:
        if path.startswith("prompt_learner"):
            return True
        if any(f".{ln}." in path or path.endswith(ln) for ln in ln_names):
            return True
        return vis_last in path or txt_last in path

    return pred


def init_maple_prompt_learner(key, arch, n_ctx: int, depth: int,
                              ctx_vectors, use_captions: bool) -> dict:
    """Build the MultiModalPromptLearner parameter tree."""
    d_text = arch.transformer_width
    d_vis = arch.vision_width
    keys = jax.random.split(key, 4 + 2 * max(1, depth - 1))

    text_deep, vis_deep, couplers = [], [], []
    for i in range(depth - 1):
        k_p, k_c = keys[4 + 2 * i], keys[5 + 2 * i]
        if i % 2 == 0:
            text_deep.append(random_ctx_vectors(k_p, n_ctx, d_text))
            couplers.append(linear_params(k_c, d_text, d_vis))
        else:
            vis_deep.append(random_ctx_vectors(k_p, n_ctx, d_vis))
            couplers.append(linear_params(k_c, d_vis, d_text))

    pl = {
        "ctx": ctx_vectors,
        "proj_lang_to_vis": linear_params(keys[0], d_text, d_vis),
        # unused in forward; parity with the reference state dict
        "proj_vis_to_lang": linear_params(keys[1], d_vis, d_text),
        "text_deep_params": text_deep,
        "vis_deep_params": vis_deep,
        "couplers": couplers,
    }
    if use_captions:
        pl["caption_pool_w"] = (
            jax.random.normal(keys[2], (d_text,)) * (d_text ** -0.5)
        ).astype(jnp.float32)
        pl["caption_proj"] = linear_params(keys[3], d_text, d_vis)
    return pl


def maple_prompts(pl: dict, prefix, suffix, depth: int):
    """The prompt-learner forward (``trainers/maple.py:177-218``): assemble
    text prompts and produce the coupled deep prompt lists."""
    ctx = pl["ctx"]
    text_deep: List = [None] * (depth - 1)
    vis_deep: List = [None] * (depth - 1)
    ti = vi = 0
    for i in range(depth - 1):
        proj = pl["couplers"][i]
        if i % 2 == 0:
            p = pl["text_deep_params"][ti]
            vis_deep[i] = apply_linear(proj, p)
            text_deep[i] = p
            ti += 1
        else:
            p = pl["vis_deep_params"][vi]
            text_deep[i] = apply_linear(proj, p)
            vis_deep[i] = p
            vi += 1

    shared_ctx = apply_linear(pl["proj_lang_to_vis"], ctx)
    prompts = assemble_prompts_end(ctx, prefix, suffix)
    return prompts, shared_ctx, text_deep, vis_deep


def make_maple_eval_fns(arch, depth: int, text_len: int):
    """Prompt-cached eval fast path, shared by the MaPLe trainer and the
    flagship bench program: the prompts/text features are image-independent,
    so evaluation computes them ONCE (``eval_prepare_fn``) and runs image
    batches against the cached features (``eval_apply_fn``) — the reference
    recomputes the whole text tower per eval batch (``trainers/maple.py:
    674``).  Both callers share the ``{"model", "prompt_const"}`` frozen
    layout."""

    def eval_prepare_fn(trainable, frozen):
        m = merge_trees(trainable, frozen["model"])
        pc = frozen["prompt_const"]
        prompts, shared_ctx, text_deep, vis_deep = maple_prompts(
            m["prompt_learner"], pc["token_prefix"], pc["token_suffix"], depth
        )
        txt = encode_text_embedded(
            m["clip"]["text"], arch, prompts, pc["eot_index"],
            deep_prompts=text_deep, max_len=text_len,
        )
        scale = jnp.clip(
            jnp.exp(m["clip"]["logit_scale"].astype(jnp.float32)), None, 100.0
        )
        return {
            "txt_n": l2_normalize(txt),
            "shared_ctx": shared_ctx,
            "vis_deep": vis_deep,
            "scale": scale,
        }

    def eval_apply_fn(trainable, frozen, images, prep):
        m = merge_trees(trainable, frozen["model"])
        img = encode_image(
            m["clip"]["visual"], arch, images,
            shallow_prompts=prep["shared_ctx"],
            deep_prompts=prep["vis_deep"],
            inference=True,
        )
        return prep["scale"] * l2_normalize(img) @ prep["txt_n"].T

    return eval_prepare_fn, eval_apply_fn


def caption_tokens_to_extra(pl: dict, text_params, caption_tokens):
    """Pool frozen caption embeddings into one 768-d token per image."""
    emb = jax.lax.stop_gradient(
        embed_tokens(text_params, caption_tokens)
    ).astype(jnp.float32)  # (B, 77, d)
    scores = jnp.einsum("btd,d->bt", emb, pl["caption_pool_w"].astype(jnp.float32))
    probs = jax.nn.softmax(scores, axis=1)
    pooled = jnp.einsum("btd,bt->bd", emb, probs)
    projected = apply_linear(pl["caption_proj"], pooled)  # (B, 768)
    return projected[:, None, :]


@TRAINER_REGISTRY.register()
class MaPLe(FunctionalTrainerMixin, TrainerX):
    """Single-site MaPLe trainer, usable standalone or wrapped by
    ``MaPLeFederated`` (which injects a ClientDataManager and the unified
    classnames, ``trainers/maple_fed.py:164-176``)."""

    # unfreeze policy trains visual resblocks.{last} only (reference
    # trainers/maple.py:447-479; maple_trainable_predicate) — every other
    # vision block takes the fused frozen-W attention kernel
    ATTN_WGRAD_VISION = "last"
    # the reference hard-codes clip_grad_norm_(max_norm=1.0) in its
    # forward_backward (trainers/maple.py:577,592) — MaPLe is the only
    # trainer that clips
    GRAD_CLIP_OVERRIDE = 1.0

    def __init__(self, cfg, client_id: Optional[int] = None,
                 classnames: Optional[List[str]] = None, dm=None,
                 shared_clip=None, use_captions_override: Optional[bool] = None):
        self.client_id = client_id
        self.classnames_override = classnames
        self._injected_dm = dm
        # federated aggregator passes a unified decision so every client's
        # trainable pytree has the same structure (FedAvg tree_maps across
        # clients)
        self._use_captions_override = use_captions_override
        # (arch, params) reuse across federated clients: the frozen CLIP is
        # identical for every client, so share one HBM copy instead of the
        # reference's N full model replicas (maple_fed.py:164-176)
        self._shared_clip = shared_clip
        super().__init__(cfg)
        self.grad_norms = []

    def check_cfg(self, cfg):
        assert cfg.TRAINER.MAPLE.PREC in ("fp16", "fp32", "amp", "bf16"), (
            f"Invalid precision setting: {cfg.TRAINER.MAPLE.PREC}"
        )

    def build_data_loader(self):
        if self._injected_dm is not None:
            self.dm = self._injected_dm
            self.train_loader_x = self.dm.train_loader
            self.val_loader = self.dm.val_loader
            self.test_loader = self.dm.test_loader
            self.num_classes = self.dm.num_classes
        else:
            super().build_data_loader()

    @property
    def _tag(self):
        return f"[Client {self.client_id}] " if self.client_id is not None else ""

    def build_model(self):
        cfg = self.cfg
        tcfg = cfg.TRAINER.MAPLE
        classnames = self.classnames_override or self.dm.dataset.classnames
        print(f"{self._tag}# of classnames = {len(classnames)}")

        if self._shared_clip is not None:
            self.arch, clip_params = self._shared_clip
        else:
            print(f"{self._tag}Loading CLIP (backbone: {cfg.MODEL.BACKBONE.NAME})")
            self.arch, clip_params = load_clip_backbone(cfg.MODEL)
        arch = self.arch

        if not arch.is_vit:
            raise ValueError(
                "MaPLe requires a ViT backbone (multi-modal prompt "
                f"injection into transformer blocks); got "
                f"{cfg.MODEL.BACKBONE.NAME}"
            )
        from federated_multi_modal_tpu.trainers.common import apply_prec

        clip_params = apply_prec(tcfg.PREC, clip_params)
        # The reference's CustomCLIP REPLACES CLIP's logit_scale with a
        # fresh parameter initialized to ln(1/0.07) (trainers/maple.py:227)
        # which the unfreeze policy then leaves frozen — so MaPLe trains
        # with scale exp(2.659)~14.3 even when the loaded CLIP checkpoint
        # carries the saturated 4.6052 (exp clamped to 100).  Reproduce
        # that exactly: shallow-copy (the tree may be shared across
        # federated clients) and pin the leaf.
        clip_params = dict(clip_params)
        clip_params["logit_scale"] = jnp.asarray(
            np.log(1.0 / 0.07), jnp.float32
        )
        n_ctx = tcfg.N_CTX
        depth = tcfg.PROMPT_DEPTH
        assert depth >= 1, "For MaPLe, PROMPT_DEPTH should be >= 1"
        assert cfg.INPUT.SIZE[0] == arch.image_resolution, (
            f"cfg_imsize ({cfg.INPUT.SIZE[0]}) must equal clip_imsize "
            f"({arch.image_resolution})"
        )
        # caption conditioning only when the dataset actually provides
        # captions (the reference passes caption=None for caption-less
        # datasets and the branch is skipped, trainers/maple.py:307-315)
        if self._use_captions_override is not None:
            self.use_captions = bool(tcfg.USE_CAPTIONS) and bool(
                self._use_captions_override
            )
        else:
            dataset_has_captions = dataset_provides_captions(self.dm)
            self.use_captions = bool(tcfg.USE_CAPTIONS) and dataset_has_captions
            if tcfg.USE_CAPTIONS and not dataset_has_captions:
                print(f"{self._tag}Dataset provides no captions; caption branch off")
        self.align_lambda = float(tcfg.ALIGN_LAMBDA)
        remat = bool(cfg.TPU.REMAT)

        ctx_init = tcfg.CTX_INIT
        key = jax.random.PRNGKey(cfg.SEED if cfg.SEED >= 0 else 0)
        if ctx_init and n_ctx <= 4:
            ctx = ctx_init_vectors(clip_params["text"], ctx_init, n_ctx)
            prompt_prefix = ctx_init.replace("_", " ")
        else:
            ctx = random_ctx_vectors(key, n_ctx, arch.transformer_width)
            prompt_prefix = " ".join(["X"] * n_ctx)
        print("MaPLe design: Multi-modal Prompt Learning")
        print(f'Initial context: "{prompt_prefix}"')
        print(f"Number of MaPLe context words (tokens): {n_ctx}")

        const = build_prompt_constants(
            clip_params["text"], classnames, prompt_prefix, n_ctx
        )
        self.const = const

        pl = init_maple_prompt_learner(
            key, arch, n_ctx, depth, ctx, self.use_captions
        )
        model = {"clip": clip_params, "prompt_learner": pl}

        pred = maple_trainable_predicate(arch.vision_layers, arch.transformer_layers)
        trainable, frozen_clip = split_tree(model, pred)
        self.trainable = cast_tree(trainable, jnp.float32)
        self.frozen = {
            "model": frozen_clip,
            "prompt_const": {
                "token_prefix": const.token_prefix,
                "token_suffix": const.token_suffix,
                "eot_index": const.eot_index,
            },
        }
        self.depth = depth

        def full_model(trainable, frozen):
            return merge_trees(trainable, frozen["model"])

        def features(trainable, frozen, images, caption_tokens=None):
            m = full_model(trainable, frozen)
            pc = frozen["prompt_const"]
            prompts, shared_ctx, text_deep, vis_deep = maple_prompts(
                m["prompt_learner"], pc["token_prefix"], pc["token_suffix"], depth
            )
            extra = None
            if caption_tokens is not None and self.use_captions:
                extra = caption_tokens_to_extra(
                    m["prompt_learner"], m["clip"]["text"], caption_tokens
                )
            txt = encode_text_embedded(
                m["clip"]["text"], arch, prompts, pc["eot_index"],
                deep_prompts=text_deep, remat=remat,
                max_len=const.text_len,
            )
            img = encode_image(
                m["clip"]["visual"], arch, images,
                shallow_prompts=shared_ctx,
                deep_prompts=vis_deep,
                extra_tokens=extra,
                remat=remat,
            )
            return l2_normalize(img), l2_normalize(txt), m

        def logits_fn(trainable, frozen, images):
            img_n, txt_n, m = features(trainable, frozen, images)
            scale = jnp.clip(
                jnp.exp(m["clip"]["logit_scale"].astype(jnp.float32)), None, 100.0
            )
            return scale * img_n @ txt_n.T

        def loss_fn(trainable, frozen, batch):
            img_n, txt_n, m = features(
                trainable, frozen, batch["image"], batch.get("caption_tokens")
            )
            scale = jnp.clip(
                jnp.exp(m["clip"]["logit_scale"].astype(jnp.float32)), None, 100.0
            )
            logits = scale * img_n @ txt_n.T
            labels = batch["label"]

            if "soft_label" in batch:
                # KL path for soft/mix-up labels (trainers/maple.py:356-360)
                target = jnp.clip(batch["soft_label"], 1e-8, None)
                logp = jax.nn.log_softmax(logits, axis=1)
                loss = jnp.mean(
                    jnp.sum(target * (jnp.log(target) - logp), axis=1)
                )
                txt_sel = target @ txt_n
            else:
                loss = optax.softmax_cross_entropy_with_integer_labels(
                    logits, labels
                ).mean()
                txt_sel = txt_n[labels]

            cos_sim = jnp.sum(img_n * txt_sel, axis=-1)
            alignment = 1.0 - cos_sim.mean()
            total = loss + self.align_lambda * alignment
            acc = jnp.mean(
                (jnp.argmax(logits, axis=-1) == labels).astype(jnp.float32)
            )
            return total, {"acc": acc * 100.0, "align": alignment}

        self.eval_prepare_fn, self.eval_apply_fn = make_maple_eval_fns(
            arch, depth, const.text_len
        )

        self.logits_fn = logits_fn
        self.loss_fn = loss_fn
        self.setup_optimization()
        self.load_init_weights()

        print(f"{self._tag}Trainable params: {count_params(self.trainable):,}")

        name = (
            f"MultiModalPromptLearner_{self.client_id}"
            if self.client_id is not None
            else "MultiModalPromptLearner"
        )
        self.model_name = name
        self.register_model(name, self._get_state, self._set_state)

    # -- state surface ---------------------------------------------------------
    def _get_state(self):
        sd = flatten_params(self.trainable)
        sd["prompt_learner.token_prefix"] = np.asarray(
            jax.device_get(self.const.token_prefix)
        )
        sd["prompt_learner.token_suffix"] = np.asarray(
            jax.device_get(self.const.token_suffix)
        )
        return {"state_dict": sd, "optimizer": None, "scheduler": None}

    def _set_state(self, flat):
        self.invalidate_eval_cache()
        self.trainable, _ = unflatten_into(self.trainable, flat,
                                           strict_shapes=True)

    # -- batches ---------------------------------------------------------------
    def parse_batch_train(self, batch):
        images = self.parse_batch_images(batch)
        labels = jnp.asarray(batch["label"])
        step = {"image": images, "label": labels}
        if self.use_captions:
            captions = [c or "" for c in batch.get("caption", [])]
            if len(captions) != images.shape[0]:
                captions = [""] * images.shape[0]
            step["caption_tokens"] = jnp.asarray(
                np.stack([_tokenize_caption(c) for c in captions])
            )
        return step

    def forward_backward(self, batch):
        step = self.parse_batch_train(batch)
        summary = self.train_step(step)
        if summary is None:  # deferred mode: checked at drain time
            return None
        if not np.isfinite(summary["loss"]):
            # reference hard-raises on NaN/Inf loss (trainers/maple.py:375-376)
            raise RuntimeError("NaN/Inf in total loss")
        self.grad_norms.append(summary.get("grad_norm", 0.0))
        return summary

    def _drain_checked(self, total_loss, steps):
        """Materialize deferred summaries (NaN hard-raise + grad-norm
        history happen inside ``drain_summaries``)."""
        for s in self.drain_summaries():
            total_loss += s["loss"]
            steps += 1
        return total_loss, steps

    def drain_summaries(self):
        """Reproduce forward_backward's NaN hard-raise (reference
        ``trainers/maple.py:375-376``) and grad-norm history at the drain
        point — shared by the aggregator loop AND the base epoch runner."""
        drained = super().drain_summaries()
        for s in drained:
            if not np.isfinite(s["loss"]):
                raise RuntimeError("NaN/Inf in total loss")
            self.grad_norms.append(s.get("grad_norm", 0.0))
        return drained

    # -- aggregator-driven local training (trainers/maple.py:629-653) ----------
    def run_epoch(self, epoch=None):
        if epoch is None:
            # standalone TrainerX path: use the base epoch runner (per-batch
            # progress lines + TRAIN.PROFILE_DIR tracing), then step the LR
            # once per epoch like the reference's Dassl loop
            loss = TrainerX.run_epoch(self)
            self.update_lr()
            return loss
        self.set_model_mode("train")
        total_loss, steps = 0.0, 0
        self.num_batches = len(self.train_loader_x)
        freq = max(1, self.cfg.TRAIN.PRINT_FREQ)
        self._sync_steps = False
        try:
            for self.batch_idx, batch in enumerate(self.train_loader_x):
                self.forward_backward(batch)
                if (self.batch_idx + 1) % freq == 0:
                    total_loss, steps = self._drain_checked(total_loss, steps)
            total_loss, steps = self._drain_checked(total_loss, steps)
        finally:
            self.end_deferred()
        # aggregator path: step LR to the *global* epoch + 1
        self.epoch = epoch
        self.update_lr()
        local = self.test()
        avg_loss = total_loss / max(1, steps)
        print(
            f"{self._tag}Epoch {epoch} done. Loss={avg_loss:.4f}, "
            f"Acc={local['accuracy']:.2f}%"
        )
        return {"avg_loss": avg_loss}

