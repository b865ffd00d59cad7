"""Training-TRAJECTORY goldens executed against the reference.

The forward/loss goldens (test_reference_golden.py) prove the model math;
these prove the TRAINING math end-to-end: the trainable/frozen partition
(``maple_trainable_predicate`` + ``split_tree``), gradient flow through
both prompted towers, the global-norm-1.0 clip, and the torch-SGD
semantics of ``engine/optim.py`` (momentum + coupled weight decay) must
produce the same parameter trajectory as the reference ``CustomCLIP``
trained by torch autograd + ``clip_grad_norm_`` + ``torch.optim.SGD``
from identical weights on identical batches (reference step:
``trainers/maple.py:560-598``; freeze policy: ``:445-479``; optimizer:
Dassl ``build_optimizer`` = SGD(momentum, weight_decay) over
requires-grad params).

The torch side restates the reference's freeze loop with one documented
generalization: the reference hard-codes ``"resblocks.11"`` (ViT-B/16's
last index; note on the fork's ``CustomCLIP`` the name rule
``"visual.transformer.resblocks.11"`` matches nothing — the module is
named ``image_encoder`` — and ``"transformer.resblocks.11"`` matches BOTH
towers), which this tiny tower maps to its own last block indices, the
same generalization ``maple_trainable_predicate`` makes.
"""

import copy

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from reference_harness import fp32_reference, our_tokenizer_with
from test_reference_golden import CLASSNAMES, maple_pair, ref  # noqa: F401

from federated_multi_modal_tpu.config import get_cfg_default

LR = 0.05
MOMENTUM = 0.9
WEIGHT_DECAY = 5e-4
STEPS = 3


def _freeze_like_reference(cc):
    """The reference unfreeze policy (trainers/maple.py:445-479) restated:
    all off; LN/BN modules on; ``prompt_learner`` names on; last resblock
    of both towers on (hard-coded ``.11`` generalized to this tower)."""
    for p in cc.parameters():
        p.requires_grad_(False)
    for m in cc.modules():
        if isinstance(m, (torch.nn.LayerNorm, torch.nn.BatchNorm1d,
                          torch.nn.BatchNorm2d)):
            for p in m.parameters():
                p.requires_grad_(True)
    lv = len(cc.image_encoder.transformer.resblocks) - 1
    lt = len(cc.text_encoder.transformer.resblocks) - 1
    for name, p in cc.named_parameters():
        if "prompt_learner" in name:
            p.requires_grad_(True)
        if f"image_encoder.transformer.resblocks.{lv}." in name:
            p.requires_grad_(True)
        if f"text_encoder.transformer.resblocks.{lt}." in name:
            p.requires_grad_(True)


def _build_our_trainer(tmp_path, arch, params, pl, bpe_path):
    """The REAL MaPLe trainer over the converted reference weights, its
    randomly-initialized prompt learner replaced by the reference's."""
    import federated_multi_modal_tpu.trainers  # noqa: F401 (registry)
    from federated_multi_modal_tpu.trainers.maple import MaPLe

    cfg = get_cfg_default()
    cfg.DATASET.ROOT = str(tmp_path / "data")
    cfg.DATASET.NAME = "Synthetic"
    cfg.MODEL.BACKBONE.NAME = "ViT-B/16"  # unused: shared_clip is injected
    cfg.INPUT.SIZE = (64, 64)
    cfg.INPUT.CANVAS_SIZE = 72
    cfg.OUTPUT_DIR = str(tmp_path / "out")
    cfg.SEED = 1
    cfg.VERBOSE = False
    cfg.TRAINER.NAME = "MaPLe"
    cfg.TRAINER.MAPLE.N_CTX = 2
    cfg.TRAINER.MAPLE.PROMPT_DEPTH = 3
    cfg.TRAINER.MAPLE.CTX_INIT = "a photo of a"
    cfg.TRAINER.MAPLE.PREC = "fp32"
    cfg.OPTIM.NAME = "sgd"
    cfg.OPTIM.LR = LR
    cfg.OPTIM.MOMENTUM = MOMENTUM
    cfg.OPTIM.WEIGHT_DECAY = WEIGHT_DECAY
    cfg.OPTIM.WARMUP_EPOCH = 0
    cfg.OPTIM.LR_SCHEDULER = "cosine"
    cfg.OPTIM.MAX_EPOCH = 3
    cfg.TPU.DATA_PARALLEL = False

    with our_tokenizer_with(bpe_path):
        trainer = MaPLe(cfg, classnames=CLASSNAMES,
                        shared_clip=(arch, params),
                        use_captions_override=False)
    # LR must be the base LR at epoch 0 so the torch mirror is exact
    # (warmup off, cosine(0) = LR; the scheduler only steps per epoch)
    assert trainer.lr_history[0] == pytest.approx(LR)

    trainer.trainable["prompt_learner"] = jax.tree.map(
        lambda x: jnp.asarray(np.asarray(x), jnp.float32), pl
    )
    # fresh momentum over the swapped-in weights (torch side starts fresh)
    trainer.opt_state = trainer.tx.init(trainer.trainable)
    return trainer


def _torch_block(rb, full=True):
    """Our converted layout for one torch ResidualAttentionBlock; frozen
    blocks contribute their (trainable) LNs only, like the split tree."""
    def ln(m):
        return {"scale": m.weight, "bias": m.bias}

    if not full:
        return {"ln_1": ln(rb.ln_1), "ln_2": ln(rb.ln_2)}
    return {
        "ln_1": ln(rb.ln_1),
        "attn": {
            "w_qkv": rb.attn.in_proj_weight.T,
            "b_qkv": rb.attn.in_proj_bias,
            "w_out": rb.attn.out_proj.weight.T,
            "b_out": rb.attn.out_proj.bias,
        },
        "ln_2": ln(rb.ln_2),
        "mlp": {
            "w_fc": rb.mlp.c_fc.weight.T,
            "b_fc": rb.mlp.c_fc.bias,
            "w_proj": rb.mlp.c_proj.weight.T,
            "b_proj": rb.mlp.c_proj.bias,
        },
    }


def _torch_trainable_view(cc):
    """The torch parameters our trainable tree maps to, in our layout
    (transposed where our convention is x @ W)."""
    def ln(m):
        return {"scale": m.weight, "bias": m.bias}

    rpl = cc.prompt_learner

    def lin(m):
        return {"w": m.weight.T, "b": m.bias}

    vis = cc.image_encoder
    txt = cc.text_encoder
    nv = len(vis.transformer.resblocks)
    nt = len(txt.transformer.resblocks)
    return {
        "prompt_learner": {
            "ctx": rpl.ctx,
            "proj_lang_to_vis": lin(rpl.proj_lang_to_vis),
            "proj_vis_to_lang": lin(rpl.proj_vis_to_lang),
            "text_deep_params": list(rpl.compound_prompts_text_parameters),
            "vis_deep_params": list(rpl.visual_deep_prompts_parameters),
            "couplers": [lin(m) for m in rpl.compound_prompt_projections],
        },
        "visual": {
            "ln_pre": ln(vis.ln_pre),
            "ln_post": ln(vis.ln_post),
            "blocks": [
                _torch_block(rb, full=(i == nv - 1))
                for i, rb in enumerate(vis.transformer.resblocks)
            ],
        },
        "text": {
            "ln_final": ln(txt.ln_final),
            "blocks": [
                _torch_block(rb, full=(i == nt - 1))
                for i, rb in enumerate(txt.transformer.resblocks)
            ],
        },
    }


def _our_trainable_view(trainable):
    """The matching subtree of our trainable pytree (dropping the non-LN
    frozen-block Nones that split_tree leaves in place)."""
    def ln_only(block, full):
        if full:
            return block
        return {"ln_1": block["ln_1"], "ln_2": block["ln_2"]}

    clip = trainable["clip"]
    nv = len(clip["visual"]["blocks"])
    nt = len(clip["text"]["blocks"])
    return {
        "prompt_learner": trainable["prompt_learner"],
        "visual": {
            "ln_pre": clip["visual"]["ln_pre"],
            "ln_post": clip["visual"]["ln_post"],
            "blocks": [
                ln_only(b, i == nv - 1)
                for i, b in enumerate(clip["visual"]["blocks"])
            ],
        },
        "text": {
            "ln_final": clip["text"]["ln_final"],
            "blocks": [
                ln_only(b, i == nt - 1)
                for i, b in enumerate(clip["text"]["blocks"])
            ],
        },
    }


def _snap(tree):
    return jax.tree.map(
        lambda x: np.array(
            x.detach().numpy() if isinstance(x, torch.Tensor) else x,
            np.float64,
        ),
        tree,
    )


def test_maple_train_trajectory_matches_reference(ref, maple_pair, tmp_path):
    cc0, arch, params, pl, const = maple_pair
    cc = copy.deepcopy(cc0)  # the module-scoped fixture must stay pristine

    rng = np.random.default_rng(11)
    batches = [
        (
            rng.standard_normal((4, 64, 64, 3)).astype(np.float32) * 0.5,
            rng.integers(0, len(CLASSNAMES), 4).astype(np.int64),
        )
        for _ in range(STEPS)
    ]

    # ---- torch side: the reference model trained by torch machinery ----
    _freeze_like_reference(cc)
    ref_train = [p for p in cc.parameters() if p.requires_grad]
    opt = torch.optim.SGD(ref_train, lr=LR, momentum=MOMENTUM,
                          weight_decay=WEIGHT_DECAY)
    losses_ref = []
    cc.train()
    with fp32_reference():
        for imgs, labels in batches:
            loss = cc(torch.from_numpy(imgs).permute(0, 3, 1, 2),
                      torch.from_numpy(labels))
            opt.zero_grad()
            loss.backward()
            torch.nn.utils.clip_grad_norm_(cc.parameters(), max_norm=1.0,
                                           error_if_nonfinite=False)
            opt.step()
            losses_ref.append(float(loss.item()))
    # the reference leaves prompt_learner.proj_vis_to_lang out of the
    # forward graph -> its grad stays None and torch skips it ENTIRELY
    # (no weight decay); pin that so the deviation note below stays honest
    assert cc.prompt_learner.proj_vis_to_lang.weight.grad is None

    # ---- our side: the REAL trainer (jitted step: loss + grads + clip +
    # SGD + NaN gate) over the converted weights ----
    trainer = _build_our_trainer(tmp_path, arch, params, pl, ref.bpe_path)

    # partition parity: same trainable tensor count and numel as the
    # reference's requires_grad set
    ours_leaves = [
        x for x in jax.tree_util.tree_leaves(trainer.trainable)
        if x is not None
    ]
    assert len(ours_leaves) == len(ref_train)
    assert sum(int(np.prod(x.shape)) for x in ours_leaves) == sum(
        p.numel() for p in ref_train
    )
    # prompt constants derive from the same tokenizer + embeddings
    np.testing.assert_allclose(
        np.asarray(trainer.const.token_prefix),
        np.asarray(const["token_prefix"]), atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(trainer.const.token_suffix),
        np.asarray(const["token_suffix"]), atol=1e-6)

    init_ours = _snap(_our_trainable_view(trainer.trainable))
    losses_ours = []
    for imgs, labels in batches:
        summary = trainer.train_step({
            "image": jnp.asarray(imgs),
            "label": jnp.asarray(labels.astype(np.int32)),
        })
        losses_ours.append(summary["loss"])

    np.testing.assert_allclose(losses_ours, losses_ref, rtol=1e-4,
                               atol=1e-4)

    # ---- parameter trajectories: compare per-leaf DELTAS ----
    final_ours = _snap(_our_trainable_view(trainer.trainable))
    init_ref = None  # deltas on the torch side come from the deepcopy base
    with torch.no_grad():
        init_ref = _snap(_torch_trainable_view(cc0))
        final_ref = _snap(_torch_trainable_view(cc))

    flat_o0, treedef = jax.tree_util.tree_flatten(init_ours)
    flat_o1 = jax.tree_util.tree_leaves(final_ours)
    flat_r0 = jax.tree_util.tree_leaves(init_ref)
    flat_r1 = jax.tree_util.tree_leaves(final_ref)
    paths = jax.tree_util.tree_flatten_with_path(init_ours)[0]
    assert len(flat_o0) == len(flat_r0) == len(flat_o1) == len(flat_r1)

    for (path, _), o0, o1, r0, r1 in zip(paths, flat_o0, flat_o1, flat_r0,
                                         flat_r1):
        name = jax.tree_util.keystr(path)
        np.testing.assert_allclose(
            o0, r0, atol=1e-6, err_msg=f"initial weights differ at {name}")
        d_ours, d_ref = o1 - o0, r1 - r0
        if "proj_vis_to_lang" in name:
            # documented deviation: torch skips None-grad params entirely,
            # our functional step sees zero grads so ONLY the coupled
            # weight decay moves this (never-used) parameter —
            # |delta| <= lr*wd*|w| per step, function-invisible
            assert np.all(np.abs(d_ref) == 0.0)
            # decay rides the momentum trace: sum_k (1-m^k)/(1-m) terms,
            # = 1 + 1.9 + 2.71 at m=0.9 over 3 steps; bound with margin
            factor = sum((1 - MOMENTUM ** (k + 1)) / (1 - MOMENTUM)
                         for k in range(STEPS))
            bound = LR * WEIGHT_DECAY * (np.abs(o0) + 1e-3) * factor * 1.5
            assert np.all(np.abs(d_ours) <= bound), name
            continue
        scale = max(1e-8, float(np.max(np.abs(d_ref))))
        np.testing.assert_allclose(
            d_ours, d_ref, atol=max(1e-7, 2e-3 * scale),
            err_msg=f"update trajectory diverges at {name} "
                    f"(|d_ref|max={scale:.3e})")
