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
import os
from collections import defaultdict

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from reference_harness import fp32_reference, our_tokenizer_with
from test_engine import _DasslWarmupWrapper
from test_reference_golden import (  # noqa: F401
    CLASSNAMES,
    build_maple_pair,
    maple_pair,
    ref,
)

from federated_multi_modal_tpu.config import get_cfg_default
from federated_multi_modal_tpu.data.dataset_base import DatasetBase
from federated_multi_modal_tpu.data.datum import Datum
from federated_multi_modal_tpu.engine.registry import DATASET_REGISTRY

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


# ===========================================================================
# Composed multi-round FEDERATED trajectory golden (round-3 verdict task 1).
#
# Every piece of the round loop was verified separately in round 2 (FedAvg
# scrub golden, validity-gate golden, broadcast momentum/LR quirk test,
# scheduler-vs-torch golden, 3-step single-client trajectory golden); this
# composes them: our REAL ``MaPLeFederated.train()`` — broadcast with
# optimizer-state deletion + scheduler-rebuild quirk
# (``/root/reference/trainers/maple_fed.py:327-339``), per-round
# ``[r*L, (r+1)*L)`` epoch windows (``:249-250``), per-client local epochs,
# weight-validity gate + reset-to-global (``:271-277``), FedAvg via the
# EXECUTED reference ``safe_average_weights`` (``:309-315``), post-round
# broadcast (``:293-294``) — against a torch mirror built on the executed
# reference ``CustomCLIP``, batch-for-batch.
#
# Inputs parity: the exact post-transform image/label batches our clients
# consume are captured at the ``train_step`` boundary and replayed through
# the torch mirror, so both sides train on bit-identical inputs while the
# round MECHANICS (what this test is about) run independently on each side.
#
# LR semantics: warmup(1, constant) + cosine ACTIVE, crossing epoch
# boundaries inside every round.  The expected per-epoch LR table is
# derived from torch machinery (CosineAnnealingLR + the Dassl warmup
# wrapper goldened in test_engine.py), with the broadcast rebuild quirk —
# first local epoch of every round at the epoch-0 (warmup) LR — applied as
# documented in ``trainers/maple_fed.py::broadcast_weights``.
# ===========================================================================

GOLDEN_FED_CLASSNAMES = [
    "forest", "golden retriever", "parking lot", "river delta",
]  # alphabetically sorted: the aggregator's sorted-union order == this
FED_LR = 0.05
FED_CONS_LR = 0.01
FED_LOCAL_EPOCHS = 2


@DATASET_REGISTRY.register()
class GoldenFedSynthetic(DatasetBase):
    """Tiny deterministic dataset whose classnames equal the golden
    CustomCLIP vocabulary (sorted, so the aggregator's unification is the
    identity map)."""

    N_TRAIN, N_VAL, N_TEST = 2, 1, 2

    def __init__(self, cfg):
        from PIL import Image

        root = os.path.abspath(os.path.expanduser(cfg.DATASET.ROOT))
        base = os.path.join(root, "golden_fed_synth")
        rng = np.random.default_rng(5)
        train, val, test = [], [], []
        n = self.N_TRAIN + self.N_VAL + self.N_TEST
        for label, cname in enumerate(GOLDEN_FED_CLASSNAMES):
            cdir = os.path.join(base, cname.replace(" ", "_"))
            os.makedirs(cdir, exist_ok=True)
            for i in range(n):
                p = os.path.join(cdir, f"img_{i}.png")
                arr = rng.integers(0, 255, (64, 64, 3), np.uint8)
                if not os.path.exists(p):
                    Image.fromarray(arr).save(p)
                d = Datum(impath=p, label=label, classname=cname)
                (train if i < self.N_TRAIN
                 else val if i < self.N_TRAIN + self.N_VAL
                 else test).append(d)
        super().__init__(train_x=train, val=val, test=test)


def _fed_cfg(tmp_path, num_rounds):
    cfg = get_cfg_default()
    cfg.DATASET.ROOT = str(tmp_path / "data")
    cfg.DATASET.NAME = "GoldenFedSynthetic"
    cfg.MODEL.BACKBONE.NAME = "ViT-B/16"  # unused: backbone loader patched
    cfg.INPUT.SIZE = (64, 64)
    cfg.INPUT.CANVAS_SIZE = 72
    cfg.DATALOADER.TRAIN_X.BATCH_SIZE = 4
    cfg.DATALOADER.TEST.BATCH_SIZE = 8
    cfg.OUTPUT_DIR = str(tmp_path / "out")
    cfg.SEED = 1
    cfg.VERBOSE = False
    cfg.TRAIN.PRINT_FREQ = 100
    cfg.TRAINER.NAME = "MaPLeFederated"
    cfg.TRAINER.MAPLE.N_CTX = 2
    cfg.TRAINER.MAPLE.PROMPT_DEPTH = 3
    cfg.TRAINER.MAPLE.CTX_INIT = "a photo of a"
    cfg.TRAINER.MAPLE.PREC = "fp32"
    cfg.TRAINER.MAPLE.USE_CAPTIONS = False
    cfg.OPTIM.NAME = "sgd"
    cfg.OPTIM.LR = FED_LR
    cfg.OPTIM.MOMENTUM = MOMENTUM
    cfg.OPTIM.WEIGHT_DECAY = WEIGHT_DECAY
    cfg.OPTIM.LR_SCHEDULER = "cosine"
    cfg.OPTIM.WARMUP_EPOCH = 1
    cfg.OPTIM.WARMUP_TYPE = "constant"
    cfg.OPTIM.WARMUP_CONS_LR = FED_CONS_LR
    cfg.OPTIM.MAX_EPOCH = num_rounds * FED_LOCAL_EPOCHS
    cfg.FED.NUM_CLIENTS = 2
    cfg.FED.NUM_ROUNDS = num_rounds
    cfg.FED.LOCAL_EPOCHS = FED_LOCAL_EPOCHS
    cfg.FED.DATASETS = ("GoldenFedSynthetic", "GoldenFedSynthetic")
    cfg.FED.CLASSNAME_ONLY_DATASETS = ()
    cfg.FED.PARALLEL_CLIENTS = False
    cfg.TPU.DATA_PARALLEL = False
    return cfg


def _torch_lr_table(base_lr, max_epoch, warmup_epoch, cons_lr):
    """Per-global-epoch LR from TORCH machinery (CosineAnnealingLR + the
    Dassl warmup wrapper goldened at test_engine.py:98)."""
    p = torch.nn.Parameter(torch.zeros(1))
    opt = torch.optim.SGD([p], lr=base_lr)
    successor = torch.optim.lr_scheduler.CosineAnnealingLR(
        opt, T_max=max_epoch)
    w = _DasslWarmupWrapper(opt, successor, warmup_epoch, "constant",
                            cons_lr=cons_lr, base_lr=base_lr)
    table = []
    for _ in range(max_epoch + 1):
        table.append(w.lr())
        w.step()
    return table


def _build_fed(ref, arch, params, pl, tmp_path, num_rounds):
    """The REAL aggregator over the converted reference weights, its
    random prompt learner replaced by the reference's via the round-0
    broadcast of ``global_weights``."""
    import federated_multi_modal_tpu.trainers  # noqa: F401 (registry)
    from federated_multi_modal_tpu.trainers import maple_fed as mf

    cfg = _fed_cfg(tmp_path, num_rounds)
    orig_loader = mf.load_clip_backbone
    mf.load_clip_backbone = lambda model_cfg: (arch, params)
    try:
        with our_tokenizer_with(ref.bpe_path):
            fed = mf.MaPLeFederated(cfg)
    finally:
        mf.load_clip_backbone = orig_loader

    fed.global_weights["prompt_learner"] = jax.tree.map(
        lambda x: jnp.asarray(np.asarray(x), jnp.float32), pl
    )
    # divergent clients: same tiny dataset, different loader RNG stream
    # (batch order AND random-resized-crop boxes/flips differ)
    fed.clients[1].train_loader_x.rng = np.random.default_rng(99)
    return fed


def _instrument_clients(fed, inject_nan_at=None):
    """Capture every (client, epoch) -> [(images_fp32, labels)] batch at
    the train_step boundary, the per-step LR, and per-epoch avg losses.
    ``inject_nan_at=(client, epoch)`` poisons that client's trainable AFTER
    the epoch (the aggregator's validity gate must catch it)."""
    captured = defaultdict(list)   # (client, epoch) -> [(img, lbl)]
    lr_log = defaultdict(list)     # (client, epoch) -> [lr per step]
    epoch_losses = defaultdict(list)  # client -> [avg_loss per epoch]
    current_epoch = {}

    for i, cl in enumerate(fed.clients):
        def make_step(i, cl, orig_step):
            def wrapped(step):
                key = (i, current_epoch[i])
                captured[key].append((
                    np.asarray(step["image"], np.float32),
                    np.asarray(step["label"], np.int64),
                ))
                lr_log[key].append(float(cl.get_current_lr()))
                return orig_step(step)
            return wrapped

        def make_epoch(i, cl, orig_epoch):
            def wrapped(epoch=None):
                current_epoch[i] = epoch
                res = orig_epoch(epoch)
                epoch_losses[i].append(res["avg_loss"])
                if inject_nan_at == (i, epoch):
                    bad = np.asarray(
                        cl.trainable["prompt_learner"]["ctx"], np.float32
                    ).copy()
                    bad[0, 0] = np.nan
                    cl.trainable["prompt_learner"]["ctx"] = jnp.asarray(bad)
                return res
            return wrapped

        cl.train_step = make_step(i, cl, cl.train_step)
        cl.run_epoch = make_epoch(i, cl, cl.run_epoch)
    return captured, lr_log, epoch_losses


def _run_torch_mirror(ref, cc_golden, captured, num_rounds,
                      invalid_at=None):
    """Restate the reference round loop (maple_fed.py:228-303) with torch
    machinery on the executed-reference CustomCLIP, consuming the captured
    batches.  Returns (final_global_model, per-client epoch losses,
    per-epoch expected LR table)."""
    L = FED_LOCAL_EPOCHS
    table = _torch_lr_table(FED_LR, num_rounds * L, 1, FED_CONS_LR)

    clients = [copy.deepcopy(cc_golden) for _ in range(2)]
    opts = []
    for mc in clients:
        _freeze_like_reference(mc)
        opts.append(torch.optim.SGD(
            [p for p in mc.parameters() if p.requires_grad],
            lr=FED_LR, momentum=MOMENTUM, weight_decay=WEIGHT_DECAY))

    def set_lr(opt, v):
        for g in opt.param_groups:
            g["lr"] = v

    global_sd = {k: v.clone() for k, v in cc_golden.state_dict().items()}
    epoch_losses = defaultdict(list)
    duck = object.__new__(ref.maple_fed.MaPLeFederated)

    with fp32_reference():
        for r in range(num_rounds):
            # 1) broadcast: load global, delete momentum, scheduler-rebuild
            #    quirk -> LR at the epoch-0 (warmup) value (:327-339)
            for mc, opt in zip(clients, opts):
                mc.load_state_dict(global_sd, strict=True)
                opt.state.clear()
                set_lr(opt, table[0])

            # 2) per-client local epochs over the global window (:249-257)
            for c, (mc, opt) in enumerate(zip(clients, opts)):
                mc.train()
                for ep in range(r * L, (r + 1) * L):
                    if ep > r * L:
                        set_lr(opt, table[ep])
                    losses = []
                    for imgs, labels in captured[(c, ep)]:
                        loss = mc(
                            torch.from_numpy(imgs).permute(0, 3, 1, 2),
                            torch.from_numpy(labels))
                        opt.zero_grad()
                        loss.backward()
                        torch.nn.utils.clip_grad_norm_(
                            mc.parameters(), max_norm=1.0,
                            error_if_nonfinite=False)
                        opt.step()
                        losses.append(float(loss.item()))
                    epoch_losses[c].append(sum(losses) / len(losses))

            # 3) validity gate + FedAvg via the EXECUTED reference
            #    safe_average_weights (:271-277, :309-315)
            sds = [{k: v.clone() for k, v in mc.state_dict().items()}
                   for mc in clients]
            valid = [c for c in range(2)
                     if invalid_at != (c, r)]
            for c in range(2):
                if c not in valid:  # reset to the OLD global (:277)
                    clients[c].load_state_dict(global_sd, strict=True)
            global_sd = ref.maple_fed.MaPLeFederated.safe_average_weights(
                duck, [sds[c] for c in valid], len(valid))
            # 4) post-round broadcast + test (:293-298) — weight-neutral
            #    (next round's step-1 broadcast repeats it); skipped here.

    final = copy.deepcopy(cc_golden)
    final.load_state_dict(global_sd, strict=True)
    return final, epoch_losses, table


def _compare_global_deltas(fed_final, cc_init, mirror_final, total_steps):
    """Per-leaf global-weight deltas ours vs mirror (same view mapping as
    the single-client trajectory golden)."""
    init_ours = _snap(_our_trainable_view(fed_final["init"]))
    final_ours = _snap(_our_trainable_view(fed_final["final"]))
    with torch.no_grad():
        init_ref = _snap(_torch_trainable_view(cc_init))
        final_ref = _snap(_torch_trainable_view(mirror_final))

    flat_o0 = jax.tree_util.tree_leaves(init_ours)
    flat_o1 = jax.tree_util.tree_leaves(final_ours)
    flat_r0 = jax.tree_util.tree_leaves(init_ref)
    flat_r1 = jax.tree_util.tree_leaves(final_ref)
    paths = jax.tree_util.tree_flatten_with_path(init_ours)[0]
    assert len(flat_o0) == len(flat_r0) == len(flat_o1) == len(flat_r1)

    moved = 0.0
    for (path, _), o0, o1, r0, r1 in zip(paths, flat_o0, flat_o1, flat_r0,
                                         flat_r1):
        name = jax.tree_util.keystr(path)
        np.testing.assert_allclose(
            o0, r0, atol=1e-6, err_msg=f"initial global differs at {name}")
        d_ours, d_ref = o1 - o0, r1 - r0
        if "proj_vis_to_lang" in name:
            # documented deviation (see the single-client golden): torch
            # skips the None-grad param entirely; ours decays it
            assert np.all(np.abs(d_ref) == 0.0)
            bound = (FED_LR * WEIGHT_DECAY * (np.abs(o0) + 1e-3)
                     * total_steps / (1 - MOMENTUM) * 1.5)
            assert np.all(np.abs(d_ours) <= bound), name
            continue
        moved = max(moved, float(np.max(np.abs(d_ref))))
        scale = max(1e-8, float(np.max(np.abs(d_ref))))
        np.testing.assert_allclose(
            d_ours, d_ref, atol=max(1e-7, 3e-3 * scale),
            err_msg=f"federated trajectory diverges at {name} "
                    f"(|d_ref|max={scale:.3e})")
    assert moved > 0.0, "global weights never moved"


def _assert_lr_trajectory(lr_log, table, num_rounds):
    """Broadcast quirk + per-epoch continuation: first local epoch of each
    round at table[0], epoch r*L+k (k>=1) at table[r*L+k]."""
    L = FED_LOCAL_EPOCHS
    for (c, ep), lrs in lr_log.items():
        expect = table[0] if ep % L == 0 else table[ep]
        for lr in lrs:
            assert lr == pytest.approx(expect, rel=1e-6), (
                f"client {c} epoch {ep}: lr {lr} != {expect}")


def test_federated_round_trajectory_matches_reference(ref, tmp_path):
    """3 rounds x 2 clients x 2 local epochs of the REAL MaPLeFederated
    vs the torch mirror on the executed reference CustomCLIP."""
    NUM_ROUNDS = 3
    cc_golden, arch, params, pl, const = build_maple_pair(
        ref, GOLDEN_FED_CLASSNAMES)

    fed = _build_fed(ref, arch, params, pl, tmp_path, NUM_ROUNDS)
    # prompt constants derive from the same tokenizer + embeddings — this
    # also pins that the aggregator's sorted-union class order equals the
    # mirror's vocabulary order
    np.testing.assert_allclose(
        np.asarray(fed.clients[0].const.token_prefix),
        cc_golden.prompt_learner.token_prefix.detach().numpy(), atol=1e-6)

    captured, lr_log, epoch_losses = _instrument_clients(fed)
    init_global = _snap_tree(fed.global_weights)
    fed.train()

    # the round loop ran fully: every (client, epoch) window has batches
    assert set(captured) == {
        (c, ep) for c in range(2)
        for ep in range(NUM_ROUNDS * FED_LOCAL_EPOCHS)
    }
    # divergent clients: the reseeded loader gave client 1 different data
    assert any(
        a[0].shape != b[0].shape or not np.array_equal(a[0], b[0])
        for a, b in zip(captured[(0, 0)], captured[(1, 0)])
    )
    assert fed.nan_stats["total_updates"] == NUM_ROUNDS
    assert fed.nan_stats["skipped_rounds"] == 0
    assert fed.nan_stats["failed_clients"] == []

    mirror_final, mirror_losses, table = _run_torch_mirror(
        ref, cc_golden, captured, NUM_ROUNDS)

    _assert_lr_trajectory(lr_log, table, NUM_ROUNDS)
    for c in range(2):
        np.testing.assert_allclose(
            epoch_losses[c], mirror_losses[c], rtol=2e-4, atol=5e-4,
            err_msg=f"client {c} per-epoch losses diverge")
    # client losses must actually differ (divergence is real)
    assert not np.allclose(epoch_losses[0], epoch_losses[1])

    total_steps = sum(len(v) for v in captured.values()) // 2
    _compare_global_deltas(
        {"init": init_global, "final": fed.global_weights},
        cc_golden, mirror_final, total_steps)


def test_federated_round_nan_client_gate_matches_reference(ref, tmp_path):
    """Same composition with a NaN injected into client 1's weights at the
    end of round 0: the validity gate must exclude it from FedAvg and reset
    it to the old global (reference :271-277), and the remaining trajectory
    must still match the mirror."""
    NUM_ROUNDS = 2
    INJECT = (1, FED_LOCAL_EPOCHS - 1)  # client 1, last epoch of round 0
    cc_golden, arch, params, pl, const = build_maple_pair(
        ref, GOLDEN_FED_CLASSNAMES)

    fed = _build_fed(ref, arch, params, pl, tmp_path, NUM_ROUNDS)
    captured, lr_log, epoch_losses = _instrument_clients(
        fed, inject_nan_at=INJECT)
    init_global = _snap_tree(fed.global_weights)
    fed.train()

    # gate composition: the round still aggregated (client 0 valid), no
    # round skipped, no client marked failed (weights invalid != RuntimeError)
    assert fed.nan_stats["total_updates"] == NUM_ROUNDS
    assert fed.nan_stats["skipped_rounds"] == 0
    assert fed.nan_stats["failed_clients"] == []
    # the global stayed finite through the poisoned round
    assert all(
        np.isfinite(np.asarray(x)).all()
        for x in jax.tree_util.tree_leaves(fed.global_weights)
        if x is not None
    )

    mirror_final, mirror_losses, table = _run_torch_mirror(
        ref, cc_golden, captured, NUM_ROUNDS, invalid_at=(1, 0))

    _assert_lr_trajectory(lr_log, table, NUM_ROUNDS)
    for c in range(2):
        np.testing.assert_allclose(
            epoch_losses[c], mirror_losses[c], rtol=2e-4, atol=5e-4,
            err_msg=f"client {c} per-epoch losses diverge")

    total_steps = sum(len(v) for v in captured.values()) // 2
    _compare_global_deltas(
        {"init": init_global, "final": fed.global_weights},
        cc_golden, mirror_final, total_steps)


def _snap_tree(tree):
    return jax.tree_util.tree_map(
        lambda x: None if x is None else np.array(np.asarray(x), np.float64),
        tree, is_leaf=lambda x: x is None,
    )


# ===========================================================================
# CoOp training-trajectory golden (round 3): extends training-math parity
# beyond MaPLe.  The reference CoOp trainer does a PLAIN backward + SGD
# step — NO grad clipping (Dassl's model_backward_and_update,
# /root/reference/trainers/coop.py:274-277; only MaPLe hard-codes
# clip_grad_norm_, maple.py:577) — over the prompt learner's ctx alone
# (coop.py:240-251).  This golden found and pins the distinction: our
# OPTIM.GRAD_CLIP_NORM default is 0 and MaPLe forces its clip at the
# trainer level (GRAD_CLIP_OVERRIDE).
# ===========================================================================


def test_coop_train_trajectory_matches_reference(ref, tmp_path):
    from test_reference_golden_more import _tiny_clip

    design = {"trainer": "CoOp", "vision_depth": 0, "language_depth": 0,
              "vision_ctx": 0, "language_ctx": 0}
    model, _, arch, params = _tiny_clip(ref, design, seed=31)

    ccfg = get_cfg_default()
    ccfg.TRAINER.COOP.N_CTX = 4
    ccfg.TRAINER.COOP.CTX_INIT = "a photo of a"
    ccfg.TRAINER.COOP.CSC = False
    ccfg.TRAINER.COOP.CLASS_TOKEN_POSITION = "end"
    ccfg.INPUT.SIZE = (32, 32)
    with fp32_reference(), our_tokenizer_with(ref.bpe_path):
        cc = ref.coop.CustomCLIP(ccfg, GOLDEN_FED_CLASSNAMES, model)

    # sharpen the (frozen) logit scale on BOTH sides so ctx grad norms
    # exceed 1 — otherwise the clip-vs-no-clip distinction this golden
    # exists to pin would never bite at tiny-model grad magnitudes
    with torch.no_grad():
        cc.logit_scale.fill_(float(np.log(400.0)))
    params = dict(params)
    params["logit_scale"] = jnp.asarray(np.log(400.0), jnp.float32)

    # reference freeze policy (coop.py:240-242): prompt learner only
    for name, p in cc.named_parameters():
        p.requires_grad_("prompt_learner" in name)
    ref_train = [p for p in cc.parameters() if p.requires_grad]
    assert len(ref_train) == 1  # ctx is CoOp's single trainable tensor
    ctx0_ref = cc.prompt_learner.ctx.detach().numpy().astype(np.float64)
    opt = torch.optim.SGD(ref_train, lr=LR, momentum=MOMENTUM,
                          weight_decay=WEIGHT_DECAY)

    rng = np.random.default_rng(41)
    batches = [
        (
            rng.standard_normal((6, 32, 32, 3)).astype(np.float32) * 0.6,
            rng.integers(0, len(GOLDEN_FED_CLASSNAMES), 6).astype(np.int64),
        )
        for _ in range(STEPS)
    ]

    losses_ref, gnorms_ref = [], []
    cc.train()
    with fp32_reference():
        for imgs, labels in batches:
            out = cc(torch.from_numpy(imgs).permute(0, 3, 1, 2))
            loss = torch.nn.functional.cross_entropy(
                out, torch.from_numpy(labels))
            opt.zero_grad()
            loss.backward()
            gnorms_ref.append(float(
                torch.sqrt(sum((p.grad ** 2).sum() for p in ref_train))))
            opt.step()  # NO clip_grad_norm_ — coop.py:274-277
            losses_ref.append(float(loss.item()))
    # probative: at least one step's grad norm exceeds 1, so the old
    # always-clip-at-1.0 default would produce a different trajectory
    assert max(gnorms_ref) > 1.0, gnorms_ref

    # ---- our side: the REAL CoOp trainer over the converted weights ----
    import federated_multi_modal_tpu.trainers  # noqa: F401
    from federated_multi_modal_tpu.engine import build_trainer
    from federated_multi_modal_tpu.trainers import coop as coop_mod

    cfg = get_cfg_default()
    cfg.DATASET.ROOT = str(tmp_path / "data")
    cfg.DATASET.NAME = "GoldenFedSynthetic"
    cfg.MODEL.BACKBONE.NAME = "ViT-B/16"  # unused: loader patched
    cfg.INPUT.SIZE = (32, 32)
    cfg.INPUT.CANVAS_SIZE = 40
    cfg.OUTPUT_DIR = str(tmp_path / "out")
    cfg.SEED = 1
    cfg.VERBOSE = False
    cfg.TRAINER.NAME = "CoOp"
    cfg.TRAINER.COOP.N_CTX = 4
    cfg.TRAINER.COOP.CTX_INIT = "a photo of a"
    cfg.TRAINER.COOP.PREC = "fp32"
    cfg.OPTIM.NAME = "sgd"
    cfg.OPTIM.LR = LR
    cfg.OPTIM.MOMENTUM = MOMENTUM
    cfg.OPTIM.WEIGHT_DECAY = WEIGHT_DECAY
    cfg.OPTIM.WARMUP_EPOCH = 0
    cfg.OPTIM.LR_SCHEDULER = "cosine"
    cfg.OPTIM.MAX_EPOCH = 3
    cfg.TPU.DATA_PARALLEL = False
    assert cfg.OPTIM.GRAD_CLIP_NORM == 0.0  # the Dassl-trainer default

    orig_loader = coop_mod.load_clip_backbone
    coop_mod.load_clip_backbone = lambda model_cfg: (arch, params)
    try:
        with our_tokenizer_with(ref.bpe_path):
            trainer = build_trainer(cfg)
    finally:
        coop_mod.load_clip_backbone = orig_loader

    ctx0_ours = np.asarray(trainer.trainable["prompt_learner"]["ctx"],
                           np.float64)
    np.testing.assert_allclose(ctx0_ours, ctx0_ref, atol=1e-6)

    losses_ours = []
    for imgs, labels in batches:
        summary = trainer.train_step({
            "image": jnp.asarray(imgs),
            "label": jnp.asarray(labels.astype(np.int32)),
        })
        losses_ours.append(summary["loss"])
    np.testing.assert_allclose(losses_ours, losses_ref, rtol=1e-4, atol=1e-4)

    ctx1_ours = np.asarray(trainer.trainable["prompt_learner"]["ctx"],
                           np.float64)
    with torch.no_grad():
        ctx1_ref = cc.prompt_learner.ctx.detach().numpy().astype(np.float64)
    d_ours, d_ref = ctx1_ours - ctx0_ours, ctx1_ref - ctx0_ref
    scale = max(1e-8, float(np.max(np.abs(d_ref))))
    assert scale > 0.0
    np.testing.assert_allclose(
        d_ours, d_ref, atol=max(1e-7, 2e-3 * scale),
        err_msg="CoOp ctx trajectory diverges",
    )


# ===========================================================================
# IVLP training-trajectory golden (round 3): the multi-TENSOR trainable set
# — text ctx + deep text prompts living in the text transformer blocks +
# shallow/deep vision prompts — trained by plain (unclipped) SGD, matching
# the reference policy: ``requires_grad`` on for ``prompt_learner`` and
# every ``VPT`` name (/root/reference/trainers/independentVL.py:202-210),
# plain backward + step (``:253-256``).  Complements the CoOp golden (one
# tensor) with gradient flow through BOTH prompted towers' injections.
# ===========================================================================


def test_ivlp_train_trajectory_matches_reference(ref, tmp_path):
    from test_reference_golden_more import _tiny_clip

    N_CTX, T_DEPTH, V_DEPTH = 2, 2, 3
    design = {"trainer": "IVLP", "vision_depth": V_DEPTH,
              "language_depth": T_DEPTH, "vision_ctx": N_CTX,
              "language_ctx": N_CTX}
    model, final_sd, arch, params = _tiny_clip(
        ref, design, seed=17, vision_layers=4, text_layers=3)

    icfg = get_cfg_default()
    icfg.TRAINER.IVLP.N_CTX_TEXT = N_CTX
    icfg.TRAINER.IVLP.N_CTX_VISION = N_CTX
    icfg.TRAINER.IVLP.CTX_INIT = "a photo of"
    icfg.TRAINER.IVLP.PROMPT_DEPTH_TEXT = T_DEPTH
    icfg.TRAINER.IVLP.PROMPT_DEPTH_VISION = V_DEPTH
    icfg.INPUT.SIZE = (32, 32)
    with fp32_reference(), our_tokenizer_with(ref.bpe_path):
        torch.manual_seed(7)
        cc = ref.ivlp.CustomCLIP(icfg, GOLDEN_FED_CLASSNAMES, model)

    # reference freeze policy (independentVL.py:202-210): prompt_learner
    # names + every VPT name train; everything else is frozen
    for name, p in cc.named_parameters():
        p.requires_grad_("prompt_learner" in name or "VPT" in name)
    ref_train = [p for p in cc.parameters() if p.requires_grad]
    # ctx + (T_DEPTH-1) text-deep + visual.VPT + (V_DEPTH-1) vision-deep
    assert len(ref_train) == 1 + (T_DEPTH - 1) + 1 + (V_DEPTH - 1)
    opt = torch.optim.SGD(ref_train, lr=LR, momentum=MOMENTUM,
                          weight_decay=WEIGHT_DECAY)

    def torch_view():
        return {
            "prompt_learner": {
                "ctx": cc.prompt_learner.ctx,
                "deep_text": [
                    cc.text_encoder.transformer.resblocks[i].VPT_shallow
                    for i in range(1, T_DEPTH)
                ],
            },
            "vpt": {
                "shallow": cc.image_encoder.VPT,
                "deep": [
                    cc.image_encoder.transformer.resblocks[i].VPT_shallow
                    for i in range(1, V_DEPTH)
                ],
            },
        }

    with torch.no_grad():
        init_ref = _snap(torch_view())

    rng = np.random.default_rng(43)
    batches = [
        (
            rng.standard_normal((6, 32, 32, 3)).astype(np.float32) * 0.6,
            rng.integers(0, len(GOLDEN_FED_CLASSNAMES), 6).astype(np.int64),
        )
        for _ in range(STEPS)
    ]

    losses_ref = []
    cc.train()
    with fp32_reference():
        for imgs, labels in batches:
            loss = cc(torch.from_numpy(imgs).permute(0, 3, 1, 2),
                      torch.from_numpy(labels))
            opt.zero_grad()
            loss.backward()
            # every trainable leaf must actually receive gradient, or the
            # trajectory would not exercise the full injection path
            assert all(p.grad is not None for p in ref_train)
            opt.step()  # NO clip — independentVL.py:253-256
            losses_ref.append(float(loss.item()))

    # ---- our side: the REAL IVLP trainer over the converted weights ----
    import federated_multi_modal_tpu.trainers  # noqa: F401
    from federated_multi_modal_tpu.engine import build_trainer
    from federated_multi_modal_tpu.trainers import ivlp as ivlp_mod

    cfg = get_cfg_default()
    cfg.DATASET.ROOT = str(tmp_path / "data")
    cfg.DATASET.NAME = "GoldenFedSynthetic"
    cfg.MODEL.BACKBONE.NAME = "ViT-B/16"  # unused: loader patched
    cfg.INPUT.SIZE = (32, 32)
    cfg.INPUT.CANVAS_SIZE = 40
    cfg.OUTPUT_DIR = str(tmp_path / "out")
    cfg.SEED = 1
    cfg.VERBOSE = False
    cfg.TRAINER.NAME = "IVLP"
    cfg.TRAINER.IVLP.N_CTX_TEXT = N_CTX
    cfg.TRAINER.IVLP.N_CTX_VISION = N_CTX
    cfg.TRAINER.IVLP.CTX_INIT = "a photo of"
    cfg.TRAINER.IVLP.PROMPT_DEPTH_TEXT = T_DEPTH
    cfg.TRAINER.IVLP.PROMPT_DEPTH_VISION = V_DEPTH
    cfg.TRAINER.IVLP.PREC = "fp32"
    cfg.OPTIM.NAME = "sgd"
    cfg.OPTIM.LR = LR
    cfg.OPTIM.MOMENTUM = MOMENTUM
    cfg.OPTIM.WEIGHT_DECAY = WEIGHT_DECAY
    cfg.OPTIM.WARMUP_EPOCH = 0
    cfg.OPTIM.LR_SCHEDULER = "cosine"
    cfg.OPTIM.MAX_EPOCH = 3
    cfg.TPU.DATA_PARALLEL = False
    assert cfg.OPTIM.GRAD_CLIP_NORM == 0.0  # the Dassl-trainer default

    orig_loader = ivlp_mod.load_clip_backbone
    ivlp_mod.load_clip_backbone = lambda model_cfg: (arch, params)
    try:
        with our_tokenizer_with(ref.bpe_path):
            trainer = build_trainer(cfg)
    finally:
        ivlp_mod.load_clip_backbone = orig_loader

    # swap in the reference's (torch-random) initial prompts — ours are
    # jax-random; the trajectory must start from identical weights
    trainer.trainable = jax.tree.map(
        lambda a: jnp.asarray(np.asarray(a), jnp.float32), init_ref,
    )
    trainer.opt_state = trainer.tx.init(trainer.trainable)

    ours_leaves = jax.tree_util.tree_leaves(trainer.trainable)
    assert len(ours_leaves) == len(ref_train)
    assert sum(int(np.prod(x.shape)) for x in ours_leaves) == sum(
        p.numel() for p in ref_train)

    init_ours = _snap_tree(trainer.trainable)
    losses_ours = []
    for imgs, labels in batches:
        summary = trainer.train_step({
            "image": jnp.asarray(imgs),
            "label": jnp.asarray(labels.astype(np.int32)),
        })
        losses_ours.append(summary["loss"])
    np.testing.assert_allclose(losses_ours, losses_ref, rtol=1e-4, atol=1e-4)

    final_ours = _snap_tree(trainer.trainable)
    with torch.no_grad():
        final_ref = _snap(torch_view())

    paths = jax.tree_util.tree_flatten_with_path(init_ours)[0]
    flat_o0 = jax.tree_util.tree_leaves(init_ours)
    flat_o1 = jax.tree_util.tree_leaves(final_ours)
    flat_r0 = jax.tree_util.tree_leaves(init_ref)
    flat_r1 = jax.tree_util.tree_leaves(final_ref)
    assert len(flat_o0) == len(flat_r0) == len(flat_o1) == len(flat_r1)
    for (path, _), o0, o1, r0, r1 in zip(paths, flat_o0, flat_o1, flat_r0,
                                         flat_r1):
        name = jax.tree_util.keystr(path)
        np.testing.assert_allclose(
            o0, r0, atol=1e-6, err_msg=f"initial weights differ at {name}")
        d_ours, d_ref = o1 - o0, r1 - r0
        scale = max(1e-8, float(np.max(np.abs(d_ref))))
        assert scale > 1e-8, f"{name} never moved on the torch side"
        np.testing.assert_allclose(
            d_ours, d_ref, atol=max(1e-7, 2e-3 * scale),
            err_msg=f"IVLP trajectory diverges at {name} "
                    f"(|d_ref|max={scale:.3e})")


# ===========================================================================
# CoCoOp training-trajectory golden (round 3): gradients through the
# meta-net (image-conditioned context bias) and our BATCHED (B x n_cls)
# text pass vs the reference's per-image python loop
# (/root/reference/trainers/cocoop.py:147-162, 184-192) under plain
# (unclipped) SGD (``:266-269``).  The batched-vs-loop LOGITS golden
# already exists; this pins that autodiff through the batched redesign
# produces the reference's parameter trajectory.
# ===========================================================================


def test_cocoop_train_trajectory_matches_reference(ref, tmp_path):
    from test_reference_golden_more import _tiny_clip

    design = {"trainer": "CoCoOp", "vision_depth": 0, "language_depth": 0,
              "vision_ctx": 0, "language_ctx": 0}
    model, _, arch, params = _tiny_clip(ref, design, seed=23)

    ccfg = get_cfg_default()
    ccfg.TRAINER.COCOOP.N_CTX = 4
    ccfg.TRAINER.COCOOP.CTX_INIT = "a photo of a"
    ccfg.INPUT.SIZE = (32, 32)
    with fp32_reference(), our_tokenizer_with(ref.bpe_path):
        torch.manual_seed(13)
        cc = ref.cocoop.CustomCLIP(ccfg, GOLDEN_FED_CLASSNAMES, model)

    # reference freeze policy (cocoop.py:221-224): prompt_learner only
    # (which includes the meta-net)
    for name, p in cc.named_parameters():
        p.requires_grad_("prompt_learner" in name)
    ref_train = [p for p in cc.parameters() if p.requires_grad]
    assert len(ref_train) == 5  # ctx + 2 x (meta-net weight, bias)
    opt = torch.optim.SGD(ref_train, lr=LR, momentum=MOMENTUM,
                          weight_decay=WEIGHT_DECAY)

    def torch_view():
        mn = cc.prompt_learner.meta_net
        return {
            "prompt_learner": {
                "ctx": cc.prompt_learner.ctx,
                "meta_net": {
                    "linear1": {"w": mn.linear1.weight.T,
                                "b": mn.linear1.bias},
                    "linear2": {"w": mn.linear2.weight.T,
                                "b": mn.linear2.bias},
                },
            }
        }

    with torch.no_grad():
        init_ref = _snap(torch_view())

    rng = np.random.default_rng(47)
    batches = [
        (
            rng.standard_normal((5, 32, 32, 3)).astype(np.float32) * 0.6,
            rng.integers(0, len(GOLDEN_FED_CLASSNAMES), 5).astype(np.int64),
        )
        for _ in range(STEPS)
    ]

    losses_ref = []
    cc.train()
    with fp32_reference():
        for imgs, labels in batches:
            loss = cc(torch.from_numpy(imgs).permute(0, 3, 1, 2),
                      torch.from_numpy(labels))
            opt.zero_grad()
            loss.backward()
            assert all(p.grad is not None for p in ref_train)
            opt.step()  # NO clip — cocoop.py:266-269
            losses_ref.append(float(loss.item()))

    # ---- our side: the REAL CoCoOp trainer (batched text pass) ----
    import federated_multi_modal_tpu.trainers  # noqa: F401
    from federated_multi_modal_tpu.engine import build_trainer
    from federated_multi_modal_tpu.trainers import cocoop as cocoop_mod

    cfg = get_cfg_default()
    cfg.DATASET.ROOT = str(tmp_path / "data")
    cfg.DATASET.NAME = "GoldenFedSynthetic"
    cfg.MODEL.BACKBONE.NAME = "ViT-B/16"  # unused: loader patched
    cfg.INPUT.SIZE = (32, 32)
    cfg.INPUT.CANVAS_SIZE = 40
    cfg.OUTPUT_DIR = str(tmp_path / "out")
    cfg.SEED = 1
    cfg.VERBOSE = False
    cfg.TRAINER.NAME = "CoCoOp"
    cfg.TRAINER.COCOOP.N_CTX = 4
    cfg.TRAINER.COCOOP.CTX_INIT = "a photo of a"
    cfg.TRAINER.COCOOP.PREC = "fp32"
    cfg.OPTIM.NAME = "sgd"
    cfg.OPTIM.LR = LR
    cfg.OPTIM.MOMENTUM = MOMENTUM
    cfg.OPTIM.WEIGHT_DECAY = WEIGHT_DECAY
    cfg.OPTIM.WARMUP_EPOCH = 0
    cfg.OPTIM.LR_SCHEDULER = "cosine"
    cfg.OPTIM.MAX_EPOCH = 3
    cfg.TPU.DATA_PARALLEL = False
    assert cfg.OPTIM.GRAD_CLIP_NORM == 0.0  # the Dassl-trainer default

    orig_loader = cocoop_mod.load_clip_backbone
    cocoop_mod.load_clip_backbone = lambda model_cfg: (arch, params)
    try:
        with our_tokenizer_with(ref.bpe_path):
            trainer = build_trainer(cfg)
    finally:
        cocoop_mod.load_clip_backbone = orig_loader

    # swap in the reference's (torch-random) meta-net init; ctx is
    # embedding-derived and must already agree
    np.testing.assert_allclose(
        np.asarray(trainer.trainable["prompt_learner"]["ctx"], np.float64),
        init_ref["prompt_learner"]["ctx"], atol=1e-6)
    trainer.trainable = jax.tree.map(
        lambda a: jnp.asarray(np.asarray(a), jnp.float32), init_ref,
    )
    trainer.opt_state = trainer.tx.init(trainer.trainable)

    init_ours = _snap_tree(trainer.trainable)
    losses_ours = []
    for imgs, labels in batches:
        summary = trainer.train_step({
            "image": jnp.asarray(imgs),
            "label": jnp.asarray(labels.astype(np.int32)),
        })
        losses_ours.append(summary["loss"])
    np.testing.assert_allclose(losses_ours, losses_ref, rtol=1e-4, atol=1e-4)

    final_ours = _snap_tree(trainer.trainable)
    with torch.no_grad():
        final_ref = _snap(torch_view())

    paths = jax.tree_util.tree_flatten_with_path(init_ours)[0]
    flat_o0 = jax.tree_util.tree_leaves(init_ours)
    flat_o1 = jax.tree_util.tree_leaves(final_ours)
    flat_r0 = jax.tree_util.tree_leaves(init_ref)
    flat_r1 = jax.tree_util.tree_leaves(final_ref)
    assert len(flat_o0) == len(flat_r0) == len(flat_o1) == len(flat_r1)
    for (path, _), o0, o1, r0, r1 in zip(paths, flat_o0, flat_o1, flat_r0,
                                         flat_r1):
        name = jax.tree_util.keystr(path)
        np.testing.assert_allclose(
            o0, r0, atol=1e-6, err_msg=f"initial weights differ at {name}")
        d_ours, d_ref = o1 - o0, r1 - r0
        scale = max(1e-8, float(np.max(np.abs(d_ref))))
        assert scale > 1e-8, f"{name} never moved on the torch side"
        np.testing.assert_allclose(
            d_ours, d_ref, atol=max(1e-7, 2e-3 * scale),
            err_msg=f"CoCoOp trajectory diverges at {name} "
                    f"(|d_ref|max={scale:.3e})")


# ===========================================================================
# VPT training-trajectory golden (round 3): vision-only prompts (shallow +
# deep) trained against FIXED zero-shot text features
# (/root/reference/trainers/vpt.py:66-113) under plain (unclipped) SGD
# (``:186-190``); trainables are exactly the "VPT" names (``:139-145``).
# Completes trajectory coverage of all five trainable trainer families
# (MaPLe, CoOp, CoCoOp, IVLP, VPT).
# ===========================================================================


def test_vpt_train_trajectory_matches_reference(ref, tmp_path, monkeypatch):
    from test_reference_golden_more import _tiny_clip

    # the reference forward hard-codes ``.cuda()`` on the fixed embeddings
    # (vpt.py:103); neutralize the device cast like the harness does .half()
    monkeypatch.setattr(torch.Tensor, "cuda",
                        lambda self, *a, **k: self, raising=True)

    N_CTX, V_DEPTH = 2, 3
    design = {"trainer": "VPT", "vision_depth": V_DEPTH,
              "vision_ctx": N_CTX, "language_depth": 0, "language_ctx": 0}
    model, _, arch, params = _tiny_clip(
        ref, design, seed=29, vision_layers=4)

    vcfg = get_cfg_default()
    vcfg.TRAINER.VPT.N_CTX_VISION = N_CTX
    vcfg.TRAINER.VPT.PROMPT_DEPTH_VISION = V_DEPTH
    vcfg.INPUT.SIZE = (32, 32)
    with fp32_reference(), our_tokenizer_with(ref.bpe_path):
        torch.manual_seed(19)
        cc = ref.vpt.CustomCLIP(vcfg, GOLDEN_FED_CLASSNAMES, model)

    # reference freeze policy (vpt.py:139-145): exactly the VPT names
    for name, p in cc.named_parameters():
        p.requires_grad_("VPT" in name)
    ref_train = [p for p in cc.parameters() if p.requires_grad]
    assert len(ref_train) == 1 + (V_DEPTH - 1)  # visual.VPT + deep
    opt = torch.optim.SGD(ref_train, lr=LR, momentum=MOMENTUM,
                          weight_decay=WEIGHT_DECAY)

    def torch_view():
        return {
            "vpt": {
                "shallow": cc.image_encoder.VPT,
                "deep": [
                    cc.image_encoder.transformer.resblocks[i].VPT_shallow
                    for i in range(1, V_DEPTH)
                ],
            }
        }

    with torch.no_grad():
        init_ref = _snap(torch_view())

    rng = np.random.default_rng(53)
    batches = [
        (
            rng.standard_normal((6, 32, 32, 3)).astype(np.float32) * 0.6,
            rng.integers(0, len(GOLDEN_FED_CLASSNAMES), 6).astype(np.int64),
        )
        for _ in range(STEPS)
    ]

    losses_ref = []
    cc.train()
    with fp32_reference():
        for imgs, labels in batches:
            loss = cc(torch.from_numpy(imgs).permute(0, 3, 1, 2),
                      torch.from_numpy(labels), training=True)
            opt.zero_grad()
            loss.backward()
            assert all(p.grad is not None for p in ref_train)
            opt.step()  # NO clip — vpt.py:186-190
            losses_ref.append(float(loss.item()))

    # ---- our side: the REAL VPT trainer over the converted weights ----
    import federated_multi_modal_tpu.trainers  # noqa: F401
    from federated_multi_modal_tpu.engine import build_trainer
    from federated_multi_modal_tpu.trainers import vpt as vpt_mod

    cfg = get_cfg_default()
    cfg.DATASET.ROOT = str(tmp_path / "data")
    cfg.DATASET.NAME = "GoldenFedSynthetic"
    cfg.MODEL.BACKBONE.NAME = "ViT-B/16"  # unused: loader patched
    cfg.INPUT.SIZE = (32, 32)
    cfg.INPUT.CANVAS_SIZE = 40
    cfg.OUTPUT_DIR = str(tmp_path / "out")
    cfg.SEED = 1
    cfg.VERBOSE = False
    cfg.TRAINER.NAME = "VPT"
    cfg.TRAINER.VPT.N_CTX_VISION = N_CTX
    cfg.TRAINER.VPT.PROMPT_DEPTH_VISION = V_DEPTH
    cfg.TRAINER.VPT.PREC = "fp32"
    cfg.OPTIM.NAME = "sgd"
    cfg.OPTIM.LR = LR
    cfg.OPTIM.MOMENTUM = MOMENTUM
    cfg.OPTIM.WEIGHT_DECAY = WEIGHT_DECAY
    cfg.OPTIM.WARMUP_EPOCH = 0
    cfg.OPTIM.LR_SCHEDULER = "cosine"
    cfg.OPTIM.MAX_EPOCH = 3
    cfg.TPU.DATA_PARALLEL = False
    assert cfg.OPTIM.GRAD_CLIP_NORM == 0.0  # the Dassl-trainer default

    orig_loader = vpt_mod.load_clip_backbone
    vpt_mod.load_clip_backbone = lambda model_cfg: (arch, params)
    try:
        with our_tokenizer_with(ref.bpe_path):
            trainer = build_trainer(cfg)
    finally:
        vpt_mod.load_clip_backbone = orig_loader

    # fixed text features must agree before any training happens
    with torch.no_grad():
        tf_ref = cc.embeddings.return_fixed_embeddings().numpy()
    np.testing.assert_allclose(
        np.asarray(trainer.frozen["text_features"]), tf_ref,
        atol=2e-5, rtol=2e-5)

    # swap in the reference's (torch-random) initial prompts
    trainer.trainable = jax.tree.map(
        lambda a: jnp.asarray(np.asarray(a), jnp.float32), init_ref,
    )
    trainer.opt_state = trainer.tx.init(trainer.trainable)

    init_ours = _snap_tree(trainer.trainable)
    losses_ours = []
    for imgs, labels in batches:
        summary = trainer.train_step({
            "image": jnp.asarray(imgs),
            "label": jnp.asarray(labels.astype(np.int32)),
        })
        losses_ours.append(summary["loss"])
    np.testing.assert_allclose(losses_ours, losses_ref, rtol=1e-4, atol=1e-4)

    final_ours = _snap_tree(trainer.trainable)
    with torch.no_grad():
        final_ref = _snap(torch_view())

    paths = jax.tree_util.tree_flatten_with_path(init_ours)[0]
    flat_o0 = jax.tree_util.tree_leaves(init_ours)
    flat_o1 = jax.tree_util.tree_leaves(final_ours)
    flat_r0 = jax.tree_util.tree_leaves(init_ref)
    flat_r1 = jax.tree_util.tree_leaves(final_ref)
    assert len(flat_o0) == len(flat_r0) == len(flat_o1) == len(flat_r1)
    for (path, _), o0, o1, r0, r1 in zip(paths, flat_o0, flat_o1, flat_r0,
                                         flat_r1):
        name = jax.tree_util.keystr(path)
        np.testing.assert_allclose(
            o0, r0, atol=1e-6, err_msg=f"initial weights differ at {name}")
        d_ours, d_ref = o1 - o0, r1 - r0
        scale = max(1e-8, float(np.max(np.abs(d_ref))))
        assert scale > 1e-8, f"{name} never moved on the torch side"
        np.testing.assert_allclose(
            d_ours, d_ref, atol=max(1e-7, 2e-3 * scale),
            err_msg=f"VPT trajectory diverges at {name} "
                    f"(|d_ref|max={scale:.3e})")
