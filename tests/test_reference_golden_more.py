"""Round-2 extension of the reference-executing goldens: prompt learners
(CoOp end/middle/front + CSC, IVLP, VPT fixed embeddings), the zero-shot
template tables, the federated aggregator's scrub/validity math and the IID
partitioner — all asserted against the reference's OWN source executed from
/root/reference (see tests/reference_harness.py; nothing is copied).
"""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from reference_harness import (
    fp32_reference,
    load_reference,
    our_tokenizer_with,
    random_openai_sd,
)

from federated_multi_modal_tpu.config import get_cfg_default
from federated_multi_modal_tpu.models.clip_model import (
    encode_image,
    encode_text_embedded,
    encode_text_tokens,
)
from federated_multi_modal_tpu.models.params import (
    convert_torch_state_dict,
    infer_config_from_state_dict,
)
from federated_multi_modal_tpu.trainers.common import (
    assemble_prompts_end,
    assemble_prompts_positional,
    build_position_layout,
    build_prompt_constants,
    ctx_init_vectors,
)

ATOL = 2e-4
RTOL = 2e-4

CLASSNAMES = ["golden retriever", "dense residential", "parking lot",
              "thermal power plant", "forest"]


@pytest.fixture(scope="module")
def ref():
    return load_reference()


def _tiny_clip(ref, design, seed, **dims):
    """Reference CLIP (executed build_model) + our converted params, with a
    REAL-size vocab so the fixture tokenizer's ids embed correctly."""
    dims = dict(
        dict(embed_dim=32, vision_width=64, vision_layers=2, patch=16,
             resolution=32, text_width=64, text_layers=2, vocab=49408,
             ctx_len=77),
        **dims,
    )
    sd = random_openai_sd(seed=seed, **dims)
    with fp32_reference():
        model = ref.model.build_model(
            {k: v.clone() for k, v in sd.items()}, design).float().eval()
    final_sd = {k: v.detach().clone() for k, v in model.state_dict().items()}
    conv_sd = {k: v for k, v in final_sd.items() if "VPT" not in k}
    arch = infer_config_from_state_dict(conv_sd)
    params = convert_torch_state_dict(conv_sd, arch, dtype_policy=False)
    return model, final_sd, arch, params


# ---------------------------------------------------------------------------
# CoOp prompt learner: end / middle / front class-token positions + CSC
# (reference trainers/coop.py:63-183 executed)
# ---------------------------------------------------------------------------


def _coop_cfg(n_ctx, ctx_init="", csc=False, position="end"):
    cfg = get_cfg_default()
    cfg.TRAINER.COOP.N_CTX = n_ctx
    cfg.TRAINER.COOP.CTX_INIT = ctx_init
    cfg.TRAINER.COOP.CSC = csc
    cfg.TRAINER.COOP.CLASS_TOKEN_POSITION = position
    cfg.INPUT.SIZE = (32, 32)
    return cfg


@pytest.mark.parametrize("position", ["end", "middle", "front"])
def test_coop_prompt_positions_match_reference(ref, position):
    """Our static scatter layout (build_position_layout /
    assemble_prompts_positional) equals the reference PromptLearner's
    per-class python-loop assembly (trainers/coop.py:129-183) for every
    class-token position, with the SAME random ctx."""
    design = {"trainer": "CoOp", "vision_depth": 0, "language_depth": 0,
              "vision_ctx": 0, "language_ctx": 0}
    model, _, arch, params = _tiny_clip(ref, design, seed=11)
    n_ctx = 4
    with fp32_reference(), our_tokenizer_with(ref.bpe_path):
        torch.manual_seed(23)
        pl = ref.coop.PromptLearner(
            _coop_cfg(n_ctx, position=position), CLASSNAMES, model)
        prompts_ref = pl().detach().numpy()

        const = build_prompt_constants(
            params["text"], CLASSNAMES, " ".join(["X"] * n_ctx), n_ctx)
    assert const.name_lens == pl.name_lens
    layout = build_position_layout(
        position, len(CLASSNAMES), n_ctx, prompts_ref.shape[1],
        const.name_lens)
    ours = assemble_prompts_positional(
        jnp.asarray(pl.ctx.detach().numpy()), const.full_embedding, layout)
    np.testing.assert_allclose(np.asarray(ours), prompts_ref, atol=1e-6)


def test_coop_csc_and_ctx_init_match_reference(ref):
    """Class-specific contexts (CSC) assemble per-class rows (coop.py:87-94)
    and the ctx-init phrase path takes embedding[0, 1:1+n_ctx]
    (coop.py:76-83) — both vs the executed reference."""
    design = {"trainer": "CoOp", "vision_depth": 0, "language_depth": 0,
              "vision_ctx": 0, "language_ctx": 0}
    model, _, arch, params = _tiny_clip(ref, design, seed=12)
    with fp32_reference(), our_tokenizer_with(ref.bpe_path):
        torch.manual_seed(29)
        pl = ref.coop.PromptLearner(
            _coop_cfg(3, csc=True), CLASSNAMES, model)
        assert pl.ctx.shape == (len(CLASSNAMES), 3, 64)
        prompts_ref = pl().detach().numpy()
        const = build_prompt_constants(
            params["text"], CLASSNAMES, "X X X", 3)
        ours = assemble_prompts_end(
            jnp.asarray(pl.ctx.detach().numpy()),
            const.token_prefix, const.token_suffix)
        np.testing.assert_allclose(np.asarray(ours), prompts_ref, atol=1e-6)

        # ctx-init phrase: n_ctx is DERIVED from the phrase length
        pl2 = ref.coop.PromptLearner(
            _coop_cfg(16, ctx_init="a photo of a"), CLASSNAMES, model)
        ctx_ours = ctx_init_vectors(params["text"], "a photo of a", pl2.n_ctx)
        np.testing.assert_allclose(
            np.asarray(ctx_ours), pl2.ctx.detach().numpy(), atol=1e-6)


# ---------------------------------------------------------------------------
# VPT: fixed hand-crafted text embeddings (trainers/vpt.py:67-89 executed)
# ---------------------------------------------------------------------------


def test_vpt_fixed_embeddings_match_reference(ref):
    design = {"trainer": "VPT", "vision_depth": 2, "language_depth": 0,
              "vision_ctx": 2, "language_ctx": 0}
    model, _, arch, params = _tiny_clip(ref, design, seed=13)
    cfg = get_cfg_default()
    cfg.INPUT.SIZE = (32, 32)
    with fp32_reference(), our_tokenizer_with(ref.bpe_path):
        fe = ref.vpt.FixedEmbeddings(cfg, CLASSNAMES, model)
        feats_ref = fe.return_fixed_embeddings().detach().numpy()

        from federated_multi_modal_tpu.tokenizer import tokenize

        prompts = ["a photo of a " + n.replace("_", " ") + "."
                   for n in CLASSNAMES]
        tokens = jnp.asarray(tokenize(prompts))
    ours = encode_text_tokens(params["text"], arch, tokens)
    np.testing.assert_allclose(np.asarray(ours), feats_ref,
                               atol=ATOL, rtol=RTOL)


# ---------------------------------------------------------------------------
# IVLP: full CustomCLIP logits (prompt learner + both prompted towers +
# cosine head; trainers/independentVL.py:65-201 executed)
# ---------------------------------------------------------------------------


def test_ivlp_custom_clip_logits_match_reference(ref):
    v_depth, t_depth, n_ctx = 3, 2, 2
    design = {"trainer": "IVLP", "vision_depth": v_depth,
              "language_depth": t_depth, "vision_ctx": n_ctx,
              "language_ctx": n_ctx}
    model, final_sd, arch, params = _tiny_clip(
        ref, design, seed=14, vision_layers=4, text_layers=3)
    cfg = get_cfg_default()
    cfg.TRAINER.IVLP.N_CTX_TEXT = n_ctx
    cfg.TRAINER.IVLP.N_CTX_VISION = n_ctx
    cfg.TRAINER.IVLP.CTX_INIT = "a photo of"
    cfg.TRAINER.IVLP.PROMPT_DEPTH_TEXT = t_depth
    cfg.TRAINER.IVLP.PROMPT_DEPTH_VISION = v_depth
    cfg.INPUT.SIZE = (32, 32)
    rng = np.random.default_rng(14)
    imgs = rng.standard_normal((3, 32, 32, 3)).astype(np.float32)
    with fp32_reference(), our_tokenizer_with(ref.bpe_path):
        torch.manual_seed(31)
        cc = ref.ivlp.CustomCLIP(cfg, CLASSNAMES, model).eval()
        with torch.no_grad():
            logits_ref = cc(
                torch.from_numpy(imgs).permute(0, 3, 1, 2)).numpy()

        const = build_prompt_constants(
            params["text"], CLASSNAMES, "a photo of", n_ctx)
    prompts = assemble_prompts_end(
        jnp.asarray(cc.prompt_learner.ctx.detach().numpy()),
        const.token_prefix, const.token_suffix)
    txt_deep = [
        jnp.asarray(
            final_sd[f"transformer.resblocks.{i}.VPT_shallow"].numpy())
        for i in range(1, t_depth)
    ]
    vis_shallow = jnp.asarray(final_sd["visual.VPT"].numpy())
    vis_deep = [
        jnp.asarray(
            final_sd[f"visual.transformer.resblocks.{i}.VPT_shallow"].numpy())
        for i in range(1, v_depth)
    ]
    txt = encode_text_embedded(
        params["text"], arch, prompts, const.eot_index, deep_prompts=txt_deep)
    img = encode_image(
        params["visual"], arch, jnp.asarray(imgs),
        shallow_prompts=vis_shallow, deep_prompts=vis_deep)
    from federated_multi_modal_tpu.ops.primitives import l2_normalize

    scale = float(np.exp(final_sd["logit_scale"].numpy()))
    logits = scale * l2_normalize(img) @ l2_normalize(txt).T
    np.testing.assert_allclose(np.asarray(logits), logits_ref,
                               atol=5e-4, rtol=5e-4)


# ---------------------------------------------------------------------------
# Zero-shot template tables (trainers/zsclip.py:13-29 +
# trainers/imagenet_templates.py executed; ours must be a superset that
# agrees on every reference key)
# ---------------------------------------------------------------------------


def test_zsclip_templates_match_reference(ref):
    from federated_multi_modal_tpu.trainers import templates

    for name, tpl in ref.zsclip.CUSTOM_TEMPLATES.items():
        assert templates.CUSTOM_TEMPLATES.get(name) == tpl, name
    assert templates.IMAGENET_TEMPLATES == ref.imagenet_templates.IMAGENET_TEMPLATES
    assert (templates.IMAGENET_TEMPLATES_SELECT
            == ref.imagenet_templates.IMAGENET_TEMPLATES_SELECT)


# ---------------------------------------------------------------------------
# Federated aggregator math (trainers/maple_fed.py:309-325 executed via
# duck-typed self — the methods are pure functions of their arguments)
# ---------------------------------------------------------------------------


def test_fedavg_scrub_matches_reference(ref):
    """safe_average_trees == the reference's safe_average_weights: stack
    fp32, nan->0 / inf->±1e4, mean over clients, cast back."""
    from federated_multi_modal_tpu.trainers.maple_fed import safe_average_trees

    rng = np.random.default_rng(7)
    shapes = {"a": (4, 3), "b": (2,), "c": (1, 2, 2)}
    dicts = []
    for c in range(3):
        d = {k: rng.standard_normal(s).astype(np.float32)
             for k, s in shapes.items()}
        dicts.append(d)
    # poison: NaN in one client's 'a', +inf in another's 'b', -inf in 'c'
    dicts[0]["a"][1, 2] = np.nan
    dicts[1]["b"][0] = np.inf
    dicts[2]["c"][0, 1, 0] = -np.inf

    duck = object.__new__(ref.maple_fed.MaPLeFederated)
    torch_dicts = [
        {k: torch.from_numpy(v.copy()) for k, v in d.items()} for d in dicts
    ]
    avg_ref = ref.maple_fed.MaPLeFederated.safe_average_weights(
        duck, torch_dicts, valid_clients=list(range(3)))

    trees = [{k: jnp.asarray(v) for k, v in d.items()} for d in dicts]
    avg_ours = safe_average_trees(trees)
    for k in shapes:
        # the reference hard-casts to .half(); compare at fp16 resolution
        np.testing.assert_allclose(
            np.asarray(avg_ours[k], dtype=np.float16),
            avg_ref[k].numpy(),
            atol=1e-3,
        )


def test_weight_validity_gate_matches_reference(ref):
    """tree_finite == the reference's check_weights_valid over the same
    poisoned state dicts."""
    from federated_multi_modal_tpu.engine.trainer import tree_finite

    duck = object.__new__(ref.maple_fed.MaPLeFederated)
    check = ref.maple_fed.MaPLeFederated.check_weights_valid

    clean = {"w": torch.randn(3, 3), "b": torch.randn(3)}
    nan_d = {"w": torch.randn(3, 3), "b": torch.tensor([1.0, np.nan, 0.0])}
    inf_d = {"w": torch.full((2, 2), np.inf), "b": torch.randn(2)}
    for d, expect in ((clean, True), (nan_d, False), (inf_d, False)):
        assert check(duck, d) is expect
        tree = {k: jnp.asarray(v.numpy()) for k, v in d.items()}
        assert bool(tree_finite(tree)) is expect


def test_iid_partition_matches_reference(ref):
    """Same chunk arithmetic as the reference partitioner
    (trainers/data_partition.py:5-26): floor-size chunks, remainder to the
    LAST client, shared val/test."""
    import random as pyrandom
    import types as pytypes

    from federated_multi_modal_tpu.data.partition import partition_dataset_iid

    items = [f"item{i}" for i in range(23)]
    ds = pytypes.SimpleNamespace(train_x=items, val=["v"], test=["t"])

    ref_parts = ref.data_partition.partition_dataset_iid(ds, num_clients=4)
    ours = partition_dataset_iid(ds, num_clients=4, seed=0)

    assert [len(p[0]) for p in ref_parts] == [len(p["train_x"]) for p in ours]
    assert sorted(sum((p["train_x"] for p in ours), [])) == sorted(items)
    for p in ours:
        assert p["val"] == ["v"] and p["test"] == ["t"]
    # same shuffle semantics under the same seeded generator: seeding the
    # global random module reproduces the reference's random.shuffle order
    pyrandom.seed(5)
    ref_parts2 = ref.data_partition.partition_dataset_iid(ds, num_clients=4)
    ours2 = partition_dataset_iid(ds, num_clients=4, seed=5)
    assert [p[0] for p in ref_parts2] == [p["train_x"] for p in ours2]
