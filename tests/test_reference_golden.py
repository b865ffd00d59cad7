"""Goldens that EXECUTE the reference's own source (clip/model.py,
clip/simple_tokenizer.py, trainers/maple.py, trainers/cocoop.py) and assert
our functional JAX rebuild produces the same numbers.

Unlike the inline-torch parity tests (test_ops_parity.py, test_models.py),
these cannot encode the same misunderstanding twice: the "theirs" side is
the reference repository's code, imported by file path and run on CPU in
fp32 (see tests/reference_harness.py).
"""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from reference_harness import (
    fp32_reference,
    load_reference,
    our_tokenizer_with,
    random_openai_sd,
)

from federated_multi_modal_tpu.models.clip_model import (
    encode_image,
    encode_text_embedded,
    encode_text_tokens,
)
from federated_multi_modal_tpu.models.params import (
    convert_torch_state_dict,
    infer_config_from_state_dict,
)

ATOL = 2e-4
RTOL = 2e-4


@pytest.fixture(scope="module")
def ref():
    return load_reference()


# ---------------------------------------------------------------------------
# tokenizer: byte-level merge order vs the reference SimpleTokenizer
# ---------------------------------------------------------------------------


def test_tokenizer_matches_reference(ref):
    """Our BPE encode() equals the reference's SimpleTokenizer executed from
    /root/reference/clip/simple_tokenizer.py with the same (full-size,
    600-real-merge) table — multi-merge cascades, punctuation, numerals,
    casing, specials (VERDICT r1 task 7)."""
    theirs = ref.simple_tokenizer.SimpleTokenizer(bpe_path=ref.bpe_path)
    texts = [
        "a photo of a golden retriever.",
        "a centered satellite photo of permanent crop land.",
        "dense residential area, parking lot & railway station!",
        "itap of a thermal power plant",
        "the 12 ships sail 345 km",
        "A PHOTO OF A Dog",  # lowercased by both
        "storage tanks; storage tank",
        "photo photo photo",
        "xqzjv unseenword blorp",  # no learned merges apply
        "<|startoftext|> hi <|endoftext|>",
        "it's the dog's toy, they're odd",
    ]
    with our_tokenizer_with(ref.bpe_path) as ours:
        assert not ours.fallback_mode
        for t in texts:
            assert ours.encode(t) == theirs.encode(t), t
        # specials land at the OpenAI ids in both
        assert theirs.encoder["<|startoftext|>"] == 49406
        assert theirs.encoder["<|endoftext|>"] == 49407
        # full tokenize() contract incl. SOT/EOT + padding
        from federated_multi_modal_tpu.tokenizer import tokenize

        ours_arr = tokenize(texts)
        theirs_arr = ref.clip.tokenize(texts).numpy()
        np.testing.assert_array_equal(ours_arr, theirs_arr)


def test_tokenizer_merge_cascade_depth(ref):
    """The fixture's learned merges actually cascade (multi-merge words),
    so the equality above is not vacuous."""
    theirs = ref.simple_tokenizer.SimpleTokenizer(bpe_path=ref.bpe_path)
    # a word from the training list collapses to far fewer tokens than chars
    toks = theirs.encode("residential")
    assert len(toks) < len("residential") // 2


# ---------------------------------------------------------------------------
# build_model shape inference
# ---------------------------------------------------------------------------


@pytest.mark.parametrize(
    "dims",
    [
        dict(embed_dim=64, vision_width=64, vision_layers=2, patch=8,
             resolution=32, text_width=64, text_layers=2, vocab=100,
             ctx_len=16),
        dict(embed_dim=32, vision_width=128, vision_layers=3, patch=16,
             resolution=48, text_width=128, text_layers=1, vocab=64,
             ctx_len=12),
    ],
)
def test_build_model_shape_inference_matches(ref, dims):
    """Our infer_config_from_state_dict agrees with the dimensions the
    reference's build_model (clip/model.py:750-776) actually constructs."""
    sd = random_openai_sd(**dims, seed=0)
    design = {"trainer": "CoOp", "vision_depth": 0, "language_depth": 0,
              "vision_ctx": 0, "language_ctx": 0}
    with fp32_reference():
        model = ref.model.build_model({k: v.clone() for k, v in sd.items()},
                                      design)
    cfg = infer_config_from_state_dict(sd)
    assert cfg.vision_width == model.visual.conv1.weight.shape[0]
    assert cfg.vision_layers == len(model.visual.transformer.resblocks)
    assert cfg.vision_patch_size == model.visual.conv1.kernel_size[0]
    assert cfg.image_resolution == model.visual.input_resolution
    assert cfg.embed_dim == model.text_projection.shape[1]
    assert cfg.context_length == model.positional_embedding.shape[0]
    assert cfg.vocab_size == model.token_embedding.weight.shape[0]
    assert cfg.transformer_width == model.ln_final.weight.shape[0]
    assert cfg.transformer_layers == len(model.transformer.resblocks)
    assert cfg.transformer_heads == model.transformer.resblocks[0].attn.num_heads


# ---------------------------------------------------------------------------
# full towers per design mode
# ---------------------------------------------------------------------------


def _build(ref, design, seed=0, **dims):
    torch.manual_seed(seed)
    sd = random_openai_sd(seed=seed, **dims)
    with fp32_reference():
        model = ref.model.build_model({k: v.clone() for k, v in sd.items()},
                                      design).eval()
    final_sd = {k: v.detach().clone() for k, v in model.state_dict().items()}
    conv_sd = {k: v for k, v in final_sd.items() if "VPT" not in k}
    cfg = infer_config_from_state_dict(conv_sd)
    params = convert_torch_state_dict(conv_sd, cfg, dtype_policy=False)
    return model, final_sd, cfg, params


def _rand_tokens(rng, b, ctx_len, vocab):
    """Random token rows whose argmax (EOT pool position) is unique."""
    toks = rng.integers(1, vocab - 1, (b, ctx_len))
    for i in range(b):
        toks[i, rng.integers(2, ctx_len)] = vocab - 1
    return toks.astype(np.int64)


def test_coop_towers_match_reference(ref):
    """CoOp design (plain ResidualAttentionBlock): encode_image and
    encode_text of the executed reference CLIP vs our towers."""
    design = {"trainer": "CoOp", "vision_depth": 0, "language_depth": 0,
              "vision_ctx": 0, "language_ctx": 0}
    model, _, cfg, params = _build(
        ref, design, seed=0, embed_dim=64, vision_width=64, vision_layers=2,
        patch=8, resolution=32, text_width=64, text_layers=2, vocab=100,
        ctx_len=16)
    rng = np.random.default_rng(0)
    imgs = rng.standard_normal((3, 32, 32, 3)).astype(np.float32)
    toks = _rand_tokens(rng, 4, 16, 100)
    with fp32_reference(), torch.no_grad():
        img_ref = model.encode_image(
            torch.from_numpy(imgs).permute(0, 3, 1, 2)).numpy()
        txt_ref = model.encode_text(torch.from_numpy(toks)).numpy()
    img_got = np.asarray(encode_image(params["visual"], cfg, jnp.asarray(imgs)))
    txt_got = np.asarray(
        encode_text_tokens(params["text"], cfg, jnp.asarray(toks.astype(np.int32))))
    np.testing.assert_allclose(img_got, img_ref, atol=ATOL, rtol=RTOL)
    np.testing.assert_allclose(txt_got, txt_ref, atol=ATOL, rtol=RTOL)


def test_vpt_vision_tower_matches_reference(ref):
    """VPT design: the executed reference VisionTransformer appends its
    learned shallow VPT tokens and per-layer deep prompts replace the tail
    (clip/model.py:437-441, 239-266); our encode_image must match with the
    same extracted prompt parameters."""
    depth, n_ctx = 3, 2
    design = {"trainer": "VPT", "vision_depth": depth, "language_depth": 0,
              "vision_ctx": n_ctx, "language_ctx": 0}
    model, final_sd, cfg, params = _build(
        ref, design, seed=1, embed_dim=64, vision_width=64, vision_layers=4,
        patch=8, resolution=32, text_width=64, text_layers=2, vocab=100,
        ctx_len=16)
    shallow = final_sd["visual.VPT"].numpy()
    deep = []
    for i in range(1, depth):
        deep.append(
            final_sd[f"visual.transformer.resblocks.{i}.VPT_shallow"].numpy())
    rng = np.random.default_rng(1)
    imgs = rng.standard_normal((2, 32, 32, 3)).astype(np.float32)
    with fp32_reference(), torch.no_grad():
        img_ref = model.encode_image(
            torch.from_numpy(imgs).permute(0, 3, 1, 2)).numpy()
        txt_ref = model.encode_text(
            torch.from_numpy(_rand_tokens(rng, 2, 16, 100))).numpy()
    img_got = np.asarray(encode_image(
        params["visual"], cfg, jnp.asarray(imgs),
        shallow_prompts=jnp.asarray(shallow),
        deep_prompts=[jnp.asarray(d) for d in deep]))
    np.testing.assert_allclose(img_got, img_ref, atol=ATOL, rtol=RTOL)
    assert np.isfinite(txt_ref).all()  # language_depth=0 text path runs


def test_ivlp_towers_match_reference(ref):
    """IVLP design: independent per-layer prompts on BOTH branches
    (clip/model.py:200-266); text injection replaces [1:1+n_ctx]."""
    v_depth, t_depth, n_ctx = 3, 2, 2
    design = {"trainer": "IVLP", "vision_depth": v_depth,
              "language_depth": t_depth, "vision_ctx": n_ctx,
              "language_ctx": n_ctx}
    model, final_sd, cfg, params = _build(
        ref, design, seed=2, embed_dim=64, vision_width=64, vision_layers=4,
        patch=8, resolution=32, text_width=64, text_layers=3, vocab=100,
        ctx_len=16)
    vis_shallow = final_sd["visual.VPT"].numpy()
    vis_deep = [
        final_sd[f"visual.transformer.resblocks.{i}.VPT_shallow"].numpy()
        for i in range(1, v_depth)
    ]
    txt_deep = [
        final_sd[f"transformer.resblocks.{i}.VPT_shallow"].numpy()
        for i in range(1, t_depth)
    ]
    rng = np.random.default_rng(2)
    imgs = rng.standard_normal((2, 32, 32, 3)).astype(np.float32)
    toks = _rand_tokens(rng, 3, 16, 100)
    with fp32_reference(), torch.no_grad():
        img_ref = model.encode_image(
            torch.from_numpy(imgs).permute(0, 3, 1, 2)).numpy()
        txt_ref = model.encode_text(torch.from_numpy(toks)).numpy()
    img_got = np.asarray(encode_image(
        params["visual"], cfg, jnp.asarray(imgs),
        shallow_prompts=jnp.asarray(vis_shallow),
        deep_prompts=[jnp.asarray(d) for d in vis_deep]))
    # text: embed + EOT pooling with per-layer injection
    from federated_multi_modal_tpu.models.clip_model import embed_tokens

    x = embed_tokens(params["text"], jnp.asarray(toks.astype(np.int32)))
    eot = jnp.argmax(jnp.asarray(toks.astype(np.int32)), axis=-1)
    txt_got = np.asarray(encode_text_embedded(
        params["text"], cfg, x, eot,
        deep_prompts=[jnp.asarray(d) for d in txt_deep]))
    np.testing.assert_allclose(img_got, img_ref, atol=ATOL, rtol=RTOL)
    np.testing.assert_allclose(txt_got, txt_ref, atol=ATOL, rtol=RTOL)


# ---------------------------------------------------------------------------
# MaPLe: full CustomCLIP (prompt learner + both encoders + loss) vs the
# executed reference trainers/maple.py (captions off — documented deviation)
# ---------------------------------------------------------------------------

CLASSNAMES = ["golden retriever", "forest", "parking lot", "river delta"]


def build_maple_pair(ref, classnames):
    """(reference CustomCLIP, our converted trees) over the same weights.
    d_text=512 / d_vis=768 are REQUIRED by the reference prompt learner's
    hard-coded projection dims (trainers/maple.py:111-125).  ``classnames``
    parameterizes the prompt-learner vocabulary (the federated-round golden
    needs the aggregator's sorted-union order)."""
    from federated_multi_modal_tpu.config import get_cfg_default

    design = {"trainer": "MaPLe", "vision_depth": 0, "language_depth": 0,
              "vision_ctx": 0, "language_ctx": 0, "maple_length": 2}
    torch.manual_seed(3)
    sd = random_openai_sd(
        embed_dim=64, vision_width=768, vision_layers=2, patch=32,
        resolution=64, text_width=512, text_layers=3, vocab=49408,
        ctx_len=77, seed=3)
    cfg = get_cfg_default()
    cfg.TRAINER.MAPLE.N_CTX = 2
    cfg.TRAINER.MAPLE.PROMPT_DEPTH = 3
    cfg.TRAINER.MAPLE.CTX_INIT = "a photo of a"
    cfg.INPUT.SIZE = (64, 64)
    with fp32_reference(), our_tokenizer_with(ref.bpe_path):
        clip_model = ref.model.build_model(
            {k: v.clone() for k, v in sd.items()}, design).float().eval()
        torch.manual_seed(7)
        cc = ref.maple.CustomCLIP(cfg, classnames, clip_model)

    arch = infer_config_from_state_dict(sd)
    params = convert_torch_state_dict(sd, arch, dtype_policy=False)

    # map the reference prompt-learner parameters into our tree layout
    # (tools/convert_reference_checkpoint.py does the same by name)
    rpl = cc.prompt_learner

    def lin(mod):
        return {"w": jnp.asarray(mod.weight.detach().numpy().T),
                "b": jnp.asarray(mod.bias.detach().numpy())}

    pl = {
        "ctx": jnp.asarray(rpl.ctx.detach().numpy()),
        "proj_lang_to_vis": lin(rpl.proj_lang_to_vis),
        "proj_vis_to_lang": lin(rpl.proj_vis_to_lang),
        "text_deep_params": [
            jnp.asarray(p.detach().numpy())
            for p in rpl.compound_prompts_text_parameters
        ],
        "vis_deep_params": [
            jnp.asarray(p.detach().numpy())
            for p in rpl.visual_deep_prompts_parameters
        ],
        "couplers": [lin(m) for m in rpl.compound_prompt_projections],
    }
    const = {
        "token_prefix": jnp.asarray(rpl.token_prefix.detach().numpy()),
        "token_suffix": jnp.asarray(rpl.token_suffix.detach().numpy()),
        "eot_index": jnp.asarray(
            rpl.tokenized_prompts.argmax(dim=-1).numpy().astype(np.int32)),
        "logit_scale": float(cc.logit_scale.detach().item()),
    }
    return cc, arch, params, pl, const


@pytest.fixture(scope="module")
def maple_pair(ref):
    return build_maple_pair(ref, CLASSNAMES)


def test_maple_prompt_constants_match_reference(ref, maple_pair):
    """Our tokenizer + embedding pipeline (build_prompt_constants) produces
    the same token_prefix/token_suffix/EOT the reference registered."""
    from federated_multi_modal_tpu.trainers.common import (
        build_prompt_constants,
        ctx_init_vectors,
    )

    cc, arch, params, pl, const = maple_pair
    with our_tokenizer_with(ref.bpe_path):
        ours = build_prompt_constants(
            params["text"], CLASSNAMES, "a photo of a", 2)
        ctx = ctx_init_vectors(params["text"], "a photo of a", 2)
    np.testing.assert_allclose(
        np.asarray(ours.token_prefix), np.asarray(const["token_prefix"]),
        atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(ours.token_suffix), np.asarray(const["token_suffix"]),
        atol=1e-6)
    np.testing.assert_array_equal(
        np.asarray(ours.eot_index), np.asarray(const["eot_index"]))
    np.testing.assert_allclose(
        np.asarray(ctx), cc.prompt_learner.ctx.detach().numpy(), atol=1e-6)


def _our_maple_forward(arch, params, pl, const, imgs, depth=3):
    from federated_multi_modal_tpu.ops.primitives import l2_normalize
    from federated_multi_modal_tpu.trainers.maple import maple_prompts

    prompts, shared_ctx, text_deep, vis_deep = maple_prompts(
        pl, const["token_prefix"], const["token_suffix"], depth)
    txt = encode_text_embedded(
        params["text"], arch, prompts, const["eot_index"],
        deep_prompts=text_deep)
    img = encode_image(
        params["visual"], arch, jnp.asarray(imgs),
        shallow_prompts=shared_ctx, deep_prompts=vis_deep)
    img_n, txt_n = l2_normalize(img), l2_normalize(txt)
    scale = min(np.exp(const["logit_scale"]), 100.0)
    return img_n, txt_n, scale * img_n @ txt_n.T


def test_maple_custom_clip_logits_match_reference(maple_pair):
    cc, arch, params, pl, const = maple_pair
    rng = np.random.default_rng(4)
    imgs = rng.standard_normal((3, 64, 64, 3)).astype(np.float32)
    cc.eval()
    with fp32_reference(), torch.no_grad():
        logits_ref = cc(torch.from_numpy(imgs).permute(0, 3, 1, 2)).numpy()
    _, _, logits = _our_maple_forward(arch, params, pl, const, imgs)
    np.testing.assert_allclose(np.asarray(logits), logits_ref,
                               atol=5e-4, rtol=5e-4)


def test_maple_custom_clip_loss_matches_reference(maple_pair):
    """Training loss: CE + 0.5 * (1 - cos(img, txt[label]))
    (trainers/maple.py:349-372), executed from the reference."""
    cc, arch, params, pl, const = maple_pair
    rng = np.random.default_rng(5)
    imgs = rng.standard_normal((4, 64, 64, 3)).astype(np.float32)
    labels = np.array([0, 2, 1, 3])
    cc.train()
    with fp32_reference(), torch.no_grad():
        loss_ref = cc(torch.from_numpy(imgs).permute(0, 3, 1, 2),
                      torch.from_numpy(labels)).item()
    cc.eval()
    img_n, txt_n, logits = _our_maple_forward(arch, params, pl, const, imgs)
    import optax

    ce = optax.softmax_cross_entropy_with_integer_labels(
        jnp.asarray(logits), jnp.asarray(labels)).mean()
    cos = jnp.sum(img_n * txt_n[jnp.asarray(labels)], axis=-1).mean()
    total = float(ce + 0.5 * (1.0 - cos))
    assert abs(total - loss_ref) < 5e-4


def test_maple_soft_label_kl_loss_matches_reference(maple_pair):
    """KL path for soft labels (trainers/maple.py:356-360)."""
    cc, arch, params, pl, const = maple_pair
    rng = np.random.default_rng(6)
    imgs = rng.standard_normal((3, 64, 64, 3)).astype(np.float32)
    soft = rng.dirichlet(np.ones(4), size=3).astype(np.float32)
    cc.train()
    with fp32_reference(), torch.no_grad():
        loss_ref = cc(torch.from_numpy(imgs).permute(0, 3, 1, 2),
                      torch.from_numpy(soft)).item()
    cc.eval()
    img_n, txt_n, logits = _our_maple_forward(arch, params, pl, const, imgs)
    target = jnp.clip(jnp.asarray(soft), 1e-8, None)
    logp = jax.nn.log_softmax(jnp.asarray(logits), axis=1)
    # torch F.kl_div(log_probs, target, 'batchmean') =
    #   sum(target * (log(target) - log_probs)) / B
    kl = jnp.sum(target * (jnp.log(target) - logp)) / soft.shape[0]
    txt_sel = jnp.asarray(soft) @ txt_n
    cos = jnp.sum(
        img_n * txt_sel
        / jnp.linalg.norm(txt_sel, axis=-1, keepdims=True), axis=-1).mean()
    # torch cosine_similarity normalizes BOTH args (img_n already unit)
    total = float(kl + 0.5 * (1.0 - cos))
    assert abs(total - loss_ref) < 5e-4


# ---------------------------------------------------------------------------
# CoCoOp: batched (B*n_cls) text pass == the reference's per-image loop
# ---------------------------------------------------------------------------


def test_cocoop_batched_equals_reference_loop(ref):
    """Our single (B*n_cls) conditional text pass is mathematically
    identical to the reference's per-image text-encoder loop
    (trainers/cocoop.py:184-192), executed from the reference
    (VERDICT r1 task 5)."""
    from federated_multi_modal_tpu.config import get_cfg_default
    from federated_multi_modal_tpu.ops.primitives import l2_normalize
    from federated_multi_modal_tpu.trainers.common import apply_linear

    design = {"trainer": "CoCoOp", "vision_depth": 0, "language_depth": 0,
              "vision_ctx": 0, "language_ctx": 0}
    torch.manual_seed(11)
    sd = random_openai_sd(
        embed_dim=64, vision_width=64, vision_layers=2, patch=8,
        resolution=32, text_width=64, text_layers=2, vocab=49408,
        ctx_len=77, seed=11)
    cfg = get_cfg_default()
    cfg.TRAINER.COCOOP.N_CTX = 4
    cfg.TRAINER.COCOOP.CTX_INIT = ""
    cfg.TRAINER.COCOOP.PREC = "fp32"
    cfg.INPUT.SIZE = (32, 32)
    with fp32_reference():
        clip_model = ref.model.build_model(
            {k: v.clone() for k, v in sd.items()}, design).float().eval()
        torch.manual_seed(13)
        cc = ref.cocoop.CustomCLIP(cfg, CLASSNAMES, clip_model).eval()

    arch = infer_config_from_state_dict(sd)
    params = convert_torch_state_dict(sd, arch, dtype_policy=False)

    rng = np.random.default_rng(12)
    imgs = rng.standard_normal((3, 32, 32, 3)).astype(np.float32)
    with fp32_reference(), torch.no_grad():
        logits_ref = cc(torch.from_numpy(imgs).permute(0, 3, 1, 2)).numpy()

    rpl = cc.prompt_learner
    pl = {
        "ctx": jnp.asarray(rpl.ctx.detach().numpy()),
        "meta_net": {
            "linear1": {
                "w": jnp.asarray(rpl.meta_net.linear1.weight.detach().numpy().T),
                "b": jnp.asarray(rpl.meta_net.linear1.bias.detach().numpy()),
            },
            "linear2": {
                "w": jnp.asarray(rpl.meta_net.linear2.weight.detach().numpy().T),
                "b": jnp.asarray(rpl.meta_net.linear2.bias.detach().numpy()),
            },
        },
    }
    prefix = jnp.asarray(rpl.token_prefix.detach().numpy())
    suffix = jnp.asarray(rpl.token_suffix.detach().numpy())
    eot_1 = jnp.asarray(
        rpl.tokenized_prompts.argmax(dim=-1).numpy().astype(np.int32))
    n_cls, n_ctx, ctx_dim = len(CLASSNAMES), 4, arch.transformer_width

    # our batched computation (trainers/cocoop.py logits_fn shape-for-shape)
    img = encode_image(params["visual"], arch, jnp.asarray(imgs))
    img_n = l2_normalize(img)
    h = jax.nn.relu(apply_linear(pl["meta_net"]["linear1"], img_n))
    bias = apply_linear(pl["meta_net"]["linear2"], h)
    ctx_shift = pl["ctx"][None] + bias[:, None, :]
    B = imgs.shape[0]
    prefix_b = jnp.broadcast_to(prefix[None], (B,) + prefix.shape)
    suffix_b = jnp.broadcast_to(suffix[None], (B,) + suffix.shape)
    ctx_b = jnp.broadcast_to(
        ctx_shift[:, None].astype(prefix.dtype), (B, n_cls, n_ctx, ctx_dim))
    prompts = jnp.concatenate([prefix_b, ctx_b, suffix_b], axis=2)
    prompts = prompts.reshape(B * n_cls, arch.context_length, ctx_dim)
    eot = jnp.tile(eot_1, B)
    txt = encode_text_embedded(params["text"], arch, prompts, eot)
    txt_n = l2_normalize(txt).reshape(B, n_cls, -1)
    scale = np.exp(float(sd["logit_scale"]))
    logits = scale * jnp.einsum("bd,bcd->bc", img_n, txt_n)

    np.testing.assert_allclose(np.asarray(logits), logits_ref,
                               atol=5e-4, rtol=5e-4)


# ---------------------------------------------------------------------------
# ModifiedResNet tower + plain CLIP.forward, executed from the reference
# ---------------------------------------------------------------------------


def test_resnet_tower_and_clip_forward_match_reference(ref):
    """RN path: construct the reference CLIP with a tuple vision_layers
    (ModifiedResNet + AttentionPool2d), round-trip its state dict through
    the reference's own build_model (shape inference for ResNet,
    clip/model.py:763-771), convert, and compare encode_image /
    encode_text / the full CLIP.forward logits."""
    from federated_multi_modal_tpu.models.clip_model import (
        cosine_logits,
        encode_image_auto,
    )
    from federated_multi_modal_tpu.ops.primitives import l2_normalize

    design = {"trainer": "CoOp", "vision_depth": 0, "language_depth": 0,
              "vision_ctx": 0, "language_ctx": 0}
    torch.manual_seed(21)
    with fp32_reference():
        built = ref.model.CLIP(
            64,            # embed_dim
            64,            # image_resolution
            (1, 1, 1, 1),  # vision_layers (tuple -> ModifiedResNet)
            32,            # vision_width
            None,          # vision_patch_size
            16,            # context_length
            100,           # vocab_size
            64,            # transformer_width
            1,             # transformer_heads
            2,             # transformer_layers
            design,
        ).float().eval()
        sd = {k: v.detach().clone() for k, v in built.state_dict().items()}
        model = ref.model.build_model(
            {k: v.clone() for k, v in sd.items()}, design).float().eval()

    cfg = infer_config_from_state_dict(sd)
    assert cfg.vision_layers == (1, 1, 1, 1)
    assert not cfg.is_vit
    assert cfg.image_resolution == 64
    params = convert_torch_state_dict(sd, cfg, dtype_policy=False)

    rng = np.random.default_rng(23)
    imgs = rng.standard_normal((2, 64, 64, 3)).astype(np.float32)
    toks = _rand_tokens(rng, 3, 16, 100)
    with fp32_reference(), torch.no_grad():
        img_ref = model.encode_image(
            torch.from_numpy(imgs).permute(0, 3, 1, 2)).numpy()
        txt_ref = model.encode_text(torch.from_numpy(toks)).numpy()
        li_ref, lt_ref = model(torch.from_numpy(imgs).permute(0, 3, 1, 2),
                               torch.from_numpy(toks))

    img_got = np.asarray(
        encode_image_auto(params["visual"], cfg, jnp.asarray(imgs)))
    txt_got = np.asarray(encode_text_tokens(
        params["text"], cfg, jnp.asarray(toks.astype(np.int32))))
    np.testing.assert_allclose(img_got, img_ref, atol=5e-4, rtol=5e-4)
    np.testing.assert_allclose(txt_got, txt_ref, atol=ATOL, rtol=RTOL)

    # full CLIP.forward contract: normalized cosine logits both directions
    # (reference clip/model.py:709-723; logit_scale.exp(), no clamp hit)
    logits = np.asarray(cosine_logits(
        jnp.asarray(img_got), jnp.asarray(txt_got),
        jnp.asarray(float(sd["logit_scale"]))))
    np.testing.assert_allclose(logits, li_ref.numpy(), atol=2e-3, rtol=2e-3)
    np.testing.assert_allclose(logits.T, lt_ref.numpy(), atol=2e-3,
                               rtol=2e-3)


def test_tokenizer_fuzz_matches_reference(ref):
    """Seeded fuzz over compositions of word pieces, digits, punctuation,
    html escapes, accents, CJK, emoji and whitespace runs — id-for-id
    against the EXECUTED reference tokenizer (extends the fixed-string
    golden above; 200 random strings)."""
    theirs = ref.simple_tokenizer.SimpleTokenizer(bpe_path=ref.bpe_path)
    rng = np.random.default_rng(99)
    pieces = [
        "dog", "photo", "residential", "satellite", "x", "12", "345",
        "...", "!", "?", ",", ";", "&amp;", "&lt;3", "café",
        "naïve", "日本", "\U0001f642", "-", "_", "'s",
        "o'neil", "CO2", "100%", "word-break", "e", "zzz", "THE",
    ]
    seps = [" ", "  ", "\t", " \n ", ""]
    with our_tokenizer_with(ref.bpe_path) as ours:
        for _ in range(200):
            k = int(rng.integers(1, 10))
            s = ""
            for j in range(k):
                s += pieces[int(rng.integers(0, len(pieces)))]
                s += seps[int(rng.integers(0, len(seps)))]
            assert ours.encode(s) == theirs.encode(s), repr(s)
