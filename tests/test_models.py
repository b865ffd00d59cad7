"""CLIP encoder tests: shapes, prompt-injection semantics, checkpoint
conversion parity against a torch reimplementation of the CLIP text tower."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn as nn

from federated_multi_modal_tpu.models import (
    CLIPConfig,
    convert_torch_state_dict,
    cosine_logits,
    embed_tokens,
    encode_image,
    encode_text_embedded,
    encode_text_tokens,
    infer_config_from_state_dict,
    init_clip_params,
    tiny_test_config,
)
from federated_multi_modal_tpu.tokenizer import tokenize


@pytest.fixture(scope="module")
def tiny():
    cfg = tiny_test_config()
    params = init_clip_params(cfg, jax.random.PRNGKey(1), dtype_policy=False)
    return cfg, params


def test_encode_image_shape(tiny):
    cfg, params = tiny
    imgs = np.random.default_rng(0).standard_normal(
        (2, cfg.image_resolution, cfg.image_resolution, 3)
    ).astype(np.float32)
    feats = encode_image(params["visual"], cfg, jnp.asarray(imgs))
    assert feats.shape == (2, cfg.embed_dim)
    assert feats.dtype == jnp.float32


def test_encode_image_with_prompts(tiny):
    cfg, params = tiny
    rng = np.random.default_rng(1)
    imgs = rng.standard_normal((2, 32, 32, 3)).astype(np.float32)
    shallow = rng.standard_normal((2, cfg.vision_width)).astype(np.float32)
    deep = [
        rng.standard_normal((2, cfg.vision_width)).astype(np.float32)
        for _ in range(cfg.vision_layers - 1)
    ]
    cap = rng.standard_normal((2, 1, cfg.vision_width)).astype(np.float32)
    feats = encode_image(
        params["visual"], cfg, jnp.asarray(imgs),
        shallow_prompts=jnp.asarray(shallow),
        deep_prompts=[jnp.asarray(d) for d in deep],
        extra_tokens=jnp.asarray(cap),
    )
    assert feats.shape == (2, cfg.embed_dim)
    assert np.isfinite(np.asarray(feats)).all()


def test_deep_prompt_injection_changes_output(tiny):
    cfg, params = tiny
    rng = np.random.default_rng(2)
    imgs = rng.standard_normal((1, 32, 32, 3)).astype(np.float32)
    shallow = rng.standard_normal((2, cfg.vision_width)).astype(np.float32)
    base = encode_image(
        params["visual"], cfg, jnp.asarray(imgs), shallow_prompts=jnp.asarray(shallow)
    )
    deep = [np.full((2, cfg.vision_width), 3.0, np.float32)]
    changed = encode_image(
        params["visual"], cfg, jnp.asarray(imgs),
        shallow_prompts=jnp.asarray(shallow),
        deep_prompts=[jnp.asarray(deep[0])],
    )
    assert not np.allclose(np.asarray(base), np.asarray(changed))


def test_text_causal_mask_padding_invariance(tiny):
    """Tokens after EOT are causally masked out of the pooled feature:
    corrupting the padding slots must not change encode_text output."""
    cfg, params = tiny
    tokens = jnp.asarray(tokenize(["a photo of a cat."]))
    x = embed_tokens(params["text"], tokens)
    eot = jnp.argmax(tokens, axis=-1)
    base = encode_text_embedded(params["text"], cfg, x, eot)

    eot_pos = int(np.asarray(eot)[0])
    x_corrupt = np.asarray(x).copy()
    x_corrupt[:, eot_pos + 1 :, :] += 7.0
    out = encode_text_embedded(params["text"], cfg, jnp.asarray(x_corrupt), eot)
    np.testing.assert_allclose(np.asarray(base), np.asarray(out), atol=1e-5)


def test_text_truncation_is_exact(tiny):
    """max_len truncation after the last EOT is mathematically exact: the
    causal mask already prevents earlier positions from attending to the
    dropped padding (this is the text-tower fast path every training step
    uses via PromptConstants.text_len)."""
    cfg, params = tiny
    tokens = jnp.asarray(tokenize(["a photo of a cat.", "a photo of a dog."]))
    x = embed_tokens(params["text"], tokens)
    eot = jnp.argmax(tokens, axis=-1)
    full = encode_text_embedded(params["text"], cfg, x, eot)
    max_eot = int(np.asarray(eot).max()) + 1
    text_len = -(-max_eot // 8) * 8
    d = cfg.transformer_width
    rng = np.random.default_rng(11)
    deep = [rng.standard_normal((2, d)).astype(np.float32)]
    for max_len in (text_len, max_eot, tokens.shape[1]):
        out = encode_text_embedded(params["text"], cfg, x, eot, max_len=max_len)
        np.testing.assert_allclose(
            np.asarray(full), np.asarray(out), atol=1e-5,
            err_msg=f"max_len={max_len}",
        )
    # exactness holds under deep prompt injection too
    full_d = encode_text_embedded(params["text"], cfg, x, eot, deep_prompts=deep)
    out_d = encode_text_embedded(
        params["text"], cfg, x, eot, deep_prompts=deep, max_len=text_len
    )
    np.testing.assert_allclose(np.asarray(full_d), np.asarray(out_d), atol=1e-5)


def test_text_deep_prompt_injection_changes_output(tiny):
    """Deep text prompts replace slots [1:1+n_ctx]; different prompt values
    at layer 1 must change the pooled feature."""
    cfg, params = tiny
    tokens = jnp.asarray(tokenize(["a photo of a cat."]))
    x = embed_tokens(params["text"], tokens)
    eot = jnp.argmax(tokens, axis=-1)
    d = cfg.transformer_width
    rng = np.random.default_rng(7)
    p1 = [np.zeros((2, d), np.float32)]
    p2 = [rng.standard_normal((2, d)).astype(np.float32) * 20.0]
    out1 = encode_text_embedded(params["text"], cfg, x, eot, deep_prompts=p1)
    out2 = encode_text_embedded(params["text"], cfg, x, eot, deep_prompts=p2)
    assert np.abs(np.asarray(out1) - np.asarray(out2)).max() > 1e-3


def test_cosine_logits_scale_clamp(tiny):
    rng = np.random.default_rng(3)
    img = rng.standard_normal((4, 16)).astype(np.float32)
    txt = rng.standard_normal((7, 16)).astype(np.float32)
    # default: UNCLAMPED exp, like the Dassl trainers (coop.py:208-209)
    logits = cosine_logits(jnp.asarray(img), jnp.asarray(txt), jnp.asarray(10.0))
    assert logits.shape == (4, 7)
    assert np.abs(np.asarray(logits)).max() > 100.0
    # opt-in clamp (MaPLe's .exp().clamp(max=100), maple.py:325)
    clamped = cosine_logits(jnp.asarray(img), jnp.asarray(txt),
                            jnp.asarray(10.0), max_scale=100.0)
    assert np.abs(np.asarray(clamped)).max() <= 100.0 + 1e-4
    ratio = np.asarray(logits) / np.asarray(clamped)
    np.testing.assert_allclose(ratio, np.exp(10.0) / 100.0, rtol=1e-5)


# ---------------------------------------------------------------------------
# torch text-tower parity: build a small torch CLIP text encoder, export its
# state dict in OpenAI naming, convert, compare encode_text outputs.
# ---------------------------------------------------------------------------


class _TorchTextCLIP(nn.Module):
    def __init__(self, vocab, width, layers, heads, ctx_len, embed_dim):
        super().__init__()
        self.token_embedding = nn.Embedding(vocab, width)
        self.positional_embedding = nn.Parameter(torch.randn(ctx_len, width) * 0.01)
        self.blocks = nn.ModuleList()
        for _ in range(layers):
            blk = nn.ModuleDict(
                {
                    "attn": nn.MultiheadAttention(width, heads, batch_first=True),
                    "ln_1": nn.LayerNorm(width),
                    "c_fc": nn.Linear(width, width * 4),
                    "c_proj": nn.Linear(width * 4, width),
                    "ln_2": nn.LayerNorm(width),
                }
            )
            self.blocks.append(blk)
        self.ln_final = nn.LayerNorm(width)
        self.text_projection = nn.Parameter(torch.randn(width, embed_dim) * width ** -0.5)
        self.logit_scale = nn.Parameter(torch.tensor(float(np.log(1 / 0.07))))
        mask = torch.full((ctx_len, ctx_len), float("-inf")).triu(1)
        self.register_buffer("mask", mask, persistent=False)

    def forward(self, tokens):
        x = self.token_embedding(tokens)
        x = x + self.positional_embedding
        for blk in self.blocks:
            h = blk["ln_1"](x)
            a, _ = blk["attn"](h, h, h, attn_mask=self.mask, need_weights=False)
            x = x + a
            h = blk["ln_2"](x)
            h = blk["c_fc"](h)
            h = h * torch.sigmoid(1.702 * h)
            x = x + blk["c_proj"](h)
        x = self.ln_final(x)
        pooled = x[torch.arange(x.shape[0]), tokens.argmax(dim=-1)]
        return pooled @ self.text_projection

    def openai_state_dict(self, vision_cfg: CLIPConfig):
        """Export under OpenAI CLIP key names (plus a matching ViT vision
        tower of random weights so shape inference works)."""
        sd = {}
        sd["token_embedding.weight"] = self.token_embedding.weight
        sd["positional_embedding"] = self.positional_embedding
        for i, blk in enumerate(self.blocks):
            pre = f"transformer.resblocks.{i}"
            sd[f"{pre}.attn.in_proj_weight"] = blk["attn"].in_proj_weight
            sd[f"{pre}.attn.in_proj_bias"] = blk["attn"].in_proj_bias
            sd[f"{pre}.attn.out_proj.weight"] = blk["attn"].out_proj.weight
            sd[f"{pre}.attn.out_proj.bias"] = blk["attn"].out_proj.bias
            sd[f"{pre}.ln_1.weight"] = blk["ln_1"].weight
            sd[f"{pre}.ln_1.bias"] = blk["ln_1"].bias
            sd[f"{pre}.ln_2.weight"] = blk["ln_2"].weight
            sd[f"{pre}.ln_2.bias"] = blk["ln_2"].bias
            sd[f"{pre}.mlp.c_fc.weight"] = blk["c_fc"].weight
            sd[f"{pre}.mlp.c_fc.bias"] = blk["c_fc"].bias
            sd[f"{pre}.mlp.c_proj.weight"] = blk["c_proj"].weight
            sd[f"{pre}.mlp.c_proj.bias"] = blk["c_proj"].bias
        sd["ln_final.weight"] = self.ln_final.weight
        sd["ln_final.bias"] = self.ln_final.bias
        sd["text_projection"] = self.text_projection
        sd["logit_scale"] = self.logit_scale

        # matching random vision tower
        v = vision_cfg
        width = v.vision_width
        sd["visual.conv1.weight"] = torch.randn(width, 3, v.vision_patch_size,
                                                v.vision_patch_size) * 0.02
        sd["visual.class_embedding"] = torch.randn(width) * 0.02
        sd["visual.positional_embedding"] = torch.randn(v.num_patches + 1, width) * 0.02
        sd["visual.ln_pre.weight"] = torch.ones(width)
        sd["visual.ln_pre.bias"] = torch.zeros(width)
        for i in range(v.vision_layers):
            pre = f"visual.transformer.resblocks.{i}"
            sd[f"{pre}.attn.in_proj_weight"] = torch.randn(3 * width, width) * 0.02
            sd[f"{pre}.attn.in_proj_bias"] = torch.zeros(3 * width)
            sd[f"{pre}.attn.out_proj.weight"] = torch.randn(width, width) * 0.02
            sd[f"{pre}.attn.out_proj.bias"] = torch.zeros(width)
            sd[f"{pre}.ln_1.weight"] = torch.ones(width)
            sd[f"{pre}.ln_1.bias"] = torch.zeros(width)
            sd[f"{pre}.ln_2.weight"] = torch.ones(width)
            sd[f"{pre}.ln_2.bias"] = torch.zeros(width)
            sd[f"{pre}.mlp.c_fc.weight"] = torch.randn(4 * width, width) * 0.02
            sd[f"{pre}.mlp.c_fc.bias"] = torch.zeros(4 * width)
            sd[f"{pre}.mlp.c_proj.weight"] = torch.randn(width, 4 * width) * 0.02
            sd[f"{pre}.mlp.c_proj.bias"] = torch.zeros(width)
        sd["visual.ln_post.weight"] = torch.ones(width)
        sd["visual.ln_post.bias"] = torch.zeros(width)
        sd["visual.proj"] = torch.randn(width, v.embed_dim) * 0.02
        return {k: v.detach() for k, v in sd.items()}


def test_checkpoint_conversion_text_parity():
    torch.manual_seed(0)
    arch = tiny_test_config()
    tm = _TorchTextCLIP(
        arch.vocab_size,
        arch.transformer_width,
        arch.transformer_layers,
        arch.transformer_heads,
        arch.context_length,
        arch.embed_dim,
    ).eval()
    sd = tm.openai_state_dict(arch)

    inferred = infer_config_from_state_dict(sd)
    assert inferred.transformer_width == arch.transformer_width
    assert inferred.vision_patch_size == arch.vision_patch_size
    assert inferred.context_length == arch.context_length

    params = convert_torch_state_dict(sd, inferred, dtype_policy=False)

    tokens_np = tokenize(["a photo of a cat.", "a photo of a dog."])
    with torch.no_grad():
        theirs = tm(torch.from_numpy(tokens_np.astype(np.int64))).numpy()
    ours = np.asarray(encode_text_tokens(params["text"], inferred,
                                         jnp.asarray(tokens_np)))
    np.testing.assert_allclose(ours, theirs, atol=2e-4, rtol=2e-4)


def test_checkpoint_conversion_vision_runs():
    torch.manual_seed(0)
    arch = tiny_test_config()
    tm = _TorchTextCLIP(
        arch.vocab_size, arch.transformer_width, arch.transformer_layers,
        arch.transformer_heads, arch.context_length, arch.embed_dim,
    )
    sd = tm.openai_state_dict(arch)
    params = convert_torch_state_dict(sd)
    imgs = jnp.zeros((2, arch.image_resolution, arch.image_resolution, 3))
    feats = encode_image(params["visual"], arch, imgs)
    assert feats.shape == (2, arch.embed_dim)


class _TorchViT(nn.Module):
    """Vanilla CLIP VisionTransformer (reference clip/model.py:383-455):
    strided conv patchify -> class token -> pos embed -> ln_pre -> blocks ->
    ln_post on CLS -> projection."""

    def __init__(self, width, layers, heads, patch, res, embed_dim):
        super().__init__()
        self.conv1 = nn.Conv2d(3, width, kernel_size=patch, stride=patch,
                               bias=False)
        scale = width ** -0.5
        n_tok = (res // patch) ** 2 + 1
        self.class_embedding = nn.Parameter(torch.randn(width) * scale)
        self.positional_embedding = nn.Parameter(
            torch.randn(n_tok, width) * scale
        )
        self.ln_pre = nn.LayerNorm(width)
        self.blocks = nn.ModuleList()
        for _ in range(layers):
            self.blocks.append(nn.ModuleDict({
                "attn": nn.MultiheadAttention(width, heads, batch_first=True),
                "ln_1": nn.LayerNorm(width),
                "c_fc": nn.Linear(width, width * 4),
                "c_proj": nn.Linear(width * 4, width),
                "ln_2": nn.LayerNorm(width),
            }))
        self.ln_post = nn.LayerNorm(width)
        self.proj = nn.Parameter(torch.randn(width, embed_dim) * scale)

    def forward(self, x):  # (B, 3, H, W)
        x = self.conv1(x)
        x = x.reshape(x.shape[0], x.shape[1], -1).permute(0, 2, 1)
        cls = self.class_embedding[None, None].expand(x.shape[0], 1, -1)
        x = torch.cat([cls, x], dim=1) + self.positional_embedding
        x = self.ln_pre(x)
        for blk in self.blocks:
            h = blk["ln_1"](x)
            a, _ = blk["attn"](h, h, h, need_weights=False)
            x = x + a
            h = blk["ln_2"](x)
            h = blk["c_fc"](h)
            h = h * torch.sigmoid(1.702 * h)
            x = x + blk["c_proj"](h)
        return self.ln_post(x[:, 0]) @ self.proj


def test_vision_tower_matches_torch():
    """Full image-tower golden vs a torch CLIP ViT: patchify-as-matmul,
    token assembly, blocks, CLS pooling and projection must agree."""
    from federated_multi_modal_tpu.models.params import (
        convert_torch_state_dict,
        infer_config_from_state_dict,
    )

    torch.manual_seed(1)
    width, layers, heads, patch, res, embed = 128, 2, 2, 8, 32, 64
    vit = _TorchViT(width, layers, heads, patch, res, embed).eval()

    sd = {
        "visual.conv1.weight": vit.conv1.weight,
        "visual.class_embedding": vit.class_embedding,
        "visual.positional_embedding": vit.positional_embedding,
        "visual.ln_pre.weight": vit.ln_pre.weight,
        "visual.ln_pre.bias": vit.ln_pre.bias,
        "visual.ln_post.weight": vit.ln_post.weight,
        "visual.ln_post.bias": vit.ln_post.bias,
        "visual.proj": vit.proj,
    }
    for i, blk in enumerate(vit.blocks):
        pre = f"visual.transformer.resblocks.{i}"
        sd[f"{pre}.attn.in_proj_weight"] = blk["attn"].in_proj_weight
        sd[f"{pre}.attn.in_proj_bias"] = blk["attn"].in_proj_bias
        sd[f"{pre}.attn.out_proj.weight"] = blk["attn"].out_proj.weight
        sd[f"{pre}.attn.out_proj.bias"] = blk["attn"].out_proj.bias
        sd[f"{pre}.ln_1.weight"] = blk["ln_1"].weight
        sd[f"{pre}.ln_1.bias"] = blk["ln_1"].bias
        sd[f"{pre}.ln_2.weight"] = blk["ln_2"].weight
        sd[f"{pre}.ln_2.bias"] = blk["ln_2"].bias
        sd[f"{pre}.mlp.c_fc.weight"] = blk["c_fc"].weight
        sd[f"{pre}.mlp.c_fc.bias"] = blk["c_fc"].bias
        sd[f"{pre}.mlp.c_proj.weight"] = blk["c_proj"].weight
        sd[f"{pre}.mlp.c_proj.bias"] = blk["c_proj"].bias
    # text keys for shape inference only
    tw = 128
    sd["text_projection"] = torch.randn(tw, embed)
    sd["positional_embedding"] = torch.randn(16, tw)
    sd["token_embedding.weight"] = torch.randn(50, tw)
    sd["ln_final.weight"] = torch.ones(tw)
    sd["ln_final.bias"] = torch.zeros(tw)
    sd["logit_scale"] = torch.tensor(1.0)
    sd = {k: v.detach() for k, v in sd.items()}

    cfg = infer_config_from_state_dict(sd)
    assert cfg.vision_patch_size == patch and cfg.image_resolution == res
    params = convert_torch_state_dict(sd, cfg, dtype_policy=False)

    rng = np.random.default_rng(5)
    imgs = rng.standard_normal((3, res, res, 3)).astype(np.float32)
    with torch.no_grad():
        ref = vit(torch.from_numpy(imgs).permute(0, 3, 1, 2).float()).numpy()
    got = np.asarray(
        encode_image(params["visual"], cfg, jnp.asarray(imgs))
    )
    np.testing.assert_allclose(got, ref, atol=2e-4, rtol=2e-4)


def test_text_sequence_packing_is_exact(tiny):
    """Sequence packing (P prompts per 128-token attention row, block-
    diagonal causal mask) must produce the same features as the unpacked
    path — including deep prompt injection and a sequence count that does
    not divide the pack factor."""
    cfg, params = tiny
    rng = np.random.default_rng(21)
    d = cfg.transformer_width
    for n_cls in (4, 7, 37):  # 37: padding path (P=8 over T=16)
        prompts = rng.standard_normal((n_cls, 16, d)).astype(np.float32)
        eot = jnp.asarray(rng.integers(2, 16, n_cls).astype(np.int32))
        deep = [rng.standard_normal((2, d)).astype(np.float32)]
        unpacked = encode_text_embedded(
            params["text"], cfg, jnp.asarray(prompts), eot,
            deep_prompts=[jnp.asarray(p) for p in deep], pack=False,
        )
        packed = encode_text_embedded(
            params["text"], cfg, jnp.asarray(prompts), eot,
            deep_prompts=[jnp.asarray(p) for p in deep], pack=True,
        )
        np.testing.assert_allclose(
            np.asarray(packed), np.asarray(unpacked), atol=2e-5, rtol=2e-5,
            err_msg=f"n_cls={n_cls}",
        )


def test_text_packing_grads_match_unpacked(tiny):
    """Gradients w.r.t. prompts and deep prompts are unchanged by packing
    (the training path runs packed)."""
    cfg, params = tiny
    rng = np.random.default_rng(22)
    d = cfg.transformer_width
    prompts = jnp.asarray(
        rng.standard_normal((6, 16, d)).astype(np.float32))
    eot = jnp.asarray(rng.integers(2, 16, 6).astype(np.int32))
    deep = jnp.asarray(rng.standard_normal((2, d)).astype(np.float32))

    def loss(prompts, deep, pack):
        out = encode_text_embedded(
            params["text"], cfg, prompts, eot, deep_prompts=[deep],
            pack=pack)
        return jnp.sum(out ** 2)

    g_u = jax.grad(loss, argnums=(0, 1))(prompts, deep, False)
    g_p = jax.grad(loss, argnums=(0, 1))(prompts, deep, True)
    for a, b in zip(g_p, g_u):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-5, rtol=2e-5)


def test_build_block_causal_mask_structure():
    from federated_multi_modal_tpu.ops.primitives import (
        build_block_causal_mask,
    )

    m = np.asarray(build_block_causal_mask(2, 3))
    assert m.shape == (6, 6)
    # within-block causal: (1,0) visible, (0,1) masked
    assert m[1, 0] == 0.0 and m[0, 1] == -np.inf
    # cross-block: always masked, both directions
    assert m[3, 2] == -np.inf and m[2, 3] == -np.inf
    assert (np.diag(m) == 0.0).all()
