"""Functional CLIP encoders with generalized deep prompt injection.

One parameterized implementation replaces the reference's three block
variants (``ResidualAttentionBlock{,_IVLP,_MaPLe}``, ``clip/model.py:
167-352``): every method (CoOp/CoCoOp = no injection, VPT/IVLP = per-layer
learned prompts, MaPLe = externally supplied coupled prompts) is expressed
by the ``deep_prompts`` / ``shallow_prompts`` arguments.  Injection is
*replacement*, never growth (``clip/model.py:320-349``):

* vision: the last ``n_ctx`` tokens are replaced at layers ``1..K``
* text: tokens ``[1 : 1+n_ctx]`` are replaced at layers ``1..K``

All shapes are static — sequence length is fixed at trace time, so XLA
compiles one program per configuration and everything lands on the MXU.

Caption conditioning (MaPLe fork feature): one pooled-and-projected caption
token per image is appended to the vision sequence and re-injected at every
prompted layer.  **Documented deviation** from the reference, which creates
*untrained random* pooling/projection modules on every forward and appends
``batch_size`` caption tokens shared across the whole batch
(``clip/model.py:550-561``); here the pooling vector and projection are
trained parameters and conditioning is per-sample.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp

from federated_multi_modal_tpu.models.params import CLIPConfig
from federated_multi_modal_tpu.ops.primitives import (
    build_block_causal_mask,
    build_causal_mask,
    layer_norm,
    linear,
    residual_block,
)


# --------------------------------------------------------------------------
# vision tower
# --------------------------------------------------------------------------


def patchify(params_visual, cfg: CLIPConfig, images: jax.Array) -> jax.Array:
    """Patch embedding as a single matmul (conv1 with stride=patch is an
    img2col matmul — the MXU-native formulation of ``clip/model.py:427``).

    Args:
        images: ``(B, H, W, 3)`` in the compute dtype.
    Returns:
        ``(B, grid^2, width)``.
    """
    B = images.shape[0]
    P = cfg.vision_patch_size
    g = cfg.grid_size
    x = images.reshape(B, g, P, g, P, 3)
    x = x.transpose(0, 1, 3, 2, 4, 5).reshape(B, g * g, P * P * 3)
    return linear(x, params_visual["conv1"]["w"])


def _broadcast_prompt(p: jax.Array, batch: int, dtype) -> jax.Array:
    """(n_ctx, d) or (B, n_ctx, d) -> (B, n_ctx, d)."""
    p = p.astype(dtype)
    if p.ndim == 2:
        p = jnp.broadcast_to(p[None], (batch,) + p.shape)
    return p


def _block_fn(remat: bool, attn_w_frozen: bool = False,
              inference: bool = False):
    """Per-block forward, optionally rematerialized: with ``remat`` the
    block's activations are recomputed in the backward pass instead of
    stored — ~1 extra forward of FLOPs for ~L x activation memory saved,
    which buys much larger batches (HBM is the binding constraint).

    ``attn_w_frozen`` / ``inference`` are bound statically (they select
    the fused LN+QKV+attention / LN+MLP kernels — see
    ``ops.primitives.residual_block``)."""
    import functools

    fn = residual_block
    if attn_w_frozen or inference:
        fn = functools.partial(
            residual_block, attn_w_frozen=attn_w_frozen, inference=inference
        )
    if remat:
        return jax.checkpoint(fn, static_argnums=(2,))
    return fn


def encode_image(
    params,
    cfg: CLIPConfig,
    images: jax.Array,
    shallow_prompts: Optional[jax.Array] = None,
    deep_prompts: Optional[Sequence[jax.Array]] = None,
    extra_tokens: Optional[jax.Array] = None,
    remat: bool = False,
    inference: bool = False,
) -> jax.Array:
    """Vision transformer forward with optional prompt injection.

    Args:
        params: the ``visual`` subtree.
        images: ``(B, H, W, 3)``.
        shallow_prompts: ``(n_ctx, width)`` or ``(B, n_ctx, width)`` tokens
            appended after the positional embedding (VPT shallow /
            MaPLe ``shared_ctx``; ``clip/model.py:437-441, 536-538``).
        deep_prompts: per-layer prompts for layers ``1..len(deep_prompts)``;
            each ``(n_ctx, width)``.  Layer ``i`` replaces the trailing
            prompt tokens with ``deep_prompts[i-1]``.
        extra_tokens: ``(B, k, width)`` per-sample conditioning tokens
            (caption embeddings), appended after the shallow prompts and
            re-injected alongside every deep prompt.
        inference: caller guarantees no cotangent ever flows into this
            tower (eval fast paths, frozen-tower feature extraction).
            Every block then takes the whole-block fused inference kernel
            under the pallas impl — a pure forward win (docs/BENCH.md).
            In TRAINING, fully-frozen-weight blocks (the trainer's wgrad
            declaration) route through the whole-block fused TRAIN kernel
            by default (``FMM_TPU_FUSED_TRAIN_BLOCK``, +5.95% e2e measured
            — docs/BENCH.md round 5); the older sublayer fused path
            remains behind ``FMM_TPU_FUSED_TRAIN`` (measured loss, kept
            for A/B).

    Returns:
        ``(B, embed_dim)`` image features (pre-normalization), fp32.
    """
    dtype = params["conv1"]["w"].dtype
    x = patchify(params, cfg, images.astype(dtype))
    B = x.shape[0]
    w = cfg.vision_width

    cls = params["class_embedding"].astype(dtype)
    cls = jnp.broadcast_to(cls[None, None, :], (B, 1, w))
    x = jnp.concatenate([cls, x], axis=1)
    x = x + params["positional_embedding"].astype(dtype)[None]

    n_ctx = 0
    if shallow_prompts is not None:
        sp = _broadcast_prompt(shallow_prompts, B, dtype)
        n_ctx = sp.shape[1]
        x = jnp.concatenate([x, sp], axis=1)

    n_extra = 0
    if extra_tokens is not None:
        et = extra_tokens.astype(dtype)
        n_extra = et.shape[1]
        x = jnp.concatenate([x, et], axis=1)

    x = layer_norm(x, params["ln_pre"])

    n_tail = n_ctx + n_extra
    deep_prompts = deep_prompts or []
    if deep_prompts and n_ctx == 0:
        raise ValueError(
            "deep_prompts require shallow_prompts: injection REPLACES the "
            "trailing prompt tokens (clip/model.py:320-349); with no "
            "shallow prompts there is nothing to replace and the sequence "
            "would silently grow"
        )
    for i, dp in enumerate(deep_prompts):
        # replacement-never-growth invariant: a deep prompt wider or
        # narrower than the shallow prompts would silently change the
        # sequence length here (and the fused group path would instead
        # clobber patch tokens) — reject both
        if dp.shape[-2] != n_ctx:
            raise ValueError(
                f"deep_prompts[{i}] has {dp.shape[-2]} rows but the "
                f"shallow prompts define n_ctx={n_ctx}: injection replaces "
                "the trailing prompt rows one-for-one"
            )
    block = _block_fn(remat)
    # fused kernels: in ``inference`` towers every block fuses (no grads
    # exist at all); in training only the blocks the trainer declared
    # frozen-W (ops.primitives.set_vision_attn_wgrad_blocks) — those
    # route through the whole-block fused TRAIN kernel by default
    # (FMM_TPU_FUSED_TRAIN_BLOCK, docs/BENCH.md round 5) or the sublayer
    # fused path when only FMM_TPU_FUSED_TRAIN is set.
    from federated_multi_modal_tpu.ops.primitives import (
        fused_train_block_enabled,
        fused_train_enabled,
        get_vision_attn_wgrad_blocks,
    )

    if inference:
        wgrad = frozenset()
    elif fused_train_enabled() or fused_train_block_enabled():
        # FMM_TPU_FUSED_TRAIN routes frozen-W blocks through the sublayer
        # fused LN+QKV+attention kernel; FMM_TPU_FUSED_TRAIN_BLOCK through
        # the whole-block train kernel (fwd + custom VJP).  Either gate
        # needs the trainer's wgrad declaration resolved here.
        wgrad = get_vision_attn_wgrad_blocks(len(params["blocks"]))
    else:
        wgrad = None
    block_fw = (
        _block_fn(remat, attn_w_frozen=True, inference=inference)
        if wgrad is not None else None
    )
    # block-GROUP fast path (inference only): run G consecutive blocks per
    # Pallas kernel with the deep-prompt injections done in-kernel,
    # removing the (B, T, D) HBM round-trip at every in-group block
    # boundary AND the full-tensor injection concats
    # (ops/pallas/fused_block.py::fused_block_group_residual;
    # FMM_TPU_FUSED_NBLK > 1 enables, VMEM residency caps G).
    group_size = 1
    if inference:
        import federated_multi_modal_tpu.ops.primitives as _prim
        from federated_multi_modal_tpu.ops.pallas.fused_block import (
            fused_block_eligible,
            fused_block_group_residual,
            fused_block_group_size,
        )

        group_size = fused_block_group_size()
        T_seq = x.shape[1]
        if group_size > 1 and not (
            _prim._ATTENTION_IMPL == "pallas"
            and fused_block_eligible(
                B, T_seq, cfg.vision_width, cfg.vision_heads,
                params["blocks"][0]["mlp"]["w_fc"].shape[-1], None,
            )
            # deep prompts must be batch-shared rows for the in-kernel
            # broadcast (the per-sample case rides ``extra_tokens``)
            and all(p.ndim == 2 for p in deep_prompts)
        ):
            group_size = 1

    if group_size > 1:
        n_blocks = len(params["blocks"])
        for s in range(0, n_blocks, group_size):
            grp = params["blocks"][s:s + group_size]
            flags, prompts = [], []
            for j in range(len(grp)):
                i = s + j
                if 1 <= i <= len(deep_prompts):
                    flags.append(True)
                    prompts.append(deep_prompts[i - 1].astype(dtype))
                else:
                    flags.append(False)
            x = fused_block_group_residual(
                x, tuple(grp), cfg.vision_heads,
                inject_flags=tuple(flags), prompts=tuple(prompts),
                extra=(extra_tokens.astype(dtype) if
                       (extra_tokens is not None and any(flags)) else None),
            )
    else:
        for i, blk in enumerate(params["blocks"]):
            if 1 <= i <= len(deep_prompts):
                p = _broadcast_prompt(deep_prompts[i - 1], B, dtype)
                tail = [p]
                if extra_tokens is not None:
                    tail.append(extra_tokens.astype(dtype))
                x = jnp.concatenate(
                    [x[:, : x.shape[1] - n_tail]] + tail, axis=1)
            fn = block_fw if (wgrad is not None and i not in wgrad) else block
            x = fn(x, blk, cfg.vision_heads)

    pooled = layer_norm(x[:, 0, :], params["ln_post"])
    feats = jnp.matmul(
        pooled, params["proj"].astype(dtype), preferred_element_type=jnp.float32
    )
    return feats.astype(jnp.float32)


def encode_image_auto(params, cfg: CLIPConfig, images: jax.Array, **prompt_kwargs):
    """Dispatch to the ViT or ModifiedResNet tower by architecture.

    Prompt injection is a ViT-only feature (the reference's RN path has no
    prompt variants either, ``clip/model.py:596-626``).
    """
    if cfg.is_vit:
        return encode_image(params, cfg, images, **prompt_kwargs)
    prompts = {
        k: v for k, v in prompt_kwargs.items()
        if k not in ("remat", "inference")
    }
    if any(v is not None for v in prompts.values()):
        raise ValueError("Visual prompting requires a ViT backbone")
    from federated_multi_modal_tpu.models.resnet import encode_image_resnet

    # ``inference`` is a fusion hint with no RN-path effect (the fused
    # kernels are transformer-only); ``remat`` is honored so a caller's
    # memory request is not silently dropped
    rcfg = cfg.resnet_config()
    if prompt_kwargs.get("remat"):
        return jax.checkpoint(
            lambda p, im: encode_image_resnet(p, rcfg, im)
        )(params, images)
    return encode_image_resnet(params, rcfg, images)


# --------------------------------------------------------------------------
# text tower
# --------------------------------------------------------------------------


def embed_tokens(params_text, tokens: jax.Array) -> jax.Array:
    """Token-id lookup -> ``(N, T, d)`` embeddings (frozen
    ``token_embedding``)."""
    return jnp.take(params_text["token_embedding"], tokens, axis=0)


# Packed text rows target one MXU tile of tokens: P = 128 // T truncated
# prompts share a row under a block-diagonal causal mask, turning the text
# tower's (T, T) attention matmuls (T ~ 8-24 after EOT truncation — ~2%
# MXU utilization as (n_cls*H) tiny batched matmuls) into (128, 128) ones.
# The packing reshape is layout-free ((N, T, d) and (N/P, P*T, d) share
# row-major memory), and per-sequence positions/LN/MLP are unaffected, so
# the math is identical up to fp accumulation order.
TEXT_PACK_TARGET = 128

# Module default for encode_text_embedded's ``pack=None`` (auto).  Set from
# ``cfg.TPU.TEXT_PACK`` before the jitted programs trace — same pattern as
# ops.primitives.set_attention_impl.  Measured 1.086x end-to-end on the
# MaPLe step at 1000 classes on v5e (docs/BENCH.md).
_TEXT_PACK_DEFAULT = True


def set_text_pack(enabled: bool) -> None:
    global _TEXT_PACK_DEFAULT
    _TEXT_PACK_DEFAULT = bool(enabled)


def encode_text_embedded(
    params,
    cfg: CLIPConfig,
    prompts: jax.Array,
    eot_index: jax.Array,
    deep_prompts: Optional[Sequence[jax.Array]] = None,
    remat: bool = False,
    max_len: Optional[int] = None,
    pack: Optional[bool] = None,
) -> jax.Array:
    """Text transformer over pre-assembled prompt embeddings.

    Equivalent of the method trainers' ``TextEncoder`` wrapper
    (``trainers/maple.py:43-79``): add positional embedding, run the causal
    transformer with optional deep prompt injection, LayerNorm, pool at the
    EOT position, project.

    Args:
        prompts: ``(N, 77, d)`` embeddings (SOS + ctx + class + EOS + pad).
        eot_index: ``(N,)`` int positions of the EOT token
            (``tokenized.argmax(-1)`` in the reference).
        max_len: optional static truncation of the token axis.  With the
            causal mask, positions ``<= i`` never attend to positions
            ``> i``, so dropping the padding after the last EOT is
            *mathematically exact* for EOT pooling — and cuts the text
            tower's FLOPs by ~77/max_len (class prompts are ~8 tokens).
            Pass ``PromptConstants.text_len``.
        pack: pack ``128 // T`` sequences per attention row under a
            block-diagonal causal mask (MXU-shaped attention; exact same
            per-sequence math).  ``None`` = auto (on when ``T <= 64``).
    """
    if max_len is not None and prompts.shape[1] > max_len:
        prompts = prompts[:, :max_len]
    dtype = params["text_projection"].dtype
    pos = params["positional_embedding"][: prompts.shape[1]]
    x = prompts.astype(dtype) + pos.astype(dtype)[None]

    N, T, d = x.shape
    use_pack = _TEXT_PACK_DEFAULT if pack is None else pack
    P = TEXT_PACK_TARGET // T if use_pack else 1
    deep_prompts = deep_prompts or []
    if P >= 2:
        G = -(-N // P)
        if G >= 8:
            # round the packed-row count to a multiple of 4 so the Pallas
            # packed kernels can group 4 rows per grid step (and XLA gets
            # even batch tiles); <= 3 rows of waste
            G = -(-G // 4) * 4
        n_pad = G * P
        if n_pad != N:
            x = jnp.pad(x, ((0, n_pad - N), (0, 0), (0, 0)))
        mask = build_block_causal_mask(P, T)
        x = x.reshape(G, P * T, d)
    else:
        n_pad = N
        mask = build_causal_mask(T)

    block = _block_fn(remat)
    for i, blk in enumerate(params["blocks"]):
        if 1 <= i <= len(deep_prompts):
            p = deep_prompts[i - 1]
            if p.ndim == 3 and p.shape[0] == N and n_pad != N:
                p = jnp.pad(p, ((0, n_pad - N), (0, 0), (0, 0)))
            p = _broadcast_prompt(p, n_pad, dtype)
            n_ctx = p.shape[1]
            xs = x.reshape(n_pad, T, d) if P >= 2 else x
            xs = jnp.concatenate([xs[:, :1], p, xs[:, 1 + n_ctx :]], axis=1)
            x = xs.reshape(G, P * T, d) if P >= 2 else xs
        x = block(x, blk, cfg.transformer_heads, mask)

    if P >= 2:
        x = x.reshape(n_pad, T, d)[:N]
    x = layer_norm(x, params["ln_final"])
    pooled = jnp.take_along_axis(x, eot_index[:, None, None], axis=1)[:, 0]
    feats = jnp.matmul(
        pooled,
        params["text_projection"].astype(dtype),
        preferred_element_type=jnp.float32,
    )
    return feats.astype(jnp.float32)


def encode_text_tokens(params, cfg: CLIPConfig, tokens: jax.Array) -> jax.Array:
    """Plain CLIP ``encode_text`` over token ids (zero-shot path,
    reference ``clip/model.py:694-707``)."""
    x = embed_tokens(params, tokens)
    eot = jnp.argmax(tokens, axis=-1)
    return encode_text_embedded(params, cfg, x, eot)


# --------------------------------------------------------------------------
# similarity head
# --------------------------------------------------------------------------


def cosine_logits(
    image_features: jax.Array,
    text_features: jax.Array,
    logit_scale: jax.Array,
    max_scale: float | None = None,
) -> jax.Array:
    """``exp(logit_scale) * norm(img) @ norm(txt)^T`` in fp32.

    Unclamped by default: the Dassl trainers (CoOp/CoCoOp/VPT/IVLP/zsclip)
    all use a plain ``logit_scale.exp()`` (reference ``trainers/coop.py:
    208-209``, ``vpt.py:102-109``, ``independentVL.py:166-174``).  MaPLe
    is the ONLY trainer that clamps (``.exp().clamp(max=100)``, reference
    ``trainers/maple.py:325``) and does so in its own loss closure
    (``trainers/maple.py`` here), not through this helper; pass
    ``max_scale`` to opt in."""
    from federated_multi_modal_tpu.ops.primitives import l2_normalize

    img = l2_normalize(image_features)
    txt = l2_normalize(text_features)
    scale = jnp.exp(logit_scale.astype(jnp.float32))
    if max_scale is not None:
        scale = jnp.clip(scale, None, max_scale)
    return scale * jnp.matmul(img, txt.T, preferred_element_type=jnp.float32)
