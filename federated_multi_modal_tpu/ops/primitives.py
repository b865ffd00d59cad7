"""Core compute primitives for the CLIP transformer stacks.

TPU-first rebuild of the reference's torch op layer (``clip/model.py``):

* ``layer_norm`` — always computed in fp32 and cast back, mirroring the
  fp16-safe LayerNorm subclass at ``clip/model.py:153-159``.
* ``quick_gelu`` — ``x * sigmoid(1.702 x)`` (``clip/model.py:162-164``).
* ``multi_head_attention`` — one fused QKV projection + fp32 softmax.
  Sequences here are tiny (77 text / 199 vision tokens), so attention is
  compute-bound on the MXU, not memory-bound; XLA fuses the softmax chain.
* ``mlp`` — c_fc -> QuickGELU -> c_proj.

All functions are pure: ``(params_subtree, activations) -> activations`` on
``(batch, tokens, dim)`` arrays (no torch-style LND permutes).  Weights are
stored input-major (``(d_in, d_out)``), i.e. transposed relative to torch.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def quick_gelu(x: jax.Array) -> jax.Array:
    return x * jax.nn.sigmoid(1.702 * x)


def layer_norm(x: jax.Array, p, eps: float = 1e-5) -> jax.Array:
    """LayerNorm over the last axis, fp32 math, output in input dtype."""
    orig_dtype = x.dtype
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x32 - mean), axis=-1, keepdims=True)
    y = (x32 - mean) * jax.lax.rsqrt(var + eps)
    y = y * p["scale"].astype(jnp.float32) + p["bias"].astype(jnp.float32)
    return y.astype(orig_dtype)


def linear(x: jax.Array, w: jax.Array, b: jax.Array = None) -> jax.Array:
    y = jnp.matmul(x, w.astype(x.dtype))
    if b is not None:
        y = y + b.astype(y.dtype)
    return y


# Attention implementation switch: "pallas" (packed-QKV fused kernels with
# an in-VMEM custom VJP — measured 1.6x on the full MaPLe train step at
# ViT-B/16 shapes on v5e; ops/pallas/attention.py) or "xla".  Set from
# cfg.TPU.ATTENTION_IMPL before the jitted programs trace ("auto" resolves
# to pallas on TPU backends).  Module default stays "xla" so bare ops are
# portable; trainers/bench set it explicitly.
_ATTENTION_IMPL = "xla"


def set_attention_impl(impl: str) -> None:
    global _ATTENTION_IMPL
    assert impl in ("xla", "pallas"), impl
    _ATTENTION_IMPL = impl


# Vision-tower attention weight-gradient policy, set by trainers before
# tracing (same pattern as set_attention_impl).  ``None`` (default) means
# "unknown — every block may need d(w_qkv)", which disables the fused
# LN+QKV+attention kernel: its VJP returns zero weight cotangents by
# design (ops/pallas/fused_block.py).  Trainers declare the set of vision
# block indices whose attention weights ARE trainable; every other block
# routes through the fused kernel when the impl is "pallas".  MaPLe
# unfreezes only ``resblocks.{last}`` in each tower
# (reference trainers/maple.py:447-479 -> {n_layers - 1}); CoOp/CoCoOp/
# VPT/IVLP/zero-shot train no attention weights at all -> frozenset().
_VISION_ATTN_WGRAD_BLOCKS = None


def set_vision_attn_wgrad_blocks(blocks) -> None:
    """``None`` = unknown (fused kernel disabled), ``"last"`` = only the
    last block's attention weights are trainable (resolved against the
    tower's block count at trace time), or an explicit iterable of
    trainable block indices."""
    global _VISION_ATTN_WGRAD_BLOCKS
    if blocks is None or blocks == "last":
        _VISION_ATTN_WGRAD_BLOCKS = blocks
    else:
        _VISION_ATTN_WGRAD_BLOCKS = frozenset(blocks)


def get_vision_attn_wgrad_blocks(n_blocks: int = None):
    """Resolved set of wgrad-needing block indices, or None if unknown."""
    p = _VISION_ATTN_WGRAD_BLOCKS
    if p == "last":
        return None if n_blocks is None else frozenset({n_blocks - 1})
    return p


def fused_train_enabled() -> bool:
    """Experimental gate: route frozen-W blocks through the fused
    LN+QKV+attention kernel DURING TRAINING too.  Off by default — the
    fused backward only fits VMEM at GB=1 on ViT-B/16 vision shapes, where
    512 grid steps starve the MXU and the step as a whole loses ~8%
    (1223 vs 1320 img/s, docs/BENCH.md).  Inference towers
    (``encode_image(inference=True)``) always fuse; that path has no
    backward and is a pure measured win."""
    import os

    return os.environ.get("FMM_TPU_FUSED_TRAIN", "0").lower() in (
        "1", "on", "true",
    )


def fused_train_block_enabled() -> bool:
    """Gate for the WHOLE-BLOCK fused train kernel (forward + custom VJP
    with on-the-fly LN moments and VMEM-resident weights,
    ``ops/pallas/fused_block.py::fused_block_train``).  Requires the
    routed blocks to have ALL non-LN weights frozen — true for every
    block the trainers declare via ``set_vision_attn_wgrad_blocks``: the
    reference unfreeze policy trains whole blocks or nothing
    (``reference/trainers/maple.py:447-479``), so "attention weights
    frozen" and "MLP weights frozen" coincide per block."""
    from federated_multi_modal_tpu.ops.pallas.fused_block import (
        fused_block_train_enabled,
    )

    return fused_block_train_enabled()


def multi_head_attention(
    x: jax.Array,
    p,
    n_head: int,
    attn_mask: jax.Array = None,
) -> jax.Array:
    """Self-attention with packed QKV (torch ``nn.MultiheadAttention`` math).

    Args:
        x: ``(B, T, D)`` activations.
        p: dict with ``w_qkv (D, 3D)``, ``b_qkv (3D,)``, ``w_out (D, D)``,
           ``b_out (D,)``.
        n_head: number of attention heads.
        attn_mask: optional additive mask ``(T, T)`` (causal for text).
    """
    B, T, D = x.shape
    head_dim = D // n_head

    qkv = linear(x, p["w_qkv"], p["b_qkv"])  # (B, T, 3D)

    if _ATTENTION_IMPL == "pallas":
        from federated_multi_modal_tpu.ops.pallas.attention import (
            fused_attention_diff,
            packed_attention,
            packed_attention_eligible,
            packed_attention_masked,
            packed_attention_masked_eligible,
        )

        if packed_attention_eligible(B, T, D, n_head, attn_mask):
            # no-mask fast path (vision tower): one kernel each direction
            # straight over the packed QKV tensor
            out = packed_attention(qkv, n_head)
            return linear(out, p["w_out"], p["b_out"])
        if T >= 32 and packed_attention_masked_eligible(
            B, T, D, n_head, attn_mask
        ):
            # masked fast path (sequence-packed text rows, full 77-token
            # text): packed-QKV kernels with the static mask folded in
            out = packed_attention_masked(qkv, attn_mask, n_head)
            return linear(out, p["w_out"], p["b_out"])
        if T >= 32:
            q, k, v = jnp.split(qkv, 3, axis=-1)
            out = fused_attention_diff(q, k, v, n_head, attn_mask)
            return linear(out, p["w_out"], p["b_out"])
        # tiny sequences (EOT-truncated text prompts, T ~ 8-16): per-(b,h)
        # kernel launches cost more than the attention itself — XLA's fused
        # batched formulation wins, so fall through

    q, k, v = jnp.split(qkv, 3, axis=-1)

    def heads(t):  # (B, T, D) -> (B, H, T, hd)
        return t.reshape(B, T, n_head, head_dim).transpose(0, 2, 1, 3)

    q, k, v = heads(q), heads(k), heads(v)

    scale = 1.0 / jnp.sqrt(jnp.asarray(head_dim, jnp.float32))
    # fp32 accumulation for the score matmul and softmax
    scores = jnp.einsum(
        "bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32
    ) * scale
    if attn_mask is not None:
        scores = scores + attn_mask.astype(jnp.float32)
    probs = jax.nn.softmax(scores, axis=-1).astype(x.dtype)

    out = jnp.einsum("bhqk,bhkd->bhqd", probs, v)
    out = out.transpose(0, 2, 1, 3).reshape(B, T, D)
    return linear(out, p["w_out"], p["b_out"])


def mlp(x: jax.Array, p) -> jax.Array:
    h = quick_gelu(linear(x, p["w_fc"], p["b_fc"]))
    return linear(h, p["w_proj"], p["b_proj"])


def residual_block(
    x: jax.Array,
    p,
    n_head: int,
    attn_mask: jax.Array = None,
    attn_w_frozen: bool = False,
    inference: bool = False,
) -> jax.Array:
    """Pre-LN transformer block (``ResidualAttentionBlock`` semantics,
    reference ``clip/model.py:167-198``).

    ``attn_w_frozen=True`` asserts that d(w_qkv)/d(b_qkv) of THIS block are
    never consumed (the block's attention weights are frozen), which
    unlocks the fused LN+QKV+attention kernel on the mask-free path — its
    VJP is exact for x and the LN params but returns zero weight
    cotangents (ops/pallas/fused_block.py).

    ``inference=True`` additionally asserts that NO cotangent ever flows
    through the block (eval fast paths, frozen feature towers): the MLP
    half then also fuses (LN2 + fc + QuickGELU + proj + residual in one
    kernel, no VJP defined — differentiating it raises loudly).
    """
    if attn_w_frozen and attn_mask is None and _ATTENTION_IMPL == "pallas":
        from federated_multi_modal_tpu.ops.pallas.fused_block import (
            fused_ln_attention,
            fused_ln_attention_eligible,
            fused_ln_mlp_eligible,
            fused_ln_mlp_residual,
        )

        B, T, D = x.shape
        if fused_ln_attention_eligible(B, T, D, n_head, attn_mask):
            if inference:
                from federated_multi_modal_tpu.ops.pallas.fused_block import (
                    fused_block_eligible,
                    fused_block_residual,
                    fused_ln_attention_residual,
                )

                hidden = p["mlp"]["w_fc"].shape[-1]
                if fused_block_eligible(B, T, D, n_head, hidden, attn_mask):
                    # whole block in ONE kernel: one HBM read + one write
                    return fused_block_residual(x, p, n_head)
                x = fused_ln_attention_residual(x, p["ln_1"], p["attn"],
                                                n_head)
                if fused_ln_mlp_eligible(B, T, D, hidden):
                    return fused_ln_mlp_residual(x, p["ln_2"], p["mlp"])
                x = x + mlp(layer_norm(x, p["ln_2"]), p["mlp"])
                return x
            from federated_multi_modal_tpu.ops.pallas.fused_block import (
                fused_block_train,
                fused_block_train_eligible,
            )

            hidden_t = p["mlp"]["w_fc"].shape[-1]
            if fused_block_train_eligible(B, T, D, n_head, hidden_t,
                                          attn_mask):
                # whole-block TRAIN kernel: one kernel forward, one kernel
                # backward for the full pre-LN block.  Contract: every
                # non-LN weight of this block is frozen (the VJP returns
                # zero attention AND MLP weight cotangents) — guaranteed
                # by the trainers' wgrad declaration, which freezes whole
                # blocks (reference trainers/maple.py:447-479).
                return fused_block_train(x, p, n_head)
            a = fused_ln_attention(
                x, p["ln_1"], p["attn"]["w_qkv"], p["attn"]["b_qkv"], n_head
            )
            x = x + linear(a, p["attn"]["w_out"], p["attn"]["b_out"])
            x = x + mlp(layer_norm(x, p["ln_2"]), p["mlp"])
            return x
    if (not inference and attn_mask is None
            and _ATTENTION_IMPL == "pallas"):
        from federated_multi_modal_tpu.ops.pallas.fused_block import (
            fused_block_train_dw,
            fused_block_train_dw_enabled,
            fused_ln_attention_eligible,
            fused_ln_mlp_eligible,
        )

        if fused_block_train_dw_enabled():
            B, T, D = x.shape
            hidden = p["mlp"]["w_fc"].shape[-1]
            if (fused_ln_attention_eligible(B, T, D, n_head, attn_mask)
                    and fused_ln_mlp_eligible(B, T, D, hidden)):
                # TRAINABLE-block whole-block kernel: exact cotangents for
                # every weight (a drop-in autodiff replacement) — covers
                # vision resblocks.{last} under the MaPLe unfreeze policy
                return fused_block_train_dw(x, p, n_head)
    x = x + multi_head_attention(layer_norm(x, p["ln_1"]), p["attn"], n_head, attn_mask)
    x = x + mlp(layer_norm(x, p["ln_2"]), p["mlp"])
    return x


def build_causal_mask(context_length: int) -> jnp.ndarray:
    """Additive causal mask (reference ``CLIP.build_attention_mask``,
    ``clip/model.py:679-685``)."""
    mask = jnp.full((context_length, context_length), -jnp.inf, jnp.float32)
    return jnp.triu(mask, k=1)


def build_block_causal_mask(n_blocks: int, block_len: int) -> jnp.ndarray:
    """Block-diagonal causal mask for sequence-packed text rows.

    ``n_blocks`` independent sequences of ``block_len`` tokens share one
    packed row of ``n_blocks * block_len`` tokens; position ``i`` may attend
    to ``j`` iff both live in the same block and ``j <= i``.  Packing several
    EOT-truncated class prompts per row turns the text tower's tiny
    ``(T, T)`` attention matmuls into MXU-sized ``(128, 128)`` ones while
    computing mathematically identical per-sequence attention."""
    L = n_blocks * block_len
    idx = jnp.arange(L)
    same_block = (idx[:, None] // block_len) == (idx[None, :] // block_len)
    causal = idx[None, :] <= idx[:, None]
    return jnp.where(same_block & causal, 0.0, -jnp.inf).astype(jnp.float32)


def l2_normalize(x: jax.Array, axis: int = -1, eps: float = 1e-8) -> jax.Array:
    """fp32 L2 normalization (reference ``F.normalize(..., eps=1e-8)``,
    ``trainers/maple.py:340-341``)."""
    x32 = x.astype(jnp.float32)
    norm = jnp.linalg.norm(x32, axis=axis, keepdims=True)
    return x32 / jnp.maximum(norm, eps)
