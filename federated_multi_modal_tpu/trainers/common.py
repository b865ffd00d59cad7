"""Shared prompt-learner building blocks for the method trainers.

Covers the common pattern every reference prompt learner repeats
(``trainers/coop.py:63-119``, ``trainers/maple.py:96-149``,
``trainers/independentVL.py:65-119``):

* embed a context-init phrase ("a photo of a") to initialize ctx vectors
* tokenize ``"<prefix> <classname>."`` for every class
* register the frozen SOS prefix / class+EOS suffix embeddings
* assemble ``prefix + ctx + suffix`` into ``(n_cls, 77, d)`` prompts

plus the generalized class-token-position layout (end/middle/front,
``trainers/coop.py:129-183``) expressed as a static scatter so all three
positions compile to one gather — no per-class python loops at step time.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import List

import jax
import jax.numpy as jnp
import numpy as np

from federated_multi_modal_tpu.models.clip_model import embed_tokens
from federated_multi_modal_tpu.tokenizer import get_tokenizer, tokenize


@dataclass
class PromptConstants:
    """Frozen, class-conditioned tensors for a prompt learner."""

    tokenized: jnp.ndarray        # (n_cls, 77) int32
    eot_index: jnp.ndarray        # (n_cls,) int32
    token_prefix: jnp.ndarray     # (n_cls, 1, d)  SOS embedding
    token_suffix: jnp.ndarray     # (n_cls, 77-1-n_ctx, d)  class+EOS+pad
    full_embedding: jnp.ndarray   # (n_cls, 77, d) embeddings of the template
    name_lens: List[int] = field(default_factory=list)
    n_cls: int = 0
    n_ctx: int = 0
    # Static truncation point for the text tower: all EOT positions fall
    # before ``text_len``, so running only the first ``text_len`` tokens
    # through the causal transformer is exact (see encode_text_embedded).
    text_len: int = 77


def ctx_init_vectors(text_params, ctx_init: str, n_ctx: int) -> jnp.ndarray:
    """Embed the init phrase and take tokens 1..1+n_ctx
    (``trainers/maple.py:96-101``)."""
    phrase = ctx_init.replace("_", " ")
    tokens = tokenize(phrase)
    emb = embed_tokens(text_params, jnp.asarray(tokens))
    return emb[0, 1 : 1 + n_ctx, :].astype(jnp.float32)


def random_ctx_vectors(key, n_ctx: int, dim: int, n_cls: int = 0) -> jnp.ndarray:
    shape = (n_cls, n_ctx, dim) if n_cls else (n_ctx, dim)
    return (jax.random.normal(key, shape) * 0.02).astype(jnp.float32)


def build_prompt_constants(
    text_params, classnames: List[str], prompt_prefix: str, n_ctx: int
) -> PromptConstants:
    tok = get_tokenizer()
    classnames = [name.replace("_", " ") for name in classnames]
    name_lens = [len(tok.encode(name)) for name in classnames]
    prompts = [f"{prompt_prefix} {name}." for name in classnames]

    tokenized = jnp.asarray(tokenize(prompts))  # (n_cls, 77)
    embedding = embed_tokens(text_params, tokenized)
    eot_index = jnp.argmax(tokenized, axis=-1)
    # round up to the sublane multiple so the token axis tiles cleanly
    max_eot = int(jnp.max(eot_index)) + 1
    text_len = min(tokenized.shape[1], -(-max_eot // 8) * 8)

    return PromptConstants(
        tokenized=tokenized,
        eot_index=eot_index,
        token_prefix=embedding[:, :1, :],
        token_suffix=embedding[:, 1 + n_ctx :, :],
        full_embedding=embedding,
        name_lens=name_lens,
        n_cls=len(classnames),
        n_ctx=n_ctx,
        text_len=text_len,
    )


def assemble_prompts_end(ctx, prefix, suffix):
    """``cat(prefix, ctx, suffix)`` (``construct_prompts``,
    ``trainers/maple.py:152-166``).  ``ctx``: (n_ctx, d) shared or
    (n_cls, n_ctx, d) class-specific."""
    n_cls = prefix.shape[0]
    if ctx.ndim == 2:
        ctx = jnp.broadcast_to(ctx[None], (n_cls,) + ctx.shape)
    return jnp.concatenate(
        [prefix, ctx.astype(prefix.dtype), suffix], axis=1
    )


def build_position_layout(
    position: str, n_cls: int, n_ctx: int, seq_len: int, name_lens: List[int]
):
    """Static layout for end/middle/front class-token positions.

    Returns ``(is_ctx (n_cls, seq), ctx_slot (n_cls, seq), src_pos
    (n_cls, seq))`` where output position p of class i reads
    ``ctx[i, ctx_slot[i,p]]`` when ``is_ctx`` else
    ``full_embedding[i, src_pos[i,p]]``.
    """
    is_ctx = np.zeros((n_cls, seq_len), bool)
    ctx_slot = np.zeros((n_cls, seq_len), np.int32)
    src_pos = np.zeros((n_cls, seq_len), np.int32)

    for i in range(n_cls):
        name_len = name_lens[i]
        # token layout of full_embedding: [SOS, ctx*n_ctx(placeholder),
        # name*name_len, '.', EOS, pad...]
        if position == "end":
            order = (
                [("fix", 0)]
                + [("ctx", j) for j in range(n_ctx)]
                + [("fix", p) for p in range(1 + n_ctx, seq_len)]
            )
        elif position == "middle":
            half = n_ctx // 2
            order = (
                [("fix", 0)]
                + [("ctx", j) for j in range(half)]
                + [("fix", 1 + n_ctx + k) for k in range(name_len)]
                + [("ctx", j) for j in range(half, n_ctx)]
                + [("fix", p) for p in range(1 + n_ctx + name_len, seq_len)]
            )
        elif position == "front":
            order = (
                [("fix", 0)]
                + [("fix", 1 + n_ctx + k) for k in range(name_len)]
                + [("ctx", j) for j in range(n_ctx)]
                + [("fix", p) for p in range(1 + n_ctx + name_len, seq_len)]
            )
        else:
            raise ValueError(position)
        order = order[:seq_len]
        for p, (kind, idx) in enumerate(order):
            if kind == "ctx":
                is_ctx[i, p] = True
                ctx_slot[i, p] = idx
            else:
                src_pos[i, p] = idx

    return jnp.asarray(is_ctx), jnp.asarray(ctx_slot), jnp.asarray(src_pos)


def assemble_prompts_positional(ctx, full_embedding, layout):
    """Assemble prompts for any class-token position with one gather.

    Args:
        ctx: (n_ctx, d) shared or (n_cls, n_ctx, d) class-specific context.
        full_embedding: (n_cls, seq, d) template embeddings.
        layout: output of :func:`build_position_layout`.
    """
    is_ctx, ctx_slot, src_pos = layout
    n_cls = full_embedding.shape[0]
    if ctx.ndim == 2:
        ctx = jnp.broadcast_to(ctx[None], (n_cls,) + ctx.shape)
    ctx = ctx.astype(full_embedding.dtype)

    ctx_gathered = jnp.take_along_axis(ctx, ctx_slot[:, :, None], axis=1)
    fix_gathered = jnp.take_along_axis(full_embedding, src_pos[:, :, None], axis=1)
    return jnp.where(is_ctx[:, :, None], ctx_gathered, fix_gathered)


def linear_params(key, d_in: int, d_out: int) -> dict:
    """Kaiming-uniform linear init matching torch ``nn.Linear`` defaults."""
    k1, k2 = jax.random.split(key)
    bound = 1.0 / np.sqrt(d_in)
    return {
        "w": jax.random.uniform(k1, (d_in, d_out), minval=-bound, maxval=bound),
        "b": jax.random.uniform(k2, (d_out,), minval=-bound, maxval=bound),
    }


def apply_linear(p, x):
    return jnp.matmul(x, p["w"].astype(x.dtype)) + p["b"].astype(x.dtype)


def apply_prec(prec: str, clip_params):
    """Honor TRAINER.*.PREC: "fp32" upcasts the frozen CLIP weights to full
    precision; "fp16"/"amp"/"bf16" keep the TPU-native bf16 + fp32-LN
    policy (the analog of the reference's half/AMP modes)."""
    if prec == "fp32":
        import jax
        import jax.numpy as jnp

        return jax.tree_util.tree_map(
            lambda x: x.astype(jnp.float32), clip_params
        )
    return clip_params
