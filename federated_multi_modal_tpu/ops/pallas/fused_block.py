"""Fused LN1 -> QKV projection -> attention Pallas kernel (vision tower).

The production packed-QKV kernels (``attention.py``) are HBM-bound on the
QKV tensor: XLA's matmul writes ``(B, T, 3D)`` (471 MB at ViT-B/16 vision
shapes, B=512/T=200/bf16) and the kernel reads it straight back.  Computing
QKV *inside* the kernel from the 157 MB residual-stream input eliminates
that round-trip, plus the LayerNorm materialization in both directions —
measured ~0.7 ms/block forward over LN + XLA-matmul + packed-kernel on v5e
(docs/BENCH.md, round 2 prototype; this module is the production form).

Scope and contract:

* Mask-free attention only (the vision tower; masked text rows keep the
  packed kernels).
* The backward kernel recomputes LN/QKV/scores/probs in VMEM from the raw
  input — the only residual is ``x`` itself, which the surrounding
  residual-add keeps alive anyway: zero extra activation memory.
* ``d(x)``, ``d(ln.scale)`` and ``d(ln.bias)`` are exact (LayerNorms are
  trainable in EVERY block under the reference's unfreeze policy,
  ``reference/trainers/maple.py:447-479``).  **The QKV weight/bias
  cotangents are returned as zeros**: materializing d(QKV) for
  ``dW = xn^T d(QKV)`` would reintroduce the full HBM round-trip the
  kernel exists to remove.  Callers must therefore route this op ONLY
  through blocks whose attention weights are frozen — the reference policy
  freezes all but ``resblocks.{last}`` — via
  ``ops.primitives.set_vision_attn_wgrad_blocks``; the trainable last
  block stays on the autodiff (packed-kernel) path.  VMEM note: dxn is
  accumulated per head through W row-slices instead of concatenating a
  ``(GB, T, 3D)`` d(QKV) block, which is what lets the backward fit at
  useful group sizes.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np

from federated_multi_modal_tpu.ops.pallas.attention import (
    _auto_interpret,
    _key_mask,
    _round_up,
)

try:
    from jax.experimental import pallas as pl

    _PALLAS_OK = True
except Exception:  # pragma: no cover
    _PALLAS_OK = False


def fused_ln_attention_eligible(B: int, T: int, D: int, n_head: int,
                                attn_mask) -> bool:
    """The fused kernel applies to mask-free, lane-aligned towers.
    ``FMM_TPU_FUSED=0`` disables it (A/B benching + escape hatch)."""
    if os.environ.get("FMM_TPU_FUSED", "1").lower() in ("0", "off", "false"):
        return False
    if not _PALLAS_OK or attn_mask is not None:
        return False
    if D % n_head or D % 128:
        return False
    hd = D // n_head
    return hd % 8 == 0 and B >= 1


def _pick_gb(B: int, Tp: int, D: int, dtype, backward: bool) -> int:
    """Rows per grid step.  The forward fits GB=4 at ViT-B/16 vision shapes
    (GB=8 blows the ~16 MB VMEM: the fp32 QKV dot output alone is 14.7 MB);
    the backward carries the same recompute plus the fp32 dxn accumulator
    and per-head gradient temporaries.  ``FMM_TPU_FUSED_GB`` /
    ``FMM_TPU_FUSED_GB_BWD`` override for experiments."""
    env = "FMM_TPU_FUSED_GB_BWD" if backward else "FMM_TPU_FUSED_GB"
    cap = os.environ.get(env)
    if cap is not None:
        cap = int(cap)
    else:
        bytes_ = jnp.dtype(dtype).itemsize
        budget = 12 << 20
        cap = 1
        for g in (8, 4, 2, 1):
            # resident per step: x/dy/dx tiles, fp32 LN temporaries, the
            # fp32 QKV dot output + its cast, per-head fp32 score blocks,
            # and (backward) the fp32 dxn accumulator
            est = (3 + 4 * 2) * g * Tp * D * bytes_ + 4 * g * Tp * 3 * D
            if backward:
                est += 4 * g * Tp * D + 3 * 4 * g * Tp * Tp
            else:
                est += 2 * 4 * g * Tp * Tp
            if est <= budget:
                cap = g
                break
    for g in range(min(cap, B), 0, -1):
        if B % g == 0:
            return g
    return 1


def _fwd_kernel(x_ref, w_ref, bq_ref, g_ref, be_ref, o_ref, *, n_head,
                scale, valid_T):
    D = x_ref.shape[-1]
    hd = D // n_head
    x32 = x_ref[...].astype(jnp.float32)  # (GB, Tp, D)
    mu = jnp.mean(x32, -1, keepdims=True)
    var = jnp.mean(jnp.square(x32 - mu), -1, keepdims=True)
    xn = (x32 - mu) * jax.lax.rsqrt(var + 1e-5)
    xn = (xn * g_ref[...] + be_ref[...]).astype(x_ref.dtype)
    qkv = jax.lax.dot_general(
        xn, w_ref[...], (((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    qkv = (qkv + bq_ref[...].astype(jnp.float32)).astype(x_ref.dtype)
    outs = []
    for i in range(n_head):
        lo = i * hd
        q = qkv[:, :, lo:lo + hd]
        k = qkv[:, :, D + lo:D + lo + hd]
        v = qkv[:, :, 2 * D + lo:2 * D + lo + hd]
        s = jax.lax.dot_general(
            q, k, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ) * scale
        if valid_T is not None:
            s = _key_mask(s, valid_T)
        p = jax.nn.softmax(s, axis=-1).astype(v.dtype)
        outs.append(
            jax.lax.dot_general(
                p, v, (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            ).astype(o_ref.dtype)
        )
    o_ref[...] = jnp.concatenate(outs, axis=-1)


def _fwd_kernel_outproj(x_ref, w_ref, bq_ref, g_ref, be_ref, wo_ref, bo_ref,
                        o_ref, *, n_head, scale, valid_T):
    """Inference-only extension of :func:`_fwd_kernel`: also applies the
    output projection and the residual add in-kernel, so the per-block
    attention half makes exactly one HBM read (x) and one write (x + out).
    """
    D = x_ref.shape[-1]
    hd = D // n_head
    x32 = x_ref[...].astype(jnp.float32)
    mu = jnp.mean(x32, -1, keepdims=True)
    var = jnp.mean(jnp.square(x32 - mu), -1, keepdims=True)
    xn = (x32 - mu) * jax.lax.rsqrt(var + 1e-5)
    xn = (xn * g_ref[...] + be_ref[...]).astype(x_ref.dtype)
    qkv = jax.lax.dot_general(
        xn, w_ref[...], (((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    qkv = (qkv + bq_ref[...].astype(jnp.float32)).astype(x_ref.dtype)
    outs = []
    for i in range(n_head):
        lo = i * hd
        q = qkv[:, :, lo:lo + hd]
        k = qkv[:, :, D + lo:D + lo + hd]
        v = qkv[:, :, 2 * D + lo:2 * D + lo + hd]
        s = jax.lax.dot_general(
            q, k, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ) * scale
        if valid_T is not None:
            s = _key_mask(s, valid_T)
        p = jax.nn.softmax(s, axis=-1).astype(v.dtype)
        outs.append(
            jax.lax.dot_general(
                p, v, (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            ).astype(x_ref.dtype)
        )
    a = jnp.concatenate(outs, axis=-1)
    proj = jax.lax.dot_general(
        a, wo_ref[...], (((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + bo_ref[...].astype(jnp.float32)
    o_ref[...] = (x32 + proj).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("n_head", "interpret"))
def fused_ln_attention_residual(x, lnp, attnp, n_head: int, interpret=None):
    """``x + out_proj(attention(qkv(layer_norm(x))))`` in one kernel.

    Forward-only (no custom VJP — differentiation raises); inference
    towers route here from ``ops.primitives.residual_block``.
    """
    B, T, D = x.shape
    hd = D // n_head
    Tp = _round_up(T, 8)
    GB = _pick_gb(B, Tp, D, x.dtype, backward=False)
    g2, be2, w2, bq2 = _prep(x, lnp, attnp["w_qkv"], attnp["b_qkv"])
    wo = attnp["w_out"].astype(x.dtype)
    bo = attnp["b_out"].reshape(1, D).astype(x.dtype)
    if Tp != T:
        x = jnp.pad(x, ((0, 0), (0, Tp - T), (0, 0)))
    blk = pl.BlockSpec((GB, Tp, D), lambda i: (i, 0, 0))
    out = pl.pallas_call(
        functools.partial(
            _fwd_kernel_outproj, n_head=n_head,
            scale=1.0 / float(np.sqrt(hd)),
            valid_T=None if Tp == T else T,
        ),
        out_shape=jax.ShapeDtypeStruct((B, Tp, D), x.dtype),
        grid=(B // GB,),
        in_specs=[
            blk,
            pl.BlockSpec((D, 3 * D), lambda i: (0, 0)),
            pl.BlockSpec((1, 3 * D), lambda i: (0, 0)),
            pl.BlockSpec((1, D), lambda i: (0, 0)),
            pl.BlockSpec((1, D), lambda i: (0, 0)),
            pl.BlockSpec((D, D), lambda i: (0, 0)),
            pl.BlockSpec((1, D), lambda i: (0, 0)),
        ],
        out_specs=blk,
        interpret=_auto_interpret(interpret),
    )(x, w2, bq2, g2, be2, wo, bo)
    return out[:, :T] if Tp != T else out


def _bwd_kernel(x_ref, w_ref, bq_ref, g_ref, be_ref, dy_ref, dx_ref,
                dgam_ref, dbet_ref, *, n_head, scale, valid_T):
    D = x_ref.shape[-1]
    hd = D // n_head
    # --- recompute the forward up to the attention probs (all in VMEM) ---
    x32 = x_ref[...].astype(jnp.float32)
    mu = jnp.mean(x32, -1, keepdims=True)
    var = jnp.mean(jnp.square(x32 - mu), -1, keepdims=True)
    rstd = jax.lax.rsqrt(var + 1e-5)
    xhat = (x32 - mu) * rstd
    xn = (xhat * g_ref[...] + be_ref[...]).astype(x_ref.dtype)
    qkv = jax.lax.dot_general(
        xn, w_ref[...], (((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    qkv = (qkv + bq_ref[...].astype(jnp.float32)).astype(x_ref.dtype)
    # --- attention backward, folding d(QKV) through W^T per head so the
    # (GB, Tp, 3D) gradient tensor is never materialized ---
    dyln = jnp.zeros(x32.shape, jnp.float32)  # grad wrt the LN output
    w = w_ref[...]
    for i in range(n_head):
        lo = i * hd
        q = qkv[:, :, lo:lo + hd]
        k = qkv[:, :, D + lo:D + lo + hd]
        v = qkv[:, :, 2 * D + lo:2 * D + lo + hd]
        g_h = dy_ref[:, :, lo:lo + hd]
        s = jax.lax.dot_general(
            q, k, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ) * scale
        if valid_T is not None:
            s = _key_mask(s, valid_T)
        p32 = jax.nn.softmax(s, axis=-1)
        p = p32.astype(v.dtype)
        dv = jax.lax.dot_general(
            p, g_h, (((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        dp = jax.lax.dot_general(
            g_h, v, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        ds = (p32 * (dp - jnp.sum(dp * p32, -1, keepdims=True))
              * scale).astype(k.dtype)
        dq = jax.lax.dot_general(
            ds, k, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        dk = jax.lax.dot_general(
            ds, q, (((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        dqkv_h = jnp.concatenate(
            [dq.astype(x_ref.dtype), dk.astype(x_ref.dtype),
             dv.astype(x_ref.dtype)], axis=-1,
        )  # (GB, Tp, 3*hd)
        w_h = jnp.concatenate(
            [w[:, lo:lo + hd], w[:, D + lo:D + lo + hd],
             w[:, 2 * D + lo:2 * D + lo + hd]], axis=-1,
        )  # (D, 3*hd)
        dyln = dyln + jax.lax.dot_general(
            dqkv_h, w_h, (((2,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    # --- LN parameter grads: accumulated across grid steps ---
    @pl.when(pl.program_id(0) == 0)
    def _init():
        dgam_ref[...] = jnp.zeros_like(dgam_ref)
        dbet_ref[...] = jnp.zeros_like(dbet_ref)

    dgam_ref[...] += jnp.sum(dyln * xhat, axis=(0, 1))[None]
    dbet_ref[...] += jnp.sum(dyln, axis=(0, 1))[None]
    # --- LN backward to the raw input ---
    dg = dyln * g_ref[...]
    m1 = jnp.mean(dg, -1, keepdims=True)
    m2 = jnp.mean(dg * xhat, -1, keepdims=True)
    dx_ref[...] = (rstd * (dg - m1 - xhat * m2)).astype(dx_ref.dtype)


def _prep(x, lnp, w, b):
    D = x.shape[-1]
    g2 = lnp["scale"].reshape(1, D).astype(jnp.float32)
    be2 = lnp["bias"].reshape(1, D).astype(jnp.float32)
    w2 = w.astype(x.dtype)
    bq2 = b.reshape(1, 3 * D).astype(x.dtype)
    return g2, be2, w2, bq2


@functools.partial(jax.jit, static_argnames=("n_head", "interpret"))
def fused_ln_attention_fwd(x, lnp, w, b, n_head: int, interpret=None):
    """LN1 -> QKV -> attention in one kernel.  ``x (B, T, D)``,
    ``w (D, 3D)``, ``b (3D,)``; returns the pre-out-projection attention
    output ``(B, T, D)``."""
    B, T, D = x.shape
    hd = D // n_head
    Tp = _round_up(T, 8)
    GB = _pick_gb(B, Tp, D, x.dtype, backward=False)
    g2, be2, w2, bq2 = _prep(x, lnp, w, b)
    if Tp != T:
        x = jnp.pad(x, ((0, 0), (0, Tp - T), (0, 0)))
    blk = pl.BlockSpec((GB, Tp, D), lambda i: (i, 0, 0))
    out = pl.pallas_call(
        functools.partial(
            _fwd_kernel, n_head=n_head, scale=1.0 / float(np.sqrt(hd)),
            valid_T=None if Tp == T else T,
        ),
        out_shape=jax.ShapeDtypeStruct((B, Tp, D), x.dtype),
        grid=(B // GB,),
        in_specs=[
            blk,
            pl.BlockSpec((D, 3 * D), lambda i: (0, 0)),
            pl.BlockSpec((1, 3 * D), lambda i: (0, 0)),
            pl.BlockSpec((1, D), lambda i: (0, 0)),
            pl.BlockSpec((1, D), lambda i: (0, 0)),
        ],
        out_specs=blk,
        interpret=_auto_interpret(interpret),
    )(x, w2, bq2, g2, be2)
    return out[:, :T] if Tp != T else out


@functools.partial(jax.jit, static_argnames=("n_head", "interpret"))
def fused_ln_attention_bwd(x, lnp, w, b, dy, n_head: int, interpret=None):
    """(dx, dgamma, dbeta) for :func:`fused_ln_attention_fwd` — one kernel,
    everything recomputed in VMEM from the raw input."""
    B, T, D = x.shape
    hd = D // n_head
    Tp = _round_up(T, 8)
    GB = _pick_gb(B, Tp, D, x.dtype, backward=True)
    g2, be2, w2, bq2 = _prep(x, lnp, w, b)
    if Tp != T:
        pad = ((0, 0), (0, Tp - T), (0, 0))
        x = jnp.pad(x, pad)
        dy = jnp.pad(dy, pad)
    blk = pl.BlockSpec((GB, Tp, D), lambda i: (i, 0, 0))
    acc = pl.BlockSpec((1, D), lambda i: (0, 0))
    dx, dgam, dbet = pl.pallas_call(
        functools.partial(
            _bwd_kernel, n_head=n_head, scale=1.0 / float(np.sqrt(hd)),
            valid_T=None if Tp == T else T,
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, Tp, D), x.dtype),
            jax.ShapeDtypeStruct((1, D), jnp.float32),
            jax.ShapeDtypeStruct((1, D), jnp.float32),
        ),
        grid=(B // GB,),
        in_specs=[
            blk,
            pl.BlockSpec((D, 3 * D), lambda i: (0, 0)),
            pl.BlockSpec((1, 3 * D), lambda i: (0, 0)),
            pl.BlockSpec((1, D), lambda i: (0, 0)),
            pl.BlockSpec((1, D), lambda i: (0, 0)),
            blk,
        ],
        out_specs=(blk, acc, acc),
        interpret=_auto_interpret(interpret),
    )(x, w2, bq2, g2, be2, dy)
    if Tp != T:
        dx = dx[:, :T]
    return dx, dgam[0], dbet[0]


# --------------------------------------------------------------------------
# fused LN2 -> MLP -> residual (inference towers only: no VJP is defined,
# so differentiating through it raises loudly — callers guarantee the tower
# is a constant subgraph, see ``encode_image(inference=True)``)
# --------------------------------------------------------------------------


def fused_ln_mlp_eligible(B: int, T: int, D: int, hidden: int) -> bool:
    """Mask-free per-token op; needs lane-aligned D and the CLIP 4x MLP.
    Shares the ``FMM_TPU_FUSED`` escape hatch with the attention kernel."""
    if os.environ.get("FMM_TPU_FUSED", "1").lower() in ("0", "off", "false"):
        return False
    return _PALLAS_OK and D % 128 == 0 and hidden == 4 * D and B >= 1


def _mlp_kernel(x_ref, g_ref, be_ref, wfc_ref, bfc_ref, wpr_ref, bpr_ref,
                o_ref, *, n_chunks):
    """out = x + QuickGELU(LN(x) @ w_fc + b_fc) @ w_proj + b_proj.

    The full weights stay VMEM-resident across grid steps (they are
    grid-invariant blocks); the (GB, Tp, 4D) hidden activation is never
    materialized — it is produced and consumed in ``n_chunks`` column
    slices of w_fc / row slices of w_proj, accumulating the projection
    output in fp32.  This removes the two largest HBM round-trips of the
    block (the 629 MB fc intermediate at ViT-B/16 vision shapes, plus the
    LN materialization)."""
    D = x_ref.shape[-1]
    H = wfc_ref.shape[-1]
    hc = H // n_chunks
    x32 = x_ref[...].astype(jnp.float32)  # (GB, Tp, D)
    mu = jnp.mean(x32, -1, keepdims=True)
    var = jnp.mean(jnp.square(x32 - mu), -1, keepdims=True)
    xn = (x32 - mu) * jax.lax.rsqrt(var + 1e-5)
    xn = (xn * g_ref[...] + be_ref[...]).astype(x_ref.dtype)
    acc = x32 + bpr_ref[...].astype(jnp.float32)
    for c in range(n_chunks):
        lo = c * hc
        h = jax.lax.dot_general(
            xn, wfc_ref[:, lo:lo + hc], (((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + bfc_ref[:, lo:lo + hc].astype(jnp.float32)
        h = (h * jax.nn.sigmoid(1.702 * h)).astype(x_ref.dtype)  # QuickGELU
        acc = acc + jax.lax.dot_general(
            h, wpr_ref[lo:lo + hc, :], (((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    o_ref[...] = acc.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def fused_ln_mlp_residual(x, lnp, mlpp, interpret=None):
    """``x + mlp(layer_norm(x, ln_2), mlp_params)`` in one kernel.

    Forward-only (no custom VJP — differentiation raises); inference
    towers route here from ``ops.primitives.residual_block``.
    """
    B, T, D = x.shape
    H = mlpp["w_fc"].shape[-1]
    Tp = _round_up(T, 8)
    # weights are VMEM-resident (9.4 MB bf16 at ViT-B/16): GB=1 with the
    # hidden dim consumed in chunks keeps the step under ~14 MB; fp32
    # needs finer chunking and GB stays 1 either way
    GB = 1
    cap = os.environ.get("FMM_TPU_FUSED_GB_MLP")
    if cap is not None:
        GB = max(g for g in range(1, int(cap) + 1) if B % g == 0)
    n_chunks = 2 if jnp.dtype(x.dtype).itemsize <= 2 else 4
    g2 = lnp["scale"].reshape(1, D).astype(jnp.float32)
    be2 = lnp["bias"].reshape(1, D).astype(jnp.float32)
    wfc = mlpp["w_fc"].astype(x.dtype)
    bfc = mlpp["b_fc"].reshape(1, H).astype(x.dtype)
    wpr = mlpp["w_proj"].astype(x.dtype)
    bpr = mlpp["b_proj"].reshape(1, D).astype(x.dtype)
    if Tp != T:
        x = jnp.pad(x, ((0, 0), (0, Tp - T), (0, 0)))
    blk = pl.BlockSpec((GB, Tp, D), lambda i: (i, 0, 0))
    out = pl.pallas_call(
        functools.partial(_mlp_kernel, n_chunks=n_chunks),
        out_shape=jax.ShapeDtypeStruct((B, Tp, D), x.dtype),
        grid=(B // GB,),
        in_specs=[
            blk,
            pl.BlockSpec((1, D), lambda i: (0, 0)),
            pl.BlockSpec((1, D), lambda i: (0, 0)),
            pl.BlockSpec((D, H), lambda i: (0, 0)),
            pl.BlockSpec((1, H), lambda i: (0, 0)),
            pl.BlockSpec((H, D), lambda i: (0, 0)),
            pl.BlockSpec((1, D), lambda i: (0, 0)),
        ],
        out_specs=blk,
        interpret=_auto_interpret(interpret),
    )(x, g2, be2, wfc, bfc, wpr, bpr)
    return out[:, :T] if Tp != T else out


# --------------------------------------------------------------------------
# whole-block fused inference kernel: LN1 -> QKV -> attention -> out-proj ->
# +x -> LN2 -> fc -> QuickGELU -> proj -> +y, ONE pallas_call per block.
#
# Design note (round-3 verdict task 3): the two-kernel fast path makes a
# full (B, T, D) HBM write+read between the attention and MLP halves
# (~2x157 MB per block at bench shapes).  The roadmap sized a
# "stream-MLP-weights-through-a-second-grid-dimension" merge, but that
# design REFETCHES the streamed weights once per batch block:
# (B/GB) * ~15 MB >> the 314 MB it saves, a structural net loss.  Instead
# ALL block weights (~15 MB bf16 at ViT-B/16) stay VMEM-resident as
# grid-invariant blocks and the kernel raises ``vmem_limit_bytes`` past
# Mosaic's default scoped budget (v5e has 128 MB of physical VMEM; the
# default limit is what capped the round-2 kernels at ~16 MB).  The
# attention-half intermediate ``y`` then lives in fp32 VMEM only.
# --------------------------------------------------------------------------


def fused_block_eligible(B, T, D, n_head, hidden, attn_mask) -> bool:
    """Whole-block fusion: both halves must be eligible, plus the
    ``FMM_TPU_FUSED_BLOCK`` escape hatch (A/B benching)."""
    if os.environ.get("FMM_TPU_FUSED_BLOCK", "1").lower() in (
            "0", "off", "false"):
        return False
    return (
        fused_ln_attention_eligible(B, T, D, n_head, attn_mask)
        and fused_ln_mlp_eligible(B, T, D, hidden)
    )


def _block_body32(x32, dtype, w, bq, g1, b1, wo, bo, g2, b2, wfc, bfc, wpr,
                  bpr, *, n_head, scale, valid_T, n_chunks):
    """One full pre-LN block on an fp32 VMEM value: fp32 in -> fp32 out.

    Shared by the single-block kernel and the block-group kernel.  ``dtype``
    is the storage dtype (dot operands are cast to it, accumulation stays
    fp32, matching the unfused path's mixed-precision policy).
    """
    D = x32.shape[-1]
    H = wfc.shape[-1]
    hd = D // n_head
    hc = H // n_chunks
    # ---- attention half: y = x + b_out + attn(ln1(x)) @ w_out ----
    mu = jnp.mean(x32, -1, keepdims=True)
    var = jnp.mean(jnp.square(x32 - mu), -1, keepdims=True)
    xn = (x32 - mu) * jax.lax.rsqrt(var + 1e-5)
    xn = (xn * g1 + b1).astype(dtype)
    qkv = jax.lax.dot_general(
        xn, w, (((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    qkv = (qkv + bq.astype(jnp.float32)).astype(dtype)
    outs = []
    for i in range(n_head):
        lo = i * hd
        q = qkv[:, :, lo:lo + hd]
        k = qkv[:, :, D + lo:D + lo + hd]
        v = qkv[:, :, 2 * D + lo:2 * D + lo + hd]
        s = jax.lax.dot_general(
            q, k, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ) * scale
        if valid_T is not None:
            s = _key_mask(s, valid_T)
        p = jax.nn.softmax(s, axis=-1).astype(v.dtype)
        outs.append(
            jax.lax.dot_general(
                p, v, (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            ).astype(dtype)
        )
    # one K=D projection dot (per-head K=hd folding measured -5% e2e:
    # M=200/K=64 dots sit at the known per-head MXU cap)
    a = jnp.concatenate(outs, axis=-1)
    y = x32 + bo.astype(jnp.float32) + jax.lax.dot_general(
        a, wo, (((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    # ---- MLP half: out = y + b_proj + gelu(ln2(y) @ w_fc + b_fc) @ w_proj
    # (y stays fp32 in VMEM — the two-kernel path rounded it to bf16
    # through HBM; this is strictly closer to the unfused fp32 math) ----
    mu2 = jnp.mean(y, -1, keepdims=True)
    var2 = jnp.mean(jnp.square(y - mu2), -1, keepdims=True)
    xn2 = (y - mu2) * jax.lax.rsqrt(var2 + 1e-5)
    xn2 = (xn2 * g2 + b2).astype(dtype)
    acc = y + bpr.astype(jnp.float32)
    for c in range(n_chunks):
        lo = c * hc
        h = jax.lax.dot_general(
            xn2, wfc[:, lo:lo + hc], (((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + bfc[:, lo:lo + hc].astype(jnp.float32)
        h = (h * jax.nn.sigmoid(1.702 * h)).astype(dtype)  # QuickGELU
        acc = acc + jax.lax.dot_general(
            h, wpr[lo:lo + hc, :], (((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    return acc




def fused_block_residual(x, p, n_head: int, interpret=None):
    """The FULL pre-LN transformer block (reference
    ``clip/model.py:167-198``) as one kernel: exactly one HBM read (x) and
    one HBM write per block on the inference fast path.

    A single block IS a group of one — delegates to
    :func:`fused_block_group_residual` so the GB/VMEM/padding logic exists
    once.

    Forward-only (no custom VJP — differentiation raises); inference
    towers route here from ``ops.primitives.residual_block``.
    """
    return fused_block_group_residual(x, (p,), n_head, interpret=interpret)


# --------------------------------------------------------------------------
# block-GROUP fused inference kernel: G consecutive blocks per pallas_call,
# with deep-prompt injection done IN-KERNEL.
#
# Mechanism (round 3, after the whole-block merge): the remaining HBM
# traffic on the eval fast path is the (B, T, D) write+read BETWEEN blocks
# (11 boundaries x ~314 MB at bench shapes) plus the prompt-injection
# concats, each of which rewrites the whole (B, T, D) tensor to replace a
# few trailing rows (reference semantics ``clip/model.py:320-349``).
# Processing G blocks per kernel removes (G-1)/G of the boundaries and
# moves the in-group injections into VMEM row writes.  All G blocks'
# weights (~15 MB bf16 each) stay grid-invariant-resident, so G is capped
# by the VMEM budget (FMM_TPU_FUSED_VMEM, default 100 MB -> G <= 6).
# The running activation stays fp32 in VMEM across the whole group (the
# per-block path rounds to bf16 through HBM at every boundary), so the
# group kernel is strictly closer to the unfused fp32 math.
# --------------------------------------------------------------------------

_GROUP_WEIGHT_KEYS = 12  # refs per block: w,bq,g1,b1,wo,bo,g2,b2,wfc,bfc,wpr,bpr


def fused_block_group_size() -> int:
    """Blocks per kernel on the inference fast path (``FMM_TPU_FUSED_NBLK``).
    1 = the round-3 whole-block kernel per block (current default until the
    group form is A/B-measured on hardware)."""
    try:
        return max(1, int(os.environ.get("FMM_TPU_FUSED_NBLK", "1")))
    except ValueError:  # pragma: no cover
        return 1


def _group_kernel(*refs, n_blocks, n_head, scale, valid_T, n_chunks,
                  inject_flags, has_extra, n_ctx, n_extra, T):
    """refs = [x] + 12*n_blocks weight refs + one (n_ctx, D) prompt ref per
    injecting block + (optional) extra-tokens ref + [out]."""
    x_ref = refs[0]
    o_ref = refs[-1]
    wrefs = refs[1:1 + _GROUP_WEIGHT_KEYS * n_blocks]
    n_inject = sum(inject_flags)
    prefs = refs[1 + _GROUP_WEIGHT_KEYS * n_blocks:
                 1 + _GROUP_WEIGHT_KEYS * n_blocks + n_inject]
    # positional rather than refs[-2]: the layout is
    # [x, 12*n_blocks weights, n_inject prompts, extra?, out], so both
    # forms agree whenever has_extra — the positional index just states
    # the layout explicitly instead of counting from the end (the
    # extra-without-injection combination is rejected at the public API)
    eref = (refs[1 + _GROUP_WEIGHT_KEYS * n_blocks + n_inject]
            if has_extra else None)

    x32 = x_ref[...].astype(jnp.float32)
    GB = x32.shape[0]
    p_i = 0
    for g in range(n_blocks):
        if inject_flags[g]:
            # replace the trailing prompt rows (and per-sample extra rows)
            # of the VALID region [0, T); padded rows [T, Tp) are dead
            parts = [x32[:, : T - n_ctx - n_extra]]
            pv = prefs[p_i][...].astype(jnp.float32)  # (n_ctx, D)
            parts.append(jnp.broadcast_to(pv[None], (GB,) + pv.shape))
            p_i += 1
            if n_extra:
                parts.append(eref[...].astype(jnp.float32))
            if x32.shape[1] > T:
                parts.append(x32[:, T:])
            x32 = jnp.concatenate(parts, axis=1)
        w = [r[...] for r in
             wrefs[g * _GROUP_WEIGHT_KEYS:(g + 1) * _GROUP_WEIGHT_KEYS]]
        x32 = _block_body32(
            x32, x_ref.dtype, *w,
            n_head=n_head, scale=scale, valid_T=valid_T, n_chunks=n_chunks,
        )
    o_ref[...] = x32.astype(o_ref.dtype)


def fused_block_group_residual(x, blocks, n_head: int,
                               inject_flags: tuple = (),
                               prompts=(), extra=None, interpret=None):
    """Run ``len(blocks)`` consecutive pre-LN blocks in ONE kernel.

    Args:
        x: ``(B, T, D)`` residual stream.
        blocks: sequence of block param dicts (``ln_1/attn/ln_2/mlp``).
        inject_flags: per-block bools — True means "before this block,
          replace the trailing prompt (+extra) rows", i.e. the deep-prompt
          injection the encoder loop otherwise does between block calls
          (``models/clip_model.py::encode_image``).
        prompts: one ``(n_ctx, D)`` array per True flag, in block order
          (shared across the batch, like ``_broadcast_prompt``'s input).
        extra: optional ``(B, k, D)`` per-sample tokens re-injected
          alongside every prompt (the MaPLe caption branch).

    Forward-only (no VJP — differentiation raises); eval towers only.

    The ``FMM_TPU_FUSED_GB_BLK``/``FMM_TPU_FUSED_VMEM`` knobs are read HERE
    (trace time of the caller) and passed to the jitted implementation as
    static arguments, so changing a knob retraces this function.  NB: a
    caller that already baked this call into its own ``jax.jit`` cache
    (e.g. the eval fast path) keeps its old trace — restart or clear the
    caller's cache after changing a knob mid-process.
    """
    if extra is not None and not any(inject_flags):
        raise ValueError(
            "fused_block_group_residual: `extra` tokens are only consumed "
            "at injection points, but every inject_flag is False — pass at "
            "least one True flag or drop `extra`"
        )
    # GB sweep on the v5e (same session, docs/BENCH.md): GB=2 wins — 4060
    # img/s eval e2e vs 3979 (GB=1) / 3698 (GB=4) / 3868 (GB=8) / 3790
    # (two-kernel baseline).  The small working set pipelines best once
    # the weights are resident.  Values <= 0 clamp to 1 (the sibling
    # FMM_TPU_FUSED_BLOCK knob is the on/off switch, not this one).
    gb_knob = max(1, int(os.environ.get("FMM_TPU_FUSED_GB_BLK", "2")))
    vmem_bytes = int(os.environ.get("FMM_TPU_FUSED_VMEM", 100 << 20))
    return _fused_block_group_jit(
        x, blocks, tuple(prompts), extra,
        n_head=n_head, inject_flags=tuple(inject_flags),
        interpret=interpret, gb_knob=gb_knob, vmem_bytes=vmem_bytes,
    )


@functools.partial(jax.jit, static_argnames=("n_head", "inject_flags",
                                             "interpret", "gb_knob",
                                             "vmem_bytes"))
def _fused_block_group_jit(x, blocks, prompts, extra, *, n_head: int,
                           inject_flags: tuple, interpret, gb_knob: int,
                           vmem_bytes: int):
    B, T, D = x.shape
    G = len(blocks)
    if not inject_flags:
        inject_flags = (False,) * G
    assert len(inject_flags) == G and len(prompts) == sum(inject_flags)
    H = blocks[0]["mlp"]["w_fc"].shape[-1]
    hd = D // n_head
    Tp = _round_up(T, 8)
    GB = max(g for g in range(1, min(gb_knob, B) + 1) if B % g == 0)
    n_chunks = 2 if jnp.dtype(x.dtype).itemsize <= 2 else 4
    n_ctx = prompts[0].shape[0] if prompts else 0
    n_extra = extra.shape[1] if extra is not None else 0

    operands = []
    in_specs = []
    row = lambda shape: pl.BlockSpec(shape, lambda i: (0, 0))  # noqa: E731
    for p in blocks:
        g1, b1, w2, bq2 = _prep(x, p["ln_1"], p["attn"]["w_qkv"],
                                p["attn"]["b_qkv"])
        operands += [
            w2, bq2, g1, b1,
            p["attn"]["w_out"].astype(x.dtype),
            p["attn"]["b_out"].reshape(1, D).astype(x.dtype),
            p["ln_2"]["scale"].reshape(1, D).astype(jnp.float32),
            p["ln_2"]["bias"].reshape(1, D).astype(jnp.float32),
            p["mlp"]["w_fc"].astype(x.dtype),
            p["mlp"]["b_fc"].reshape(1, H).astype(x.dtype),
            p["mlp"]["w_proj"].astype(x.dtype),
            p["mlp"]["b_proj"].reshape(1, D).astype(x.dtype),
        ]
        in_specs += [
            row((D, 3 * D)), row((1, 3 * D)), row((1, D)), row((1, D)),
            row((D, D)), row((1, D)), row((1, D)), row((1, D)),
            row((D, H)), row((1, H)), row((H, D)), row((1, D)),
        ]
    for pv in prompts:
        operands.append(pv.astype(x.dtype))
        in_specs.append(row((n_ctx, D)))
    if extra is not None:
        operands.append(extra.astype(x.dtype))
        in_specs.append(pl.BlockSpec((GB, n_extra, D), lambda i: (i, 0, 0)))

    if Tp != T:
        x = jnp.pad(x, ((0, 0), (0, Tp - T), (0, 0)))
    blk = pl.BlockSpec((GB, Tp, D), lambda i: (i, 0, 0))
    compiler_params = None
    if not _auto_interpret(interpret):
        from jax.experimental.pallas import tpu as pltpu

        compiler_params = pltpu.CompilerParams(
            vmem_limit_bytes=vmem_bytes,
        )
    out = pl.pallas_call(
        functools.partial(
            _group_kernel, n_blocks=G, n_head=n_head,
            scale=1.0 / float(np.sqrt(hd)),
            valid_T=None if Tp == T else T, n_chunks=n_chunks,
            inject_flags=tuple(inject_flags), has_extra=extra is not None,
            n_ctx=n_ctx, n_extra=n_extra, T=T,
        ),
        out_shape=jax.ShapeDtypeStruct((B, Tp, D), x.dtype),
        grid=(B // GB,),
        in_specs=[blk] + in_specs,
        out_specs=blk,
        interpret=_auto_interpret(interpret),
        compiler_params=compiler_params,
    )(x, *operands)
    return out[:, :T] if Tp != T else out


# --------------------------------------------------------------------------
# whole-block fused TRAIN kernel (round 5): the training sibling of
# ``fused_block_residual`` — forward + custom VJP for the FULL pre-LN block
# with on-the-fly LN moments and VMEM-resident weights (the round-3
# ``CompilerParams(vmem_limit_bytes)`` unlock applied to training).
#
# Contract: EVERY non-LN weight of the block must be frozen — the VJP is
# exact for x and both LayerNorms' scale/bias and returns **zeros for all
# attention AND MLP weight/bias cotangents**.  That is precisely the
# reference unfreeze policy for vision blocks 0..L-2: MaPLe trains the
# prompt learner, every LayerNorm, and the whole LAST block only
# (``reference/trainers/maple.py:447-479``); the other trainers train no
# tower weights at all.  The trainable last block stays on the autodiff
# (packed-kernel) path via ``set_vision_attn_wgrad_blocks``.
#
# Residual strategies (``FMM_TPU_FUSED_TRAIN_MODE``), all three measured
# same-session on v5e at bench shapes (docs/BENCH.md round 5):
#   * "save" (default, SHIPPED: 1402.7 vs 1323.9 img/s baseline, +5.95%
#     e2e at bwd GB=4): the forward additionally writes the post-cast QKV
#     tensor and the pre-activation MLP hidden — the SAME residuals the
#     unfused path saves (packed-kernel VJP keeps qkv; QuickGELU backward
#     keeps h) — so the backward has FLOPs parity with the unfused path
#     (one softmax recompute, exactly like the packed kernel's VJP) while
#     every LayerNorm forward/backward pass and elementwise round-trip is
#     fused into the kernels.  The attention-half output y is recomputed
#     from qkv (one out-proj dot) instead of stored.
#   * "save-y": "save" plus the attention-half output y stored from the
#     forward.  REJECTED: the extra (B, T, D) residual per block OOMs HBM
#     at bench shapes (16.46G needed of 15.75G).
#   * "recompute": x is the ONLY residual; the backward recomputes
#     LN1/QKV/attention/y/LN2/h entirely in VMEM.  REJECTED: 1292.3 img/s
#     (-2.4%) — the blocks are MXU-bound, so the +~65% backward matmul
#     recompute costs more than the saved bandwidth.
# --------------------------------------------------------------------------

_TRAIN_MODES = ("save", "save-y", "recompute")


def _flat2(t):
    """(GB, Tp, K) -> (GB*Tp, K): Mosaic's matmul takes exactly one
    contracting dim, so the dW reductions contract the merged row axis
    (a layout-free row-major reshape)."""
    return t.reshape(-1, t.shape[-1])


def fused_block_train_enabled() -> bool:
    """Gate for the whole-block fused TRAIN kernel
    (``FMM_TPU_FUSED_TRAIN_BLOCK``).  ON by default: measured +5.95% e2e
    on the MaPLe train step in "save" mode at bwd GB=4 (same-session A/B,
    docs/BENCH.md round 5).  ``0`` is the escape hatch / A-B baseline."""
    return os.environ.get("FMM_TPU_FUSED_TRAIN_BLOCK", "1").lower() in (
        "1", "on", "true",
    )


def fused_block_train_eligible(B, T, D, n_head, hidden, attn_mask) -> bool:
    """Whole-block TRAIN fusion: the gate plus both halves' shape rules."""
    if not fused_block_train_enabled():
        return False
    return (
        fused_ln_attention_eligible(B, T, D, n_head, attn_mask)
        and fused_ln_mlp_eligible(B, T, D, hidden)
    )


def _train_operands(x, p):
    """Weight operand list + specs shared by the train fwd/bwd kernels."""
    D = x.shape[-1]
    H = p["mlp"]["w_fc"].shape[-1]
    g1, b1, w2, bq2 = _prep(x, p["ln_1"], p["attn"]["w_qkv"],
                            p["attn"]["b_qkv"])
    operands = [
        w2, bq2, g1, b1,
        p["attn"]["w_out"].astype(x.dtype),
        p["attn"]["b_out"].reshape(1, D).astype(x.dtype),
        p["ln_2"]["scale"].reshape(1, D).astype(jnp.float32),
        p["ln_2"]["bias"].reshape(1, D).astype(jnp.float32),
        p["mlp"]["w_fc"].astype(x.dtype),
        p["mlp"]["b_fc"].reshape(1, H).astype(x.dtype),
        p["mlp"]["w_proj"].astype(x.dtype),
        p["mlp"]["b_proj"].reshape(1, D).astype(x.dtype),
    ]
    row = lambda shape: pl.BlockSpec(shape, lambda i: (0, 0))  # noqa: E731
    specs = [
        row((D, 3 * D)), row((1, 3 * D)), row((1, D)), row((1, D)),
        row((D, D)), row((1, D)), row((1, D)), row((1, D)),
        row((D, H)), row((1, H)), row((H, D)), row((1, D)),
    ]
    return operands, specs


def _train_fwd_kernel(*refs, n_head, scale, valid_T, n_chunks, save_y,
                      save_h=True):
    (x_ref, w_ref, bq_ref, g1_ref, b1_ref, wo_ref, bo_ref, g2_ref, b2_ref,
     wfc_ref, bfc_ref, wpr_ref, bpr_ref) = refs[:13]
    idx = 13
    o_ref, qkv_ref = refs[idx:idx + 2]
    idx += 2
    h_ref = None
    if save_h:
        h_ref = refs[idx]
        idx += 1
    y_ref = refs[idx] if save_y else None
    D = x_ref.shape[-1]
    H = wfc_ref.shape[-1]
    hd = D // n_head
    hc = H // n_chunks
    dtype = x_ref.dtype
    # ---- attention half ----
    x32 = x_ref[...].astype(jnp.float32)
    mu = jnp.mean(x32, -1, keepdims=True)
    var = jnp.mean(jnp.square(x32 - mu), -1, keepdims=True)
    xn = (x32 - mu) * jax.lax.rsqrt(var + 1e-5)
    xn = (xn * g1_ref[...] + b1_ref[...]).astype(dtype)
    qkv = jax.lax.dot_general(
        xn, w_ref[...], (((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    qkv = (qkv + bq_ref[...].astype(jnp.float32)).astype(dtype)
    qkv_ref[...] = qkv
    outs = []
    for i in range(n_head):
        lo = i * hd
        q = qkv[:, :, lo:lo + hd]
        k = qkv[:, :, D + lo:D + lo + hd]
        v = qkv[:, :, 2 * D + lo:2 * D + lo + hd]
        s = jax.lax.dot_general(
            q, k, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ) * scale
        if valid_T is not None:
            s = _key_mask(s, valid_T)
        p = jax.nn.softmax(s, axis=-1).astype(v.dtype)
        outs.append(
            jax.lax.dot_general(
                p, v, (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            ).astype(dtype)
        )
    a = jnp.concatenate(outs, axis=-1)
    y = x32 + bo_ref[...].astype(jnp.float32) + jax.lax.dot_general(
        a, wo_ref[...], (((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    if save_y:
        y_ref[...] = y.astype(y_ref.dtype)
    # ---- MLP half ----
    mu2 = jnp.mean(y, -1, keepdims=True)
    var2 = jnp.mean(jnp.square(y - mu2), -1, keepdims=True)
    xn2 = (y - mu2) * jax.lax.rsqrt(var2 + 1e-5)
    xn2 = (xn2 * g2_ref[...] + b2_ref[...]).astype(dtype)
    acc = y + bpr_ref[...].astype(jnp.float32)
    for c in range(n_chunks):
        lo = c * hc
        h32 = jax.lax.dot_general(
            xn2, wfc_ref[:, lo:lo + hc], (((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + bfc_ref[:, lo:lo + hc].astype(jnp.float32)
        if save_h:
            h_ref[:, :, lo:lo + hc] = h32.astype(h_ref.dtype)
        g = (h32 * jax.nn.sigmoid(1.702 * h32)).astype(dtype)  # QuickGELU
        acc = acc + jax.lax.dot_general(
            g, wpr_ref[lo:lo + hc, :], (((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    o_ref[...] = acc.astype(o_ref.dtype)


def _train_bwd_kernel(*refs, n_head, scale, valid_T, n_chunks, save, save_y,
                      wgrad=False, save_h=True):
    (x_ref, dy_ref, w_ref, bq_ref, g1_ref, b1_ref, wo_ref, bo_ref,
     g2_ref, b2_ref, wfc_ref, bfc_ref, wpr_ref, bpr_ref) = refs[:14]
    idx = 14
    qkv_ref = h_ref = y_ref = None
    if save:
        qkv_ref = refs[idx]
        idx += 1
        if save_h:
            h_ref = refs[idx]
            idx += 1
    if save_y:
        y_ref = refs[idx]
        idx += 1
    dx_ref, dg1_ref, db1_ref, dg2_ref, db2_ref = refs[idx:idx + 5]
    if wgrad:
        (dwq_ref, dbq_ref, dwo_ref, dbo_ref, dwfc_ref, dbfc_ref,
         dwpr_ref, dbpr_ref) = refs[idx + 5:idx + 13]

    D = x_ref.shape[-1]
    H = wfc_ref.shape[-1]
    hd = D // n_head
    hc = H // n_chunks
    dtype = x_ref.dtype
    w = w_ref[...]
    g1 = g1_ref[...]
    g2 = g2_ref[...]

    @pl.when(pl.program_id(0) == 0)
    def _init():
        dg1_ref[...] = jnp.zeros_like(dg1_ref)
        db1_ref[...] = jnp.zeros_like(db1_ref)
        dg2_ref[...] = jnp.zeros_like(dg2_ref)
        db2_ref[...] = jnp.zeros_like(db2_ref)
        if wgrad:
            dwq_ref[...] = jnp.zeros_like(dwq_ref)
            dbq_ref[...] = jnp.zeros_like(dbq_ref)
            dwo_ref[...] = jnp.zeros_like(dwo_ref)
            dbo_ref[...] = jnp.zeros_like(dbo_ref)
            dwfc_ref[...] = jnp.zeros_like(dwfc_ref)
            dbfc_ref[...] = jnp.zeros_like(dbfc_ref)
            dwpr_ref[...] = jnp.zeros_like(dwpr_ref)
            dbpr_ref[...] = jnp.zeros_like(dbpr_ref)

    # ---- recompute LN1 stats (x is in VMEM for dx anyway: no extra HBM
    # pass — this is the on-the-fly-moments part of the design) ----
    x32 = x_ref[...].astype(jnp.float32)
    mu1 = jnp.mean(x32, -1, keepdims=True)
    var1 = jnp.mean(jnp.square(x32 - mu1), -1, keepdims=True)
    rstd1 = jax.lax.rsqrt(var1 + 1e-5)
    xhat1 = (x32 - mu1) * rstd1

    xn1 = None
    if save:
        qkv = qkv_ref[...]
        if wgrad:  # dW_qkv needs the LN1 output; stats are already here
            xn1 = (xhat1 * g1 + b1_ref[...]).astype(dtype)
    else:
        xn1 = (xhat1 * g1 + b1_ref[...]).astype(dtype)
        qkv = jax.lax.dot_general(
            xn1, w, (((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        qkv = (qkv + bq_ref[...].astype(jnp.float32)).astype(dtype)

    a = None
    if save_y and not wgrad:
        y32 = y_ref[...].astype(jnp.float32)
    else:
        # one out-proj dot + the per-head attention forward from qkv
        # (wgrad mode always recomputes: dW_out needs the concat output a)
        outs = []
        for i in range(n_head):
            lo = i * hd
            q = qkv[:, :, lo:lo + hd]
            k = qkv[:, :, D + lo:D + lo + hd]
            v = qkv[:, :, 2 * D + lo:2 * D + lo + hd]
            s = jax.lax.dot_general(
                q, k, (((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            ) * scale
            if valid_T is not None:
                s = _key_mask(s, valid_T)
            p = jax.nn.softmax(s, axis=-1).astype(v.dtype)
            outs.append(
                jax.lax.dot_general(
                    p, v, (((2,), (1,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32,
                ).astype(dtype)
            )
        a = jnp.concatenate(outs, axis=-1)
        y32 = x32 + bo_ref[...].astype(jnp.float32) + jax.lax.dot_general(
            a, wo_ref[...], (((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    mu2 = jnp.mean(y32, -1, keepdims=True)
    var2 = jnp.mean(jnp.square(y32 - mu2), -1, keepdims=True)
    rstd2 = jax.lax.rsqrt(var2 + 1e-5)
    xhat2 = (y32 - mu2) * rstd2

    dout = dy_ref[...].astype(jnp.float32)
    dout_c = dout.astype(dtype)

    # ---- MLP backward (dxn2 always; dW_fc/dW_proj only in wgrad mode) ----
    xn2 = None
    if not (save and save_h) or wgrad:
        xn2 = (xhat2 * g2 + b2_ref[...]).astype(dtype)
    dxn2 = jnp.zeros(x32.shape, jnp.float32)
    for c in range(n_chunks):
        lo = c * hc
        if save and save_h:
            h32 = h_ref[:, :, lo:lo + hc].astype(jnp.float32)
        else:
            h32 = jax.lax.dot_general(
                xn2, wfc_ref[:, lo:lo + hc], (((2,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) + bfc_ref[:, lo:lo + hc].astype(jnp.float32)
        sig = jax.nn.sigmoid(1.702 * h32)
        dgelu = sig * (1.0 + 1.702 * h32 * (1.0 - sig))  # QuickGELU'
        dg_c = jax.lax.dot_general(
            dout_c, wpr_ref[lo:lo + hc, :], (((2,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dh_c = (dg_c * dgelu).astype(dtype)
        dxn2 = dxn2 + jax.lax.dot_general(
            dh_c, wfc_ref[:, lo:lo + hc], (((2,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        if wgrad:
            # dW_fc[:, c] = xn2^T dh_c ; dW_proj[c, :] = gelu(h_c)^T dout
            g_c = (h32 * sig).astype(dtype)
            dwfc_ref[:, lo:lo + hc] += jax.lax.dot_general(
                _flat2(xn2), _flat2(dh_c), (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            dbfc_ref[:, lo:lo + hc] += jnp.sum(
                dh_c.astype(jnp.float32), axis=(0, 1))[None]
            dwpr_ref[lo:lo + hc, :] += jax.lax.dot_general(
                _flat2(g_c), _flat2(dout_c), (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
    if wgrad:
        dbpr_ref[...] += jnp.sum(dout, axis=(0, 1))[None]
    dg2_ref[...] += jnp.sum(dxn2 * xhat2, axis=(0, 1))[None]
    db2_ref[...] += jnp.sum(dxn2, axis=(0, 1))[None]
    dgv2 = dxn2 * g2
    m1 = jnp.mean(dgv2, -1, keepdims=True)
    m2 = jnp.mean(dgv2 * xhat2, -1, keepdims=True)
    # total grad wrt y: residual branch + LN2 backward
    dyh = dout + rstd2 * (dgv2 - m1 - xhat2 * m2)

    # ---- attention backward (per head; d(QKV) folded through W^T row
    # slices so the (GB, Tp, 3D) gradient tensor is never materialized) ----
    dyh_c = dyh.astype(dtype)
    da = jax.lax.dot_general(
        dyh_c, wo_ref[...], (((2,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(dtype)
    if wgrad:
        # out-projection grads: dW_out = a^T dyh, db_out = sum(dyh)
        dwo_ref[...] += jax.lax.dot_general(
            _flat2(a), _flat2(dyh_c), (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dbo_ref[...] += jnp.sum(dyh, axis=(0, 1))[None]
    dyln1 = jnp.zeros(x32.shape, jnp.float32)
    for i in range(n_head):
        lo = i * hd
        q = qkv[:, :, lo:lo + hd]
        k = qkv[:, :, D + lo:D + lo + hd]
        v = qkv[:, :, 2 * D + lo:2 * D + lo + hd]
        da_h = da[:, :, lo:lo + hd]
        s = jax.lax.dot_general(
            q, k, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ) * scale
        if valid_T is not None:
            s = _key_mask(s, valid_T)
        p32 = jax.nn.softmax(s, axis=-1)
        p = p32.astype(v.dtype)
        dv = jax.lax.dot_general(
            p, da_h, (((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        dp = jax.lax.dot_general(
            da_h, v, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        ds = (p32 * (dp - jnp.sum(dp * p32, -1, keepdims=True))
              * scale).astype(dtype)
        dq = jax.lax.dot_general(
            ds, k, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        dk = jax.lax.dot_general(
            ds, q, (((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        dqkv_h = jnp.concatenate(
            [dq.astype(dtype), dk.astype(dtype), dv.astype(dtype)], axis=-1,
        )  # (GB, Tp, 3*hd)
        w_h = jnp.concatenate(
            [w[:, lo:lo + hd], w[:, D + lo:D + lo + hd],
             w[:, 2 * D + lo:2 * D + lo + hd]], axis=-1,
        )  # (D, 3*hd)
        dyln1 = dyln1 + jax.lax.dot_general(
            dqkv_h, w_h, (((2,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        if wgrad:
            # dW_qkv head slices: xn1^T [dq | dk | dv]; biases: row sums
            dw_h = jax.lax.dot_general(
                _flat2(xn1), _flat2(dqkv_h), (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # (D, 3*hd)
            db_h = jnp.sum(dqkv_h.astype(jnp.float32), axis=(0, 1))[None]
            dwq_ref[:, lo:lo + hd] += dw_h[:, :hd]
            dwq_ref[:, D + lo:D + lo + hd] += dw_h[:, hd:2 * hd]
            dwq_ref[:, 2 * D + lo:2 * D + lo + hd] += dw_h[:, 2 * hd:]
            dbq_ref[:, lo:lo + hd] += db_h[:, :hd]
            dbq_ref[:, D + lo:D + lo + hd] += db_h[:, hd:2 * hd]
            dbq_ref[:, 2 * D + lo:2 * D + lo + hd] += db_h[:, 2 * hd:]
    dg1_ref[...] += jnp.sum(dyln1 * xhat1, axis=(0, 1))[None]
    db1_ref[...] += jnp.sum(dyln1, axis=(0, 1))[None]
    dgv1 = dyln1 * g1
    n1 = jnp.mean(dgv1, -1, keepdims=True)
    n2 = jnp.mean(dgv1 * xhat1, -1, keepdims=True)
    dx_ref[...] = (dyh + rstd1 * (dgv1 - n1 - xhat1 * n2)).astype(
        dx_ref.dtype)


def _resolve_gb(B: int, knob: int) -> int:
    return max(g for g in range(1, min(knob, B) + 1) if B % g == 0)


@functools.partial(jax.jit, static_argnames=("n_head", "gb", "vmem_bytes",
                                             "save_y", "save_h",
                                             "interpret"))
def _fbt_fwd_save(x, p, *, n_head: int, gb: int, vmem_bytes: int,
                  save_y: bool, interpret, save_h: bool = True):
    """Forward with residual outputs: returns (out, qkv[, h][, y]) — the
    residual tensors stay T-padded so the backward consumes them as-is.
    ``save_h=False`` drops the pre-activation hidden residual (629 MB per
    block at bench shapes); the backward recomputes it from xn2."""
    B, T, D = x.shape
    H = p["mlp"]["w_fc"].shape[-1]
    hd = D // n_head
    Tp = _round_up(T, 8)
    GB = _resolve_gb(B, gb)
    n_chunks = 2 if jnp.dtype(x.dtype).itemsize <= 2 else 4
    operands, specs = _train_operands(x, p)
    if Tp != T:
        x = jnp.pad(x, ((0, 0), (0, Tp - T), (0, 0)))
    blk = pl.BlockSpec((GB, Tp, D), lambda i: (i, 0, 0))
    blk3 = pl.BlockSpec((GB, Tp, 3 * D), lambda i: (i, 0, 0))
    blkh = pl.BlockSpec((GB, Tp, H), lambda i: (i, 0, 0))
    out_shapes = [
        jax.ShapeDtypeStruct((B, Tp, D), x.dtype),
        jax.ShapeDtypeStruct((B, Tp, 3 * D), x.dtype),
    ]
    out_specs = [blk, blk3]
    if save_h:
        out_shapes.append(jax.ShapeDtypeStruct((B, Tp, H), x.dtype))
        out_specs.append(blkh)
    if save_y:
        out_shapes.append(jax.ShapeDtypeStruct((B, Tp, D), x.dtype))
        out_specs.append(blk)
    compiler_params = None
    if not _auto_interpret(interpret):
        from jax.experimental.pallas import tpu as pltpu

        compiler_params = pltpu.CompilerParams(vmem_limit_bytes=vmem_bytes)
    res = pl.pallas_call(
        functools.partial(
            _train_fwd_kernel, n_head=n_head,
            scale=1.0 / float(np.sqrt(hd)),
            valid_T=None if Tp == T else T, n_chunks=n_chunks,
            save_y=save_y, save_h=save_h,
        ),
        out_shape=tuple(out_shapes),
        grid=(B // GB,),
        in_specs=[blk] + specs,
        out_specs=tuple(out_specs),
        interpret=_auto_interpret(interpret),
        compiler_params=compiler_params,
    )(x, *operands)
    out = res[0][:, :T] if Tp != T else res[0]
    return out, tuple(res[1:])


@functools.partial(jax.jit, static_argnames=("n_head", "gb", "vmem_bytes",
                                             "save", "save_y", "wgrad",
                                             "save_h", "interpret"))
def _fbt_bwd(x, dy, p, residuals, *, n_head: int, gb: int, vmem_bytes: int,
             save: bool, save_y: bool, interpret, wgrad: bool = False,
             save_h: bool = True):
    """(dx, dg1, db1, dg2, db2[, weight grads]) for the whole-block train
    kernel.  ``wgrad=True`` (the TRAINABLE-block variant) additionally
    accumulates every attention/MLP weight and bias gradient across grid
    steps."""
    B, T, D = x.shape
    H = p["mlp"]["w_fc"].shape[-1]
    hd = D // n_head
    Tp = _round_up(T, 8)
    GB = _resolve_gb(B, gb)
    n_chunks = 2 if jnp.dtype(x.dtype).itemsize <= 2 else 4
    operands, specs = _train_operands(x, p)
    if Tp != T:
        pad = ((0, 0), (0, Tp - T), (0, 0))
        x = jnp.pad(x, pad)
        dy = jnp.pad(dy, pad)
    blk = pl.BlockSpec((GB, Tp, D), lambda i: (i, 0, 0))
    in_specs = [blk, blk] + specs
    extra = []
    if save:
        extra.append(residuals[0])
        in_specs.append(pl.BlockSpec((GB, Tp, 3 * D), lambda i: (i, 0, 0)))
        if save_h:
            extra.append(residuals[1])
            in_specs.append(pl.BlockSpec((GB, Tp, H), lambda i: (i, 0, 0)))
    if save_y:
        extra.append(residuals[-1])
        in_specs.append(blk)
    acc = pl.BlockSpec((1, D), lambda i: (0, 0))
    out_shape = [
        jax.ShapeDtypeStruct((B, Tp, D), x.dtype),
        jax.ShapeDtypeStruct((1, D), jnp.float32),
        jax.ShapeDtypeStruct((1, D), jnp.float32),
        jax.ShapeDtypeStruct((1, D), jnp.float32),
        jax.ShapeDtypeStruct((1, D), jnp.float32),
    ]
    out_specs = [blk, acc, acc, acc, acc]
    if wgrad:
        fix = lambda shape: pl.BlockSpec(shape, lambda i: (0, 0))  # noqa: E731
        for shape in ((D, 3 * D), (1, 3 * D), (D, D), (1, D),
                      (D, H), (1, H), (H, D), (1, D)):
            out_shape.append(jax.ShapeDtypeStruct(shape, jnp.float32))
            out_specs.append(fix(shape))
    compiler_params = None
    if not _auto_interpret(interpret):
        from jax.experimental.pallas import tpu as pltpu

        compiler_params = pltpu.CompilerParams(vmem_limit_bytes=vmem_bytes)
    res = pl.pallas_call(
        functools.partial(
            _train_bwd_kernel, n_head=n_head,
            scale=1.0 / float(np.sqrt(hd)),
            valid_T=None if Tp == T else T, n_chunks=n_chunks,
            save=save, save_y=save_y, wgrad=wgrad, save_h=save_h,
        ),
        out_shape=tuple(out_shape),
        grid=(B // GB,),
        in_specs=in_specs,
        out_specs=tuple(out_specs),
        interpret=_auto_interpret(interpret),
        compiler_params=compiler_params,
    )(x, dy, *operands, *extra)
    dx, dg1, db1, dg2, db2 = res[:5]
    if Tp != T:
        dx = dx[:, :T]
    return (dx, dg1[0], db1[0], dg2[0], db2[0]) + tuple(res[5:])


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5, 6))
def _fused_block_train(x, p, n_head: int, mode: str, gb_f: int, gb_b: int,
                       vmem: int):
    if mode == "recompute":
        return _fused_block_group_jit(
            x, (p,), (), None, n_head=n_head, inject_flags=(False,),
            interpret=None, gb_knob=gb_f, vmem_bytes=vmem,
        )
    out, _ = _fbt_fwd_save(
        x, p, n_head=n_head, gb=gb_f, vmem_bytes=vmem,
        save_y=(mode == "save-y"), interpret=None,
    )
    return out


def _fbt_fwd_rule(x, p, n_head, mode, gb_f, gb_b, vmem):
    if mode == "recompute":
        out = _fused_block_group_jit(
            x, (p,), (), None, n_head=n_head, inject_flags=(False,),
            interpret=None, gb_knob=gb_f, vmem_bytes=vmem,
        )
        return out, (x, p, ())
    out, res = _fbt_fwd_save(
        x, p, n_head=n_head, gb=gb_f, vmem_bytes=vmem,
        save_y=(mode == "save-y"), interpret=None,
    )
    return out, (x, p, res)


def _fbt_bwd_rule(n_head, mode, gb_f, gb_b, vmem, residuals, dy):
    x, p, res = residuals
    dx, dg1, db1, dg2, db2 = _fbt_bwd(
        x, dy, p, res, n_head=n_head, gb=gb_b, vmem_bytes=vmem,
        save=(mode != "recompute"), save_y=(mode == "save-y"),
        interpret=None,
    )

    def ln_grad(lnp, dg, db):
        return {
            "scale": dg.reshape(lnp["scale"].shape).astype(
                lnp["scale"].dtype),
            "bias": db.reshape(lnp["bias"].shape).astype(lnp["bias"].dtype),
        }

    dp = {
        "ln_1": ln_grad(p["ln_1"], dg1, db1),
        "ln_2": ln_grad(p["ln_2"], dg2, db2),
        "attn": jax.tree.map(jnp.zeros_like, p["attn"]),
        "mlp": jax.tree.map(jnp.zeros_like, p["mlp"]),
    }
    return dx, dp


_fused_block_train.defvjp(_fbt_fwd_rule, _fbt_bwd_rule)


def fused_block_train(x, p, n_head: int):
    """Differentiable whole-block fused kernel for FULLY-frozen-weight
    blocks (reference ``clip/model.py:167-198`` semantics; unfreeze policy
    ``reference/trainers/maple.py:447-479``).

    Cotangents: exact for ``x`` and both LayerNorms; **zeros for every
    attention/MLP weight and bias** — callers must route only blocks whose
    non-LN weights are all frozen (``set_vision_attn_wgrad_blocks``).

    Env knobs (read here, passed as statics — changing one retraces):
    ``FMM_TPU_FUSED_TRAIN_MODE`` (save | save-y | recompute),
    ``FMM_TPU_FUSED_GB_TRN`` / ``FMM_TPU_FUSED_GB_TRNB`` (fwd/bwd rows per
    grid step), ``FMM_TPU_FUSED_VMEM`` (Mosaic VMEM limit — the round-3
    unlock that admits useful group sizes)."""
    mode = os.environ.get("FMM_TPU_FUSED_TRAIN_MODE", "save").lower()
    if mode not in _TRAIN_MODES:
        raise ValueError(
            f"FMM_TPU_FUSED_TRAIN_MODE={mode!r}: expected one of "
            f"{_TRAIN_MODES}"
        )
    gb_f = max(1, int(os.environ.get("FMM_TPU_FUSED_GB_TRN", "2")))
    gb_b = max(1, int(os.environ.get("FMM_TPU_FUSED_GB_TRNB", "4")))
    vmem = int(os.environ.get("FMM_TPU_FUSED_VMEM", 100 << 20))
    return _fused_block_train(x, p, n_head, mode, gb_f, gb_b, vmem)


# --------------------------------------------------------------------------
# dW variant (round 5, second step): the same whole-block train kernel with
# FULL weight gradients — for TRAINABLE blocks (vision ``resblocks.{last}``
# under the MaPLe unfreeze policy, or any mask-free eligible block whose
# trainability is unknown).  Exact cotangents for EVERYTHING: x, both LNs,
# and all attention/MLP weights+biases, accumulated across grid steps as
# grid-invariant fp32 outputs.  Residuals = (qkv, h) like "save" mode; the
# attention forward is recomputed in the backward because dW_out needs the
# concat head output.
# --------------------------------------------------------------------------


def fused_block_train_dw_enabled() -> bool:
    """Gate for the dW whole-block train kernel on trainable blocks
    (``FMM_TPU_FUSED_TRAIN_DW``).  ON by default: measured 1402.7 ->
    1423.8 img/s (+1.5% e2e) over the frozen-only round-5 default at
    bwd GB=4 (same-session A/B, docs/BENCH.md); ``0`` is the escape
    hatch / A-B baseline."""
    return os.environ.get("FMM_TPU_FUSED_TRAIN_DW", "1").lower() in (
        "1", "on", "true",
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5, 6))
def _fused_block_train_dw(x, p, n_head: int, gb_f: int, gb_b: int,
                          vmem: int, save_h: bool):
    out, _ = _fbt_fwd_save(
        x, p, n_head=n_head, gb=gb_f, vmem_bytes=vmem,
        save_y=False, save_h=save_h, interpret=None,
    )
    return out


def _fbt_dw_fwd_rule(x, p, n_head, gb_f, gb_b, vmem, save_h):
    out, res = _fbt_fwd_save(
        x, p, n_head=n_head, gb=gb_f, vmem_bytes=vmem,
        save_y=False, save_h=save_h, interpret=None,
    )
    return out, (x, p, res)


def _fbt_dw_bwd_rule(n_head, gb_f, gb_b, vmem, save_h, residuals, dy):
    x, p, res = residuals
    (dx, dg1, db1, dg2, db2,
     dwq, dbq, dwo, dbo, dwfc, dbfc, dwpr, dbpr) = _fbt_bwd(
        x, dy, p, res, n_head=n_head, gb=gb_b, vmem_bytes=vmem,
        save=True, save_y=False, wgrad=True, save_h=save_h, interpret=None,
    )

    def like(leaf, g):
        return g.reshape(leaf.shape).astype(leaf.dtype)

    dp = {
        "ln_1": {"scale": like(p["ln_1"]["scale"], dg1),
                 "bias": like(p["ln_1"]["bias"], db1)},
        "ln_2": {"scale": like(p["ln_2"]["scale"], dg2),
                 "bias": like(p["ln_2"]["bias"], db2)},
        "attn": {"w_qkv": like(p["attn"]["w_qkv"], dwq),
                 "b_qkv": like(p["attn"]["b_qkv"], dbq),
                 "w_out": like(p["attn"]["w_out"], dwo),
                 "b_out": like(p["attn"]["b_out"], dbo)},
        "mlp": {"w_fc": like(p["mlp"]["w_fc"], dwfc),
                "b_fc": like(p["mlp"]["b_fc"], dbfc),
                "w_proj": like(p["mlp"]["w_proj"], dwpr),
                "b_proj": like(p["mlp"]["b_proj"], dbpr)},
    }
    return dx, dp


_fused_block_train_dw.defvjp(_fbt_dw_fwd_rule, _fbt_dw_bwd_rule)


def fused_block_train_dw(x, p, n_head: int):
    """Whole-block fused train kernel with FULL weight gradients (see the
    section comment above).  Safe for any mask-free eligible block — it is
    a drop-in autodiff replacement, not a frozen-W contract.

    ``FMM_TPU_FUSED_TRAIN_DW_SAVEH`` (default 0): the dW block does NOT
    store the pre-activation hidden — the backward recomputes it from
    xn2.  Rationale: with h stored, the composed program's HBM watermark
    tips the SPMD fed step over 15.75 GB at bench shapes (measured
    RESOURCE_EXHAUSTED); recomputing costs one extra fc matmul on the
    single trainable block.  Set to 1 to store h when capacity allows."""
    gb_f = max(1, int(os.environ.get("FMM_TPU_FUSED_GB_TRN", "2")))
    gb_b = max(1, int(os.environ.get(
        "FMM_TPU_FUSED_GB_TRNB_DW",
        os.environ.get("FMM_TPU_FUSED_GB_TRNB", "4"))))
    vmem = int(os.environ.get("FMM_TPU_FUSED_VMEM", 100 << 20))
    save_h = os.environ.get("FMM_TPU_FUSED_TRAIN_DW_SAVEH", "0").lower() in (
        "1", "on", "true",
    )
    return _fused_block_train_dw(x, p, n_head, gb_f, gb_b, vmem, save_h)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def fused_ln_attention(x, lnp, w, b, n_head: int):
    """Differentiable fused LN1+QKV+attention for FROZEN-W blocks.

    Cotangents: exact for ``x`` and the LN params; **zeros for w/b** (see
    module docstring) — only route blocks whose attention weights are
    frozen through this op.
    """
    return fused_ln_attention_fwd(x, lnp, w, b, n_head)


def _fla_fwd(x, lnp, w, b, n_head):
    return fused_ln_attention_fwd(x, lnp, w, b, n_head), (x, lnp, w, b)


def _fla_bwd(n_head, res, dy):
    x, lnp, w, b = res
    dx, dgam, dbet = fused_ln_attention_bwd(x, lnp, w, b, dy, n_head)
    dlnp = {
        "scale": dgam.reshape(lnp["scale"].shape).astype(lnp["scale"].dtype),
        "bias": dbet.reshape(lnp["bias"].shape).astype(lnp["bias"].dtype),
    }
    return dx, dlnp, jnp.zeros_like(w), jnp.zeros_like(b)


fused_ln_attention.defvjp(_fla_fwd, _fla_bwd)
