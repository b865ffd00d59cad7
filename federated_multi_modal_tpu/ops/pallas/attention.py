"""Pallas fused attention for CLIP's short sequences.

CLIP's sequences are tiny — 77 text tokens, 197-200 vision tokens
(SURVEY §5: prompt injection replaces tokens, never grows the sequence) —
so an entire (T, T) score matrix fits comfortably in VMEM (200x200 fp32 =
160 KB).  There is no need for flash-attention streaming: one kernel
invocation per (batch, head) computes QK^T, the fp32 softmax and the value
contraction without ever materializing the score matrix in HBM.  This
removes the HBM round-trips XLA emits between the score matmul, softmax
and value matmul when it chooses not to fuse them.

Used on the inference path (``cfg.TPU.USE_PALLAS_ATTENTION``); training
keeps the XLA formulation (differentiable, and the backward pass dominates
there anyway).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

try:
    from jax.experimental import pallas as pl

    _PALLAS_OK = True
except Exception:  # pragma: no cover
    _PALLAS_OK = False


def pallas_available() -> bool:
    return _PALLAS_OK


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _attn_kernel(q_ref, k_ref, v_ref, mask_ref, o_ref, *, scale):
    q = q_ref[0]  # (Tp, hd)
    k = k_ref[0]
    v = v_ref[0]
    s = jax.lax.dot_general(
        q, k,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * scale  # (Tp, Tp)
    s = s + mask_ref[:]
    p = jax.nn.softmax(s, axis=-1).astype(v.dtype)
    o_ref[0] = jnp.dot(p, v, preferred_element_type=jnp.float32).astype(
        o_ref.dtype
    )


@functools.partial(jax.jit, static_argnames=("n_head", "interpret"))
def fused_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    n_head: int,
    attn_mask: jax.Array = None,
    interpret: bool = False,
) -> jax.Array:
    """Fused multi-head attention.

    Args:
        q, k, v: ``(B, T, D)`` projected activations.
        n_head: head count (``D % n_head == 0``).
        attn_mask: optional additive ``(T, T)`` mask (causal for text).
        interpret: run the kernel in interpreter mode (CPU testing).

    Returns:
        ``(B, T, D)`` attention output (pre out-projection).
    """
    B, T, D = q.shape
    hd = D // n_head
    Tp = _round_up(T, 8)

    def heads(t):
        t = t.reshape(B, T, n_head, hd).transpose(0, 2, 1, 3)
        return t.reshape(B * n_head, T, hd)

    qh, kh, vh = heads(q), heads(k), heads(v)
    if Tp != T:
        pad = ((0, 0), (0, Tp - T), (0, 0))
        qh = jnp.pad(qh, pad)
        kh = jnp.pad(kh, pad)
        vh = jnp.pad(vh, pad)

    # additive mask: caller mask + -inf on padded keys
    mask = jnp.zeros((Tp, Tp), jnp.float32)
    if attn_mask is not None:
        mask = mask.at[:T, :T].set(attn_mask.astype(jnp.float32))
    if Tp != T:
        mask = mask.at[:, T:].set(-jnp.inf)

    scale = 1.0 / np.sqrt(hd)
    grid = (B * n_head,)
    spec = pl.BlockSpec((1, Tp, hd), lambda i: (i, 0, 0))

    out = pl.pallas_call(
        functools.partial(_attn_kernel, scale=scale),
        out_shape=jax.ShapeDtypeStruct((B * n_head, Tp, hd), q.dtype),
        grid=grid,
        in_specs=[
            spec, spec, spec,
            pl.BlockSpec((Tp, Tp), lambda i: (0, 0)),
        ],
        out_specs=spec,
        interpret=interpret,
    )(qh, kh, vh, mask)

    out = out[:, :T].reshape(B, n_head, T, hd).transpose(0, 2, 1, 3)
    return out.reshape(B, T, D)


def multi_head_attention_pallas(x, p, n_head, attn_mask=None, interpret=False):
    """Drop-in fused replacement for ``ops.primitives.multi_head_attention``
    (same packed-QKV parameter contract)."""
    from federated_multi_modal_tpu.ops.primitives import linear

    qkv = linear(x, p["w_qkv"], p["b_qkv"])
    q, k, v = jnp.split(qkv, 3, axis=-1)
    out = fused_attention(q, k, v, n_head, attn_mask, interpret=interpret)
    return linear(out, p["w_out"], p["b_out"])


# --------------------------------------------------------------------------
# differentiable wrapper: Pallas kernel forward, XLA-recompute backward
# --------------------------------------------------------------------------


def _xla_attention(q, k, v, n_head, attn_mask):
    """Reference attention used to derive the backward pass."""
    B, T, D = q.shape
    hd = D // n_head

    def heads(t):
        return t.reshape(B, T, n_head, hd).transpose(0, 2, 1, 3)

    qh, kh, vh = heads(q), heads(k), heads(v)
    scale = 1.0 / np.sqrt(hd)
    scores = jnp.einsum(
        "bhqd,bhkd->bhqk", qh, kh, preferred_element_type=jnp.float32
    ) * scale
    if attn_mask is not None:
        scores = scores + attn_mask.astype(jnp.float32)
    probs = jax.nn.softmax(scores, axis=-1).astype(q.dtype)
    out = jnp.einsum("bhqk,bhkd->bhqd", probs, vh)
    return out.transpose(0, 2, 1, 3).reshape(B, T, D)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def fused_attention_diff(q, k, v, n_head, attn_mask=None):
    """Differentiable fused attention: the forward runs the Pallas kernel;
    the backward recomputes through the XLA formulation (one extra forward
    in the backward pass — acceptable when the flag is used for training,
    ideal when it isn't)."""
    return fused_attention(q, k, v, n_head, attn_mask)


def _fad_fwd(q, k, v, n_head, attn_mask):
    return fused_attention(q, k, v, n_head, attn_mask), (q, k, v, attn_mask)


def _fad_bwd(n_head, residuals, g):
    q, k, v, attn_mask = residuals
    _, vjp = jax.vjp(lambda q, k, v: _xla_attention(q, k, v, n_head, attn_mask),
                     q, k, v)
    dq, dk, dv = vjp(g)
    return dq, dk, dv, None


fused_attention_diff.defvjp(_fad_fwd, _fad_bwd)
