"""Attention-kernel and step-decomposition micro-benchmarks (TPU).

Three modes (all timings at MaPLe flagship shapes, ViT-B/16, B=512,
T=200, bf16, v5e through the axon tunnel):

* ``attn`` — packed-QKV kernel variants head-to-head (stock, single-4-D
  -dot, token-padded, jax's flash kernel, plain XLA).
* ``parts`` — the full train step split into preproc / vision tower /
  text tower / loss glue, fwd and fwd+bwd.
* ``block`` — one ViT block split into LN / GELU / MLP / attention
  sublayer / injection concat / patchify.

Round-2 findings (details in docs/BENCH.md): the stock packed kernel
nets ~1.4-1.5 ms fwd (~22% of bf16 peak against a ~1.3 ms roofline that
is simultaneously HBM- (471 MB QKV), VPU- (fp32 softmax) and small-dot-
MXU-bound) and ~5.1 ms fwd+bwd with a data-dependent cotangent — the
earlier "3.8 ms at 9%" figure double-counted the measurement chain.  An
isolated block nets 24.5 ms fwd+bwd vs ~21 ms matmul-ideal; a
single-session run of block/block12u/block12i/tower (B=256) attributes
the whole tower: 12x block exactly, +~2.4 ms injection glue, +~7-10 ms
embed/final-LN/projection — the once-"unattributed ~50 ms" was
cross-session tunnel drift (details in docs/BENCH.md).  Variants
that LOSE: token padding to 208/256, a 4-D single-dot head batch (Mosaic
rejects the lane->sublane split), jax's flash kernel (15x off at these
short sequences), full block remat (1085 img/s), and late-normalized
softmax (fwd wash, bwd 0.6 ms/call worse — Mosaic's fused softmax
pipeline beats the extra operand materializations).

Timing on the axon tunnel follows the CLAUDE.md rule: every iteration is
chained through a data dependency inside ONE jitted ``lax.scan`` and the
only host sync is a scalar ``device_get`` at the end.  The ``null``
variant measures the chaining glue itself (one elementwise pass over the
carried tensor); subtract it for per-op cost.  Backward chains use a
squared loss so the output cotangent is data-dependent — a ``sum()``
loss hands XLA an all-ones cotangent it can collapse into rank-1
backward matmuls, flattering every non-kernel path.

Usage:
    python tools/attn_microbench.py --variants null,xla,packed,packed4d
    python tools/attn_microbench.py --mode parts
    python tools/attn_microbench.py --mode block [--only patchify]
"""

from __future__ import annotations

import argparse
import functools
import os
import time

import numpy as np


def fused_lnqkv_attention(x, lnp, w, b, n_head, GB=4, interpret=None):
    """EXPERIMENTAL: one Pallas kernel for LN1 -> QKV matmul -> attention
    (out-projection stays XLA).  The production packed kernel is HBM-bound
    on the 471 MB QKV tensor XLA's matmul writes and the kernel reads
    back; computing QKV in-kernel from the 157 MB input eliminates that
    round-trip (and the LN materialization).  Measured ~1.5 ms/block fwd
    over the LN+matmul+packed-kernel path at ViT-B/16 B=512 shapes on
    v5e.  Forward only — a round-3 production candidate; the VJP would
    recompute LN+QKV in VMEM and needs a dW/dgamma variant for the
    trainable block 11 + LN params."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    B, T, D = x.shape
    hd = D // n_head
    assert T % 8 == 0 and B % GB == 0
    g2 = lnp["scale"].reshape(1, D).astype(jnp.float32)
    be2 = lnp["bias"].reshape(1, D).astype(jnp.float32)
    bq2 = b.reshape(1, 3 * D)
    scale = 1.0 / float(np.sqrt(hd))

    def kernel(x_ref, w_ref, bq_ref, g_ref, be_ref, o_ref):
        x32 = x_ref[...].astype(jnp.float32)  # (GB, T, D)
        mu = jnp.mean(x32, -1, keepdims=True)
        var = jnp.mean(jnp.square(x32 - mu), -1, keepdims=True)
        xn = (x32 - mu) * jax.lax.rsqrt(var + 1e-5)
        xn = (xn * g_ref[...] + be_ref[...]).astype(x_ref.dtype)
        qkv = jax.lax.dot_general(
            xn, w_ref[...], (((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        qkv = (qkv + bq_ref[...].astype(jnp.float32)).astype(
            x_ref.dtype
        )  # (GB, T, 3D)
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
            p_ = jax.nn.softmax(s, axis=-1).astype(v.dtype)
            outs.append(
                jax.lax.dot_general(
                    p_, v, (((2,), (1,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32,
                ).astype(o_ref.dtype)
            )
        o_ref[...] = jnp.concatenate(outs, axis=-1)

    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((B, T, D), x.dtype),
        grid=(B // GB,),
        in_specs=[
            pl.BlockSpec((GB, T, D), lambda i: (i, 0, 0)),
            pl.BlockSpec((D, 3 * D), lambda i: (0, 0)),
            pl.BlockSpec((1, 3 * D), lambda i: (0, 0)),
            pl.BlockSpec((1, D), lambda i: (0, 0)),
            pl.BlockSpec((1, D), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((GB, T, D), lambda i: (i, 0, 0)),
        interpret=interpret,
    )(x, w.astype(x.dtype), bq2.astype(x.dtype), g2, be2)


def fused_lnqkv_attention_bwd_dx(x, lnp, w, b, dy, n_head, GB=4,
                                 interpret=None):
    """EXPERIMENTAL: dx for :func:`fused_lnqkv_attention` in ONE Pallas
    kernel — recomputes LN/QKV/scores/probs in VMEM from the raw input
    (residual = x itself, nothing else saved to HBM), then runs the
    attention backward, folds d(QKV) through W^T and the LayerNorm
    backward, and writes dx.  PROTOTYPE: param grads (dgamma/dbeta/dW/db)
    are NOT computed — the production VJP adds per-grid-step partial
    accumulators for them (timing impact ~nil: tiny reductions over
    already-resident tiles)."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    B, T, D = x.shape
    hd = D // n_head
    assert T % 8 == 0 and B % GB == 0
    g2 = lnp["scale"].reshape(1, D).astype(jnp.float32)
    be2 = lnp["bias"].reshape(1, D).astype(jnp.float32)
    bq2 = b.reshape(1, 3 * D)
    scale = 1.0 / float(np.sqrt(hd))

    def kernel(x_ref, w_ref, bq_ref, g_ref, be_ref, dy_ref, dx_ref):
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
        dq_parts, dk_parts, dv_parts = [], [], []
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
            dq_parts.append(dq.astype(x_ref.dtype))
            dk_parts.append(dk.astype(x_ref.dtype))
            dv_parts.append(dv.astype(x_ref.dtype))
        dqkv = jnp.concatenate(dq_parts + dk_parts + dv_parts, axis=-1)
        dxn = jax.lax.dot_general(
            dqkv, w_ref[...], (((2,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (GB, T, D) fp32
        dg = dxn * g_ref[...]
        m1 = jnp.mean(dg, -1, keepdims=True)
        m2 = jnp.mean(dg * xhat, -1, keepdims=True)
        dx_ref[...] = (rstd * (dg - m1 - xhat * m2)).astype(dx_ref.dtype)

    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    blk3 = pl.BlockSpec((GB, T, D), lambda i: (i, 0, 0))
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((B, T, D), x.dtype),
        grid=(B // GB,),
        in_specs=[
            blk3,
            pl.BlockSpec((D, 3 * D), lambda i: (0, 0)),
            pl.BlockSpec((1, 3 * D), lambda i: (0, 0)),
            pl.BlockSpec((1, D), lambda i: (0, 0)),
            pl.BlockSpec((1, D), lambda i: (0, 0)),
            blk3,
        ],
        out_specs=blk3,
        interpret=interpret,
    )(x, w.astype(x.dtype), bq2.astype(x.dtype), g2, be2, dy)


def make_fused_lnqkv_attention_fb(n_head, GB=4, interpret=None):
    """custom_vjp wrapper over the fused fwd/bwd kernels — TIMING/dx-parity
    prototype (param cotangents returned as zeros; see bwd docstring)."""
    import jax
    import jax.numpy as jnp

    @jax.custom_vjp
    def op(x, lnp, w, b):
        return fused_lnqkv_attention(x, lnp, w, b, n_head, GB=GB,
                                     interpret=interpret)

    def fwd(x, lnp, w, b):
        return op(x, lnp, w, b), (x, lnp, w, b)

    def bwd(res, dy):
        x, lnp, w, b = res
        dx = fused_lnqkv_attention_bwd_dx(
            x, lnp, w, b, dy, n_head, GB=GB, interpret=interpret
        )
        zeros = jax.tree_util.tree_map(jnp.zeros_like, (lnp, w, b))
        return (dx,) + zeros

    op.defvjp(fwd, bwd)
    return op


def _mk_timer(iters):
    import jax

    def timeit(make_chain):
        """make_chain() -> (scan_fn, init_carry, extra_args).

        ``extra_args`` are passed as jit ARGUMENTS (never closed over:
        baking CLIP weights into the HLO blows the remote-compile HTTP
        limit — CLAUDE.md).  Returns sec/iter.
        """
        fn, carry, extras = make_chain()
        runner = jax.jit(fn)
        out = runner(carry, *extras)
        jax.device_get(out)  # warmup: compile + run (tunnel-safe sync)
        t0 = time.time()
        out = runner(carry, *extras)
        jax.device_get(out)
        return (time.time() - t0) / iters

    return timeit


# --------------------------------------------------------------------------
# attention variants: f(qkv: (B,T,3D)) -> (B,T,D); bwd chains d(QKV)
# --------------------------------------------------------------------------


def _xla_attn(qkv, n_head):
    import jax
    import jax.numpy as jnp

    B, T, D3 = qkv.shape
    D = D3 // 3
    hd = D // n_head
    q, k, v = jnp.split(qkv, 3, axis=-1)

    def heads(t):
        return t.reshape(B, T, n_head, hd).transpose(0, 2, 1, 3)

    qh, kh, vh = heads(q), heads(k), heads(v)
    s = jnp.einsum("bhqd,bhkd->bhqk", qh, kh,
                   preferred_element_type=jnp.float32) / np.sqrt(hd)
    p = jax.nn.softmax(s, axis=-1).astype(qkv.dtype)
    o = jnp.einsum("bhqk,bhkd->bhqd", p, vh)
    return o.transpose(0, 2, 1, 3).reshape(B, T, D)


def _build_packed4d(dims_parallel=False, tpad=8):
    """Experimental: one 4-D batched dot per grid step instead of a python
    loop over the ``hp`` heads sharing the 128-lane block (halves the dot
    count; relies on Mosaic handling the lane->sublane head split)."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from federated_multi_modal_tpu.ops.pallas import attention as A

    def fwd_body(q_ref, k_ref, v_ref, o_ref, *, hd, scale, valid_T):
        GB, Tp, bs = q_ref.shape
        hp = bs // hd

        def split(ref):
            return ref[...].reshape(GB, Tp, hp, hd).transpose(0, 2, 1, 3)

        q, k, v = split(q_ref), split(k_ref), split(v_ref)
        s = jax.lax.dot_general(
            q, k, (((3,), (3,)), ((0, 1), (0, 1))),
            preferred_element_type=jnp.float32,
        ) * scale
        if valid_T is not None:
            s = A._key_mask(s, valid_T)
        p = jax.nn.softmax(s, axis=-1).astype(v.dtype)
        o = jax.lax.dot_general(
            p, v, (((3,), (2,)), ((0, 1), (0, 1))),
            preferred_element_type=jnp.float32,
        )
        o_ref[...] = o.transpose(0, 2, 1, 3).reshape(GB, Tp, bs).astype(
            o_ref.dtype
        )

    def fwd(qkv, n_head):
        B, T, D3 = qkv.shape
        D = D3 // 3
        hd = D // n_head
        hp = A._packed_hp(D, n_head)
        Tp = A._round_up(T, tpad)
        GB = A._pick_gb(B, Tp, qkv.dtype)
        qkv = A._pad_tokens(qkv, Tp)
        bs = hp * hd
        Hb = D // bs
        blk = (GB, Tp, bs)
        q_spec = pl.BlockSpec(blk, lambda i, h: (i, 0, h))
        k_spec = pl.BlockSpec(blk, lambda i, h: (i, 0, Hb + h))
        v_spec = pl.BlockSpec(blk, lambda i, h: (i, 0, 2 * Hb + h))
        o_spec = pl.BlockSpec(blk, lambda i, h: (i, 0, h))
        params = {}
        if dims_parallel:
            params["compiler_params"] = pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel")
            )
        out = pl.pallas_call(
            functools.partial(fwd_body, hd=hd, scale=1.0 / np.sqrt(hd),
                              valid_T=None if Tp == T else T),
            out_shape=jax.ShapeDtypeStruct((B, Tp, D), qkv.dtype),
            grid=(B // GB, Hb),
            in_specs=[q_spec, k_spec, v_spec],
            out_specs=o_spec,
            interpret=A._auto_interpret(None),
            **params,
        )(qkv, qkv, qkv)
        return out[:, :T] if Tp != T else out

    return fwd


def _build_packed_padded(tpad):
    """Current kernel, but tokens padded to a multiple of ``tpad`` (16 ->
    bf16 sublane alignment at 208, 128 -> full MXU tile at 256) with the
    in-kernel key mask.  Calls the UNJITTED implementation so the
    monkeypatched rounding cannot poison the jit cache of the stock
    variant (both would share the same cache key)."""
    from federated_multi_modal_tpu.ops.pallas import attention as A

    raw_fwd = getattr(A.attention_packed_fwd, "__wrapped__",
                      A.attention_packed_fwd)

    def fwd(qkv, n_head):
        orig = A._round_up
        A._round_up = lambda x, m: orig(x, tpad)
        try:
            return raw_fwd(qkv, n_head)
        finally:
            A._round_up = orig

    return fwd


def _flash(qkv, n_head, block=128):
    """jax's reference TPU flash kernel (needs (B,H,T,hd) layout; T must be
    a block multiple, so pad to 256 and mask keys via segment ids)."""
    import jax.numpy as jnp
    from jax.experimental.pallas.ops.tpu.flash_attention import (
        BlockSizes,
        flash_attention,
    )

    B, T, D3 = qkv.shape
    D = D3 // 3
    hd = D // n_head
    Tp = ((T + 255) // 256) * 256
    q, k, v = jnp.split(qkv, 3, axis=-1)

    def heads(t):
        t = t.reshape(B, T, n_head, hd).transpose(0, 2, 1, 3)
        return jnp.pad(t, ((0, 0), (0, 0), (0, Tp - T), (0, 0)))

    qh, kh, vh = heads(q), heads(k), heads(v)
    bs = BlockSizes(block_q=block, block_k_major=block, block_k=block,
                    block_b=1)
    o = flash_attention(qh, kh, vh, sm_scale=1.0 / np.sqrt(hd),
                        block_sizes=bs)
    o = o[:, :, :T].transpose(0, 2, 1, 3).reshape(B, T, D)
    return o


def run_attn(args):
    import jax
    import jax.numpy as jnp

    from federated_multi_modal_tpu.ops.pallas import attention as A

    B, T, H = args.batch, args.t, args.heads
    D = args.d
    dtype = jnp.bfloat16 if args.dtype == "bf16" else jnp.float32
    key = jax.random.PRNGKey(0)
    qkv0 = (jax.random.normal(key, (B, T, 3 * D), jnp.float32) * 0.02).astype(
        dtype
    )
    iters = args.iters
    timeit = _mk_timer(iters)

    def fwd_chain(f):
        def make():
            def body(c, _):
                out = f(c, H)
                # scalar contamination: data dependency at one-pass cost
                c = c + (out.ravel()[0] * 1e-30).astype(c.dtype)
                return c, ()

            def scan(c):
                c, _ = jax.lax.scan(body, c, length=iters)
                return c.ravel()[0]

            return scan, qkv0, ()

        return make

    def bwd_chain(f):
        def make():
            def loss(x):
                y = f(x, H).astype(jnp.float32)
                return 0.5 * (y * y).sum()

            def body(c, _):
                d = jax.grad(loss)(c)
                c = c * 0.9999 + d.astype(c.dtype) * 1e-6
                return c, ()

            def scan(c):
                c, _ = jax.lax.scan(body, c, length=iters)
                return c.ravel()[0]

            return scan, qkv0, ()

        return make

    def null(qkv, n_head):
        return qkv[..., :D] * 1.0000001

    variants = {}
    variants["null"] = null
    variants["xla"] = _xla_attn
    variants["packed"] = lambda x, h: A.attention_packed_fwd(x, h)
    variants["packed4d"] = _build_packed4d()
    variants["packed4d_par"] = _build_packed4d(dims_parallel=True)
    variants["pad208"] = _build_packed_padded(16)
    variants["pad256"] = _build_packed_padded(128)
    variants["flash"] = _flash
    bwd_variants = {
        "null": null,
        "xla": _xla_attn,
        "packed": lambda x, h: A.packed_attention(x, h),
        "flash": _flash,
    }

    names = args.variants.split(",") if args.variants else list(variants)
    flops_fwd = 4 * B * H * T * T * (D // H)
    print(f"# attn micro: B={B} T={T} D={D} H={H} {args.dtype} "
          f"iters={iters} fwd_gflop={flops_fwd/1e9:.1f} "
          f"dev={jax.devices()[0].platform}")
    base_f = base_b = 0.0
    for name in names:
        if name not in variants:
            print(f"{name:14s} (unknown)")
            continue
        try:
            tf = timeit(fwd_chain(variants[name]))
        except Exception as e:  # Mosaic rejections are data, not crashes
            print(f"{name:14s} fwd FAILED: {type(e).__name__}: "
                  f"{str(e)[:160]}")
            continue
        msg = f"{name:14s} fwd {tf*1e3:8.2f} ms"
        if name == "null":
            base_f = tf
        else:
            eff = flops_fwd / max(tf - base_f, 1e-9) / 197e12
            msg += f"  (net {max(tf-base_f,0)*1e3:6.2f} ms, {eff*100:4.1f}% peak)"
        if name in bwd_variants and not args.fwd_only:
            try:
                tb = timeit(bwd_chain(bwd_variants[name]))
                msg += f" | fwd+bwd {tb*1e3:8.2f} ms"
                if name == "null":
                    base_b = tb
                else:
                    msg += f" (net {max(tb-base_b,0)*1e3:6.2f} ms)"
            except Exception as e:
                msg += f" | bwd FAILED: {str(e)[:120]}"
        print(msg)


# --------------------------------------------------------------------------
# step decomposition: where do the 394 ms of the MaPLe train step go?
# --------------------------------------------------------------------------


def run_parts(args):
    import jax
    import jax.numpy as jnp

    from federated_multi_modal_tpu.flagship import build_maple_program
    from federated_multi_modal_tpu.models.clip_model import (
        encode_image,
        encode_text_embedded,
    )
    from federated_multi_modal_tpu.engine.trainer import merge_trees
    from federated_multi_modal_tpu.trainers.maple import maple_prompts
    from federated_multi_modal_tpu.ops.preprocess import (
        crop_resize_flip_normalize,
        sample_rrc_boxes_jax,
    )
    from federated_multi_modal_tpu.ops.primitives import set_attention_impl

    set_attention_impl(args.attention)
    B = args.batch
    n_cls = args.n_cls
    classnames = [f"class {i}" for i in range(n_cls)]
    prog = build_maple_program(classnames=classnames, depth=9,
                               use_captions=not args.no_captions)
    arch = prog["arch"]
    out_size = arch.image_resolution
    trainable, frozen = prog["trainable"], prog["frozen"]
    rng = np.random.default_rng(0)
    canvas = jnp.asarray(rng.integers(0, 255, (B, 256, 256, 3), np.uint8))
    labels = jnp.asarray(rng.integers(0, n_cls, B), jnp.int32)
    key = jax.random.PRNGKey(0)
    boxes, flips = sample_rrc_boxes_jax(key, B)
    images0 = crop_resize_flip_normalize(canvas, boxes, flips,
                                         out_size=out_size)
    iters = args.iters
    timeit = _mk_timer(iters)

    def chain_scalar(step_out_scalar_fn, carry0, extra):
        """Carry an array; each iter perturbs it by a scalar of f.  The
        extras ride as jit arguments (CLIP weights must never be HLO
        constants on the remote-compile tunnel)."""
        def make():
            def scan(c, *extras):
                def body(c, _):
                    s = step_out_scalar_fn(c, *extras)
                    return c + (s * 1e-30).astype(c.dtype), ()

                c, _ = jax.lax.scan(body, c, length=iters)
                return c.ravel()[0]

            return scan, carry0, extra

        return make

    # 1. preprocessing alone (carry the fp32 view so contamination works)
    def preproc_s(carry, boxes, flips):
        img = crop_resize_flip_normalize(carry.astype(jnp.uint8), boxes,
                                         flips, out_size=out_size)
        return img.ravel()[0].astype(jnp.float32)

    t_pre = timeit(chain_scalar(preproc_s, canvas.astype(jnp.float32),
                                (boxes, flips)))
    print(f"preproc            {t_pre*1e3:8.2f} ms", flush=True)

    text_len = int(np.asarray(frozen["prompt_const"]["eot_index"]).max()) + 1
    text_len = -(-text_len // 8) * 8

    def vis_fwd_s(images, trainable, frozen):
        m = merge_trees(trainable, frozen["model"])
        pc = frozen["prompt_const"]
        prompts, shared_ctx, text_deep, vis_deep = maple_prompts(
            m["prompt_learner"], pc["token_prefix"], pc["token_suffix"], 9
        )
        img = encode_image(m["clip"]["visual"], arch, images,
                           shallow_prompts=shared_ctx, deep_prompts=vis_deep)
        return img.ravel()[0].astype(jnp.float32)

    t_vf = timeit(chain_scalar(vis_fwd_s, images0, (trainable, frozen)))
    print(f"vision fwd         {t_vf*1e3:8.2f} ms", flush=True)

    def vis_fb_s(images, trainable, frozen):
        def loss(tr):
            m = merge_trees(tr, frozen["model"])
            pc = frozen["prompt_const"]
            prompts, shared_ctx, text_deep, vis_deep = maple_prompts(
                m["prompt_learner"], pc["token_prefix"], pc["token_suffix"], 9
            )
            img = encode_image(m["clip"]["visual"], arch, images,
                               shallow_prompts=shared_ctx,
                               deep_prompts=vis_deep)
            img32 = img.astype(jnp.float32)
            return 0.5 * (img32 * img32).sum()

        g = jax.grad(loss)(trainable)
        return jax.tree_util.tree_reduce(
            lambda a, x: a + x.ravel()[0].astype(jnp.float32), g, 0.0
        )

    t_vfb = timeit(chain_scalar(vis_fb_s, images0, (trainable, frozen)))
    print(f"vision fwd+bwd     {t_vfb*1e3:8.2f} ms", flush=True)

    def txt_fb_s(carry, trainable, frozen):
        def loss(tr):
            m = merge_trees(tr, frozen["model"])
            pc = frozen["prompt_const"]
            prompts, shared_ctx, text_deep, vis_deep = maple_prompts(
                m["prompt_learner"], pc["token_prefix"], pc["token_suffix"], 9
            )
            txt = encode_text_embedded(
                m["clip"]["text"], arch, prompts, pc["eot_index"],
                deep_prompts=text_deep, max_len=text_len,
            )
            txt32 = txt.astype(jnp.float32)
            return 0.5 * (txt32 * txt32).sum()

        g = jax.grad(loss)(trainable)
        return jax.tree_util.tree_reduce(
            lambda a, x: a + x.ravel()[0].astype(jnp.float32), g, 0.0
        )

    t_tfb = timeit(chain_scalar(txt_fb_s, images0, (trainable, frozen)))
    print(f"text fwd+bwd       {t_tfb*1e3:8.2f} ms  (n_cls={n_cls})",
          flush=True)

    loss_fn = prog["loss_fn"]
    batch = {"image": images0, "label": labels}
    if not args.no_captions:
        from federated_multi_modal_tpu.tokenizer import tokenize

        batch["caption_tokens"] = jnp.asarray(
            tokenize(["a satellite photo of a scene"] * B)
        )

    def loss_fwd_s(images, trainable, frozen):
        b = dict(batch, image=images)
        loss, _ = loss_fn(trainable, frozen, b)
        return loss

    t_lf = timeit(chain_scalar(loss_fwd_s, images0, (trainable, frozen)))
    print(f"full loss fwd      {t_lf*1e3:8.2f} ms")

    def loss_fb_s(images, trainable, frozen):
        b = dict(batch, image=images)

        def w(tr):
            return loss_fn(tr, frozen, b)[0]

        loss, g = jax.value_and_grad(w)(trainable)
        return loss + jax.tree_util.tree_reduce(
            lambda a, x: a + x.ravel()[0].astype(jnp.float32), g, 0.0
        )

    t_lfb = timeit(chain_scalar(loss_fb_s, images0, (trainable, frozen)))
    print(f"full loss fwd+bwd  {t_lfb*1e3:8.2f} ms")
    print(f"# sum(preproc+loss_fb) = {(t_pre+t_lfb)*1e3:.2f} ms vs "
          f"bench full step; vision share f+b = {t_vfb*1e3:.2f}, "
          f"text share f+b = {t_tfb*1e3:.2f}")


def run_block(args):
    """Component timings at ViT-B/16 block shapes: LN, GELU, MLP, the
    attention sublayer, one full block, 12 scanned blocks, and the
    prompt-injection concat — fwd and fwd+activation-bwd (weights frozen,
    as in MaPLe training)."""
    import jax
    import jax.numpy as jnp

    from federated_multi_modal_tpu.models.params import (
        BACKBONE_CONFIGS,
        init_clip_params,
    )
    from federated_multi_modal_tpu.ops import primitives as P

    from federated_multi_modal_tpu.ops.primitives import set_attention_impl

    set_attention_impl(args.attention)
    B, T, D = args.batch, args.t, args.d
    H = args.heads
    arch = BACKBONE_CONFIGS["ViT-B/16"]
    key = jax.random.PRNGKey(0)
    params = init_clip_params(arch, key)
    blk = jax.tree_util.tree_map(
        lambda a: a.astype(jnp.bfloat16), params["visual"]["blocks"][0]
    )
    blocks12 = jax.tree_util.tree_map(
        lambda *xs: jnp.stack(xs),
        *[jax.tree_util.tree_map(lambda a: a.astype(jnp.bfloat16), b)
          for b in params["visual"]["blocks"]],
    )
    x0 = (jax.random.normal(key, (B, T, D), jnp.float32) * 0.02).astype(
        jnp.bfloat16
    )
    iters = args.iters
    timeit = _mk_timer(iters)

    def chain(f, *extra, carry=None):
        """f(x, *extra) -> same-shaped array; chained via scaled feedback."""
        c0 = x0 if carry is None else carry

        def make():
            def scan(c, *ex):
                def body(c, _):
                    out = f(c, *ex)
                    return (c * 0.9999 + out.astype(c.dtype) * 1e-6), ()

                c, _ = jax.lax.scan(body, c, length=iters)
                return c.ravel()[0].astype(jnp.float32)

            return scan, c0, extra

        return make

    def chain_fb(f, *extra, carry=None):
        c0 = x0 if carry is None else carry

        def make():
            def scan(c, *ex):
                def body(c, _):
                    d = jax.grad(
                        lambda x: 0.5 * (f(x, *ex).astype(jnp.float32) ** 2).sum()
                    )(c)
                    return (c * 0.9999 + d.astype(c.dtype) * 1e-6), ()

                c, _ = jax.lax.scan(body, c, length=iters)
                return c.ravel()[0].astype(jnp.float32)

            return scan, c0, extra

        return make

    def report(name, f, *extra, fb=True, carry=None):
        only = args.only.split(",") if args.only else []
        if only and name not in only and not name.startswith("null"):
            return
        try:
            tf = timeit(chain(f, *extra, carry=carry))
            line = f"{name:12s} fwd {tf*1e3:8.2f} ms"
            if fb and not args.fwd_only:
                tb = timeit(chain_fb(f, *extra, carry=carry))
                line += f" | fwd+bwd {tb*1e3:8.2f} ms"
        except Exception as e:
            line = f"{name:12s} FAILED: {type(e).__name__}: {str(e)[:120]}"
        print(line, flush=True)

    x_fc = (jax.random.normal(key, (B, T, 4 * D), jnp.float32) * 0.02).astype(
        jnp.bfloat16
    )
    only_list = args.only.split(",") if args.only else []
    if only_list == ["patchify"]:
        _patchify_bench(args, arch, params, timeit, iters, key, B)
        return
    skip_patchify = bool(only_list) and "patchify" not in only_list
    report("null", lambda x: x * 1.0000001)
    report("null_fc", lambda x: x * 1.0000001, carry=x_fc)
    report("ln", lambda x, p: P.layer_norm(x, p), blk["ln_1"])
    report("gelu", lambda x: P.quick_gelu(x), carry=x_fc)
    report("mlp", lambda x, p: P.mlp(x, p), blk["mlp"])
    report("attn_sub",
           lambda x, p: P.multi_head_attention(x, p, H), blk["attn"])
    report("block",
           lambda x, p: P.residual_block(x, p, H), blk)

    def block_noln(x, p):
        """The block with both LayerNorms removed — the CEILING a fused
        LN+matmul kernel could reach.  block - block_noln >> 0 means XLA
        is NOT hiding LN's bandwidth and a Pallas fusion has headroom;
        ~0 means LN already rides the matmul pipeline for free."""
        x = x + P.multi_head_attention(x, p["attn"], H)
        x = x + P.mlp(x, p["mlp"])
        return x

    report("block_noln", block_noln, blk)

    def ln_linear(x, lnp, w, b):
        """Algebraic LN->matmul fusion: LN(x) @ w + b WITHOUT materializing
        LN(x).  Per-row scalars mu/rstd commute with the contraction:
        LN(x)@W = rstd*(x @ (gamma (.) W)) - rstd*mu*(gamma^T W) + beta^T W
        — one bf16 dot over a row-scaled W, a cheap fused moments
        reduction over x, and an elementwise epilogue XLA folds into the
        dot's output write.  Exact in fp32; in bf16 it ROUNDS DIFFERENTLY
        (raw x instead of normalized LN(x) enters the dot)."""
        g = lnp["scale"].astype(jnp.float32)
        beta = lnp["bias"].astype(jnp.float32)
        w32 = w.astype(jnp.float32)
        wp = (g[:, None] * w32).astype(x.dtype)
        s = (g @ w32)
        t = (beta @ w32)
        x32 = x.astype(jnp.float32)
        mu = jnp.mean(x32, -1, keepdims=True)
        var = jnp.mean(jnp.square(x32 - mu), -1, keepdims=True)
        rstd = jax.lax.rsqrt(var + 1e-5)
        y = jnp.matmul(x, wp).astype(jnp.float32)
        y = rstd * y - (rstd * mu) * s + t
        if b is not None:
            y = y + b.astype(jnp.float32)
        return y.astype(x.dtype)

    def block_lnfuse(x, p):
        from federated_multi_modal_tpu.ops.pallas import attention as pa

        qkv = ln_linear(x, p["ln_1"], p["attn"]["w_qkv"], p["attn"]["b_qkv"])
        if args.attention == "pallas":
            a = pa.packed_attention(qkv, H)
        else:
            q, k, v = jnp.split(qkv, 3, axis=-1)
            a = pa._xla_attention(q, k, v, H, None)
        x = x + P.linear(a, p["attn"]["w_out"], p["attn"]["b_out"])
        h = P.quick_gelu(
            ln_linear(x, p["ln_2"], p["mlp"]["w_fc"], p["mlp"]["b_fc"])
        )
        return x + P.linear(h, p["mlp"]["w_proj"], p["mlp"]["b_proj"])

    report("block_lnfuse", block_lnfuse, blk)

    # experimental fused LN1+QKV+attention kernel (module level, above)
    def attn_path_ref(x, p):
        """Today's path for the same slice: LN1 (XLA) -> QKV matmul (XLA)
        -> packed attention kernel (reads QKV back from HBM; custom-VJP
        op so fwd+bwd is the production backward)."""
        from federated_multi_modal_tpu.ops.pallas import attention as pa

        xn = P.layer_norm(x, p["ln_1"])
        qkv = P.linear(xn, p["attn"]["w_qkv"], p["attn"]["b_qkv"])
        return pa.packed_attention(qkv, H)

    _fused_fb = make_fused_lnqkv_attention_fb(
        H, GB=int(os.environ.get("FMM_TPU_FUSED_GB", "4"))
    )

    def attn_path_fused(x, p):
        return _fused_fb(
            x, p["ln_1"], p["attn"]["w_qkv"], p["attn"]["b_qkv"]
        )

    def attn_path_fused_raw(x, p):
        return fused_lnqkv_attention(
            x, p["ln_1"], p["attn"]["w_qkv"], p["attn"]["b_qkv"], H,
            GB=int(os.environ.get("FMM_TPU_FUSED_GB", "4")),
        )

    report("attn_path", attn_path_ref, blk)
    if not only_list or "attn_fused" in only_list:
        # the whole comparison under ONE jit with params as arguments —
        # eager pallas_call dispatch 500s the remote compiler, and closing
        # over weights would bake them into the HLO (CLAUDE.md)
        try:
            err = float(jax.device_get(jax.jit(
                lambda x, p: jnp.max(jnp.abs(
                    attn_path_ref(x, p).astype(jnp.float32)
                    - attn_path_fused(x, p).astype(jnp.float32)
                ))
            )(x0, blk)))
            print(f"attn_fused max|diff| vs attn_path = {err:.3e} "
                  f"(bf16 re-rounding; fp32-exact on CPU interpret — "
                  f"tests/test_pallas.py)", flush=True)
        except Exception as e:
            print(f"attn_fused check FAILED: {type(e).__name__}: "
                  f"{str(e)[:150]}", flush=True)
    report("attn_fusedp", attn_path_fused_raw, blk, fb=False)
    report("attn_fused", attn_path_fused, blk)

    def twelve(x, bs):
        def body(c, b):
            return P.residual_block(c, b, H), ()

        y, _ = jax.lax.scan(body, x, bs)
        return y

    report("block12", twelve, blocks12)

    def twelve_unrolled(x, bs):
        """Python-unrolled like the real tower (encode_image loops blocks
        in python); the scanned variant crashes the tunnel's remote
        compiler, this one compiles."""
        for i in range(12):
            blk_i = jax.tree_util.tree_map(lambda a: a[i], bs)
            x = P.residual_block(x, blk_i, H)
        return x

    report("block12u", twelve_unrolled, blocks12)

    prompt = (jax.random.normal(key, (2, D), jnp.float32) * 0.02).astype(
        jnp.bfloat16
    )

    def inject(x, p):
        pb = jnp.broadcast_to(p[None], (B,) + p.shape)
        return jnp.concatenate([x[:, : T - p.shape[0]], pb], axis=1)

    report("inject", inject, prompt)

    deep8 = (jax.random.normal(key, (8, 2, D), jnp.float32) * 0.02).astype(
        jnp.bfloat16
    )

    def twelve_injected(x, bs, dp):
        """block12u + the exact per-layer injection glue of the real tower
        (``models/clip_model.py:143-150``): layers 1..8 slice the trailing
        2 prompt tokens off and concat fresh ones.  block12i - block12u =
        the in-situ injection cost; tower - block12i = the remaining
        embed/LN/proj glue."""
        for i in range(12):
            if 1 <= i <= dp.shape[0]:
                p = jnp.broadcast_to(dp[i - 1][None], (B,) + dp.shape[1:])
                x = jnp.concatenate(
                    [x[:, : T - p.shape[1]], p.astype(x.dtype)], axis=1
                )
            blk_i = jax.tree_util.tree_map(lambda a: a[i], bs)
            x = P.residual_block(x, blk_i, H)
        return x

    report("block12i", twelve_injected, blocks12, deep8)

    if not only_list or "tower" in only_list:
        _tower_bench(args, arch, params, timeit, iters, key, B)
    if not skip_patchify:
        _patchify_bench(args, arch, params, timeit, iters, key, B)


def _tower_bench(args, arch, params, timeit, iters, key, B):
    """The real ``encode_image`` with MaPLe-style shallow+deep prompts,
    fwd and fwd+prompt-bwd — measured in the SAME session as
    block12u/block12i so the tower-vs-12x-block gap can be attributed
    without cross-session tunnel drift (docs/BENCH.md)."""
    import jax
    import jax.numpy as jnp

    from federated_multi_modal_tpu.models.clip_model import encode_image

    D = arch.vision_width
    res = arch.image_resolution
    images = (jax.random.normal(key, (B, res, res, 3), jnp.float32)
              * 0.5).astype(jnp.bfloat16)
    vis = jax.tree_util.tree_map(
        lambda a: a.astype(jnp.bfloat16)
        if hasattr(a, "dtype") and a.dtype == jnp.float32 else a,
        params["visual"],
    )
    sp = (jax.random.normal(key, (2, D), jnp.float32) * 0.02).astype(
        jnp.bfloat16
    )
    dp = (jax.random.normal(jax.random.fold_in(key, 7), (8, 2, D),
                            jnp.float32) * 0.02).astype(jnp.bfloat16)

    def fwd(imgs, vis, sp, dp):
        return encode_image(vis, arch, imgs, shallow_prompts=sp,
                            deep_prompts=[dp[i] for i in range(8)])

    def make(fb):
        def build():
            def scan(c, vis, sp, dp):
                def body(c, _):
                    if fb:
                        def loss(pr):
                            s, d = pr
                            f = fwd(c, vis, s, d).astype(jnp.float32)
                            return 0.5 * (f * f).sum()

                        gs, gd = jax.grad(loss)((sp, dp))
                        out = gs.ravel()[0] + gd.ravel()[0]
                    else:
                        out = fwd(c, vis, sp, dp).ravel()[0]
                    return (c * 0.9999
                            + (out * 1e-30).astype(c.dtype)), ()

                c, _ = jax.lax.scan(body, c, length=iters)
                return c.ravel()[0].astype(jnp.float32)

            return scan, images, (vis, sp, dp)

        return build

    try:
        tf = timeit(make(False))
        line = f"tower        fwd {tf*1e3:8.2f} ms"
        if not args.fwd_only:
            tb = timeit(make(True))
            line += f" | fwd+bwd {tb*1e3:8.2f} ms"
        print(line, flush=True)
    except Exception as e:
        print(f"tower FAILED: {type(e).__name__}: {str(e)[:120]}",
              flush=True)


def _patchify_bench(args, arch, params, timeit, iters, key, B):
    """Patch embedding: the only (…, 3)-minor-dim op in the tower —
    suspected relayout sink (3 of 128 lanes live through the 6-D
    transpose)."""
    import jax
    import jax.numpy as jnp

    from federated_multi_modal_tpu.models.clip_model import patchify

    images = (jax.random.normal(key, (B, 224, 224, 3), jnp.float32)
              * 0.5).astype(jnp.bfloat16)
    vis = jax.tree_util.tree_map(
        lambda a: a.astype(jnp.bfloat16)
        if a.dtype == jnp.float32 else a,
        {"conv1": params["visual"]["conv1"]},
    )

    def make_patch():
        def scan(c, vis):
            def body(c, _):
                out = patchify(vis, arch, c)
                return (c * 0.9999
                        + (out.ravel()[0] * 1e-30).astype(c.dtype)), ()

            c, _ = jax.lax.scan(body, c, length=iters)
            return c.ravel()[0].astype(jnp.float32)

        return scan, images, (vis,)

    def make_null_img():
        def scan(c):
            def body(c, _):
                return c * 1.0000001, ()

            c, _ = jax.lax.scan(body, c, length=iters)
            return c.ravel()[0].astype(jnp.float32)

        return scan, images, ()

    try:
        tn = timeit(make_null_img)
        tp = timeit(make_patch)
        print(f"null_img     fwd {tn*1e3:8.2f} ms", flush=True)
        print(f"patchify     fwd {tp*1e3:8.2f} ms  "
              f"(net {max(tp-tn,0)*1e3:.2f})", flush=True)
    except Exception as e:
        print(f"patchify FAILED: {str(e)[:120]}", flush=True)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--mode", choices=["attn", "parts", "block"],
                   default="attn")
    p.add_argument("--batch", type=int, default=512)
    p.add_argument("--t", type=int, default=200)
    p.add_argument("--d", type=int, default=768)
    p.add_argument("--heads", type=int, default=12)
    p.add_argument("--n-cls", type=int, default=1000)
    p.add_argument("--iters", type=int, default=20)
    p.add_argument("--dtype", choices=["bf16", "f32"], default="bf16")
    p.add_argument("--variants", default="")
    p.add_argument("--fwd-only", action="store_true")
    p.add_argument("--no-captions", action="store_true")
    p.add_argument("--attention", choices=["xla", "pallas"],
                   default="pallas")
    p.add_argument("--platform", choices=["default", "cpu"],
                   default="default")
    p.add_argument("--only", default="",
                   help="block mode: run only the named sub-bench(es), "
                        "comma-separated (e.g. block12u,block12i,tower)")
    args = p.parse_args()
    if args.platform == "cpu":
        import jax

        jax.config.update("jax_platforms", "cpu")
    if args.mode == "parts":
        run_parts(args)
    elif args.mode == "block":
        run_block(args)
    else:
        run_attn(args)


if __name__ == "__main__":
    main()
