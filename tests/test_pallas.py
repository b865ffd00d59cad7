"""Pallas fused attention: interpreter-mode parity against the XLA path."""

import jax.numpy as jnp
import numpy as np
import pytest

from federated_multi_modal_tpu.ops import build_causal_mask, multi_head_attention
from federated_multi_modal_tpu.ops.pallas.attention import (
    fused_attention,
    multi_head_attention_pallas,
    pallas_available,
)

pytestmark = pytest.mark.skipif(
    not pallas_available(), reason="pallas unavailable"
)


def _params(rng, d):
    return {
        "w_qkv": rng.standard_normal((d, 3 * d)).astype(np.float32) * 0.05,
        "b_qkv": rng.standard_normal(3 * d).astype(np.float32) * 0.05,
        "w_out": rng.standard_normal((d, d)).astype(np.float32) * 0.05,
        "b_out": rng.standard_normal(d).astype(np.float32) * 0.05,
    }


@pytest.mark.parametrize("T", [77, 199])  # text / MaPLe-vision lengths
def test_fused_attention_matches_xla(rng, T):
    d, n_head, B = 128, 2, 2
    x = rng.standard_normal((B, T, d)).astype(np.float32)
    p = _params(rng, d)
    ref = np.asarray(multi_head_attention(jnp.asarray(x), p, n_head))
    got = np.asarray(
        multi_head_attention_pallas(jnp.asarray(x), p, n_head, interpret=True)
    )
    np.testing.assert_allclose(got, ref, atol=2e-4, rtol=2e-4)


def test_fused_attention_causal_mask(rng):
    d, n_head, B, T = 128, 2, 1, 77
    x = rng.standard_normal((B, T, d)).astype(np.float32)
    p = _params(rng, d)
    mask = build_causal_mask(T)
    ref = np.asarray(multi_head_attention(jnp.asarray(x), p, n_head, mask))
    got = np.asarray(
        multi_head_attention_pallas(
            jnp.asarray(x), p, n_head, attn_mask=mask, interpret=True
        )
    )
    np.testing.assert_allclose(got, ref, atol=2e-4, rtol=2e-4)


def test_fused_attention_padding_is_ignored(rng):
    """T=199 pads to 200; padded keys must not leak into real outputs."""
    d, n_head, B, T = 64, 1, 1, 9  # pads to 16
    q = rng.standard_normal((B, T, d)).astype(np.float32)
    k = rng.standard_normal((B, T, d)).astype(np.float32)
    v = rng.standard_normal((B, T, d)).astype(np.float32)
    got = np.asarray(fused_attention(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), n_head, interpret=True
    ))
    # reference computed without padding
    import jax

    scale = 1.0 / np.sqrt(d)
    s = q[0] @ k[0].T * scale
    pr = np.asarray(jax.nn.softmax(jnp.asarray(s), axis=-1))
    ref = (pr @ v[0])[None]
    np.testing.assert_allclose(got, ref, atol=2e-4, rtol=2e-4)


def test_differentiable_wrapper_grads_match_xla(rng):
    """fused_attention_diff: pallas forward + XLA-derived backward must
    match the plain XLA attention's gradients."""
    import jax

    from federated_multi_modal_tpu.ops.pallas import attention as pa

    d, n_head, B, T = 128, 2, 1, 9
    q = rng.standard_normal((B, T, d)).astype(np.float32)
    k = rng.standard_normal((B, T, d)).astype(np.float32)
    v = rng.standard_normal((B, T, d)).astype(np.float32)

    def loss_xla(q, k, v):
        return pa._xla_attention(
            jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), n_head, None
        ).sum()

    # interpret mode for the kernel forward on CPU
    orig = pa.fused_attention
    pa.fused_attention = lambda q, k, v, n, m=None: orig(
        q, k, v, n, m, interpret=True
    )
    try:
        def loss_pl(q, k, v):
            return pa.fused_attention_diff(
                jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), n_head, None
            ).sum()

        g_ref = jax.grad(loss_xla, argnums=(0, 1, 2))(q, k, v)
        g_pl = jax.grad(loss_pl, argnums=(0, 1, 2))(q, k, v)
    finally:
        pa.fused_attention = orig

    for a, b in zip(g_pl, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-4, rtol=2e-4)


def test_packed_attention_matches_xla(rng):
    """Packed-QKV kernel (no transposes, in-VMEM scores): forward parity."""
    import jax

    from federated_multi_modal_tpu.ops.pallas import attention as pa

    d, n_head, B, T = 128, 2, 4, 16
    qkv = rng.standard_normal((B, T, 3 * d)).astype(np.float32)
    assert pa.packed_attention_eligible(B, T, d, n_head, None)

    q, k, v = np.split(qkv, 3, axis=-1)
    ref = np.asarray(pa._xla_attention(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), n_head, None
    ))
    got = np.asarray(pa.packed_attention(jnp.asarray(qkv), n_head))
    np.testing.assert_allclose(got, ref, atol=2e-4, rtol=2e-4)


def test_packed_attention_grads_match_xla(rng):
    """The in-kernel backward (recomputed scores, packed d(QKV)) must match
    the XLA attention's VJP."""
    import jax

    from federated_multi_modal_tpu.ops.pallas import attention as pa

    d, n_head, B, T = 128, 2, 2, 8
    qkv = rng.standard_normal((B, T, 3 * d)).astype(np.float32)
    co = rng.standard_normal((B, T, d)).astype(np.float32)

    def loss_xla(qkv):
        q, k, v = jnp.split(qkv, 3, axis=-1)
        return jnp.sum(pa._xla_attention(q, k, v, n_head, None) * co)

    def loss_pl(qkv):
        return jnp.sum(pa.packed_attention(qkv, n_head) * co)

    g_ref = jax.grad(loss_xla)(jnp.asarray(qkv))
    g_pl = jax.grad(loss_pl)(jnp.asarray(qkv))
    np.testing.assert_allclose(
        np.asarray(g_pl), np.asarray(g_ref), atol=2e-4, rtol=2e-4
    )


def test_packed_attention_eligibility():
    from federated_multi_modal_tpu.ops.pallas import attention as pa

    assert pa.packed_attention_eligible(512, 200, 768, 12, None)
    assert pa.packed_attention_eligible(512, 199, 768, 12, None)  # pads to 200
    assert not pa.packed_attention_eligible(
        512, 200, 768, 12, np.zeros((200, 200))  # masked
    )
    assert not pa.packed_attention_eligible(2, 16, 48, 3, None)  # hd=16, H=3


def test_packed_attention_unaligned_T(rng):
    """T=13 pads to 16 with in-kernel key masking; parity incl. grads."""
    import jax

    from federated_multi_modal_tpu.ops.pallas import attention as pa

    d, n_head, B, T = 128, 2, 2, 13
    qkv = rng.standard_normal((B, T, 3 * d)).astype(np.float32)
    co = rng.standard_normal((B, T, d)).astype(np.float32)

    def loss_xla(qkv):
        q, k, v = jnp.split(qkv, 3, axis=-1)
        return jnp.sum(pa._xla_attention(q, k, v, n_head, None) * co)

    def loss_pl(qkv):
        return jnp.sum(pa.packed_attention(qkv, n_head) * co)

    np.testing.assert_allclose(
        np.asarray(pa.packed_attention(jnp.asarray(qkv), n_head)),
        np.asarray(pa._xla_attention(
            *jnp.split(jnp.asarray(qkv), 3, axis=-1), n_head, None
        )),
        atol=2e-4, rtol=2e-4,
    )
    g_ref = jax.grad(loss_xla)(jnp.asarray(qkv))
    g_pl = jax.grad(loss_pl)(jnp.asarray(qkv))
    np.testing.assert_allclose(
        np.asarray(g_pl), np.asarray(g_ref), atol=2e-4, rtol=2e-4
    )


def test_attention_impl_switch(rng):
    """set_attention_impl routes multi_head_attention through the kernel."""
    from federated_multi_modal_tpu.ops import primitives as P
    from federated_multi_modal_tpu.ops.pallas import attention as pa

    d, n_head, B, T = 128, 2, 2, 11
    x = rng.standard_normal((B, T, d)).astype(np.float32)
    p = _params(rng, d)

    ref = np.asarray(P.multi_head_attention(jnp.asarray(x), p, n_head))
    orig = pa.fused_attention
    pa.fused_attention = lambda q, k, v, n, m=None: orig(
        q, k, v, n, m, interpret=True
    )
    P.set_attention_impl("pallas")
    try:
        got = np.asarray(P.multi_head_attention(jnp.asarray(x), p, n_head))
    finally:
        P.set_attention_impl("xla")
        pa.fused_attention = orig
    np.testing.assert_allclose(got, ref, atol=2e-4, rtol=2e-4)


def test_packed_attention_under_vmap(rng):
    """The fed-parallel path vmaps the loss over clients; packed attention
    must batch correctly in both directions."""
    import jax

    from federated_multi_modal_tpu.ops.pallas import attention as pa

    C, B, T, d, n_head = 2, 2, 8, 128, 2
    qkv = rng.standard_normal((C, B, T, 3 * d)).astype(np.float32)
    co = rng.standard_normal((C, B, T, d)).astype(np.float32)

    def loss(qkv, co):
        return jnp.sum(pa.packed_attention(qkv, n_head) * co)

    def loss_ref(qkv, co):
        q, k, v = jnp.split(qkv, 3, axis=-1)
        return jnp.sum(pa._xla_attention(q, k, v, n_head, None) * co)

    g = jax.grad(lambda q: jnp.sum(jax.vmap(loss)(q, jnp.asarray(co))))(
        jnp.asarray(qkv)
    )
    g_ref = jax.grad(
        lambda q: jnp.sum(jax.vmap(loss_ref)(q, jnp.asarray(co)))
    )(jnp.asarray(qkv))
    np.testing.assert_allclose(
        np.asarray(g), np.asarray(g_ref), atol=2e-4, rtol=2e-4
    )


def test_packed_attention_masked_matches_xla(rng):
    """Masked packed-QKV kernel (sequence-packed text rows): forward parity
    with XLA attention under a block-diagonal causal mask."""
    from federated_multi_modal_tpu.ops.pallas import attention as pa
    from federated_multi_modal_tpu.ops.primitives import build_block_causal_mask

    d, n_head, B = 128, 2, 4
    P, Tb = 4, 8
    T = P * Tb
    mask = build_block_causal_mask(P, Tb)
    qkv = rng.standard_normal((B, T, 3 * d)).astype(np.float32)
    assert pa.packed_attention_masked_eligible(B, T, d, n_head, mask)

    q, k, v = np.split(qkv, 3, axis=-1)
    ref = np.asarray(pa._xla_attention(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), n_head, mask
    ))
    got = np.asarray(
        pa.packed_attention_masked(jnp.asarray(qkv), mask, n_head)
    )
    np.testing.assert_allclose(got, ref, atol=2e-4, rtol=2e-4)


def test_packed_attention_masked_grads_match_xla(rng):
    import jax

    from federated_multi_modal_tpu.ops.pallas import attention as pa
    from federated_multi_modal_tpu.ops.primitives import build_block_causal_mask

    d, n_head, B = 128, 2, 2
    P, Tb = 2, 8
    T = P * Tb
    mask = build_block_causal_mask(P, Tb)
    qkv = rng.standard_normal((B, T, 3 * d)).astype(np.float32)
    co = rng.standard_normal((B, T, d)).astype(np.float32)

    def loss_xla(qkv):
        q, k, v = jnp.split(qkv, 3, axis=-1)
        return jnp.sum(pa._xla_attention(q, k, v, n_head, mask) * co)

    def loss_pl(qkv):
        return jnp.sum(pa.packed_attention_masked(qkv, mask, n_head) * co)

    g_ref = jax.grad(loss_xla)(jnp.asarray(qkv))
    g_pl = jax.grad(loss_pl)(jnp.asarray(qkv))
    np.testing.assert_allclose(
        np.asarray(g_pl), np.asarray(g_ref), atol=2e-4, rtol=2e-4
    )


def test_packed_attention_masked_unaligned_T(rng):
    """Token counts that are not multiples of 8 pad keys with -inf via the
    mask; outputs on real tokens must be unaffected."""
    from federated_multi_modal_tpu.ops.pallas import attention as pa
    from federated_multi_modal_tpu.ops.primitives import build_causal_mask

    d, n_head, B, T = 128, 2, 2, 37
    mask = build_causal_mask(T)
    qkv = rng.standard_normal((B, T, 3 * d)).astype(np.float32)
    q, k, v = np.split(qkv, 3, axis=-1)
    ref = np.asarray(pa._xla_attention(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), n_head, mask
    ))
    got = np.asarray(
        pa.packed_attention_masked(jnp.asarray(qkv), mask, n_head)
    )
    np.testing.assert_allclose(got, ref, atol=2e-4, rtol=2e-4)


def test_pick_gb_respects_mosaic_slice_limit(monkeypatch):
    """GB * hp (the (b, h) slices one grid step touches) must stay <= 16 —
    Mosaic rejects kernels beyond that (docs/BENCH.md).  head_dim 32
    (hp = 4) shapes would otherwise pick GB = 8 from the VMEM estimate
    alone, and FMM_TPU_PACKED_GB must not be able to push past the limit
    either."""
    from federated_multi_modal_tpu.ops.pallas import attention as pa

    assert pa._pick_gb(512, 200, jnp.bfloat16, hp=4) == 4
    assert pa._pick_gb(512, 200, jnp.bfloat16, hp=2) == 8
    monkeypatch.setenv("FMM_TPU_PACKED_GB", "16")
    assert pa._pick_gb(512, 128, jnp.bfloat16, hp=2) <= 8
    # and the packed kernels still run end-to-end at hp=4 (head_dim 32)
    import jax

    r = np.random.default_rng(0)
    qkv = jnp.asarray(r.standard_normal((8, 16, 3 * 256)).astype(np.float32))
    q, k, v = jnp.split(qkv, 3, axis=-1)
    ref = np.asarray(pa._xla_attention(q, k, v, 8, None))
    got = np.asarray(pa.packed_attention(qkv, 8))
    np.testing.assert_allclose(got, ref, atol=2e-4, rtol=2e-4)


def test_fused_lnqkv_attention_matches_unfused(rng):
    """The experimental fused LN1->QKV->attention kernel
    (tools/attn_microbench.py::fused_lnqkv_attention, a round-3 production
    candidate) must equal LN + QKV matmul + packed attention exactly in
    fp32 (the algebra is identical; only bf16 re-rounding may differ)."""
    import sys

    sys.path.insert(0, str(__import__("pathlib").Path(__file__).parents[1]
                           / "tools"))
    from attn_microbench import fused_lnqkv_attention
    from federated_multi_modal_tpu.ops import primitives as P
    from federated_multi_modal_tpu.ops.pallas import attention as pa

    B, T, D, H = 8, 16, 128, 2
    x = jnp.asarray(rng.standard_normal((B, T, D)).astype(np.float32))
    lnp = {
        "scale": jnp.asarray(
            (rng.standard_normal(D) * 0.1 + 1).astype(np.float32)),
        "bias": jnp.asarray(
            (rng.standard_normal(D) * 0.1).astype(np.float32)),
    }
    w = jnp.asarray((rng.standard_normal((D, 3 * D)) * 0.05).astype(
        np.float32))
    b = jnp.asarray((rng.standard_normal(3 * D) * 0.05).astype(np.float32))

    qkv = P.linear(P.layer_norm(x, lnp), w, b)
    ref = pa.attention_packed_fwd(qkv, H, interpret=True)
    got = fused_lnqkv_attention(x, lnp, w, b, H, GB=4, interpret=True)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), atol=2e-5, rtol=2e-5
    )


def test_fused_lnqkv_attention_bwd_dx_matches_autodiff(rng):
    """dx from the experimental fused backward kernel
    (tools/attn_microbench.py::make_fused_lnqkv_attention_fb — recomputes
    LN/QKV/scores in VMEM) must match autodiff through the unfused
    LN -> QKV matmul -> packed-attention path to fp32 precision."""
    import sys

    sys.path.insert(0, str(__import__("pathlib").Path(__file__).parents[1]
                           / "tools"))
    from attn_microbench import make_fused_lnqkv_attention_fb
    from federated_multi_modal_tpu.ops import primitives as P
    from federated_multi_modal_tpu.ops.pallas import attention as pa

    import jax

    B, T, D, H = 4, 16, 128, 2
    x = jnp.asarray(rng.standard_normal((B, T, D)).astype(np.float32))
    lnp = {
        "scale": jnp.asarray(
            (rng.standard_normal(D) * 0.1 + 1).astype(np.float32)),
        "bias": jnp.asarray(
            (rng.standard_normal(D) * 0.1).astype(np.float32)),
    }
    w = jnp.asarray((rng.standard_normal((D, 3 * D)) * 0.05).astype(
        np.float32))
    b = jnp.asarray((rng.standard_normal(3 * D) * 0.05).astype(np.float32))
    co = jnp.asarray(rng.standard_normal((B, T, D)).astype(np.float32))

    def unfused(x):
        qkv = P.linear(P.layer_norm(x, lnp), w, b)
        return pa.packed_attention(qkv, H)

    fused = make_fused_lnqkv_attention_fb(H, GB=2, interpret=True)
    ref_dx = jax.grad(lambda x: jnp.sum(unfused(x) * co))(x)
    got_dx = jax.grad(lambda x: jnp.sum(fused(x, lnp, w, b) * co))(x)
    np.testing.assert_allclose(
        np.asarray(got_dx), np.asarray(ref_dx), atol=2e-5, rtol=2e-5
    )


# --------------------------------------------------------------------------
# production fused LN+QKV+attention (ops/pallas/fused_block.py)
# --------------------------------------------------------------------------


@pytest.mark.parametrize("T", [16, 13])  # aligned + padded token counts
def test_fused_ln_attention_production(rng, T):
    """The production fused op (fwd + custom VJP) matches LN -> QKV matmul
    -> XLA attention exactly in fp32, including dgamma/dbeta accumulated
    across grid steps and the padded-T key masking."""
    import jax

    from federated_multi_modal_tpu.ops import primitives as P
    from federated_multi_modal_tpu.ops.pallas.attention import _xla_attention
    from federated_multi_modal_tpu.ops.pallas.fused_block import (
        fused_ln_attention,
    )

    B, D, H = 4, 128, 2
    x = jnp.asarray(rng.standard_normal((B, T, D)).astype(np.float32))
    lnp = {
        "scale": jnp.asarray(
            (rng.standard_normal(D) * 0.1 + 1).astype(np.float32)),
        "bias": jnp.asarray(
            (rng.standard_normal(D) * 0.1).astype(np.float32)),
    }
    w = jnp.asarray((rng.standard_normal((D, 3 * D)) * 0.05).astype(
        np.float32))
    b = jnp.asarray((rng.standard_normal(3 * D) * 0.05).astype(np.float32))
    co = jnp.asarray(rng.standard_normal((B, T, D)).astype(np.float32))

    def ref(x, lnp):
        qkv = P.linear(P.layer_norm(x, lnp), w, b)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        return _xla_attention(q, k, v, H, None)

    got = fused_ln_attention(x, lnp, w, b, H)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref(x, lnp)), atol=2e-5, rtol=2e-5
    )

    g_got = jax.grad(
        lambda x, lnp: jnp.sum(fused_ln_attention(x, lnp, w, b, H) * co),
        argnums=(0, 1),
    )(x, lnp)
    g_ref = jax.grad(
        lambda x, lnp: jnp.sum(ref(x, lnp) * co), argnums=(0, 1)
    )(x, lnp)
    for a, r in zip(jax.tree.leaves(g_got), jax.tree.leaves(g_ref)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(r), atol=5e-5, rtol=5e-5
        )
    # contract: weight cotangents are zeros (frozen-W blocks only)
    dw = jax.grad(
        lambda w: jnp.sum(fused_ln_attention(x, lnp, w, b, H) * co)
    )(w)
    assert float(jnp.max(jnp.abs(dw))) == 0.0


@pytest.mark.parametrize("T", [16, 13])  # aligned + padded token counts
def test_fused_ln_mlp_residual_matches_unfused(rng, T):
    """The inference MLP kernel (LN2 -> fc -> QuickGELU -> proj -> residual
    in one pallas_call) matches the unfused primitives exactly in fp32,
    with the hidden dim consumed in column chunks."""
    from federated_multi_modal_tpu.ops import primitives as P
    from federated_multi_modal_tpu.ops.pallas.fused_block import (
        fused_ln_mlp_residual,
    )

    B, D = 4, 128
    x = jnp.asarray(rng.standard_normal((B, T, D)).astype(np.float32))
    lnp = {
        "scale": jnp.asarray(
            (rng.standard_normal(D) * 0.1 + 1).astype(np.float32)),
        "bias": jnp.asarray(
            (rng.standard_normal(D) * 0.1).astype(np.float32)),
    }
    mlpp = {
        "w_fc": jnp.asarray(
            (rng.standard_normal((D, 4 * D)) * 0.05).astype(np.float32)),
        "b_fc": jnp.asarray(
            (rng.standard_normal(4 * D) * 0.05).astype(np.float32)),
        "w_proj": jnp.asarray(
            (rng.standard_normal((4 * D, D)) * 0.05).astype(np.float32)),
        "b_proj": jnp.asarray(
            (rng.standard_normal(D) * 0.05).astype(np.float32)),
    }
    ref = x + P.mlp(P.layer_norm(x, lnp), mlpp)
    got = fused_ln_mlp_residual(x, lnp, mlpp)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), atol=2e-5, rtol=2e-5
    )


@pytest.mark.parametrize("T", [16, 13])  # aligned + padded token counts
def test_residual_block_inference_matches_xla(rng, T):
    """residual_block(inference=True) under the pallas impl (fused
    attention+out-proj+residual kernel, then fused LN2+MLP+residual
    kernel) matches the plain XLA block forward."""
    from federated_multi_modal_tpu.ops import primitives as P

    B, D, H = 4, 128, 2
    x = jnp.asarray(rng.standard_normal((B, T, D)).astype(np.float32))
    p = {
        "ln_1": {"scale": jnp.ones(D), "bias": jnp.zeros(D)},
        "ln_2": {
            "scale": jnp.asarray(
                (rng.standard_normal(D) * 0.1 + 1).astype(np.float32)),
            "bias": jnp.asarray(
                (rng.standard_normal(D) * 0.1).astype(np.float32)),
        },
        "attn": {
            "w_qkv": jnp.asarray(
                (rng.standard_normal((D, 3 * D)) * 0.05).astype(np.float32)),
            "b_qkv": jnp.zeros(3 * D),
            "w_out": jnp.asarray(
                (rng.standard_normal((D, D)) * 0.05).astype(np.float32)),
            "b_out": jnp.zeros(D),
        },
        "mlp": {
            "w_fc": jnp.asarray(
                (rng.standard_normal((D, 4 * D)) * 0.05).astype(np.float32)),
            "b_fc": jnp.zeros(4 * D),
            "w_proj": jnp.asarray(
                (rng.standard_normal((4 * D, D)) * 0.05).astype(np.float32)),
            "b_proj": jnp.zeros(D),
        },
    }
    ref = P.residual_block(x, p, H, None)
    P.set_attention_impl("pallas")
    try:
        got = P.residual_block(x, p, H, None, attn_w_frozen=True,
                               inference=True)
    finally:
        P.set_attention_impl("xla")
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), atol=2e-5, rtol=2e-5
    )


def test_residual_block_fused_path_matches_autodiff(rng, monkeypatch):
    """residual_block(attn_w_frozen=True) under the pallas impl computes the
    same output and (x, ln_1, ln_2, mlp) grads as the plain XLA block.

    Pins the SUBLAYER fused path (exact MLP grads), so the whole-block
    train kernel — whose contract zeroes the MLP cotangents too, tested in
    test_fused_block_train_matches_autodiff — is gated off here."""
    import jax

    from federated_multi_modal_tpu.ops import primitives as P

    monkeypatch.setenv("FMM_TPU_FUSED_TRAIN_BLOCK", "0")

    B, T, D, H = 4, 16, 128, 2
    x = jnp.asarray(rng.standard_normal((B, T, D)).astype(np.float32))
    p = {
        "ln_1": {"scale": jnp.ones(D), "bias": jnp.zeros(D)},
        "ln_2": {"scale": jnp.ones(D), "bias": jnp.zeros(D)},
        "attn": {
            "w_qkv": jnp.asarray(
                (rng.standard_normal((D, 3 * D)) * 0.05).astype(np.float32)),
            "b_qkv": jnp.zeros(3 * D),
            "w_out": jnp.asarray(
                (rng.standard_normal((D, D)) * 0.05).astype(np.float32)),
            "b_out": jnp.zeros(D),
        },
        "mlp": {
            "w_fc": jnp.asarray(
                (rng.standard_normal((D, 4 * D)) * 0.05).astype(np.float32)),
            "b_fc": jnp.zeros(4 * D),
            "w_proj": jnp.asarray(
                (rng.standard_normal((4 * D, D)) * 0.05).astype(np.float32)),
            "b_proj": jnp.zeros(D),
        },
    }
    co = jnp.asarray(rng.standard_normal((B, T, D)).astype(np.float32))

    def diffable(p):  # grads wrt everything EXCEPT the attention weights
        return {"ln_1": p["ln_1"], "ln_2": p["ln_2"], "mlp": p["mlp"]}

    def run(frozen_flag):
        def loss(x, dp):
            full = dict(p, **dp)
            return jnp.sum(
                P.residual_block(x, full, H, None, attn_w_frozen=frozen_flag)
                * co
            )

        out = P.residual_block(x, p, H, None, attn_w_frozen=frozen_flag)
        grads = jax.grad(loss, argnums=(0, 1))(x, diffable(p))
        return out, grads

    P.set_attention_impl("pallas")
    try:
        out_f, g_f = run(True)
    finally:
        P.set_attention_impl("xla")
    out_r, g_r = run(False)
    np.testing.assert_allclose(
        np.asarray(out_f), np.asarray(out_r), atol=2e-5, rtol=2e-5
    )
    for a, r in zip(jax.tree.leaves(g_f), jax.tree.leaves(g_r)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(r), atol=5e-5, rtol=5e-5
        )


def test_vision_attn_wgrad_policy_matches_trainable_split():
    """The 'last' policy trainers declare is exactly what the MaPLe unfreeze
    predicate makes trainable: attention weights of visual.blocks.{L-1}
    only (reference trainers/maple.py:447-479)."""
    from federated_multi_modal_tpu.ops import primitives as P
    from federated_multi_modal_tpu.trainers.maple import (
        maple_trainable_predicate,
    )

    L = 3
    pred = maple_trainable_predicate(L, L)
    P.set_vision_attn_wgrad_blocks("last")
    try:
        resolved = P.get_vision_attn_wgrad_blocks(L)
    finally:
        P.set_vision_attn_wgrad_blocks(None)
    assert resolved == frozenset({L - 1})
    for i in range(L):
        trainable = pred(f"visual.blocks.{i}.attn.w_qkv")
        assert trainable == (i in resolved)
    # prompt-only trainers declare frozenset(): no attention weight trains
    from federated_multi_modal_tpu.trainers.cocoop import CoCoOp
    from federated_multi_modal_tpu.trainers.coop import CoOp
    from federated_multi_modal_tpu.trainers.ivlp import IVLP
    from federated_multi_modal_tpu.trainers.maple import MaPLe
    from federated_multi_modal_tpu.trainers.vpt import VPT
    from federated_multi_modal_tpu.trainers.zsclip import ZeroshotCLIP

    assert MaPLe.ATTN_WGRAD_VISION == "last"
    for cls in (CoOp, CoCoOp, VPT, IVLP, ZeroshotCLIP):
        assert cls.ATTN_WGRAD_VISION == frozenset()


def test_maple_grads_fused_policy_end_to_end(rng):
    """Full MaPLe loss + grads on the trainable pytree are unchanged when
    the frozen-W vision blocks route through the fused kernel (Tiny
    backbone, fp32, interpreter mode)."""
    import jax

    from federated_multi_modal_tpu.flagship import (
        build_maple_program,
        example_batch,
    )
    from federated_multi_modal_tpu.ops import primitives as P

    def to_fp32(tree):  # floats only — token-id leaves stay integer
        return jax.tree.map(
            lambda x: x.astype(jnp.float32)
            if jnp.issubdtype(x.dtype, jnp.inexact) else x,
            tree,
        )

    def build():
        prog = build_maple_program(
            backbone="Tiny", classnames=["cat", "dog", "bird"],
            n_ctx=2, depth=2, use_captions=True, seed=0,
        )
        # fp32 everywhere for a tight comparison
        prog["trainable"] = to_fp32(prog["trainable"])
        prog["frozen"] = to_fp32(prog["frozen"])
        return prog

    batch = None

    def grads_for(impl, policy):
        nonlocal batch
        P.set_attention_impl(impl)
        P.set_vision_attn_wgrad_blocks(policy)
        try:
            prog = build()
            if batch is None:
                batch = example_batch(prog["arch"], batch_size=4, n_cls=3)
                batch["image"] = batch["image"].astype(jnp.float32)
            loss, _ = prog["loss_fn"](prog["trainable"], prog["frozen"], batch)
            g = jax.grad(
                lambda t: prog["loss_fn"](t, prog["frozen"], batch)[0]
            )(prog["trainable"])
            return float(loss), g
        finally:
            P.set_attention_impl("xla")
            P.set_vision_attn_wgrad_blocks(None)

    loss_ref, g_ref = grads_for("xla", None)
    loss_fused, g_fused = grads_for("pallas", "last")
    assert abs(loss_ref - loss_fused) < 1e-5
    for a, r in zip(jax.tree.leaves(g_fused), jax.tree.leaves(g_ref)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(r), atol=1e-4, rtol=1e-3
        )


@pytest.mark.parametrize("T", [16, 13])  # aligned + padded token counts
def test_fused_block_residual_matches_unfused(rng, T):
    """The whole-block inference kernel (LN1 -> QKV -> attention ->
    out-proj -> +x -> LN2 -> fc -> QuickGELU -> proj -> +y in ONE
    pallas_call, round-3 verdict task 3) matches the unfused primitives in
    fp32, including nonzero biases and key-padding."""
    import os

    from federated_multi_modal_tpu.ops import primitives as P
    from federated_multi_modal_tpu.ops.pallas.fused_block import (
        fused_block_eligible,
        fused_block_residual,
    )

    B, D, H = 4, 128, 2
    x = jnp.asarray(rng.standard_normal((B, T, D)).astype(np.float32))

    def vec(n, s=0.05):
        return jnp.asarray((rng.standard_normal(n) * s).astype(np.float32))

    p = {
        "ln_1": {"scale": vec(D, 0.1) + 1, "bias": vec(D, 0.1)},
        "ln_2": {"scale": vec(D, 0.1) + 1, "bias": vec(D, 0.1)},
        "attn": {
            "w_qkv": jnp.asarray(
                (rng.standard_normal((D, 3 * D)) * 0.05).astype(np.float32)),
            "b_qkv": vec(3 * D),
            "w_out": jnp.asarray(
                (rng.standard_normal((D, D)) * 0.05).astype(np.float32)),
            "b_out": vec(D),
        },
        "mlp": {
            "w_fc": jnp.asarray(
                (rng.standard_normal((D, 4 * D)) * 0.05).astype(np.float32)),
            "b_fc": vec(4 * D),
            "w_proj": jnp.asarray(
                (rng.standard_normal((4 * D, D)) * 0.05).astype(np.float32)),
            "b_proj": vec(D),
        },
    }
    assert fused_block_eligible(B, T, D, H, 4 * D, None)
    ref = P.residual_block(x, p, H, None)
    got = fused_block_residual(x, p, H)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), atol=2e-5, rtol=2e-5
    )

    # escape hatch: FMM_TPU_FUSED_BLOCK=0 falls back to the two-kernel
    # path, which must also still match
    os.environ["FMM_TPU_FUSED_BLOCK"] = "0"
    P.set_attention_impl("pallas")
    try:
        assert not fused_block_eligible(B, T, D, H, 4 * D, None)
        two = P.residual_block(x, p, H, None, attn_w_frozen=True,
                               inference=True)
    finally:
        del os.environ["FMM_TPU_FUSED_BLOCK"]
        P.set_attention_impl("xla")
    np.testing.assert_allclose(
        np.asarray(two), np.asarray(ref), atol=2e-5, rtol=2e-5
    )


def _rand_block(rng, D):
    def vec(n, s=0.05):
        return jnp.asarray((rng.standard_normal(n) * s).astype(np.float32))

    def mat(shape, s=0.05):
        return jnp.asarray(
            (rng.standard_normal(shape) * s).astype(np.float32))

    return {
        "ln_1": {"scale": vec(D, 0.1) + 1, "bias": vec(D, 0.1)},
        "ln_2": {"scale": vec(D, 0.1) + 1, "bias": vec(D, 0.1)},
        "attn": {"w_qkv": mat((D, 3 * D)), "b_qkv": vec(3 * D),
                 "w_out": mat((D, D)), "b_out": vec(D)},
        "mlp": {"w_fc": mat((D, 4 * D)), "b_fc": vec(4 * D),
                "w_proj": mat((4 * D, D)), "b_proj": vec(D)},
    }


@pytest.mark.parametrize("T,group", [(16, 3), (16, 2), (10, 2)])
def test_fused_block_group_matches_sequential(rng, T, group):
    """The block-GROUP kernel (G blocks + in-kernel deep-prompt injection
    per pallas_call) reproduces the sequential per-block path: injection
    before blocks 1..dp replaces the trailing prompt rows (reference
    ``clip/model.py:320-349``), then the full pre-LN block runs."""
    from federated_multi_modal_tpu.ops import primitives as P
    from federated_multi_modal_tpu.ops.pallas.fused_block import (
        fused_block_group_residual,
    )

    B, D, H, N, n_ctx, dp = 4, 128, 2, 6, 2, 4
    blocks = [_rand_block(rng, D) for _ in range(N)]
    prompts = [
        jnp.asarray((rng.standard_normal((n_ctx, D)) * 0.3).astype(np.float32))
        for _ in range(dp)
    ]
    x0 = jnp.asarray(rng.standard_normal((B, T, D)).astype(np.float32))

    # sequential reference: the encode_image loop restated
    x = x0
    for i, blk in enumerate(blocks):
        if 1 <= i <= dp:
            pb = jnp.broadcast_to(prompts[i - 1][None], (B, n_ctx, D))
            x = jnp.concatenate([x[:, : T - n_ctx], pb], axis=1)
        x = P.residual_block(x, blk, H, None)
    ref = x

    # group kernel over the same schedule
    x = x0
    for s in range(0, N, group):
        grp = blocks[s:s + group]
        flags = tuple(1 <= s + j <= dp for j in range(len(grp)))
        pvs = tuple(prompts[s + j - 1] for j in range(len(grp))
                    if 1 <= s + j <= dp)
        x = fused_block_group_residual(
            x, tuple(grp), H, inject_flags=flags, prompts=pvs)
    np.testing.assert_allclose(
        np.asarray(x), np.asarray(ref), atol=5e-5, rtol=5e-5)


def test_fused_block_group_with_extra_tokens(rng):
    """Per-sample extra tokens (the MaPLe caption branch) are re-injected
    alongside every deep prompt inside the group kernel."""
    from federated_multi_modal_tpu.ops import primitives as P
    from federated_multi_modal_tpu.ops.pallas.fused_block import (
        fused_block_group_residual,
    )

    B, T, D, H, N, n_ctx, k, dp = 4, 16, 128, 2, 4, 2, 1, 3
    blocks = [_rand_block(rng, D) for _ in range(N)]
    prompts = [
        jnp.asarray((rng.standard_normal((n_ctx, D)) * 0.3).astype(np.float32))
        for _ in range(dp)
    ]
    extra = jnp.asarray(
        (rng.standard_normal((B, k, D)) * 0.3).astype(np.float32))
    x0 = jnp.asarray(rng.standard_normal((B, T, D)).astype(np.float32))
    n_tail = n_ctx + k

    x = x0
    for i, blk in enumerate(blocks):
        if 1 <= i <= dp:
            pb = jnp.broadcast_to(prompts[i - 1][None], (B, n_ctx, D))
            x = jnp.concatenate([x[:, : T - n_tail], pb, extra], axis=1)
        x = P.residual_block(x, blk, H, None)
    ref = x

    x = x0
    for s in range(0, N, 2):
        grp = blocks[s:s + 2]
        flags = tuple(1 <= s + j <= dp for j in range(len(grp)))
        pvs = tuple(prompts[s + j - 1] for j in range(len(grp))
                    if 1 <= s + j <= dp)
        x = fused_block_group_residual(
            x, tuple(grp), H, inject_flags=flags, prompts=pvs,
            extra=extra if any(flags) else None)
    np.testing.assert_allclose(
        np.asarray(x), np.asarray(ref), atol=5e-5, rtol=5e-5)


def test_encode_image_group_path_matches_default(rng):
    """``encode_image(inference=True)`` with FMM_TPU_FUSED_NBLK>1 routes the
    vision tower through the block-group kernel and must match the
    per-block path exactly (fp32, deep prompts active)."""
    import os

    import jax

    from federated_multi_modal_tpu.models.clip_model import encode_image
    from federated_multi_modal_tpu.models.params import (
        CLIPConfig,
        init_clip_params,
    )
    from federated_multi_modal_tpu.ops import primitives as P

    cfg = CLIPConfig(
        embed_dim=32, image_resolution=32, vision_layers=5, vision_width=128,
        vision_patch_size=16, context_length=77, vocab_size=512,
        transformer_width=64, transformer_heads=2, transformer_layers=2,
    )
    params = init_clip_params(cfg, jax.random.PRNGKey(3), dtype_policy=False)
    imgs = jnp.asarray(rng.standard_normal((4, 32, 32, 3)).astype(np.float32))
    shallow = jnp.asarray(
        (rng.standard_normal((2, 128)) * 0.3).astype(np.float32))
    deep = [
        jnp.asarray((rng.standard_normal((2, 128)) * 0.3).astype(np.float32))
        for _ in range(3)
    ]

    ref = encode_image(params["visual"], cfg, imgs, shallow_prompts=shallow,
                       deep_prompts=deep, inference=True)

    P.set_attention_impl("pallas")
    os.environ["FMM_TPU_FUSED_NBLK"] = "2"
    try:
        got = encode_image(params["visual"], cfg, imgs,
                           shallow_prompts=shallow, deep_prompts=deep,
                           inference=True)
    finally:
        del os.environ["FMM_TPU_FUSED_NBLK"]
        P.set_attention_impl("xla")
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), atol=5e-5, rtol=5e-5)


def test_fused_block_gb_env_guard(rng, monkeypatch):
    """FMM_TPU_FUSED_GB_BLK<=0 must clamp to 1, not crash the default eval
    fast path (0 is the off-switch convention of the SIBLING knob
    FMM_TPU_FUSED_BLOCK, an easy slip)."""
    from federated_multi_modal_tpu.ops.pallas.fused_block import (
        fused_block_residual,
    )

    B, T, D, H = 2, 16, 128, 2
    x = jnp.asarray(rng.standard_normal((B, T, D)).astype(np.float32))
    p = _rand_block(rng, D)
    ref = fused_block_residual(x, p, H)
    for bad in ("0", "-1"):
        monkeypatch.setenv("FMM_TPU_FUSED_GB_BLK", bad)
        got = fused_block_residual(x, p, H)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=1e-6, rtol=1e-6)


# --------------------------------------------------------------------------
# whole-block fused TRAIN kernel (round 5)
# --------------------------------------------------------------------------


@pytest.mark.parametrize("mode", ["save", "save-y", "recompute"])
@pytest.mark.parametrize("T", [16, 13])  # aligned + padded token counts
def test_fused_block_train_matches_autodiff(rng, T, mode, monkeypatch):
    """fused_block_train's value and VJP (dx + both LN grads) match
    autodiff through the unfused block in fp32, in every residual mode;
    all attention/MLP weight cotangents are exactly zero (the frozen-W
    contract)."""
    import jax

    from federated_multi_modal_tpu.ops import primitives as P
    from federated_multi_modal_tpu.ops.pallas.fused_block import (
        fused_block_train,
    )

    monkeypatch.setenv("FMM_TPU_FUSED_TRAIN_MODE", mode)
    B, D, H = 4, 128, 2
    x = jnp.asarray(rng.standard_normal((B, T, D)).astype(np.float32))
    p = _rand_block(rng, D)
    co = jnp.asarray(rng.standard_normal((B, T, D)).astype(np.float32))

    out_f = fused_block_train(x, p, H)
    out_r = P.residual_block(x, p, H, None)
    np.testing.assert_allclose(
        np.asarray(out_f), np.asarray(out_r), atol=2e-5, rtol=2e-5)

    gx_f, gp_f = jax.grad(
        lambda x_, p_: jnp.sum(fused_block_train(x_, p_, H) * co),
        argnums=(0, 1),
    )(x, p)
    gx_r, gp_r = jax.grad(
        lambda x_, p_: jnp.sum(P.residual_block(x_, p_, H, None) * co),
        argnums=(0, 1),
    )(x, p)
    np.testing.assert_allclose(
        np.asarray(gx_f), np.asarray(gx_r), atol=5e-5, rtol=5e-5)
    for ln in ("ln_1", "ln_2"):
        for leaf in ("scale", "bias"):
            np.testing.assert_allclose(
                np.asarray(gp_f[ln][leaf]), np.asarray(gp_r[ln][leaf]),
                atol=5e-4, rtol=5e-4, err_msg=f"{ln}.{leaf}")
    # frozen-W contract: every attention/MLP cotangent is exactly zero
    for grp in ("attn", "mlp"):
        for leaf in jax.tree.leaves(gp_f[grp]):
            assert not np.any(np.asarray(leaf)), grp


def test_fused_block_train_bf16_close(rng, monkeypatch):
    """bf16 storage: fused grads stay within bf16 re-rounding distance of
    the fp32 unfused reference."""
    import jax

    from federated_multi_modal_tpu.ops import primitives as P
    from federated_multi_modal_tpu.ops.pallas.fused_block import (
        fused_block_train,
    )

    monkeypatch.setenv("FMM_TPU_FUSED_TRAIN_MODE", "save")
    B, T, D, H = 4, 16, 128, 2
    x32 = jnp.asarray(rng.standard_normal((B, T, D)).astype(np.float32))
    p = _rand_block(rng, D)
    co = jnp.asarray(rng.standard_normal((B, T, D)).astype(np.float32))

    gx_f = jax.grad(
        lambda x_: jnp.sum(
            fused_block_train(x_.astype(jnp.bfloat16), p, H).astype(
                jnp.float32) * co)
    )(x32)
    gx_r = jax.grad(
        lambda x_: jnp.sum(
            P.residual_block(
                x_.astype(jnp.bfloat16), p, H, None).astype(jnp.float32)
            * co)
    )(x32)
    np.testing.assert_allclose(
        np.asarray(gx_f), np.asarray(gx_r), atol=3e-2, rtol=3e-2)


def test_fused_block_train_mode_env_guard(rng, monkeypatch):
    """An unknown FMM_TPU_FUSED_TRAIN_MODE raises loudly instead of
    silently falling back."""
    from federated_multi_modal_tpu.ops.pallas.fused_block import (
        fused_block_train,
    )

    monkeypatch.setenv("FMM_TPU_FUSED_TRAIN_MODE", "bogus")
    x = jnp.zeros((2, 16, 128), jnp.float32)
    with pytest.raises(ValueError, match="bogus"):
        fused_block_train(x, _rand_block(rng, 128), 2)


def test_maple_grads_fused_block_train_end_to_end(rng, monkeypatch):
    """Full MaPLe loss + trainable-pytree grads are unchanged when frozen
    vision blocks route through the whole-block TRAIN kernel
    (FMM_TPU_FUSED_TRAIN_BLOCK=1), and the kernel really is on the path."""
    import jax

    from federated_multi_modal_tpu.flagship import (
        build_maple_program,
        example_batch,
    )
    from federated_multi_modal_tpu.ops import primitives as P
    from federated_multi_modal_tpu.ops.pallas import fused_block as FB

    def to_fp32(tree):
        return jax.tree.map(
            lambda x: x.astype(jnp.float32)
            if jnp.issubdtype(x.dtype, jnp.inexact) else x,
            tree,
        )

    def build():
        prog = build_maple_program(
            backbone="Tiny", classnames=["cat", "dog", "bird"],
            n_ctx=2, depth=2, use_captions=True, seed=0,
        )
        prog["trainable"] = to_fp32(prog["trainable"])
        prog["frozen"] = to_fp32(prog["frozen"])
        return prog

    batch = None

    def grads_for(impl, policy, gate):
        nonlocal batch
        if gate:
            monkeypatch.setenv("FMM_TPU_FUSED_TRAIN_BLOCK", "1")
        else:
            monkeypatch.delenv("FMM_TPU_FUSED_TRAIN_BLOCK", raising=False)
        P.set_attention_impl(impl)
        P.set_vision_attn_wgrad_blocks(policy)
        try:
            prog = build()
            if batch is None:
                batch = example_batch(prog["arch"], batch_size=4, n_cls=3)
                batch["image"] = batch["image"].astype(jnp.float32)
            loss, _ = prog["loss_fn"](prog["trainable"], prog["frozen"], batch)
            g = jax.grad(
                lambda t: prog["loss_fn"](t, prog["frozen"], batch)[0]
            )(prog["trainable"])
            return float(loss), g
        finally:
            P.set_attention_impl("xla")
            P.set_vision_attn_wgrad_blocks(None)

    calls = {"n": 0}
    real = FB.fused_block_train

    def counting(*a, **k):
        calls["n"] += 1
        return real(*a, **k)

    monkeypatch.setattr(FB, "fused_block_train", counting)

    loss_ref, g_ref = grads_for("xla", None, gate=False)
    loss_fused, g_fused = grads_for("pallas", "last", gate=True)
    # Tiny has 3 vision blocks; blocks 0..1 are frozen-W and eligible —
    # loss + grad tracing calls the kernel at least twice
    assert calls["n"] >= 2
    assert abs(loss_ref - loss_fused) < 1e-5
    for a, r in zip(jax.tree.leaves(g_fused), jax.tree.leaves(g_ref)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(r), atol=1e-4, rtol=1e-3
        )


def test_fused_block_train_under_vmap(rng, monkeypatch):
    """The parallel federated step vmaps the whole train step over the
    client axis (trainers/maple_fed.py::build_parallel_fed_step); the
    whole-block train kernel must batch correctly under vmap for value AND
    grad."""
    import jax

    from federated_multi_modal_tpu.ops import primitives as P
    from federated_multi_modal_tpu.ops.pallas.fused_block import (
        fused_block_train,
    )

    monkeypatch.setenv("FMM_TPU_FUSED_TRAIN_MODE", "save")
    C, B, T, D, H = 3, 2, 16, 128, 2
    x = jnp.asarray(rng.standard_normal((C, B, T, D)).astype(np.float32))
    p = _rand_block(rng, D)
    co = jnp.asarray(rng.standard_normal((C, B, T, D)).astype(np.float32))

    def loss(x_c, co_c):
        return jnp.sum(fused_block_train(x_c, p, H) * co_c)

    def loss_ref(x_c, co_c):
        return jnp.sum(P.residual_block(x_c, p, H, None) * co_c)

    vals = jax.vmap(loss)(x, co)
    grads = jax.vmap(jax.grad(loss))(x, co)
    vals_r = jax.vmap(loss_ref)(x, co)
    grads_r = jax.vmap(jax.grad(loss_ref))(x, co)
    np.testing.assert_allclose(
        np.asarray(vals), np.asarray(vals_r), atol=2e-4, rtol=2e-5)
    np.testing.assert_allclose(
        np.asarray(grads), np.asarray(grads_r), atol=5e-5, rtol=5e-5)


@pytest.mark.parametrize("save_h", ["0", "1"])
@pytest.mark.parametrize("T", [16, 13])
def test_fused_block_train_dw_matches_autodiff(rng, T, save_h, monkeypatch):
    """The dW variant's VJP matches autodiff through the unfused block for
    EVERY cotangent: x, both LNs, and all attention/MLP weights+biases —
    in both the h-recompute (default) and h-stored residual modes."""
    import jax

    from federated_multi_modal_tpu.ops import primitives as P
    from federated_multi_modal_tpu.ops.pallas.fused_block import (
        fused_block_train_dw,
    )

    monkeypatch.setenv("FMM_TPU_FUSED_TRAIN_DW_SAVEH", save_h)

    B, D, H = 4, 128, 2
    x = jnp.asarray(rng.standard_normal((B, T, D)).astype(np.float32))
    p = _rand_block(rng, D)
    co = jnp.asarray(rng.standard_normal((B, T, D)).astype(np.float32))

    out_f = fused_block_train_dw(x, p, H)
    out_r = P.residual_block(x, p, H, None)
    np.testing.assert_allclose(
        np.asarray(out_f), np.asarray(out_r), atol=2e-5, rtol=2e-5)

    gx_f, gp_f = jax.grad(
        lambda x_, p_: jnp.sum(fused_block_train_dw(x_, p_, H) * co),
        argnums=(0, 1),
    )(x, p)
    gx_r, gp_r = jax.grad(
        lambda x_, p_: jnp.sum(P.residual_block(x_, p_, H, None) * co),
        argnums=(0, 1),
    )(x, p)
    np.testing.assert_allclose(
        np.asarray(gx_f), np.asarray(gx_r), atol=5e-5, rtol=5e-5)
    flat_f = jax.tree.leaves_with_path(gp_f)
    flat_r = dict(jax.tree.leaves_with_path(gp_r))
    assert len(flat_f) == 12  # 2 LN x2 + 4 attn + 4 mlp leaves
    for path, leaf in flat_f:
        np.testing.assert_allclose(
            np.asarray(leaf), np.asarray(flat_r[path]),
            atol=1e-3, rtol=1e-4, err_msg=str(path))


def test_maple_grads_both_fused_train_kernels_end_to_end(rng, monkeypatch):
    """MaPLe loss + trainable grads with BOTH round-5 kernels routed:
    frozen vision blocks through fused_block_train, the trainable last
    block through the dW variant — equal to the XLA reference path.
    The trainable tree includes the last block's attention/MLP weights, so
    this checks the dW cotangents end-to-end."""
    import jax

    from federated_multi_modal_tpu.flagship import (
        build_maple_program,
        example_batch,
    )
    from federated_multi_modal_tpu.ops import primitives as P
    from federated_multi_modal_tpu.ops.pallas import fused_block as FB

    def to_fp32(tree):
        return jax.tree.map(
            lambda x: x.astype(jnp.float32)
            if jnp.issubdtype(x.dtype, jnp.inexact) else x,
            tree,
        )

    batch = None

    def grads_for(impl, policy, dw):
        nonlocal batch
        if dw:
            monkeypatch.setenv("FMM_TPU_FUSED_TRAIN_DW", "1")
        else:
            monkeypatch.delenv("FMM_TPU_FUSED_TRAIN_DW", raising=False)
        P.set_attention_impl(impl)
        P.set_vision_attn_wgrad_blocks(policy)
        try:
            prog = build_maple_program(
                backbone="Tiny", classnames=["cat", "dog", "bird"],
                n_ctx=2, depth=2, use_captions=True, seed=0,
            )
            prog["trainable"] = to_fp32(prog["trainable"])
            prog["frozen"] = to_fp32(prog["frozen"])
            if batch is None:
                batch = example_batch(prog["arch"], batch_size=4, n_cls=3)
                batch["image"] = batch["image"].astype(jnp.float32)
            loss, _ = prog["loss_fn"](prog["trainable"], prog["frozen"], batch)
            g = jax.grad(
                lambda t: prog["loss_fn"](t, prog["frozen"], batch)[0]
            )(prog["trainable"])
            return float(loss), g
        finally:
            P.set_attention_impl("xla")
            P.set_vision_attn_wgrad_blocks(None)

    calls = {"n": 0}
    real = FB.fused_block_train_dw

    def counting(*a, **k):
        calls["n"] += 1
        return real(*a, **k)

    monkeypatch.setattr(FB, "fused_block_train_dw", counting)

    loss_ref, g_ref = grads_for("xla", None, dw=False)
    loss_fused, g_fused = grads_for("pallas", "last", dw=True)
    assert calls["n"] >= 1  # the trainable last block routed through dW
    assert abs(loss_ref - loss_fused) < 1e-5
    for (path, a), r in zip(
        jax.tree.leaves_with_path(g_fused), jax.tree.leaves(g_ref)
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(r), atol=2e-4, rtol=1e-3,
            err_msg=str(path))
