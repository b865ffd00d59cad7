"""Golden-value parity of the JAX primitives against torch (CPU).

The reference computes through torch ``nn.MultiheadAttention`` /
``nn.LayerNorm`` / QuickGELU (``clip/model.py:153-198``); these tests build
the equivalent torch modules inline, copy weights both ways, and require
agreement to fp32 tolerance.
"""

import jax.numpy as jnp
import numpy as np
import torch
import torch.nn as nn

from federated_multi_modal_tpu.ops import (
    build_causal_mask,
    layer_norm,
    mlp,
    multi_head_attention,
    quick_gelu,
    residual_block,
)

TOL = dict(atol=2e-5, rtol=2e-5)


def test_quick_gelu_matches_torch(rng):
    x = rng.standard_normal((4, 16)).astype(np.float32)
    ours = np.asarray(quick_gelu(jnp.asarray(x)))
    theirs = (torch.from_numpy(x) * torch.sigmoid(1.702 * torch.from_numpy(x))).numpy()
    np.testing.assert_allclose(ours, theirs, **TOL)


def test_layer_norm_matches_torch(rng):
    d = 32
    x = rng.standard_normal((3, 7, d)).astype(np.float32)
    scale = rng.standard_normal(d).astype(np.float32)
    bias = rng.standard_normal(d).astype(np.float32)

    ours = np.asarray(layer_norm(jnp.asarray(x), {"scale": scale, "bias": bias}))

    ln = nn.LayerNorm(d)
    with torch.no_grad():
        ln.weight.copy_(torch.from_numpy(scale))
        ln.bias.copy_(torch.from_numpy(bias))
    theirs = ln(torch.from_numpy(x)).detach().numpy()
    np.testing.assert_allclose(ours, theirs, **TOL)


def _mha_params(rng, d):
    return {
        "w_qkv": rng.standard_normal((d, 3 * d)).astype(np.float32) * 0.05,
        "b_qkv": rng.standard_normal(3 * d).astype(np.float32) * 0.05,
        "w_out": rng.standard_normal((d, d)).astype(np.float32) * 0.05,
        "b_out": rng.standard_normal(d).astype(np.float32) * 0.05,
    }


def _torch_mha(p, d, n_head):
    mha = nn.MultiheadAttention(d, n_head, batch_first=True)
    with torch.no_grad():
        mha.in_proj_weight.copy_(torch.from_numpy(p["w_qkv"].T))
        mha.in_proj_bias.copy_(torch.from_numpy(p["b_qkv"]))
        mha.out_proj.weight.copy_(torch.from_numpy(p["w_out"].T))
        mha.out_proj.bias.copy_(torch.from_numpy(p["b_out"]))
    return mha


def test_attention_matches_torch(rng):
    d, n_head, B, T = 32, 4, 2, 11
    x = rng.standard_normal((B, T, d)).astype(np.float32)
    p = _mha_params(rng, d)

    ours = np.asarray(
        multi_head_attention(jnp.asarray(x), p, n_head)
    )
    mha = _torch_mha(p, d, n_head)
    theirs, _ = mha(torch.from_numpy(x), torch.from_numpy(x), torch.from_numpy(x),
                    need_weights=False)
    np.testing.assert_allclose(ours, theirs.detach().numpy(), atol=1e-4, rtol=1e-4)


def test_attention_causal_mask_matches_torch(rng):
    d, n_head, B, T = 16, 2, 2, 9
    x = rng.standard_normal((B, T, d)).astype(np.float32)
    p = _mha_params(rng, d)
    mask = build_causal_mask(T)

    ours = np.asarray(multi_head_attention(jnp.asarray(x), p, n_head, mask))
    mha = _torch_mha(p, d, n_head)
    tmask = torch.full((T, T), float("-inf")).triu(1)
    theirs, _ = mha(torch.from_numpy(x), torch.from_numpy(x), torch.from_numpy(x),
                    attn_mask=tmask, need_weights=False)
    np.testing.assert_allclose(ours, theirs.detach().numpy(), atol=1e-4, rtol=1e-4)


class _TorchBlock(nn.Module):
    """Inline rebuild of the reference ResidualAttentionBlock for parity."""

    def __init__(self, d, n_head):
        super().__init__()
        self.attn = nn.MultiheadAttention(d, n_head, batch_first=True)
        self.ln_1 = nn.LayerNorm(d)
        self.c_fc = nn.Linear(d, d * 4)
        self.c_proj = nn.Linear(d * 4, d)
        self.ln_2 = nn.LayerNorm(d)

    def forward(self, x, mask=None):
        h = self.ln_1(x)
        a, _ = self.attn(h, h, h, attn_mask=mask, need_weights=False)
        x = x + a
        h = self.ln_2(x)
        h = self.c_fc(h)
        h = h * torch.sigmoid(1.702 * h)
        return x + self.c_proj(h)


def test_residual_block_matches_torch(rng):
    d, n_head, B, T = 32, 4, 2, 13
    x = rng.standard_normal((B, T, d)).astype(np.float32)
    p = {
        "ln_1": {
            "scale": rng.standard_normal(d).astype(np.float32),
            "bias": rng.standard_normal(d).astype(np.float32) * 0.1,
        },
        "attn": _mha_params(rng, d),
        "ln_2": {
            "scale": rng.standard_normal(d).astype(np.float32),
            "bias": rng.standard_normal(d).astype(np.float32) * 0.1,
        },
        "mlp": {
            "w_fc": rng.standard_normal((d, 4 * d)).astype(np.float32) * 0.05,
            "b_fc": rng.standard_normal(4 * d).astype(np.float32) * 0.05,
            "w_proj": rng.standard_normal((4 * d, d)).astype(np.float32) * 0.05,
            "b_proj": rng.standard_normal(d).astype(np.float32) * 0.05,
        },
    }

    ours = np.asarray(residual_block(jnp.asarray(x), p, n_head))

    tb = _TorchBlock(d, n_head)
    with torch.no_grad():
        tb.attn.in_proj_weight.copy_(torch.from_numpy(p["attn"]["w_qkv"].T))
        tb.attn.in_proj_bias.copy_(torch.from_numpy(p["attn"]["b_qkv"]))
        tb.attn.out_proj.weight.copy_(torch.from_numpy(p["attn"]["w_out"].T))
        tb.attn.out_proj.bias.copy_(torch.from_numpy(p["attn"]["b_out"]))
        tb.ln_1.weight.copy_(torch.from_numpy(p["ln_1"]["scale"]))
        tb.ln_1.bias.copy_(torch.from_numpy(p["ln_1"]["bias"]))
        tb.ln_2.weight.copy_(torch.from_numpy(p["ln_2"]["scale"]))
        tb.ln_2.bias.copy_(torch.from_numpy(p["ln_2"]["bias"]))
        tb.c_fc.weight.copy_(torch.from_numpy(p["mlp"]["w_fc"].T))
        tb.c_fc.bias.copy_(torch.from_numpy(p["mlp"]["b_fc"]))
        tb.c_proj.weight.copy_(torch.from_numpy(p["mlp"]["w_proj"].T))
        tb.c_proj.bias.copy_(torch.from_numpy(p["mlp"]["b_proj"]))
    theirs = tb(torch.from_numpy(x)).detach().numpy()
    np.testing.assert_allclose(ours, theirs, atol=1e-4, rtol=1e-4)


def test_mlp_quickgelu_chain(rng):
    d = 16
    x = rng.standard_normal((2, 5, d)).astype(np.float32)
    p = {
        "w_fc": rng.standard_normal((d, 4 * d)).astype(np.float32) * 0.1,
        "b_fc": np.zeros(4 * d, np.float32),
        "w_proj": rng.standard_normal((4 * d, d)).astype(np.float32) * 0.1,
        "b_proj": np.zeros(d, np.float32),
    }
    ours = np.asarray(mlp(jnp.asarray(x), p))
    h = x @ p["w_fc"] + p["b_fc"]
    h = h * (1.0 / (1.0 + np.exp(-1.702 * h)))
    theirs = h @ p["w_proj"] + p["b_proj"]
    np.testing.assert_allclose(ours, theirs, atol=1e-4, rtol=1e-4)
