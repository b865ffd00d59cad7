"""Golden test: the MaPLe prompt-learner coupling math against an inline
torch reimplementation of the fork's alternating-parity design
(``trainers/maple.py:117-131, 194-218`` semantics)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn as nn

from federated_multi_modal_tpu.models.params import tiny_test_config
from federated_multi_modal_tpu.trainers.maple import (
    init_maple_prompt_learner,
    maple_prompts,
)


class _TorchMaPLePromptCoupling(nn.Module):
    """The fork's coupling rule, restated: even depth i owns a text param
    projected text->vis; odd depth i owns a vision param projected
    vis->text; shared_ctx = proj_lang_to_vis(ctx)."""

    def __init__(self, n_ctx, d_text, d_vis, depth):
        super().__init__()
        self.depth = depth
        self.ctx = nn.Parameter(torch.randn(n_ctx, d_text) * 0.02)
        self.proj_lang_to_vis = nn.Linear(d_text, d_vis)
        self.text_params = nn.ParameterList(
            [nn.Parameter(torch.randn(n_ctx, d_text) * 0.02)
             for i in range(depth - 1) if i % 2 == 0]
        )
        self.vis_params = nn.ParameterList(
            [nn.Parameter(torch.randn(n_ctx, d_vis) * 0.02)
             for i in range(depth - 1) if i % 2 != 0]
        )
        self.projections = nn.ModuleList(
            [nn.Linear(d_text, d_vis) if i % 2 == 0 else nn.Linear(d_vis, d_text)
             for i in range(depth - 1)]
        )

    def forward(self):
        text_deep = [None] * (self.depth - 1)
        vis_deep = [None] * (self.depth - 1)
        for i, layer in enumerate(self.projections):
            if i % 2 == 0:
                p = self.text_params[i // 2]
                vis_deep[i] = layer(p)
                text_deep[i] = p
            else:
                p = self.vis_params[(i - 1) // 2]
                text_deep[i] = layer(p)
                vis_deep[i] = p
        shared_ctx = self.proj_lang_to_vis(self.ctx)
        return shared_ctx, text_deep, vis_deep


@pytest.mark.parametrize("depth", [3, 4, 5])
def test_alternating_coupling_matches_torch(depth):
    torch.manual_seed(0)
    arch = tiny_test_config()
    n_ctx = 2
    d_text, d_vis = arch.transformer_width, arch.vision_width

    tm = _TorchMaPLePromptCoupling(n_ctx, d_text, d_vis, depth).eval()

    # build our tree and copy torch weights into it
    pl = init_maple_prompt_learner(
        jax.random.PRNGKey(0), arch, n_ctx, depth, jnp.zeros((n_ctx, d_text)),
        use_captions=False,
    )
    pl["ctx"] = jnp.asarray(tm.ctx.detach().numpy())
    pl["proj_lang_to_vis"] = {
        "w": jnp.asarray(tm.proj_lang_to_vis.weight.detach().numpy().T),
        "b": jnp.asarray(tm.proj_lang_to_vis.bias.detach().numpy()),
    }
    pl["text_deep_params"] = [
        jnp.asarray(p.detach().numpy()) for p in tm.text_params
    ]
    pl["vis_deep_params"] = [
        jnp.asarray(p.detach().numpy()) for p in tm.vis_params
    ]
    pl["couplers"] = [
        {
            "w": jnp.asarray(l.weight.detach().numpy().T),
            "b": jnp.asarray(l.bias.detach().numpy()),
        }
        for l in tm.projections
    ]

    n_cls = 3
    prefix = jnp.zeros((n_cls, 1, d_text))
    suffix = jnp.zeros((n_cls, 77 - 1 - n_ctx, d_text))
    prompts, shared_ctx, text_deep, vis_deep = maple_prompts(
        pl, prefix, suffix, depth
    )

    with torch.no_grad():
        t_shared, t_text, t_vis = tm()

    np.testing.assert_allclose(
        np.asarray(shared_ctx), t_shared.detach().numpy(), atol=1e-5, rtol=1e-5
    )
    assert len(text_deep) == len(t_text) == depth - 1
    for i in range(depth - 1):
        np.testing.assert_allclose(
            np.asarray(text_deep[i]), t_text[i].detach().numpy(), atol=1e-5, rtol=1e-5,
            err_msg=f"text_deep[{i}]",
        )
        np.testing.assert_allclose(
            np.asarray(vis_deep[i]), t_vis[i].detach().numpy(), atol=1e-5, rtol=1e-5,
            err_msg=f"vis_deep[{i}]",
        )

    # prompts: [prefix, ctx, suffix] with ctx broadcast per class
    np.testing.assert_allclose(
        np.asarray(prompts[:, 1 : 1 + n_ctx, :]),
        np.tile(tm.ctx.detach().numpy()[None], (n_cls, 1, 1)),
        atol=1e-6,
    )


def test_ownership_parity_counts():
    """depth-1 slots: ceil/floor split between text-owned and vision-owned."""
    arch = tiny_test_config()
    for depth in (2, 3, 6, 9):
        pl = init_maple_prompt_learner(
            jax.random.PRNGKey(0), arch, 2, depth, jnp.zeros((2, arch.transformer_width)),
            use_captions=False,
        )
        n = depth - 1
        assert len(pl["text_deep_params"]) == (n + 1) // 2
        assert len(pl["vis_deep_params"]) == n // 2
        assert len(pl["couplers"]) == n
        for i, c in enumerate(pl["couplers"]):
            d_in = c["w"].shape[0]
            assert d_in == (arch.transformer_width if i % 2 == 0
                            else arch.vision_width)
