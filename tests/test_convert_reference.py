"""Reference-checkpoint converter: synthetic torch-named state dicts map
into names our MaPLe/CoOp trainable trees accept."""

import sys

import numpy as np
import torch

sys.path.insert(0, "tools")

from convert_reference_checkpoint import (  # noqa: E402
    convert_maple,
    convert_prompt_learner_only,
)


def test_convert_maple_names_and_transposes():
    d_text, d_vis, n_ctx, depth = 8, 12, 2, 4
    sd = {
        "prompt_learner.ctx": torch.randn(n_ctx, d_text),
        "prompt_learner.token_prefix": torch.randn(3, 1, d_text),
        "prompt_learner.token_suffix": torch.randn(3, 74, d_text),
        "prompt_learner.proj_lang_to_vis.weight": torch.randn(d_vis, d_text),
        "prompt_learner.proj_lang_to_vis.bias": torch.randn(d_vis),
        "prompt_learner.proj_vis_to_lang.weight": torch.randn(d_text, d_vis),
        "prompt_learner.proj_vis_to_lang.bias": torch.randn(d_text),
        "prompt_learner.compound_prompts_text_parameters.0": torch.randn(n_ctx, d_text),
        "prompt_learner.compound_prompts_text_parameters.1": torch.randn(n_ctx, d_text),
        "prompt_learner.visual_deep_prompts_parameters.0": torch.randn(n_ctx, d_vis),
        "prompt_learner.compound_prompt_projections.0.weight": torch.randn(d_vis, d_text),
        "prompt_learner.compound_prompt_projections.0.bias": torch.randn(d_vis),
        "prompt_learner.compound_prompt_projections.1.weight": torch.randn(d_text, d_vis),
        "prompt_learner.compound_prompt_projections.1.bias": torch.randn(d_text),
        "prompt_learner.compound_prompt_projections.2.weight": torch.randn(d_vis, d_text),
        "prompt_learner.compound_prompt_projections.2.bias": torch.randn(d_vis),
        "image_encoder.conv1.weight": torch.randn(d_vis, 3, 2, 2),
        "image_encoder.ln_pre.weight": torch.randn(d_vis),
        "image_encoder.ln_pre.bias": torch.randn(d_vis),
        "image_encoder.transformer.resblocks.0.ln_1.weight": torch.randn(d_vis),
        "image_encoder.transformer.resblocks.0.ln_1.bias": torch.randn(d_vis),
        "image_encoder.transformer.resblocks.0.attn.in_proj_weight": torch.randn(3 * d_vis, d_vis),
        "image_encoder.transformer.resblocks.0.attn.in_proj_bias": torch.randn(3 * d_vis),
        "image_encoder.transformer.resblocks.0.attn.out_proj.weight": torch.randn(d_vis, d_vis),
        "image_encoder.transformer.resblocks.0.attn.out_proj.bias": torch.randn(d_vis),
        "image_encoder.transformer.resblocks.0.ln_2.weight": torch.randn(d_vis),
        "image_encoder.transformer.resblocks.0.ln_2.bias": torch.randn(d_vis),
        "image_encoder.transformer.resblocks.0.mlp.c_fc.weight": torch.randn(4 * d_vis, d_vis),
        "image_encoder.transformer.resblocks.0.mlp.c_fc.bias": torch.randn(4 * d_vis),
        "image_encoder.transformer.resblocks.0.mlp.c_proj.weight": torch.randn(d_vis, 4 * d_vis),
        "image_encoder.transformer.resblocks.0.mlp.c_proj.bias": torch.randn(d_vis),
        "text_encoder.ln_final.weight": torch.randn(d_text),
        "text_encoder.ln_final.bias": torch.randn(d_text),
        "logit_scale": torch.tensor(1.0),
        "clip_model2.token_embedding.weight": torch.randn(10, d_text),
        "tokenized_prompts": torch.zeros(3, 77),
    }
    out = convert_maple(sd)

    assert "prompt_learner.ctx" in out
    assert "prompt_learner.token_prefix" not in out
    assert "clip_model2.token_embedding.weight" not in str(out.keys())
    # linear transposed to input-major
    assert out["prompt_learner.proj_lang_to_vis.w"].shape == (d_text, d_vis)
    np.testing.assert_allclose(
        out["prompt_learner.proj_lang_to_vis.w"],
        sd["prompt_learner.proj_lang_to_vis.weight"].numpy().T,
    )
    assert out["prompt_learner.text_deep_params.1"].shape == (n_ctx, d_text)
    assert out["prompt_learner.couplers.1.w"].shape == (d_vis, d_text)
    # encoder names
    assert out["clip.visual.blocks.0.attn.w_qkv"].shape == (d_vis, 3 * d_vis)
    assert out["clip.visual.ln_pre.scale"].shape == (d_vis,)
    assert out["clip.text.ln_final.scale"].shape == (d_text,)
    # conv reshaped to the matmul kernel
    assert out["clip.visual.conv1.w"].shape == (2 * 2 * 3, d_vis)


def test_converted_maple_loads_into_trainer_tree(tmp_path):
    """Round-trip: reference-shaped MaPLe tensors land in our trainable."""
    import jax
    import jax.numpy as jnp

    import federated_multi_modal_tpu.trainers  # noqa: F401
    from federated_multi_modal_tpu.config import get_cfg_default
    from federated_multi_modal_tpu.engine import build_trainer

    cfg = get_cfg_default()
    cfg.DATASET.ROOT = str(tmp_path)
    cfg.DATASET.NAME = "Synthetic"
    cfg.MODEL.BACKBONE.NAME = "Tiny"
    cfg.INPUT.SIZE = (32, 32)
    cfg.INPUT.CANVAS_SIZE = 40
    cfg.TRAINER.NAME = "MaPLe"
    cfg.TRAINER.MAPLE.PROMPT_DEPTH = 3
    cfg.OUTPUT_DIR = str(tmp_path / "out")
    cfg.SEED = 1
    cfg.VERBOSE = False
    trainer = build_trainer(cfg)

    d_text = trainer.arch.transformer_width
    ctx = torch.full((2, d_text), 0.25)
    sd = {"prompt_learner.ctx": ctx}
    flat = convert_maple(sd)
    trainer._set_state(flat)
    np.testing.assert_allclose(
        np.asarray(trainer.trainable["prompt_learner"]["ctx"]), 0.25
    )


def test_convert_coop_and_cocoop():
    sd = {
        "ctx": torch.randn(4, 8),
        "token_prefix": torch.randn(3, 1, 8),
        "token_suffix": torch.randn(3, 72, 8),
        "meta_net.linear1.weight": torch.randn(2, 16),
        "meta_net.linear1.bias": torch.randn(2),
        "meta_net.linear2.weight": torch.randn(8, 2),
        "meta_net.linear2.bias": torch.randn(8),
    }
    out = convert_prompt_learner_only(sd, "CoCoOp")
    assert set(out) == {
        "prompt_learner.ctx",
        "prompt_learner.meta_net.linear1.w",
        "prompt_learner.meta_net.linear1.b",
        "prompt_learner.meta_net.linear2.w",
        "prompt_learner.meta_net.linear2.b",
    }
    assert out["prompt_learner.meta_net.linear1.w"].shape == (16, 2)
