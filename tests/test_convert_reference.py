"""Reference-checkpoint converter: synthetic torch-named state dicts map
into names our MaPLe/CoOp trainable trees accept, and the REVERSE export
produces state dicts the executed reference loads via its own contract."""

import sys

import numpy as np
import torch

sys.path.insert(0, "tools")

from convert_reference_checkpoint import (  # noqa: E402
    convert_maple,
    convert_prompt_learner_only,
    export_maple,
    export_prompt_learner_only,
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


def test_export_maple_is_exact_inverse(tmp_path):
    """convert_maple(export_maple(flat)) == flat bit-for-bit on a REAL
    trainer state dict (every name family our MaPLe trainable produces,
    incl. the class-conditioned buffers the forward map drops)."""
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
    flat = trainer._get_state()["state_dict"]

    skipped = []
    exported = export_maple(flat, skipped=skipped)
    back = convert_maple(
        {k: torch.from_numpy(np.ascontiguousarray(v))
         for k, v in exported.items()}
    )
    # forward map drops the class-conditioned buffers by contract; the
    # caption branch has no reference counterpart (per-forward-random in
    # the reference) and is reported as skipped
    assert skipped == [k for k in flat if "caption" in k] != []
    expect = {k: v for k, v in flat.items()
              if not k.endswith(("token_prefix", "token_suffix"))
              and "caption" not in k}
    assert set(back) == set(expect)
    for k in expect:
        np.testing.assert_array_equal(back[k], expect[k], err_msg=k)


def test_reverse_export_loads_into_executed_reference(tmp_path):
    """Ours -> torch golden (round-3 verdict task 6): train the REAL MaPLe
    trainer a few steps on the converted reference weights, export via
    ``export_maple``, load into the EXECUTED reference ``CustomCLIP``
    through its own load contract (prefix/suffix drop +
    ``load_state_dict(strict=False)``, ``/root/reference/trainers/maple.py:
    683-716``), and the two models must produce identical logits — the
    parity pillar runnable in BOTH directions the day real weights exist."""
    import copy

    import jax
    import jax.numpy as jnp

    from reference_harness import fp32_reference, load_reference
    from test_reference_golden import CLASSNAMES, build_maple_pair
    from test_reference_golden_training import _build_our_trainer

    ref_mod = load_reference()
    cc, arch, params, pl, const = build_maple_pair(ref_mod, CLASSNAMES)
    trainer = _build_our_trainer(tmp_path, arch, params, pl,
                                 ref_mod.bpe_path)

    rng = np.random.default_rng(23)
    for _ in range(3):
        trainer.train_step({
            "image": jnp.asarray(
                rng.standard_normal((4, 64, 64, 3)).astype(np.float32) * 0.5
            ),
            "label": jnp.asarray(
                rng.integers(0, len(CLASSNAMES), 4).astype(np.int32)
            ),
        })

    flat = trainer._get_state()["state_dict"]
    # training moved the prompt learner (the comparison is non-vacuous)
    assert not np.allclose(flat["prompt_learner.ctx"], np.asarray(pl["ctx"]))

    sd_torch = {
        k: torch.from_numpy(np.ascontiguousarray(v))
        for k, v in export_maple(flat).items()
    }
    # the reference's own load contract
    del sd_torch["prompt_learner.token_prefix"]
    del sd_torch["prompt_learner.token_suffix"]
    cc2 = copy.deepcopy(cc)
    with fp32_reference():
        res = cc2.load_state_dict(sd_torch, strict=False)
    # every exported tensor landed on a reference module name
    assert res.unexpected_keys == [], res.unexpected_keys
    # missing = frozen leaves our trainable never carries + the dropped
    # class-conditioned buffers; no trained prompt tensor may be missing
    missing_pl = [k for k in res.missing_keys
                  if k.startswith("prompt_learner.")]
    assert set(missing_pl) <= {
        "prompt_learner.token_prefix", "prompt_learner.token_suffix",
    }, missing_pl

    imgs = rng.standard_normal((3, 64, 64, 3)).astype(np.float32)
    cc2.eval()
    with fp32_reference(), torch.no_grad():
        logits_ref = cc2(torch.from_numpy(imgs).permute(0, 3, 1, 2)).numpy()
    logits_ours = np.asarray(
        jax.device_get(trainer.model_inference(jnp.asarray(imgs)))
    )
    np.testing.assert_allclose(logits_ours, logits_ref, atol=5e-4,
                               rtol=5e-4)


def test_reverse_export_cli(tmp_path):
    """The ``--reverse`` CLI surface: our pickle checkpoint in, a
    torch-loadable reference checkpoint out, caption-branch tensors
    reported as skipped."""
    import os
    import pickle
    import subprocess

    d_text, d_vis, n_ctx = 8, 12, 2
    rng = np.random.default_rng(0)
    flat = {
        "prompt_learner.ctx": rng.standard_normal((n_ctx, d_text)).astype(
            np.float32),
        "prompt_learner.proj_lang_to_vis.w": rng.standard_normal(
            (d_text, d_vis)).astype(np.float32),
        "prompt_learner.proj_lang_to_vis.b": rng.standard_normal(
            d_vis).astype(np.float32),
        "prompt_learner.caption_pool_w": rng.standard_normal(
            d_text).astype(np.float32),
        "clip.visual.blocks.0.ln_1.scale": rng.standard_normal(
            d_vis).astype(np.float32),
        "clip.text.ln_final.scale": rng.standard_normal(d_text).astype(
            np.float32),
    }
    src = tmp_path / "model.pth.tar-2"
    with open(src, "wb") as f:
        pickle.dump({"epoch": 2, "state_dict": flat, "optimizer": None,
                     "scheduler": None, "val_result": None}, f)
    dst = tmp_path / "ref" / "model.pth.tar-2"
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out = subprocess.run(
        [sys.executable,
         os.path.join(repo, "tools", "convert_reference_checkpoint.py"),
         "--reverse", "--trainer", "MaPLe", str(src), str(dst)],
        capture_output=True, text=True, cwd=repo, timeout=300,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert "caption_pool_w" in out.stdout  # skipped + reported
    ckpt = torch.load(str(dst), map_location="cpu", weights_only=False)
    sd = ckpt["state_dict"]
    assert ckpt["epoch"] == 2
    assert sd["prompt_learner.proj_lang_to_vis.weight"].shape == (
        d_vis, d_text)  # transposed back to torch convention
    assert "image_encoder.transformer.resblocks.0.ln_1.weight" in sd
    assert "text_encoder.ln_final.weight" in sd
    assert not any("caption" in k for k in sd)


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

    # reverse is the exact inverse on the kept tensors (prefix/suffix are
    # dropped by the forward map, so the round trip covers the rest)
    back = export_prompt_learner_only(out, "CoCoOp")
    for k in ("ctx", "meta_net.linear1.weight", "meta_net.linear2.bias"):
        np.testing.assert_array_equal(back[k], sd[k].numpy(), err_msg=k)

    # VPT keys refuse reverse export (encounter-order lossy forward map)
    import pytest

    with pytest.raises(KeyError, match="lossy"):
        export_prompt_learner_only({"vpt.shallow": np.zeros((2, 4))}, "VPT")


def test_reverse_export_coop_loads_into_executed_reference():
    """Ours -> torch for the prompt-learner-only families: a CoOp ctx
    trained HERE lands back in the EXECUTED reference ``PromptLearner``
    through its own load contract (prefix/suffix drop +
    ``load_state_dict(strict=False)``, the Dassl ``load_model`` path the
    reference trainers share), and a CoCoOp meta_net round-trips with the
    transpose convention intact."""
    from reference_harness import (
        fp32_reference,
        load_reference,
        our_tokenizer_with,
    )
    from test_reference_golden import CLASSNAMES
    from test_reference_golden_more import _coop_cfg, _tiny_clip

    ref_mod = load_reference()
    design = {"trainer": "CoOp", "vision_depth": 0, "language_depth": 0,
              "vision_ctx": 0, "language_ctx": 0}
    model, _, arch, params = _tiny_clip(ref_mod, design, seed=11)
    with fp32_reference(), our_tokenizer_with(ref_mod.bpe_path):
        torch.manual_seed(23)
        pl = ref_mod.coop.PromptLearner(_coop_cfg(4), CLASSNAMES, model)

        # simulate training here: perturb the converted ctx, export back
        flat = convert_prompt_learner_only(
            {k: v.detach().clone() for k, v in pl.state_dict().items()},
            "CoOp")
        trained = flat["prompt_learner.ctx"] + 0.125
        flat["prompt_learner.ctx"] = trained

        sd = {k: torch.from_numpy(np.array(v, copy=True))
              for k, v in export_prompt_learner_only(flat, "CoOp").items()}
        # reference load contract (coop.py load_model): drop the
        # class-conditioned buffers, non-strict load (the forward
        # converter already dropped them from `flat`; a checkpoint saved
        # by OUR trainers would carry them, so pop defensively)
        sd.pop("token_prefix", None)
        sd.pop("token_suffix", None)
        torch.manual_seed(99)  # different init: the load must overwrite it
        pl2 = ref_mod.coop.PromptLearner(_coop_cfg(4), CLASSNAMES, model)
        res = pl2.load_state_dict(sd, strict=False)
        assert res.unexpected_keys == [], res.unexpected_keys
        np.testing.assert_allclose(pl2.ctx.detach().numpy(), trained,
                                   atol=0)
        # the loaded learner assembles prompts with OUR trained ctx
        # (shared ctx broadcast to every class row, position "end")
        prompts = pl2().detach().numpy()
        np.testing.assert_allclose(
            prompts[:, 1:5, :],
            np.broadcast_to(trained, prompts[:, 1:5, :].shape),
            atol=1e-6)
