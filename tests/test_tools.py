"""Offline tooling smoke tests (SURVEY §2.1 tool rows): caption generator,
linear-probe pipeline, prompt interpreter, parse-free feature extraction."""

import importlib.util
import os
import sys
from types import SimpleNamespace

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load(name, relpath):
    spec = importlib.util.spec_from_file_location(
        name, os.path.join(REPO, relpath)
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_captiongen_placeholder(tmp_path):
    """Placeholder mode writes one .txt per image with the classname
    template (reference captiongen.py writes a parallel captions/ tree)."""
    captiongen = _load("captiongen_tool", "tools/captiongen.py")
    src = tmp_path / "images"
    for cls in ["golf_course", "runway"]:
        d = src / cls
        d.mkdir(parents=True)
        for i in range(2):
            (d / f"img{i}.jpg").write_bytes(b"\xff\xd8fake")
    out = tmp_path / "captions"
    captiongen.generate_placeholder(str(src), str(out))
    txt = (out / "golf_course" / "img0.txt").read_text()
    assert txt == "a photo of a golf course"
    assert sorted(os.listdir(out / "runway")) == ["img0.txt", "img1.txt"]


def test_linear_probe_binary_search():
    """run_probe converges to high accuracy on separable blobs (the CLIP
    App. A3 protocol rebuilt in tools/lpclip/linear_probe.py)."""
    lp = _load("linear_probe_tool", "tools/lpclip/linear_probe.py")
    rng = np.random.default_rng(0)
    n_cls, d = 4, 16
    centers = rng.normal(size=(n_cls, d)) * 5.0

    def blob(n_per):
        X = np.concatenate(
            [centers[c] + rng.normal(size=(n_per, d)) for c in range(n_cls)]
        )
        y = np.repeat(np.arange(n_cls), n_per)
        return X, y

    train, val, test = blob(20), blob(8), blob(10)
    accs = lp.run_probe(train, val, test, num_shot=8, num_step=3, seed=1)
    assert len(accs) == 3
    assert accs[-1] > 0.9


def test_interpret_nearest_words():
    itool = _load("interpret_tool", "tools/interpret_prompts.py")
    emb = np.eye(8, 4, dtype=np.float32) * 3.0
    tok = SimpleNamespace(decoder={i: f"word{i}" for i in range(8)})
    out = itool.nearest_words(emb[2:3], emb, tok, topk=2)
    assert out[0][0][0] == "word2"
    assert out[0][0][1] == 0.0


def test_feat_extractor_end_to_end(tmp_path):
    """feat_extractor writes {split}.npz with feature/label lists for a
    catalog dataset (reference lpclip/feat_extractor.py:105-167)."""
    cfg_file = tmp_path / "tiny.yaml"
    cfg_file.write_text(
        "MODEL:\n  BACKBONE:\n    NAME: 'Tiny'\n"
        "INPUT:\n  SIZE: [32, 32]\n  CANVAS_SIZE: 40\n"
        "DATALOADER:\n  TRAIN_X:\n    BATCH_SIZE: 8\n"
    )
    ds_file = tmp_path / "ds.yaml"
    ds_file.write_text("DATASET:\n  NAME: 'Synthetic'\n")

    fe = _load("feat_extractor_tool", "tools/lpclip/feat_extractor.py")
    args = SimpleNamespace(
        root=str(tmp_path / "data"),
        output_dir=str(tmp_path / "out"),
        config_file=str(cfg_file),
        dataset_config_file=str(ds_file),
        backbone="",
        split="test",
        num_shots=-1,
        seed=1,
    )
    fe.main(args)

    f = np.load(tmp_path / "out" / "Synthetic" / "test.npz")
    feats, labels = f["feature_list"], f["label_list"]
    assert feats.ndim == 2 and feats.shape[0] == labels.shape[0]
    assert feats.shape[0] > 0


def test_parse_test_res_base2new(tmp_path):
    """--base2new aggregates base/new seed logs and prints the harmonic
    mean (the reference's headline base-to-novel metric)."""
    import subprocess

    for sub, acc in [("base", "80.00"), ("new", "70.00")]:
        d = tmp_path / sub / "seed1"
        d.mkdir(parents=True)
        (d / "log.txt").write_text(
            f"Finished training\n=> result\n* accuracy: {acc}%\n"
        )
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "parse_test_res.py"),
         str(tmp_path), "--base2new"],
        capture_output=True, text=True, cwd=REPO,
    )
    assert out.returncode == 0, out.stderr
    assert "* H: 74.67%" in out.stdout
    assert "* base: 80.00%" in out.stdout


def test_clip_api_load_surface(tmp_path):
    """clip_api: available_models parity with the reference table, local
    torch checkpoint conversion, and the air-gapped random fallback."""
    import torch

    from federated_multi_modal_tpu import clip_api

    assert set(clip_api.available_models()) == {
        "RN50", "RN101", "RN50x4", "RN50x16", "ViT-B/32", "ViT-B/16",
        "ViT-L/14",
    }

    # fabricate a tiny OpenAI-format ViT checkpoint (visual.* / text keys)
    w, d, layers, vocab, ctx_len = 128, 64, 2, 100, 16
    patch, grid = 16, 2

    def block(prefix, width):
        return {
            f"{prefix}.ln_1.weight": torch.randn(width),
            f"{prefix}.ln_1.bias": torch.randn(width),
            f"{prefix}.attn.in_proj_weight": torch.randn(3 * width, width),
            f"{prefix}.attn.in_proj_bias": torch.randn(3 * width),
            f"{prefix}.attn.out_proj.weight": torch.randn(width, width),
            f"{prefix}.attn.out_proj.bias": torch.randn(width),
            f"{prefix}.ln_2.weight": torch.randn(width),
            f"{prefix}.ln_2.bias": torch.randn(width),
            f"{prefix}.mlp.c_fc.weight": torch.randn(4 * width, width),
            f"{prefix}.mlp.c_fc.bias": torch.randn(4 * width),
            f"{prefix}.mlp.c_proj.weight": torch.randn(width, 4 * width),
            f"{prefix}.mlp.c_proj.bias": torch.randn(width),
        }

    sd = {
        "visual.proj": torch.randn(w, d),
        "visual.conv1.weight": torch.randn(w, 3, patch, patch),
        "visual.class_embedding": torch.randn(w),
        "visual.positional_embedding": torch.randn(grid * grid + 1, w),
        "visual.ln_pre.weight": torch.randn(w),
        "visual.ln_pre.bias": torch.randn(w),
        "visual.ln_post.weight": torch.randn(w),
        "visual.ln_post.bias": torch.randn(w),
        "text_projection": torch.randn(w, d),
        "positional_embedding": torch.randn(ctx_len, w),
        "token_embedding.weight": torch.randn(vocab, w),
        "ln_final.weight": torch.randn(w),
        "ln_final.bias": torch.randn(w),
        "logit_scale": torch.tensor(2.0),
    }
    for i in range(layers):
        sd.update(block(f"visual.transformer.resblocks.{i}", w))
        sd.update(block(f"transformer.resblocks.{i}", w))

    path = tmp_path / "tiny.pt"
    torch.save(sd, str(path))
    arch, params = clip_api.load(str(path))
    assert arch.vision_width == w and arch.vision_patch_size == patch
    assert arch.image_resolution == patch * grid
    assert arch.transformer_layers == layers and arch.vocab_size == vocab
    # torch linear weights are (out, in); converted JAX weights input-major
    np.testing.assert_allclose(
        np.asarray(params["visual"]["blocks"][0]["attn"]["w_qkv"],
                   np.float32),
        sd["visual.transformer.resblocks.0.attn.in_proj_weight"].numpy().T,
        atol=2e-2,  # bf16 dtype policy quantization
    )

    # air-gapped fallback: known name, no cache/egress -> random init
    arch2, p2 = clip_api.load("ViT-B/16", download_root=str(tmp_path))
    assert arch2.vision_patch_size == 16
    assert p2["text"]["token_embedding"].shape[0] == 49408


@pytest.mark.slow
def test_run_parity_smoke(tmp_path):
    """The one-command HM-parity runbook (round-4 verdict task 4) in its
    skip-tolerant smoke mode: fallback vocabulary + random weights drive
    the WHOLE stage graph (tokenizer -> weights -> zero-shot eval ->
    base2new scripts -> HM parse) so the orchestration is proven today and
    the environment-blocked pillar becomes one command the day the real
    weights + BPE table appear."""
    import subprocess

    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "run_parity.py"),
         "--smoke", "--root", str(tmp_path / "data"),
         "--output-dir", str(tmp_path / "out")],
        capture_output=True, text=True, timeout=1500,
    )
    assert out.returncode == 0, (out.stdout[-2000:], out.stderr[-2000:])
    assert "PARITY RUNBOOK: ok" in out.stdout
    # the environment-blocked stages SKIP (never fake a parity claim)
    assert "[SKIP] tokenizer" in out.stdout
    assert "[SKIP] weights" in out.stdout
    # the runnable stages actually ran
    assert "[PASS] zeroshot:synthetic" in out.stdout
    assert "[PASS] base2new:synthetic" in out.stdout
    assert "[PASS] hm-parse:synthetic" in out.stdout
