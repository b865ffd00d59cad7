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
