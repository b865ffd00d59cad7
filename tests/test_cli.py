"""train.py CLI surface: config merge order, flag mapping, INIT_WEIGHTS."""

import sys
from types import SimpleNamespace

import numpy as np
import pytest

sys.path.insert(0, ".")  # repo root for train.py

import train as train_cli  # noqa: E402


def _args(**kw):
    base = dict(
        root="", output_dir="", resume="", seed=0, source_domains=None,
        target_domains=None, transforms=None, trainer="", backbone="",
        head="", eval_only=False, model_dir="", load_epoch=None,
        no_train=False, opts=[], config_file="", dataset_config_file="",
    )
    base.update(kw)
    return SimpleNamespace(**base)


def test_setup_cfg_merge_order(tmp_path):
    ds = tmp_path / "ds.yaml"
    ds.write_text("DATASET:\n  NAME: 'EuroSAT'\nOPTIM:\n  LR: 0.1\n")
    tr = tmp_path / "tr.yaml"
    tr.write_text("OPTIM:\n  LR: 0.2\n  MAX_EPOCH: 7\n")

    args = _args(
        dataset_config_file=str(ds),
        config_file=str(tr),
        trainer="MaPLe",
        root="/data",
        seed=3,
        opts=["OPTIM.LR", "0.3"],
    )
    cfg = train_cli.setup_cfg(args)
    # trainer yaml overrides dataset yaml; opts override both
    assert cfg.OPTIM.LR == 0.3
    assert cfg.OPTIM.MAX_EPOCH == 7
    assert cfg.DATASET.NAME == "EuroSAT"
    assert cfg.TRAINER.NAME == "MaPLe"
    assert cfg.DATASET.ROOT == "/data"
    assert cfg.SEED == 3
    assert cfg.is_frozen()


def test_setup_cfg_backbone_flag():
    cfg = train_cli.setup_cfg(_args(backbone="RN50"))
    assert cfg.MODEL.BACKBONE.NAME == "RN50"


def test_init_weights_loading(tmp_path):
    """MODEL.INIT_WEIGHTS loads a checkpoint into a fresh trainer."""
    import federated_multi_modal_tpu.trainers  # noqa: F401
    from federated_multi_modal_tpu.config import get_cfg_default
    from federated_multi_modal_tpu.engine import build_trainer
    from federated_multi_modal_tpu.engine.checkpoint import save_checkpoint

    def make(init_weights=""):
        cfg = get_cfg_default()
        cfg.DATASET.ROOT = str(tmp_path / "data")
        cfg.DATASET.NAME = "Synthetic"
        cfg.MODEL.BACKBONE.NAME = "Tiny"
        cfg.MODEL.INIT_WEIGHTS = init_weights
        cfg.INPUT.SIZE = (32, 32)
        cfg.INPUT.CANVAS_SIZE = 40
        cfg.TRAINER.NAME = "CoOp"
        cfg.TRAINER.COOP.N_CTX = 4
        cfg.OUTPUT_DIR = str(tmp_path / "out")
        cfg.SEED = 1
        cfg.VERBOSE = False
        return build_trainer(cfg)

    t1 = make()
    ctx = np.full_like(np.asarray(t1.trainable["prompt_learner"]["ctx"]), 0.5)
    ckpt_dir = tmp_path / "init"
    save_checkpoint(
        {"epoch": 1, "state_dict": {"prompt_learner.ctx": ctx}},
        str(ckpt_dir),
    )
    t2 = make(init_weights=str(ckpt_dir / "model.pth.tar-1"))
    np.testing.assert_allclose(
        np.asarray(t2.trainable["prompt_learner"]["ctx"]), 0.5
    )


def test_base2new_scripts_end_to_end(tmp_path):
    """L6 script-level integration (round-3 verdict task 5): run the REAL
    ``scripts/maple/base2new_train_maple.sh`` + ``base2new_test_maple.sh``
    (Tiny backbone, Synthetic, 1 epoch), then ``parse_test_res.py
    --base2new`` over the produced output tree.  Pins the base2new dir
    layout (``/root/reference/scripts/maple/base2new_train_maple.sh:16-38``)
    and the prefix/suffix class-transfer contract
    (``trainers/maple.py:683-716``) through the actual CLI."""
    import os
    import re
    import subprocess

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    cfg_name = "vit_b16_c2_ep5_batch4_2ctx"
    env = dict(os.environ)
    env.update(
        DATA=str(tmp_path / "data"),
        OUTROOT=str(tmp_path / "output"),
        CFG=cfg_name,
        SHOTS="2",
        LOADEP="1",
        FMM_TPU_PLATFORM="cpu",
    )
    overrides = [
        "MODEL.BACKBONE.NAME", "Tiny",
        "INPUT.SIZE", "(32, 32)",
        "INPUT.CANVAS_SIZE", "40",
        "TRAINER.MAPLE.PROMPT_DEPTH", "3",
        "TRAINER.MAPLE.PREC", "fp32",
        "OPTIM.MAX_EPOCH", "1",
        "DATALOADER.TEST.BATCH_SIZE", "8",
        "TPU.DATA_PARALLEL", "False",
        "VERBOSE", "False",
    ]
    for script in ("base2new_train_maple.sh", "base2new_test_maple.sh"):
        out = subprocess.run(
            ["bash", os.path.join(repo, "scripts", "maple", script),
             "synthetic", "1"] + overrides,
            capture_output=True, text=True, env=env, cwd=repo, timeout=900,
        )
        assert out.returncode == 0, (
            script, out.stdout[-2000:], out.stderr[-2000:]
        )

    common = os.path.join(str(tmp_path / "output"), "base2new")
    base_dir = os.path.join(
        common, "train_base", "synthetic", "shots_2", "MaPLe", cfg_name)
    new_dir = os.path.join(
        common, "test_new", "synthetic", "shots_2", "MaPLe", cfg_name)
    assert os.path.isfile(os.path.join(base_dir, "seed1", "log.txt"))
    assert os.path.isfile(os.path.join(new_dir, "seed1", "log.txt"))
    # checkpoint under the registered model name, reference pth.tar naming
    assert os.path.isfile(os.path.join(
        base_dir, "seed1", "MultiModalPromptLearner", "model.pth.tar-1"))

    agg = tmp_path / "agg"
    agg.mkdir()
    os.symlink(base_dir, agg / "base")
    os.symlink(new_dir, agg / "new")
    out = subprocess.run(
        [sys.executable, os.path.join(repo, "tools", "parse_test_res.py"),
         str(agg), "--base2new", "--test-log"],
        capture_output=True, text=True, cwd=repo, timeout=120,
    )
    assert out.returncode == 0, out.stderr
    hm = re.search(r"\* H: ([\d.]+)%", out.stdout)
    assert hm, out.stdout
    assert float(hm.group(1)) >= 0.0


def test_federated_cli_end_to_end(tmp_path):
    """The FLAGSHIP federated path through the real CLI: train.py with
    --trainer MaPLeFederated (Tiny, Synthetic, 2 rounds) must emit the
    round summaries, the ``Finished training`` end signal and the
    ``* accuracy:`` log contract, write the aggregator checkpoint under
    ``MultiModalPromptLearner_Aggregator/model.pth.tar-{MAX_EPOCH}``, and
    the checkpoint must round-trip through ``--model-dir <out>
    --eval-only`` (reference contract:
    ``/root/reference/trainers/maple_fed.py:388-411``,
    ``scripts/maple/xd_train_maple.sh:22-30``)."""
    import os
    import re
    import subprocess

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ)
    env["FMM_TPU_PLATFORM"] = "cpu"
    out_dir = str(tmp_path / "out")
    common = [
        sys.executable, os.path.join(repo, "train.py"),
        "--root", str(tmp_path / "data"),
        "--seed", "2",
        "--trainer", "MaPLeFederated",
        "--dataset-config-file", "configs/datasets/synthetic.yaml",
        "--config-file",
        "configs/trainers/MaPLeFederated/"
        "vit_b16_c2_ep5_batch4_2ctx_cross_datasets.yaml",
        "--output-dir", out_dir,
    ]
    overrides = [
        "MODEL.BACKBONE.NAME", "Tiny",
        "INPUT.SIZE", "(32, 32)",
        "INPUT.CANVAS_SIZE", "40",
        "TRAINER.MAPLE.PROMPT_DEPTH", "3",
        "TRAINER.MAPLE.PREC", "fp32",
        "FED.NUM_ROUNDS", "2",
        "FED.LOCAL_EPOCHS", "1",
        "FED.DATASETS", "('Synthetic', 'Synthetic')",
        "FED.CLASSNAME_ONLY_DATASETS", "()",
        "DATALOADER.TEST.BATCH_SIZE", "16",
        "TPU.DATA_PARALLEL", "False",
        "VERBOSE", "False",
    ]
    run = subprocess.run(common + overrides, capture_output=True, text=True,
                         env=env, cwd=repo, timeout=900)
    assert run.returncode == 0, (run.stdout[-2000:], run.stderr[-2000:])
    # round-loop log contract
    for rnd in (1, 2):
        assert f"--- Federated Round {rnd}/2 ---" in run.stdout
        assert re.search(
            rf"\[Round {rnd}\] Test accuracy \(client 0\) = [\d.]+%",
            run.stdout), run.stdout[-2000:]
    assert "Training Summary:" in run.stdout
    assert "Finished training" in run.stdout
    assert re.search(r"\* accuracy: \d+\.\d\d%", run.stdout), \
        run.stdout[-800:]
    ckpt = os.path.join(
        out_dir, "MultiModalPromptLearner_Aggregator", "model.pth.tar-2")
    assert os.path.isfile(ckpt), os.listdir(out_dir)
    # the tee'd log file carries the same contract for parse_test_res
    with open(os.path.join(out_dir, "log.txt")) as f:
        log = f.read()
    assert "Finished training" in log and "* accuracy:" in log

    # eval-only reload of the aggregator checkpoint
    eval_dir = str(tmp_path / "eval")
    run2 = subprocess.run(
        common[:-1] + [eval_dir, "--model-dir", out_dir, "--eval-only"]
        + overrides,
        capture_output=True, text=True, env=env, cwd=repo, timeout=900)
    assert run2.returncode == 0, (run2.stdout[-2000:], run2.stderr[-2000:])
    assert re.search(r"Loaded aggregator weights from '.*model\.pth\.tar-2'",
                     run2.stdout), run2.stdout[-2000:]
    assert "Broadcasted loaded global weights." in run2.stdout
    assert re.search(r"\* accuracy: \d+\.\d\d%", run2.stdout), \
        run2.stdout[-800:]


@pytest.mark.parametrize("trainer,cfgfile,model_dirname,extra", [
    ("CoOp", "CoOp/vit_b16.yaml", "prompt_learner", []),
    ("CoCoOp", "CoCoOp/vit_b16_c4_ep10_batch1.yaml", "prompt_learner",
     ["DATALOADER.TRAIN_X.BATCH_SIZE", "2"]),
    ("VPT", "VPT/vit_b16_c2_ep5_batch4_4.yaml", "prompt_learner",
     ["TRAINER.VPT.PROMPT_DEPTH_VISION", "2"]),
    ("IVLP", "IVLP/vit_b16_c2_ep5_batch4_2+2ctx.yaml", "VLPromptLearner",
     ["TRAINER.IVLP.PROMPT_DEPTH_TEXT", "2",
      "TRAINER.IVLP.PROMPT_DEPTH_VISION", "2"]),
])
def test_single_site_trainer_cli_end_to_end(tmp_path, trainer, cfgfile,
                                            model_dirname, extra):
    """Train -> checkpoint -> eval-only reload through the REAL CLI for
    every single-site trainer family (the flagship MaPLe path has its own
    script-level test above).  Pins registry wiring, the per-trainer
    config namespace, the ``model.pth.tar-{epoch}`` checkpoint contract
    and the ``--model-dir`` reload path (reference ``train.py`` arg
    surface; Dassl ``load_model``)."""
    import os
    import re
    import subprocess

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ)
    env["FMM_TPU_PLATFORM"] = "cpu"
    out_dir = str(tmp_path / "out")
    common = [
        sys.executable, os.path.join(repo, "train.py"),
        "--root", str(tmp_path / "data"),
        "--seed", "1",
        "--trainer", trainer,
        "--dataset-config-file", "configs/datasets/synthetic.yaml",
        "--config-file", os.path.join("configs/trainers", cfgfile),
        "--output-dir", out_dir,
    ]
    overrides = [
        "MODEL.BACKBONE.NAME", "Tiny",
        "INPUT.SIZE", "(32, 32)",
        "INPUT.CANVAS_SIZE", "40",
        "OPTIM.MAX_EPOCH", "1",
        f"TRAINER.{trainer.upper()}.PREC", "fp32",
        "DATALOADER.TEST.BATCH_SIZE", "8",
        "TPU.DATA_PARALLEL", "False",
        "VERBOSE", "False",
    ] + extra
    run = subprocess.run(common + overrides, capture_output=True, text=True,
                         env=env, cwd=repo, timeout=900)
    assert run.returncode == 0, (run.stdout[-2000:], run.stderr[-2000:])
    assert "Finished training" in run.stdout
    assert re.search(r"\* accuracy: \d+\.\d\d%", run.stdout), run.stdout[-800:]
    ckpt = os.path.join(out_dir, model_dirname, "model.pth.tar-1")
    assert os.path.isfile(ckpt), os.listdir(out_dir)

    eval_dir = str(tmp_path / "eval")
    run2 = subprocess.run(
        common[:-1] + [eval_dir, "--model-dir", out_dir, "--load-epoch", "1",
                       "--eval-only"] + overrides,
        capture_output=True, text=True, env=env, cwd=repo, timeout=900)
    assert run2.returncode == 0, (run2.stdout[-2000:], run2.stderr[-2000:])
    assert re.search(r"\* accuracy: \d+\.\d\d%", run2.stdout), \
        run2.stdout[-800:]
