import pytest

from federated_multi_modal_tpu.config import CfgNode, get_cfg_default


def test_defaults_have_reference_fields():
    cfg = get_cfg_default()
    # trainer extensions from reference train.py:96-138
    assert cfg.TRAINER.MAPLE.N_CTX == 2
    assert cfg.TRAINER.MAPLE.PROMPT_DEPTH == 9
    assert cfg.TRAINER.COOP.N_CTX == 16
    assert cfg.TRAINER.IVLP.PROMPT_DEPTH_VISION == 9
    assert cfg.FED.NUM_CLIENTS == 2
    assert cfg.FED.NUM_ROUNDS == 30
    assert cfg.FED.LOCAL_EPOCHS == 10
    assert cfg.DATASET.SUBSAMPLE_CLASSES == "all"


def test_merge_from_list_and_freeze():
    cfg = get_cfg_default()
    cfg.merge_from_list(["OPTIM.LR", "0.0035", "DATASET.SUBSAMPLE_CLASSES", "base"])
    assert cfg.OPTIM.LR == 0.0035
    assert cfg.DATASET.SUBSAMPLE_CLASSES == "base"
    cfg.freeze()
    with pytest.raises(AttributeError):
        cfg.OPTIM.LR = 1.0
    cfg.defrost()
    cfg.OPTIM.LR = 1.0


def test_merge_from_list_rejects_unknown_key():
    cfg = get_cfg_default()
    with pytest.raises(KeyError):
        cfg.merge_from_list(["NOPE.NOT_A_KEY", "1"])


def test_clone_is_deep_and_unfrozen():
    cfg = get_cfg_default()
    cfg.freeze()
    c2 = cfg.clone()
    c2.OPTIM.LR = 123.0
    assert cfg.OPTIM.LR != 123.0
    assert cfg.is_frozen()


def test_merge_from_file(tmp_path):
    yaml_text = """
OPTIM:
  NAME: "sgd"
  LR: 0.0026
  MAX_EPOCH: 2
  WARMUP_CONS_LR: 1e-4
INPUT:
  SIZE: (224, 224)
DATALOADER:
  TRAIN_X:
    BATCH_SIZE: 4
"""
    f = tmp_path / "cfg.yaml"
    f.write_text(yaml_text)
    cfg = get_cfg_default()
    cfg.merge_from_file(str(f))
    assert cfg.OPTIM.LR == 0.0026
    assert cfg.OPTIM.MAX_EPOCH == 2
    assert cfg.OPTIM.WARMUP_CONS_LR == 1e-4
    assert cfg.INPUT.SIZE == (224, 224)
    assert cfg.DATALOADER.TRAIN_X.BATCH_SIZE == 4


def test_dump_roundtrip():
    import yaml

    cfg = get_cfg_default()
    loaded = yaml.safe_load(cfg.dump())
    assert loaded["FED"]["NUM_CLIENTS"] == 2


def test_pickle_roundtrip():
    import pickle

    cfg = get_cfg_default()
    cfg.freeze()
    cfg2 = pickle.loads(pickle.dumps(cfg))
    assert cfg2.FED.NUM_ROUNDS == 30
    assert cfg2.is_frozen()
