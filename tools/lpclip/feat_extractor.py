"""Linear-probe stage 1: CLIP feature extraction into .npz
(rebuild of ``lpclip/feat_extractor.py``).

Extracts frozen CLIP image features for the train/val/test splits of a
catalog dataset and stores ``{split}.npz`` with ``feature_list`` /
``label_list`` under ``OUTPUT_DIR/<DatasetName>/``.

Usage::

    python tools/lpclip/feat_extractor.py --root <data_root> \
        --dataset-config-file configs/datasets/caltech101.yaml \
        --output-dir clip_feat --split train
"""

import argparse
import os

import numpy as np

import federated_multi_modal_tpu.data.datasets  # noqa: F401
from federated_multi_modal_tpu.config import get_cfg_default
from federated_multi_modal_tpu.data.loader import DataLoader
from federated_multi_modal_tpu.data.transforms import build_transform
from federated_multi_modal_tpu.engine.registry import build_dataset
from federated_multi_modal_tpu.models.clip_model import encode_image_auto
from federated_multi_modal_tpu.models.params import load_clip_backbone
from federated_multi_modal_tpu.ops.preprocess import crop_resize_flip_normalize
from federated_multi_modal_tpu.utils import set_random_seed, setup_logger


def main(args):
    import jax
    import jax.numpy as jnp

    cfg = get_cfg_default()
    if args.dataset_config_file:
        cfg.merge_from_file(args.dataset_config_file)
    if args.config_file:
        cfg.merge_from_file(args.config_file)
    if args.root:
        cfg.DATASET.ROOT = args.root
    if args.output_dir:
        cfg.OUTPUT_DIR = args.output_dir
    if args.backbone:
        cfg.MODEL.BACKBONE.NAME = args.backbone
    cfg.DATASET.NUM_SHOTS = args.num_shots
    cfg.SEED = args.seed
    cfg.freeze()

    if cfg.SEED >= 0:
        set_random_seed(cfg.SEED)
    setup_logger(cfg.OUTPUT_DIR)

    dataset = build_dataset(cfg)
    split_data = {
        "train": dataset.train_x, "val": dataset.val, "test": dataset.test
    }[args.split]

    tfm = build_transform(cfg, is_train=False)
    loader = DataLoader(
        split_data,
        batch_size=cfg.DATALOADER.TRAIN_X.BATCH_SIZE,
        transform=tfm,
        is_train=False,
        sampler_type="SequentialSampler",
        drop_last=False,
    )

    arch, params = load_clip_backbone(cfg.MODEL)

    # params passed as an argument, not closed over: baked-in pytrees blow
    # the remote-compile HTTP limit on tunnel backends (CLAUDE.md)
    @jax.jit
    def _extract(visual, images):
        # pure feature extraction: no grads ever -> fused inference tower
        return encode_image_auto(visual, arch, images, inference=True)

    def extract(images):
        return _extract(params["visual"], images)

    features, labels = [], []
    for batch in loader:
        if "canvas" in batch:
            images = crop_resize_flip_normalize(
                jnp.asarray(batch["canvas"]),
                jnp.asarray(batch["box"]),
                jnp.asarray(batch["flip"]),
                out_size=cfg.INPUT.SIZE[0],
            )
        else:
            images = jnp.asarray(batch["img"])
        feats = np.asarray(jax.device_get(extract(images)))
        features.extend(feats.tolist())
        labels.extend(batch["label"].tolist())

    save_dir = os.path.join(cfg.OUTPUT_DIR, cfg.DATASET.NAME)
    os.makedirs(save_dir, exist_ok=True)
    np.savez(
        os.path.join(save_dir, args.split),
        feature_list=features,
        label_list=labels,
    )
    print(f"Saved {len(labels)} features to {save_dir}/{args.split}.npz")


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--root", type=str, default="")
    parser.add_argument("--output-dir", type=str, default="clip_feat")
    parser.add_argument("--config-file", type=str, default="")
    parser.add_argument("--dataset-config-file", type=str, default="")
    parser.add_argument("--backbone", type=str, default="")
    parser.add_argument("--split", type=str, default="train",
                        choices=["train", "val", "test"])
    parser.add_argument("--num-shots", type=int, default=-1)
    parser.add_argument("--seed", type=int, default=-1)
    main(parser.parse_args())
