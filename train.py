"""CLI entry point (rebuild of the reference ``train.py``).

Same surface: ``python train.py --trainer MaPLeFederated --config-file
configs/trainers/... --dataset-config-file configs/datasets/... [--seed N]
[--eval-only --model-dir D --load-epoch E] [opts ...]`` with the same merge
order: dataset yaml -> trainer yaml -> CLI flags -> freeform opts
(reference ``train.py:140-160``).
"""

import argparse
import os

# FMM_TPU_PLATFORM=cpu forces the host platform before the backend
# initializes (some site configurations register a default accelerator
# backend that ignores the JAX_PLATFORMS env var; jax.config wins when
# applied pre-init).  Used by the script-level CI tests.
if os.environ.get("FMM_TPU_PLATFORM"):
    import jax

    jax.config.update("jax_platforms", os.environ["FMM_TPU_PLATFORM"])

# persistent compilation cache: repeated CLI runs in one container skip
# recompiling HLO-identical programs (same default dir as bench.py;
# override/disable via JAX_COMPILATION_CACHE_DIR)
try:
    import jax as _jax

    _jax.config.update(
        "jax_compilation_cache_dir",
        os.environ.get("JAX_COMPILATION_CACHE_DIR", "/tmp/fmm_jax_cache"),
    )
except Exception:
    pass

from federated_multi_modal_tpu.config import get_cfg_default
from federated_multi_modal_tpu.engine import build_trainer
from federated_multi_modal_tpu.utils import (
    collect_env_info,
    set_random_seed,
    setup_logger,
)

# populate registries
import federated_multi_modal_tpu.data.datasets  # noqa: F401
import federated_multi_modal_tpu.trainers  # noqa: F401


def print_args(args, cfg):
    print("***************")
    print("** Arguments **")
    print("***************")
    for key in sorted(args.__dict__):
        print(f"{key}: {args.__dict__[key]}")
    print("************")
    print("** Config **")
    print("************")
    print(cfg)


def reset_cfg(cfg, args):
    if args.root:
        cfg.DATASET.ROOT = args.root
    if args.output_dir:
        cfg.OUTPUT_DIR = args.output_dir
    if args.resume:
        cfg.RESUME = args.resume
    if args.seed:
        cfg.SEED = args.seed
    if args.source_domains:
        cfg.DATASET.SOURCE_DOMAINS = args.source_domains
    if args.target_domains:
        cfg.DATASET.TARGET_DOMAINS = args.target_domains
    if args.transforms:
        cfg.INPUT.TRANSFORMS = args.transforms
    if args.trainer:
        cfg.TRAINER.NAME = args.trainer
    if args.backbone:
        cfg.MODEL.BACKBONE.NAME = args.backbone
    if args.head:
        cfg.MODEL.HEAD.NAME = args.head


def setup_cfg(args):
    cfg = get_cfg_default()
    if args.dataset_config_file:
        cfg.merge_from_file(args.dataset_config_file)
    if args.config_file:
        cfg.merge_from_file(args.config_file)
    reset_cfg(cfg, args)
    if args.opts:
        cfg.merge_from_list(args.opts)
    cfg.freeze()
    return cfg


def main(args):
    from federated_multi_modal_tpu.parallel import (
        initialize_multihost,
        is_main_process,
        process_count,
    )

    # multi-host pods: wire the jax.distributed coordinator before any
    # backend use; single-host runs are a no-op
    multihost = initialize_multihost()

    cfg = setup_cfg(args)
    # install the log.txt tee FIRST so the seed/topology provenance lands
    # in the artifact parse_test_res.py reads (Dassl calls setup_logger
    # before anything else prints)
    if is_main_process():  # one log.txt writer per pod
        setup_logger(cfg.OUTPUT_DIR)
    if multihost:
        print(f"Multi-host run: {process_count()} processes")
    if cfg.SEED >= 0:
        print(f"Setting fixed seed: {cfg.SEED}")
        set_random_seed(cfg.SEED)

    print_args(args, cfg)
    print("Collecting env info ...")
    print(f"** System info **\n{collect_env_info()}\n")

    trainer = build_trainer(cfg)

    if args.eval_only:
        trainer.load_model(args.model_dir, epoch=args.load_epoch)
        trainer.test()
        return

    if not args.no_train:
        trainer.train()


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--root", type=str, default="", help="path to dataset")
    parser.add_argument("--output-dir", type=str, default="", help="output directory")
    parser.add_argument(
        "--resume", type=str, default="",
        help="checkpoint directory (from which the training resumes)",
    )
    parser.add_argument(
        "--seed", type=int, default=-1,
        help="only positive value enables a fixed seed",
    )
    parser.add_argument(
        "--source-domains", type=str, nargs="+", help="source domains for DA/DG"
    )
    parser.add_argument(
        "--target-domains", type=str, nargs="+", help="target domains for DA/DG"
    )
    parser.add_argument(
        "--transforms", type=str, nargs="+", help="data augmentation methods"
    )
    parser.add_argument("--config-file", type=str, default="", help="path to config file")
    parser.add_argument(
        "--dataset-config-file", type=str, default="",
        help="path to config file for dataset setup",
    )
    parser.add_argument("--trainer", type=str, default="", help="name of trainer")
    parser.add_argument("--backbone", type=str, default="", help="name of CNN backbone")
    parser.add_argument("--head", type=str, default="", help="name of head")
    parser.add_argument("--eval-only", action="store_true", help="evaluation only")
    parser.add_argument(
        "--model-dir", type=str, default="",
        help="load model from this directory for eval-only mode",
    )
    parser.add_argument(
        "--load-epoch", type=int, help="load model weights at this epoch for evaluation"
    )
    parser.add_argument(
        "--no-train", action="store_true", help="do not call trainer.train()"
    )
    parser.add_argument(
        "opts", default=None, nargs=argparse.REMAINDER,
        help="modify config options using the command-line",
    )
    main(parser.parse_args())
