"""Dataset catalog (parity with the reference's registered plugins,
``train.py:9-27``): 11 base-to-novel recognition datasets, 4 ImageNet
domain-shift variants, the 2 captioned remote-sensing datasets used by the
federated trainer, plus a synthetic dataset for tests/benchmarks."""

from federated_multi_modal_tpu.data.datasets import (  # noqa: F401
    caltech101,
    dtd,
    eurosat,
    fgvc_aircraft,
    food101,
    imagenet,
    imagenet_a,
    imagenet_r,
    imagenet_sketch,
    imagenetv2,
    oxford_flowers,
    oxford_pets,
    patternnet,
    stanford_cars,
    sun397,
    synthetic,
    ucf101,
    ucmerced,
)
