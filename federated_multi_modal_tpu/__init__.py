"""federated_multi_modal_tpu — a TPU-native (JAX/XLA/Pallas) framework for
multi-modal prompt learning on frozen CLIP, with federated training.

Re-designed from scratch for TPU with the capabilities of the reference
`tahaspc82442/federated_multi_modal` (a MaPLe fork):

  * CLIP ViT + text transformer cores as pure-functional JAX with static
    shapes, bf16 matmuls on the MXU and fp32 LayerNorm/logit math
    (reference: ``clip/model.py``).
  * Prompt-learning method family: CoOp, Co-CoOp, VPT, IVLP, MaPLe (with the
    fork's alternating bidirectional V-L couplers), zero-shot CLIP and
    linear-probe CLIP (reference: ``trainers/*.py``).
  * Federated orchestration with unified label spaces and FedAvg, mapped
    onto a ``jax.sharding.Mesh`` client axis (reference:
    ``trainers/maple_fed.py``).
  * A Dassl-equivalent engine: config tree, dataset catalog with few-shot /
    base-new subsampling, data manager, optimizer/scheduler factories,
    evaluator, checkpoint I/O, logger (reference external dep:
    Dassl.pytorch).
"""

__version__ = "0.1.0"

from federated_multi_modal_tpu.config import get_cfg_default  # noqa: F401
from federated_multi_modal_tpu.engine.registry import (  # noqa: F401
    DATASET_REGISTRY,
    TRAINER_REGISTRY,
    build_trainer,
)
