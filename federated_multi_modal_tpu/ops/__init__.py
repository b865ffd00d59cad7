from federated_multi_modal_tpu.ops.primitives import (
    build_causal_mask,
    l2_normalize,
    layer_norm,
    linear,
    mlp,
    multi_head_attention,
    quick_gelu,
    residual_block,
)

__all__ = [
    "build_causal_mask",
    "l2_normalize",
    "layer_norm",
    "linear",
    "mlp",
    "multi_head_attention",
    "quick_gelu",
    "residual_block",
]
