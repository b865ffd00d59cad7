from federated_multi_modal_tpu.ops.pallas.attention import (
    fused_attention,
    pallas_available,
)

__all__ = ["fused_attention", "pallas_available"]
