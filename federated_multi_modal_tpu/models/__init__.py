from federated_multi_modal_tpu.models.params import (
    BACKBONE_CONFIGS,
    CLIPConfig,
    apply_dtype_policy,
    convert_torch_state_dict,
    infer_config_from_state_dict,
    init_clip_params,
    load_clip_backbone,
    tiny_test_config,
)
from federated_multi_modal_tpu.models.clip_model import (
    cosine_logits,
    embed_tokens,
    encode_image,
    encode_text_embedded,
    encode_text_tokens,
    patchify,
)

__all__ = [
    "BACKBONE_CONFIGS",
    "CLIPConfig",
    "apply_dtype_policy",
    "convert_torch_state_dict",
    "infer_config_from_state_dict",
    "init_clip_params",
    "load_clip_backbone",
    "tiny_test_config",
    "cosine_logits",
    "embed_tokens",
    "encode_image",
    "encode_text_embedded",
    "encode_text_tokens",
    "patchify",
]
