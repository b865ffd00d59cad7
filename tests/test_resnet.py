"""ModifiedResNet tower: torch parity on the bottleneck + end-to-end RN
zero-shot smoke test."""

import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn as nn

from federated_multi_modal_tpu.models.resnet import (
    ResNetConfig,
    bottleneck,
    convert_torch_resnet,
    encode_image_resnet,
    init_resnet_params,
)


class _TorchBottleneck(nn.Module):
    """Inline rebuild of the reference Bottleneck (clip/model.py:10-53)."""

    def __init__(self, inplanes, planes, stride=1):
        super().__init__()
        self.conv1 = nn.Conv2d(inplanes, planes, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(planes)
        self.conv2 = nn.Conv2d(planes, planes, 3, padding=1, bias=False)
        self.bn2 = nn.BatchNorm2d(planes)
        self.avgpool = nn.AvgPool2d(stride) if stride > 1 else nn.Identity()
        self.conv3 = nn.Conv2d(planes, planes * 4, 1, bias=False)
        self.bn3 = nn.BatchNorm2d(planes * 4)
        self.relu = nn.ReLU()
        self.downsample = None
        if stride > 1 or inplanes != planes * 4:
            self.downsample = nn.Sequential(
                nn.AvgPool2d(stride),
                nn.Conv2d(inplanes, planes * 4, 1, stride=1, bias=False),
                nn.BatchNorm2d(planes * 4),
            )

    def forward(self, x):
        identity = x
        out = self.relu(self.bn1(self.conv1(x)))
        out = self.relu(self.bn2(self.conv2(out)))
        out = self.avgpool(out)
        out = self.bn3(self.conv3(out))
        if self.downsample is not None:
            identity = self.downsample(x)
        return self.relu(out + identity)


def _rand_bn(rng, c):
    return {
        "scale": rng.standard_normal(c).astype(np.float32) * 0.1 + 1.0,
        "bias": rng.standard_normal(c).astype(np.float32) * 0.1,
        "mean": rng.standard_normal(c).astype(np.float32) * 0.1,
        "var": np.abs(rng.standard_normal(c).astype(np.float32)) * 0.1 + 1.0,
    }


def test_bottleneck_matches_torch(rng):
    inplanes, planes, stride = 8, 4, 2
    x = rng.standard_normal((2, 16, 16, inplanes)).astype(np.float32)

    p = {
        "conv1": {"w": rng.standard_normal((1, 1, inplanes, planes)).astype(np.float32) * 0.2},
        "bn1": _rand_bn(rng, planes),
        "conv2": {"w": rng.standard_normal((3, 3, planes, planes)).astype(np.float32) * 0.1},
        "bn2": _rand_bn(rng, planes),
        "conv3": {"w": rng.standard_normal((1, 1, planes, planes * 4)).astype(np.float32) * 0.2},
        "bn3": _rand_bn(rng, planes * 4),
        "downsample": {
            "conv": {"w": rng.standard_normal((1, 1, inplanes, planes * 4)).astype(np.float32) * 0.2},
            "bn": _rand_bn(rng, planes * 4),
        },
    }

    tb = _TorchBottleneck(inplanes, planes, stride).eval()
    with torch.no_grad():
        tb.conv1.weight.copy_(torch.from_numpy(p["conv1"]["w"].transpose(3, 2, 0, 1)))
        tb.conv2.weight.copy_(torch.from_numpy(p["conv2"]["w"].transpose(3, 2, 0, 1)))
        tb.conv3.weight.copy_(torch.from_numpy(p["conv3"]["w"].transpose(3, 2, 0, 1)))
        for bn_t, bn_p in [(tb.bn1, p["bn1"]), (tb.bn2, p["bn2"]), (tb.bn3, p["bn3"]),
                           (tb.downsample[2], p["downsample"]["bn"])]:
            bn_t.weight.copy_(torch.from_numpy(bn_p["scale"]))
            bn_t.bias.copy_(torch.from_numpy(bn_p["bias"]))
            bn_t.running_mean.copy_(torch.from_numpy(bn_p["mean"]))
            bn_t.running_var.copy_(torch.from_numpy(bn_p["var"]))
        tb.downsample[1].weight.copy_(
            torch.from_numpy(p["downsample"]["conv"]["w"].transpose(3, 2, 0, 1))
        )
        theirs = tb(torch.from_numpy(x.transpose(0, 3, 1, 2)))
        theirs = theirs.permute(0, 2, 3, 1).numpy()

    ours = np.asarray(bottleneck(jnp.asarray(x), p, stride))
    np.testing.assert_allclose(ours, theirs, atol=2e-4, rtol=2e-4)


def test_resnet_tower_shapes():
    cfg = ResNetConfig(layers=(1, 1, 1, 1), output_dim=32, width=16,
                       input_resolution=64)
    params = init_resnet_params(cfg, jax.random.PRNGKey(0))
    imgs = jnp.zeros((2, 64, 64, 3))
    feats = encode_image_resnet(params, cfg, imgs)
    assert feats.shape == (2, 32)
    assert np.isfinite(np.asarray(feats)).all()


def test_rn_zeroshot_smoke(tmp_path):
    import federated_multi_modal_tpu.trainers  # noqa: F401
    from federated_multi_modal_tpu.config import get_cfg_default
    from federated_multi_modal_tpu.engine import build_trainer
    from federated_multi_modal_tpu.models.params import BACKBONE_CONFIGS, CLIPConfig

    # register a small RN backbone for the test
    BACKBONE_CONFIGS["TinyRN"] = CLIPConfig(
        embed_dim=64, vision_layers=(1, 1, 1, 1), vision_width=16,
        vision_patch_size=0, image_resolution=64,
        transformer_width=128, transformer_heads=2, transformer_layers=2,
    )
    try:
        cfg = get_cfg_default()
        cfg.DATASET.ROOT = str(tmp_path)
        cfg.DATASET.NAME = "Synthetic"
        cfg.MODEL.BACKBONE.NAME = "TinyRN"
        cfg.INPUT.SIZE = (64, 64)
        cfg.INPUT.CANVAS_SIZE = 72
        cfg.DATALOADER.TEST.BATCH_SIZE = 8
        cfg.TRAINER.NAME = "ZeroshotCLIP"
        cfg.OUTPUT_DIR = str(tmp_path / "out")
        cfg.SEED = 1
        cfg.VERBOSE = False
        trainer = build_trainer(cfg)
        res = trainer.test()
        assert 0.0 <= res["accuracy"] <= 100.0
    finally:
        del BACKBONE_CONFIGS["TinyRN"]


def test_scaled_resnet_catalog_configs():
    """RN50x4 / RN50x16 catalog entries (reference clip/clip.py:32-33):
    params initialize and the stem produces the right spatial grid."""
    import jax

    from federated_multi_modal_tpu.models.params import (
        BACKBONE_CONFIGS,
        init_clip_params,
    )

    for name, res, width, embed in [("RN50x4", 288, 80, 640),
                                    ("RN50x16", 384, 96, 768)]:
        cfg = BACKBONE_CONFIGS[name]
        assert not cfg.is_vit
        assert cfg.image_resolution == res
        assert cfg.vision_width == width
        assert cfg.embed_dim == embed
        rc = cfg.resnet_config()
        # attention-pool spacial dim = resolution / 32
        assert rc.input_resolution // 32 == res // 32
        params = init_clip_params(cfg, jax.random.PRNGKey(0),
                                  dtype_policy=False)
        # attention-pool positional embedding covers the final grid + CLS
        pe = params["visual"]["attnpool"]["positional_embedding"]
        assert pe.shape[0] == (res // 32) ** 2 + 1
        # embedding table matches the transformer width
        assert params["text"]["token_embedding"].shape[1] == cfg.transformer_width
