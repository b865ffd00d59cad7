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


class _TorchModifiedResNet(nn.Module):
    """Inline torch rebuild of the reference ModifiedResNet + AttentionPool2d
    (clip/model.py:56-150) with OpenAI state-dict naming, used as the golden
    model for full-tower conversion parity."""

    def __init__(self, layers, output_dim, width, input_resolution, heads):
        super().__init__()
        self.conv1 = nn.Conv2d(3, width // 2, 3, stride=2, padding=1, bias=False)
        self.bn1 = nn.BatchNorm2d(width // 2)
        self.conv2 = nn.Conv2d(width // 2, width // 2, 3, padding=1, bias=False)
        self.bn2 = nn.BatchNorm2d(width // 2)
        self.conv3 = nn.Conv2d(width // 2, width, 3, padding=1, bias=False)
        self.bn3 = nn.BatchNorm2d(width)
        self.avgpool = nn.AvgPool2d(2)
        self.relu = nn.ReLU()

        self._inplanes = width
        self.layer1 = self._make_layer(width, layers[0])
        self.layer2 = self._make_layer(width * 2, layers[1], stride=2)
        self.layer3 = self._make_layer(width * 4, layers[2], stride=2)
        self.layer4 = self._make_layer(width * 8, layers[3], stride=2)

        spacial = input_resolution // 32
        embed_dim = width * 32
        self.heads = heads
        self.positional_embedding = nn.Parameter(
            torch.randn(spacial ** 2 + 1, embed_dim) / embed_dim ** 0.5
        )
        self.q_proj = nn.Linear(embed_dim, embed_dim)
        self.k_proj = nn.Linear(embed_dim, embed_dim)
        self.v_proj = nn.Linear(embed_dim, embed_dim)
        self.c_proj = nn.Linear(embed_dim, output_dim)

    def _make_layer(self, planes, blocks, stride=1):
        mods = [_TorchBottleneck(self._inplanes, planes, stride)]
        self._inplanes = planes * 4
        for _ in range(1, blocks):
            mods.append(_TorchBottleneck(self._inplanes, planes))
        return nn.Sequential(*mods)

    def forward(self, x):
        x = self.relu(self.bn1(self.conv1(x)))
        x = self.relu(self.bn2(self.conv2(x)))
        x = self.relu(self.bn3(self.conv3(x)))
        x = self.avgpool(x)
        x = self.layer4(self.layer3(self.layer2(self.layer1(x))))
        # AttentionPool2d (clip/model.py:56-75)
        x = x.flatten(start_dim=2).permute(2, 0, 1)  # (HW, B, C)
        x = torch.cat([x.mean(dim=0, keepdim=True), x], dim=0)
        x = x + self.positional_embedding[:, None, :]
        out, _ = nn.functional.multi_head_attention_forward(
            query=x[:1], key=x, value=x,
            embed_dim_to_check=x.shape[-1], num_heads=self.heads,
            q_proj_weight=self.q_proj.weight,
            k_proj_weight=self.k_proj.weight,
            v_proj_weight=self.v_proj.weight,
            in_proj_weight=None,
            in_proj_bias=torch.cat(
                [self.q_proj.bias, self.k_proj.bias, self.v_proj.bias]
            ),
            bias_k=None, bias_v=None, add_zero_attn=False, dropout_p=0,
            out_proj_weight=self.c_proj.weight,
            out_proj_bias=self.c_proj.bias,
            use_separate_proj_weight=True,
            training=False, need_weights=False,
        )
        return out.squeeze(0)


def test_full_resnet_tower_matches_torch():
    """Full ModifiedResNet golden: torch reference-semantics model ->
    OpenAI-naming state dict -> convert_torch_resnet -> identical features
    (reference clip/model.py:56-150)."""
    torch.manual_seed(0)
    layers, width, res, out_dim, heads = (1, 1, 1, 1), 16, 64, 32, 2
    tm = _TorchModifiedResNet(layers, out_dim, width, res, heads).eval()

    # export with OpenAI CLIP naming: visual.* with downsample.0/.1 conv/bn
    # (the avgpool holds slot -1 in OpenAI's OrderedDict)
    sd = {}
    for name, t in tm.state_dict().items():
        name = name.replace("downsample.1.", "downsample.TMP.")
        name = name.replace("downsample.2.", "downsample.1.")
        name = name.replace("downsample.TMP.", "downsample.0.")
        name = name.replace("positional_embedding", "attnpool.positional_embedding")
        for p in ("q_proj", "k_proj", "v_proj", "c_proj"):
            name = name.replace(f"{p}.", f"attnpool.{p}.")
        sd[f"visual.{name}"] = t
    # our _TorchBottleneck's downsample is Sequential(avgpool, conv, bn) ->
    # torch names .0 avgpool (no params), .1 conv, .2 bn; remapped above.

    cfg = ResNetConfig(layers=layers, output_dim=out_dim, width=width,
                       input_resolution=res)
    params = convert_torch_resnet(sd, cfg)

    x = np.random.default_rng(1).standard_normal((2, res, res, 3)).astype(np.float32)
    with torch.no_grad():
        theirs = tm(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
    ours = np.asarray(encode_image_resnet(params, cfg, jnp.asarray(x)))
    np.testing.assert_allclose(ours, theirs, atol=5e-4, rtol=5e-4)
