"""OpenAI-CLIP-style public API surface.

Compatibility layer over the JAX core matching the ``clip`` package API the
reference uses (``clip/clip.py``): ``available_models()``, ``load()``,
``tokenize()``, and the checkpoint download helper with SHA256 verification
(URLs are public; downloads only work with network egress — in air-gapped
environments pass a local path to ``load``).
"""

from __future__ import annotations

import hashlib
import os
import urllib.request
import warnings

from federated_multi_modal_tpu.models.params import (
    BACKBONE_CONFIGS,
    convert_torch_state_dict,
    infer_config_from_state_dict,
    init_clip_params,
)
from federated_multi_modal_tpu.tokenizer import tokenize  # noqa: F401

# Official OpenAI checkpoint URLs (SHA256 embedded in the path, verified on
# download) — same table the reference downloads from (clip/clip.py:29-37).
_MODELS = {
    "RN50": "https://openaipublic.azureedge.net/clip/models/afeb0e10f9e5a86da6080e35cf09123aca3b358a0c3e3b6c78a7b63bc04b6762/RN50.pt",
    "RN101": "https://openaipublic.azureedge.net/clip/models/8fa8567bab74a42d41c5915025a8e4538c3bdbe8804a470a72f30b0d94fab599/RN101.pt",
    "RN50x4": "https://openaipublic.azureedge.net/clip/models/7e526bd135e493cef0776de27d5f42653e6b4c8bf9e0f653bb11773263205fdd/RN50x4.pt",
    "RN50x16": "https://openaipublic.azureedge.net/clip/models/52378b407f34354e150460fe41077663dd5b39c54cd0bfd2b27167a4a06ec9aa/RN50x16.pt",
    "ViT-B/32": "https://openaipublic.azureedge.net/clip/models/40d365715913c9da98579312b702a82c18be219cc2a73407c4526f58eba950af/ViT-B-32.pt",
    "ViT-B/16": "https://openaipublic.azureedge.net/clip/models/5806e77cd80f8b59890b7e101eabd078d9fb84e6937f9e85e4ecb61988df416f/ViT-B-16.pt",
    "ViT-L/14": "https://openaipublic.azureedge.net/clip/models/b8cca3fd41ae0c99ba7e8951adf17d267cdb84cd88be6f7c2e0eca1737a03836/ViT-L-14.pt",
}


def available_models():
    return list(_MODELS)


def _download(url: str, root: str = None) -> str:
    """Download with SHA256 verification (mirror of ``clip/clip.py:39-68``)."""
    root = root or os.path.expanduser("~/.cache/clip")
    os.makedirs(root, exist_ok=True)
    filename = os.path.basename(url)
    expected_sha256 = url.split("/")[-2]
    target = os.path.join(root, filename)

    if os.path.isfile(target):
        digest = hashlib.sha256(open(target, "rb").read()).hexdigest()
        if digest == expected_sha256:
            return target
        warnings.warn(
            f"{target} exists but the SHA256 does not match; re-downloading"
        )

    with urllib.request.urlopen(url) as source, open(target, "wb") as output:
        while True:
            buf = source.read(8192)
            if not buf:
                break
            output.write(buf)

    digest = hashlib.sha256(open(target, "rb").read()).hexdigest()
    if digest != expected_sha256:
        raise RuntimeError("Model has been downloaded but the SHA256 does not match")
    return target


def load(name: str, download_root: str = None, allow_random: bool = True):
    """Resolve a model name or local path into ``(CLIPConfig, params)``.

    * local ``.pt``/``.pth`` path -> torch checkpoint conversion
    * known model name + cached/downloadable checkpoint -> conversion
    * otherwise (air-gapped): random CLIP-init params when ``allow_random``
    """
    if os.path.isfile(name):
        return _load_torch(name)

    if name in _MODELS:
        # only the DOWNLOAD may fall back to random init — a conversion
        # failure on an obtained checkpoint is a real error that must
        # surface, not silently degrade to random weights
        try:
            path = _download(_MODELS[name], download_root)
        except Exception as e:  # no egress / no cache
            if not allow_random:
                raise
            warnings.warn(
                f"Could not obtain weights for {name} ({e}); using random "
                "CLIP-initialized parameters."
            )
            arch = BACKBONE_CONFIGS[name]
            return arch, init_clip_params(arch)
        return _load_torch(path)

    if name in BACKBONE_CONFIGS and allow_random:
        arch = BACKBONE_CONFIGS[name]
        return arch, init_clip_params(arch)

    raise RuntimeError(
        f"Model {name} not found; available models = {available_models()}"
    )


def _load_torch(path: str):
    from federated_multi_modal_tpu.models.params import load_torch_state_dict

    sd = load_torch_state_dict(path)
    arch = infer_config_from_state_dict(sd)
    return arch, convert_torch_state_dict(sd, arch)
