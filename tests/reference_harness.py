"""Harness that EXECUTES the PyTorch reference's own source files for
golden parity tests.

The reference modules (``/root/reference/clip/model.py``, ``clip/clip.py``,
``clip/simple_tokenizer.py``, ``trainers/maple.py``, ``trainers/cocoop.py``)
are imported *by file path* through a symlinked package directory — no
reference code is copied into this repo.  Their unavailable dependencies
(dassl, ftfy, torchvision, tqdm) are stubbed with inert placeholders, and a
full-size synthetic BPE merge table is generated so ``clip.tokenize`` works
offline with the SAME token ids as our tokenizer (49406/49407 specials).

``fp32_reference()`` neutralizes the reference's hard-coded ``.half()``
casts (``clip/model.py:438,537,248,259,327,344``; ``trainers/maple.py:112``)
so the reference runs in fp32 on CPU and goldens can use tight tolerances.
"""

from __future__ import annotations

import contextlib
import gzip
import os
import sys
import types
from collections import Counter

REFERENCE_ROOT = "/root/reference"
HARNESS_DIR = "/tmp/fmm_ref_harness"

# number of merge lines the reference slices from the table
# (clip/simple_tokenizer.py:67: merges[1:49152-256-2+1])
FULL_MERGES = 49152 - 256 - 2

_WORDS = (
    "a photo of the this that with and for from satellite aerial centered "
    "image picture drawing painting sketch texture land use cover "
    "airplane airport baseball diamond basketball court beach bridge "
    "chaparral church circular farmland cloud commercial area dense "
    "residential desert forest freeway golf course ground track field "
    "harbor industrial intersection island lake meadow medium mobile home "
    "park overpass palace parking lot railway station rectangular river "
    "roundabout runway sea ice ship snowberg sparse stadium storage tank "
    "tennis terrace thermal power plant wetland annual crop herbaceous "
    "vegetation highway pasture permanent pond pets flowers aircraft "
    "describable textures food cars sun caltech action retriever golden "
    "delta cat dog bird horse sheep truck ship person bicycle motorcycle"
).split()


def _learn_merges(words, n_merges: int):
    """Tiny deterministic BPE training over a word list: produces a
    realistic cascaded merge table (multi-merge words) for fixtures."""
    vocab = Counter()
    for w in words:
        vocab[tuple(w[:-1]) + (w[-1] + "</w>",)] += 1
    merges, seen = [], set()
    for _ in range(n_merges):
        pairs = Counter()
        for sym, f in vocab.items():
            for a, b in zip(sym, sym[1:]):
                pairs[(a, b)] += f
        pairs = {p: c for p, c in pairs.items() if p not in seen}
        if not pairs:
            break
        best = max(pairs.items(), key=lambda kv: (kv[1], kv[0]))[0]
        merges.append(best)
        seen.add(best)
        new_vocab = Counter()
        for sym, f in vocab.items():
            out, i = [], 0
            while i < len(sym):
                if i < len(sym) - 1 and (sym[i], sym[i + 1]) == best:
                    out.append(sym[i] + sym[i + 1])
                    i += 2
                else:
                    out.append(sym[i])
                    i += 1
            new_vocab[tuple(out)] += f
        vocab = new_vocab
    return merges


def write_bpe_fixture(path: str, n_real_merges: int = 600) -> None:
    """Write a FULL-SIZE synthetic merge table (48,894 lines) so both
    tokenizers place ``<|startoftext|>``/``<|endoftext|>`` at 49406/49407
    like the real OpenAI table.  The first ~``n_real_merges`` lines are
    learned from an English word list (so test prompts exercise deep merge
    cascades); the rest are inert filler pairs that never match."""
    merges = _learn_merges(_WORDS, n_real_merges)
    lines = ["bpe fixture v1 (synthetic, deterministic)"]
    lines += [f"{a} {b}" for a, b in merges]
    for i in range(FULL_MERGES - len(merges)):
        lines.append(f"<filler{i}> <x>")
    assert len(lines) == FULL_MERGES + 1
    with gzip.open(path, "wt", encoding="utf-8") as f:
        f.write("\n".join(lines) + "\n")


def _stub(name: str, **attrs):
    mod = types.ModuleType(name)
    for k, v in attrs.items():
        setattr(mod, k, v)
    sys.modules[name] = mod
    return mod


def _install_stubs():
    class _Registry:
        def register(self, cls=None):
            if cls is None:
                return lambda c: c
            return cls

    class _TrainerX:
        def __init__(self, *a, **k):
            pass

    class _Datum:  # dassl.data.datasets.Datum (caption-patched fork shape)
        def __init__(self, impath="", label=0, classname="", caption=None,
                     domain=0):
            self.impath, self.label = impath, label
            self.classname, self.caption, self.domain = classname, caption, domain

    if "dassl" not in sys.modules:
        dassl = _stub("dassl")
        dassl.engine = _stub(
            "dassl.engine", TRAINER_REGISTRY=_Registry(), TrainerX=_TrainerX
        )
        dassl.metrics = _stub(
            "dassl.metrics", compute_accuracy=lambda *a, **k: [0.0]
        )
        dassl.utils = _stub("dassl.utils")
        dassl.optim = _stub(
            "dassl.optim",
            build_optimizer=lambda *a, **k: None,
            build_lr_scheduler=lambda *a, **k: None,
        )
        dassl.data = _stub("dassl.data", DataManager=object, Datum=_Datum)
        dassl.data.data_manager = _stub(
            "dassl.data.data_manager",
            build_transform=lambda *a, **k: None,
            build_data_loader=lambda *a, **k: None,
        )

        class _DatasetBase:  # inert base: class bodies only, never __init__'d
            def __init__(self, *a, **k):
                pass

        dassl.data.datasets = _stub(
            "dassl.data.datasets", Datum=_Datum,
            DATASET_REGISTRY=_Registry(), DatasetBase=_DatasetBase,
        )
    # Functional dassl.utils helpers the dataset plugins actually rely on
    # (Dassl semantics: listdir_nohidden skips dotfiles, unsorted by default)
    import json

    def _read_json(path):
        with open(path) as f:
            return json.load(f)

    def _write_json(obj, path):
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        with open(path, "w") as f:
            json.dump(obj, f, indent=4, separators=(",", ": "))

    def _listdir_nohidden(path, sort=False):
        items = [f for f in os.listdir(path) if not f.startswith(".")]
        if sort:
            items.sort()
        return items

    # (re)set utils attrs so later harness extensions in the same process
    # see every helper the reference files import
    for name, fn in (
        ("load_pretrained_weights", lambda *a, **k: None),
        ("load_checkpoint", lambda *a, **k: {}),
        ("mkdir_if_missing", lambda p: os.makedirs(p, exist_ok=True)),
        ("save_checkpoint", lambda *a, **k: None),
        ("read_json", _read_json),
        ("write_json", _write_json),
        ("listdir_nohidden", _listdir_nohidden),
    ):
        setattr(sys.modules["dassl.utils"], name, fn)

    if "ftfy" not in sys.modules:
        _stub("ftfy", fix_text=lambda text, *a, **k: text)
    if "torchvision" not in sys.modules:
        class _T:  # inert transform placeholder
            def __init__(self, *a, **k):
                pass

            def __call__(self, x):
                return x

        tv = _stub("torchvision")
        tv.transforms = _stub(
            "torchvision.transforms",
            Compose=_T, Resize=_T, CenterCrop=_T, ToTensor=_T, Normalize=_T,
            InterpolationMode=types.SimpleNamespace(BICUBIC="bicubic"),
        )
    if "tqdm" not in sys.modules:
        _stub("tqdm", tqdm=lambda it=None, *a, **k: it,
              trange=lambda *a, **k: range(*a))


def _link(src: str, dst: str) -> None:
    # repoint stale links / replace leftover regular files so a changed
    # REFERENCE_ROOT never leaves dangling symlinks in the persistent
    # harness dir
    if os.path.islink(dst):
        if os.readlink(dst) == src:
            return
        os.unlink(dst)
    elif os.path.exists(dst):
        os.unlink(dst)
    os.symlink(src, dst)


_cache = None


def load_reference():
    """Build the symlink package (once), install stubs, import the
    reference modules.  Returns a namespace with ``model`` (clip.model),
    ``clip`` (clip.clip), ``simple_tokenizer``, ``maple``, ``cocoop``
    (trainers), and ``bpe_path``."""
    global _cache
    if _cache is not None:
        return _cache

    if not os.path.isdir(os.path.join(REFERENCE_ROOT, "clip")):
        # off-container checkout: the reference mount is absent — skip the
        # executed-reference goldens instead of erroring the whole suite
        import pytest

        pytest.skip(
            f"reference tree not available at {REFERENCE_ROOT}",
            allow_module_level=False,
        )

    clip_dir = os.path.join(HARNESS_DIR, "clip")
    trainers_dir = os.path.join(HARNESS_DIR, "ref_trainers")
    os.makedirs(clip_dir, exist_ok=True)
    os.makedirs(trainers_dir, exist_ok=True)
    for name in ("__init__.py", "clip.py", "model.py", "simple_tokenizer.py"):
        _link(os.path.join(REFERENCE_ROOT, "clip", name),
              os.path.join(clip_dir, name))
    for name in ("maple.py", "cocoop.py", "coop.py", "vpt.py",
                 "independentVL.py", "zsclip.py", "imagenet_templates.py",
                 "maple_fed.py", "client_datamanager.py",
                 "data_partition.py"):
        _link(os.path.join(REFERENCE_ROOT, "trainers", name),
              os.path.join(trainers_dir, name))
    datasets_dir = os.path.join(HARNESS_DIR, "ref_datasets")
    os.makedirs(datasets_dir, exist_ok=True)
    for name in ("oxford_pets.py", "dtd.py", "eurosat.py", "caltech101.py",
                 "patternnet.py", "ucmerced.py", "imagenet.py"):
        _link(os.path.join(REFERENCE_ROOT, "datasets", name),
              os.path.join(datasets_dir, name))
    for d in (trainers_dir, datasets_dir):
        init = os.path.join(d, "__init__.py")
        if not os.path.exists(init):
            with open(init, "w") as f:
                f.write("")
    bpe_path = os.path.join(clip_dir, "bpe_simple_vocab_16e6.txt.gz")
    if not os.path.exists(bpe_path):
        write_bpe_fixture(bpe_path)

    _install_stubs()
    if HARNESS_DIR not in sys.path:
        sys.path.insert(0, HARNESS_DIR)

    import importlib

    clip_pkg = importlib.import_module("clip")
    ref_trainers = importlib.import_module("ref_trainers")
    # maple_fed.py does ``from trainers.maple import MaPLe`` (absolute name):
    # alias the harness package under that name so the reference file
    # imports ITS OWN sibling, exactly as it does in the reference repo
    sys.modules.setdefault("trainers", ref_trainers)
    maple_mod = importlib.import_module("ref_trainers.maple")
    sys.modules.setdefault("trainers.maple", maple_mod)
    ns = types.SimpleNamespace(
        clip=importlib.import_module("clip.clip"),
        model=importlib.import_module("clip.model"),
        simple_tokenizer=importlib.import_module("clip.simple_tokenizer"),
        maple=maple_mod,
        cocoop=importlib.import_module("ref_trainers.cocoop"),
        coop=importlib.import_module("ref_trainers.coop"),
        vpt=importlib.import_module("ref_trainers.vpt"),
        ivlp=importlib.import_module("ref_trainers.independentVL"),
        zsclip=importlib.import_module("ref_trainers.zsclip"),
        imagenet_templates=importlib.import_module(
            "ref_trainers.imagenet_templates"),
        maple_fed=importlib.import_module("ref_trainers.maple_fed"),
        data_partition=importlib.import_module("ref_trainers.data_partition"),
        oxford_pets=importlib.import_module("ref_datasets.oxford_pets"),
        dtd=importlib.import_module("ref_datasets.dtd"),
        eurosat=importlib.import_module("ref_datasets.eurosat"),
        caltech101=importlib.import_module("ref_datasets.caltech101"),
        patternnet=importlib.import_module("ref_datasets.patternnet"),
        ucmerced=importlib.import_module("ref_datasets.ucmerced"),
        imagenet=importlib.import_module("ref_datasets.imagenet"),
        pkg=clip_pkg,
        bpe_path=bpe_path,
    )
    _cache = ns
    return ns


@contextlib.contextmanager
def fp32_reference():
    """Neutralize the reference's hard-coded ``.half()`` casts so its
    modules execute end-to-end in fp32 (CPU-friendly, tight tolerances).
    Patches ``torch.Tensor.half`` and ``nn.Module.half`` to identity."""
    import torch

    t_half, m_half = torch.Tensor.half, torch.nn.Module.half
    torch.Tensor.half = lambda self: self
    torch.nn.Module.half = lambda self: self
    try:
        yield
    finally:
        torch.Tensor.half = t_half
        torch.nn.Module.half = m_half


@contextlib.contextmanager
def our_tokenizer_with(bpe_path: str):
    """Swap our module-level tokenizer singleton for one loading the
    fixture table, so module-level ``tokenize()`` matches ``clip.tokenize``
    id-for-id inside the context."""
    from federated_multi_modal_tpu.tokenizer import bpe

    old = bpe._tokenizer_singleton
    bpe._tokenizer_singleton = bpe.ClipTokenizer(bpe_path=bpe_path)
    try:
        yield bpe._tokenizer_singleton
    finally:
        bpe._tokenizer_singleton = old


def random_openai_sd(
    *,
    embed_dim=64,
    vision_width=64,
    vision_layers=2,
    patch=8,
    resolution=32,
    text_width=64,
    text_layers=2,
    vocab=100,
    ctx_len=16,
    seed=0,
):
    """Random torch state dict in the OpenAI CLIP (ViT) naming scheme, at
    arbitrary small shapes, for ``build_model`` shape-inference + forward
    goldens (key inventory per ``clip/model.py:750-776``)."""
    import torch

    g = torch.Generator().manual_seed(seed)

    def r(*shape, s=0.02):
        return torch.randn(*shape, generator=g) * s

    grid = resolution // patch
    sd = {
        "visual.conv1.weight": r(vision_width, 3, patch, patch),
        "visual.class_embedding": r(vision_width),
        "visual.positional_embedding": r(grid * grid + 1, vision_width),
        "visual.ln_pre.weight": torch.ones(vision_width),
        "visual.ln_pre.bias": torch.zeros(vision_width),
        "visual.ln_post.weight": torch.ones(vision_width),
        "visual.ln_post.bias": torch.zeros(vision_width),
        "visual.proj": r(vision_width, embed_dim),
        "token_embedding.weight": r(vocab, text_width),
        "positional_embedding": r(ctx_len, text_width, s=0.01),
        "ln_final.weight": torch.ones(text_width),
        "ln_final.bias": torch.zeros(text_width),
        "text_projection": r(text_width, embed_dim, s=text_width ** -0.5),
        "logit_scale": torch.tensor(2.0),
    }
    for prefix, width, layers in (
        ("visual.transformer.resblocks", vision_width, vision_layers),
        ("transformer.resblocks", text_width, text_layers),
    ):
        for i in range(layers):
            p = f"{prefix}.{i}"
            sd[f"{p}.attn.in_proj_weight"] = r(3 * width, width)
            sd[f"{p}.attn.in_proj_bias"] = r(3 * width)
            sd[f"{p}.attn.out_proj.weight"] = r(width, width)
            sd[f"{p}.attn.out_proj.bias"] = r(width)
            sd[f"{p}.ln_1.weight"] = torch.ones(width)
            sd[f"{p}.ln_1.bias"] = torch.zeros(width)
            sd[f"{p}.ln_2.weight"] = torch.ones(width)
            sd[f"{p}.ln_2.bias"] = torch.zeros(width)
            sd[f"{p}.mlp.c_fc.weight"] = r(4 * width, width)
            sd[f"{p}.mlp.c_fc.bias"] = r(4 * width)
            sd[f"{p}.mlp.c_proj.weight"] = r(width, 4 * width)
            sd[f"{p}.mlp.c_proj.bias"] = r(width)
    return sd
