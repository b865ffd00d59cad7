"""Convert reference (PyTorch/Dassl) checkpoints into this framework's
format, so models trained with the original ``federated_multi_modal`` stack
can be evaluated or fine-tuned here directly.

Name mapping (reference torch module names -> our flat pytree names):

MaPLe / MaPLeFederated (full CustomCLIP state dict, ``trainers/maple.py``):
  prompt_learner.ctx                                -> prompt_learner.ctx
  prompt_learner.proj_lang_to_vis.{weight,bias}     -> prompt_learner.proj_lang_to_vis.{w^T,b}
  prompt_learner.proj_vis_to_lang.{weight,bias}     -> prompt_learner.proj_vis_to_lang.{w^T,b}
  prompt_learner.compound_prompts_text_parameters.k -> prompt_learner.text_deep_params.k
  prompt_learner.visual_deep_prompts_parameters.k   -> prompt_learner.vis_deep_params.k
  prompt_learner.compound_prompt_projections.i.*    -> prompt_learner.couplers.i.{w^T,b}
  image_encoder.*  (ViT naming)                     -> clip.visual.*
  text_encoder.*                                    -> clip.text.*
  token_prefix / token_suffix                       -> dropped (re-derived
                                                       from classnames at load)
  clip_model2.* / tokenized_prompts / logit_scale   -> dropped (frozen dupes)

CoOp / CoCoOp / IVLP / VPT (prompt-learner-only state dicts): the learner
tensors map 1:1 (linear weights transposed); ``VPT``-named vision prompts
map into the ``vpt`` subtree.

Usage::

    python tools/convert_reference_checkpoint.py --trainer MaPLe \
        model.pth.tar-9 converted/MultiModalPromptLearner/model.pth.tar-9
"""

from __future__ import annotations

import argparse
import os
import re

import numpy as np


def _np(t):
    try:
        return np.asarray(t.detach().cpu().float().numpy())
    except AttributeError:
        return np.asarray(t, dtype=np.float32)


# Single source of truth for both conversion directions (the reverse
# tables used to be hand-transcribed inverses and could silently drift):
#   our block-leaf name -> (reference block-leaf name, transpose?)
_BLOCK_LEAVES = {
    "attn.w_qkv": ("attn.in_proj_weight", True),
    "attn.b_qkv": ("attn.in_proj_bias", False),
    "attn.w_out": ("attn.out_proj.weight", True),
    "attn.b_out": ("attn.out_proj.bias", False),
    "ln_1.scale": ("ln_1.weight", False),
    "ln_1.bias": ("ln_1.bias", False),
    "ln_2.scale": ("ln_2.weight", False),
    "ln_2.bias": ("ln_2.bias", False),
    "mlp.w_fc": ("mlp.c_fc.weight", True),
    "mlp.b_fc": ("mlp.c_fc.bias", False),
    "mlp.w_proj": ("mlp.c_proj.weight", True),
    "mlp.b_proj": ("mlp.c_proj.bias", False),
}

#   our full leaf name -> reference full leaf name (no transpose)
_SIMPLE_LEAVES = {
    "clip.visual.ln_pre.scale": "image_encoder.ln_pre.weight",
    "clip.visual.ln_pre.bias": "image_encoder.ln_pre.bias",
    "clip.visual.ln_post.scale": "image_encoder.ln_post.weight",
    "clip.visual.ln_post.bias": "image_encoder.ln_post.bias",
    "clip.visual.class_embedding": "image_encoder.class_embedding",
    "clip.visual.positional_embedding":
        "image_encoder.positional_embedding",
    "clip.visual.proj": "image_encoder.proj",
    "clip.text.ln_final.scale": "text_encoder.ln_final.weight",
    "clip.text.ln_final.bias": "text_encoder.ln_final.bias",
    "clip.text.positional_embedding": "text_encoder.positional_embedding",
    "clip.text.text_projection": "text_encoder.text_projection",
}


def _block_map(src, dst, i, sd, out):
    for ours, (theirs, transpose) in _BLOCK_LEAVES.items():
        k = f"{src}.{theirs}"
        if k in sd:
            v = _np(sd[k])
            out[f"{dst}.{ours}"] = v.T if transpose else v


def convert_maple(sd) -> dict:
    out = {}
    for k, v in sd.items():
        if k.startswith("prompt_learner."):
            sub = k[len("prompt_learner."):]
            if sub in ("token_prefix", "token_suffix"):
                continue
            if sub == "ctx":
                out["prompt_learner.ctx"] = _np(v)
            elif m := re.match(r"proj_(lang_to_vis|vis_to_lang)\.(weight|bias)", sub):
                which, wb = m.groups()
                name = f"prompt_learner.proj_{which}." + ("w" if wb == "weight" else "b")
                out[name] = _np(v).T if wb == "weight" else _np(v)
            elif m := re.match(r"compound_prompts_text_parameters\.(\d+)", sub):
                out[f"prompt_learner.text_deep_params.{m.group(1)}"] = _np(v)
            elif m := re.match(r"visual_deep_prompts_parameters\.(\d+)", sub):
                out[f"prompt_learner.vis_deep_params.{m.group(1)}"] = _np(v)
            elif m := re.match(r"compound_prompt_projections\.(\d+)\.(weight|bias)", sub):
                i, wb = m.groups()
                name = f"prompt_learner.couplers.{i}." + ("w" if wb == "weight" else "b")
                out[name] = _np(v).T if wb == "weight" else _np(v)
            # clip_model2 duplicates and anything else: skip

    # encoder weights (LNs everywhere + the trained last blocks)
    for k in sd:
        m = re.match(r"image_encoder\.transformer\.resblocks\.(\d+)\.", k)
        if m:
            i = int(m.group(1))
            _block_map(
                f"image_encoder.transformer.resblocks.{i}",
                f"clip.visual.blocks.{i}", i, sd, out,
            )
        m = re.match(r"text_encoder\.transformer\.resblocks\.(\d+)\.", k)
        if m:
            i = int(m.group(1))
            _block_map(
                f"text_encoder.transformer.resblocks.{i}",
                f"clip.text.blocks.{i}", i, sd, out,
            )
    simple = {theirs: ours for ours, theirs in _SIMPLE_LEAVES.items()}
    for src, dst in simple.items():
        if src in sd:
            out[dst] = _np(sd[src])
    if "image_encoder.conv1.weight" in sd:
        w = _np(sd["image_encoder.conv1.weight"])  # (O, 3, P, P)
        out["clip.visual.conv1.w"] = w.transpose(2, 3, 1, 0).reshape(-1, w.shape[0])
    return out


def export_maple(flat, skipped=None) -> dict:
    """Inverse of :func:`convert_maple`: our flat dotted-name numpy state
    dict -> a torch-named ``CustomCLIP`` state dict the reference loads via
    its OWN prefix/suffix-drop contract
    (``/root/reference/trainers/maple.py:683-716``,
    ``load_state_dict(strict=False)`` on the registered full model).
    Makes the accuracy-parity pillar runnable in BOTH directions: models
    trained here can be evaluated by the original stack.

    Caption-branch leaves (``caption_pool_w``/``caption_proj``) are
    collected into ``skipped`` instead of exported: the reference has no
    trained caption parameters to map to — it draws its caption projection
    randomly on EVERY forward inside the image encoder
    (``/root/reference/clip/model.py``; documented deviation, see
    ``trainers/maple.py`` module docstring)."""
    out = {}
    if skipped is None:
        skipped = []
    for k, v in flat.items():
        v = _np(v)
        if k.startswith("prompt_learner."):
            sub = k[len("prompt_learner."):]
            if sub.startswith(("caption_pool_w", "caption_proj")):
                skipped.append(k)
                continue
            if sub in ("token_prefix", "token_suffix"):
                # class-conditioned buffers: exported verbatim (the
                # reference's own save carries them; its load deletes them)
                out[k] = v
            elif sub == "ctx":
                out[k] = v
            elif m := re.match(r"proj_(lang_to_vis|vis_to_lang)\.(w|b)", sub):
                which, wb = m.groups()
                name = (f"prompt_learner.proj_{which}."
                        + ("weight" if wb == "w" else "bias"))
                out[name] = v.T if wb == "w" else v
            elif m := re.match(r"text_deep_params\.(\d+)", sub):
                out["prompt_learner.compound_prompts_text_parameters."
                    f"{m.group(1)}"] = v
            elif m := re.match(r"vis_deep_params\.(\d+)", sub):
                out["prompt_learner.visual_deep_prompts_parameters."
                    f"{m.group(1)}"] = v
            elif m := re.match(r"couplers\.(\d+)\.(w|b)", sub):
                i, wb = m.groups()
                name = (f"prompt_learner.compound_prompt_projections.{i}."
                        + ("weight" if wb == "w" else "bias"))
                out[name] = v.T if wb == "w" else v
            else:
                raise KeyError(f"no reference mapping for {k!r}")
        elif m := re.match(r"clip\.(visual|text)\.blocks\.(\d+)\.(.+)", k):
            tower, i, leaf = m.groups()
            if leaf not in _BLOCK_LEAVES:
                raise KeyError(f"no reference mapping for {k!r}")
            name, transpose = _BLOCK_LEAVES[leaf]
            enc = "image_encoder" if tower == "visual" else "text_encoder"
            out[f"{enc}.transformer.resblocks.{i}.{name}"] = (
                v.T if transpose else v
            )
        elif k in _SIMPLE_LEAVES:
            out[_SIMPLE_LEAVES[k]] = v
        elif k == "clip.visual.conv1.w":
            # (P*P*3, O) matmul kernel back to torch conv (O, 3, P, P)
            o = v.shape[1]
            p = int(round((v.shape[0] // 3) ** 0.5))
            assert p * p * 3 == v.shape[0], v.shape
            out["image_encoder.conv1.weight"] = (
                v.reshape(p, p, 3, o).transpose(3, 2, 0, 1)
            )
        else:
            raise KeyError(f"no reference mapping for {k!r}")
    return out


def convert_prompt_learner_only(sd, trainer: str) -> dict:
    """CoOp / CoCoOp / IVLP / VPT register only the prompt learner."""
    out = {}
    for k, v in sd.items():
        if k in ("token_prefix", "token_suffix"):
            continue
        if k == "ctx":
            out["prompt_learner.ctx"] = _np(v)
        elif m := re.match(r"meta_net\.(linear[12])\.(weight|bias)", k):
            lin, wb = m.groups()
            name = f"prompt_learner.meta_net.{lin}." + ("w" if wb == "weight" else "b")
            out[name] = _np(v).T if wb == "weight" else _np(v)
        elif "VPT" in k:
            # reference stores shallow VPT on the vision tower and per-layer
            # VPT_shallow params inside blocks; map indices in encounter order
            out.setdefault("_vpt_raw", []).append((k, _np(v)))
        else:
            out[f"prompt_learner.{k}"] = _np(v)

    raw = out.pop("_vpt_raw", [])
    if raw:
        raw.sort()
        shallow = [v for k, v in raw if ".resblocks." not in k]
        deep = [v for k, v in raw if ".resblocks." in k]
        if shallow:
            out["vpt.shallow"] = shallow[0]
        for j, v in enumerate(deep):
            out[f"vpt.deep.{j}"] = v
    return out


def export_prompt_learner_only(flat, trainer: str) -> dict:
    """Inverse of :func:`convert_prompt_learner_only` for CoOp / CoCoOp /
    IVLP: our flat names back to the reference prompt-learner module names
    (``trainers/coop.py`` registers ``prompt_learner`` only; its
    ``load_model`` drops token_prefix/suffix and loads ``strict=False``
    like MaPLe's).  VPT is NOT reversible: the forward map flattens the
    reference's VPT names in encounter order, discarding the originals."""
    out = {}
    for k, v in flat.items():
        v = _np(v)
        if k.startswith("vpt."):
            raise KeyError(
                f"cannot reverse-export {k!r}: the forward VPT map is "
                "encounter-order lossy (reference names discarded)"
            )
        if not k.startswith("prompt_learner."):
            raise KeyError(f"no reference mapping for {k!r} "
                           f"({trainer} registers prompt_learner only)")
        sub = k[len("prompt_learner."):]
        if m := re.match(r"meta_net\.(linear[12])\.(w|b)", sub):
            lin, wb = m.groups()
            name = f"meta_net.{lin}." + ("weight" if wb == "w" else "bias")
            out[name] = v.T if wb == "w" else v
        else:
            # ctx, token_prefix/suffix and the generic IVLP passthrough
            # tensors were stored verbatim by the forward map
            out[sub] = v
    return out


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("src", help="reference .pth.tar checkpoint "
                                    "(--reverse: OUR checkpoint)")
    parser.add_argument("dst", help="output checkpoint path")
    parser.add_argument("--trainer", default="MaPLe",
                        choices=["MaPLe", "CoOp", "CoCoOp", "IVLP", "VPT"])
    parser.add_argument("--reverse", action="store_true",
                        help="export OUR checkpoint to a torch-named "
                             "reference checkpoint the original stack's "
                             "load_model accepts (MaPLe: full CustomCLIP "
                             "names, trainers/maple.py:683-716; CoOp/"
                             "CoCoOp/IVLP: prompt-learner names; VPT is "
                             "not reversible)")
    args = parser.parse_args()

    import torch

    if args.reverse:
        if args.trainer == "VPT":
            parser.error("--reverse cannot target VPT (the forward VPT "
                         "map is encounter-order lossy)")
        import pickle

        with open(args.src, "rb") as f:
            ours = pickle.load(f)
        sd_np = ours.get("state_dict", ours)
        skipped = []
        if args.trainer == "MaPLe":
            exported = export_maple(sd_np, skipped=skipped)
        else:
            exported = export_prompt_learner_only(sd_np, args.trainer)
        sd_torch = {
            k: torch.from_numpy(np.array(v, copy=True))
            for k, v in exported.items()
        }
        if skipped:
            print(f"Skipped {len(skipped)} caption-branch tensor(s) with "
                  f"no reference counterpart: {skipped}")
        os.makedirs(os.path.dirname(args.dst) or ".", exist_ok=True)
        torch.save({
            "epoch": ours.get("epoch", 0),
            "state_dict": sd_torch,
            "optimizer": None,
            "scheduler": None,
            "val_result": ours.get("val_result"),
            "exported_from": args.src,
        }, args.dst)
        print(f"Exported {len(sd_torch)} tensors -> {args.dst}")
        return

    ckpt = torch.load(args.src, map_location="cpu", weights_only=False)
    sd = ckpt.get("state_dict", ckpt)

    if args.trainer == "MaPLe":
        flat = convert_maple(sd)
    else:
        flat = convert_prompt_learner_only(sd, args.trainer)

    os.makedirs(os.path.dirname(args.dst) or ".", exist_ok=True)
    import pickle

    payload = {
        "epoch": ckpt.get("epoch", 0),
        "state_dict": flat,
        "optimizer": None,
        "scheduler": None,
        "val_result": ckpt.get("val_result"),
        "cfg": None,
        "converted_from": args.src,
    }
    with open(args.dst, "wb") as f:
        pickle.dump(payload, f, protocol=pickle.HIGHEST_PROTOCOL)
    print(f"Converted {len(flat)} tensors -> {args.dst}")


if __name__ == "__main__":
    main()
