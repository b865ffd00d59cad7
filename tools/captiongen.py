"""Offline BLIP caption generation into a parallel ``captions/`` tree
(rebuild of the reference ``captiongen.py``).

Walks ``<input_dir>/<class>/<image>`` and writes
``<output_dir>/<class>/<image>.txt`` captions with
``Salesforce/blip-image-captioning-base``.  Requires the ``transformers``
weights to be available (downloaded or cached); in air-gapped environments
use ``--placeholder`` to emit template captions from folder names instead.
"""

import argparse
import os


def generate_placeholder(input_dir, output_dir):
    for class_name in sorted(os.listdir(input_dir)):
        class_dir = os.path.join(input_dir, class_name)
        if not os.path.isdir(class_dir):
            continue
        out_dir = os.path.join(output_dir, class_name)
        os.makedirs(out_dir, exist_ok=True)
        text = f"a photo of a {class_name.replace('_', ' ')}"
        for fname in sorted(os.listdir(class_dir)):
            stem = os.path.splitext(fname)[0]
            with open(os.path.join(out_dir, stem + ".txt"), "w") as f:
                f.write(text)
        print(f"{class_name}: placeholder captions written")


def generate_blip(input_dir, output_dir, model_name):
    import torch
    from PIL import Image
    from transformers import BlipForConditionalGeneration, BlipProcessor

    processor = BlipProcessor.from_pretrained(model_name)
    model = BlipForConditionalGeneration.from_pretrained(model_name)
    model.eval()

    for class_name in sorted(os.listdir(input_dir)):
        class_dir = os.path.join(input_dir, class_name)
        if not os.path.isdir(class_dir):
            continue
        out_dir = os.path.join(output_dir, class_name)
        os.makedirs(out_dir, exist_ok=True)
        for fname in sorted(os.listdir(class_dir)):
            out_path = os.path.join(out_dir, os.path.splitext(fname)[0] + ".txt")
            if os.path.exists(out_path):
                continue
            image = Image.open(os.path.join(class_dir, fname)).convert("RGB")
            inputs = processor(image, return_tensors="pt")
            with torch.no_grad():
                out = model.generate(**inputs, max_new_tokens=30)
            caption = processor.decode(out[0], skip_special_tokens=True)
            with open(out_path, "w") as f:
                f.write(caption)
        print(f"{class_name}: captions written")


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("input_dir", type=str, help="dataset image tree")
    parser.add_argument("output_dir", type=str, help="parallel caption tree")
    parser.add_argument(
        "--model", type=str, default="Salesforce/blip-image-captioning-base"
    )
    parser.add_argument(
        "--placeholder", action="store_true",
        help="emit classname-template captions (no model download needed)",
    )
    args = parser.parse_args()

    if args.placeholder:
        generate_placeholder(args.input_dir, args.output_dir)
    else:
        generate_blip(args.input_dir, args.output_dir, args.model)


if __name__ == "__main__":
    main()
