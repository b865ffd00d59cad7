"""Benchmark: MaPLe fine-tune throughput (images/sec/chip) on TPU.

Measures the full jitted training step — fused on-device preprocessing
(uint8 canvas -> bicubic crop-resize + flip + CLIP-normalize), ViT-B/16
image tower + text tower with deep multi-modal prompt coupling and the
caption branch, CE + alignment loss, backward, SGD update with grad clip —
i.e. everything the reference's ``forward_backward``
(``trainers/maple.py:547-627``) does per batch.

Dispatch modes:

* ``scan`` (default): one jitted ``lax.scan`` runs all steps on device —
  fresh random-resized-crop boxes/flips are sampled **on device** per step
  (``ops/preprocess.py::sample_rrc_boxes_jax``), so the loop makes zero
  host round-trips.  This measures what the chip can actually sustain
  with no host in the loop (~427 ms/step at batch 512 on a v5e).
* ``python``: per-step python dispatch with donated buffers.  JAX's async
  dispatch pipelines the tunnel latency behind device execution, so on
  this container it lands within noise of ``scan`` — but it depends on
  the host keeping up, which ``scan`` does not.

Baseline (BASELINE.md): the reference trains MaPLe on ImageNet 16-shot
(16,000 images) for 5 epochs in ~1 hour on one A100 => ~22.2 images/sec.
``vs_baseline`` is the multiple of that number.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import argparse
import json
import sys
import time

import numpy as np

A100_BASELINE_IPS = 16000 * 5 / 3600.0  # ~22.2 img/s (docs/RUN.md:8-10)


def main():
    parser = argparse.ArgumentParser()
    # defaults mirror the baseline workload: the A100 number was
    # measured on ImageNet (1000 classes); batch 512 is the v5e
    # throughput-optimal point without remat (the text tower's exact
    # EOT-truncation keeps its activations small enough)
    parser.add_argument("--batch-size", type=int, default=512)
    parser.add_argument("--n-cls", type=int, default=1000)
    parser.add_argument("--steps", type=int, default=30)
    parser.add_argument("--no-captions", action="store_true")
    parser.add_argument("--depth", type=int, default=9)
    parser.add_argument("--remat", action="store_true",
                        help="rematerialize blocks (bigger batches)")
    parser.add_argument("--attention", choices=["xla", "pallas"],
                        default="pallas",
                        help="attention impl (pallas = packed-QKV fused "
                             "kernels on the unmasked vision path)")
    parser.add_argument("--dispatch", choices=["scan", "python"],
                        default="scan",
                        help="scan = all steps in one on-device lax.scan; "
                             "python = per-step host dispatch")
    parser.add_argument("--warmup", type=int, default=5,
                        help="warmup dispatches (python mode only; scan "
                             "mode warms up with one full scan)")
    parser.add_argument("--backbone", default="ViT-B/16",
                        help="backbone catalog entry (Tiny for CI-scale "
                             "smoke runs)")
    parser.add_argument("--platform", choices=["default", "cpu"],
                        default="default",
                        help="cpu forces the host platform (e.g. with "
                             "XLA_FLAGS=--xla_force_host_platform_device_"
                             "count=8 to exercise the data-parallel path)")
    args = parser.parse_args()

    import jax

    if args.platform == "cpu":
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from federated_multi_modal_tpu.flagship import build_maple_program
    from federated_multi_modal_tpu.config import get_cfg_default
    from federated_multi_modal_tpu.engine.optim import build_optimizer
    from federated_multi_modal_tpu.ops.preprocess import (
        crop_resize_flip_normalize,
        sample_rrc_boxes,
        sample_rrc_boxes_jax,
    )
    from federated_multi_modal_tpu.tokenizer import tokenize

    from federated_multi_modal_tpu.ops.primitives import set_attention_impl

    set_attention_impl(args.attention)

    use_captions = not args.no_captions
    classnames = [f"class {i}" for i in range(args.n_cls)]
    prog = build_maple_program(
        backbone=args.backbone,
        classnames=classnames,
        depth=args.depth,
        use_captions=use_captions,
        remat=args.remat,
    )

    cfg = get_cfg_default()
    cfg.OPTIM.LR = 0.0026
    tx = build_optimizer(cfg.OPTIM)
    opt_state = tx.init(prog["trainable"])
    loss_fn = prog["loss_fn"]

    out_size = prog["arch"].image_resolution

    def one_step(trainable, frozen, opt_state, canvas, boxes, flips, labels,
                 caption_tokens):
        images = crop_resize_flip_normalize(
            canvas, boxes, flips, out_size=out_size
        )
        batch = {"image": images, "label": labels}
        if use_captions:
            batch["caption_tokens"] = caption_tokens

        def wrapped(tr):
            return loss_fn(tr, frozen, batch)

        (loss, _), grads = jax.value_and_grad(wrapped, has_aux=True)(trainable)
        updates, opt_state = tx.update(grads, opt_state, trainable)
        trainable = jax.tree_util.tree_map(
            lambda p, u: p if u is None else p + u,
            trainable, updates, is_leaf=lambda x: x is None,
        )
        return trainable, opt_state, loss

    rng = np.random.default_rng(0)
    B = args.batch_size
    canvas = jnp.asarray(rng.integers(0, 255, (B, 256, 256, 3), np.uint8))
    labels = jnp.asarray(rng.integers(0, args.n_cls, B), jnp.int32)
    captions = jnp.asarray(
        tokenize(["a satellite photo of a scene"] * B)
    )
    frozen = prog["frozen"]

    # data parallelism over every visible chip: batch sharded along a 1-D
    # "data" mesh, params replicated — GSPMD inserts the gradient
    # all-reduce over ICI.  On one chip this is a no-op, so the same
    # bench scales to whatever slice it lands on; the reported metric
    # stays PER-CHIP.
    n_dev = jax.device_count()
    if n_dev > 1 and B % n_dev == 0:
        from jax.sharding import Mesh, NamedSharding, PartitionSpec

        mesh = Mesh(np.asarray(jax.devices()), ("data",))
        batch_sharding = NamedSharding(mesh, PartitionSpec("data"))
        canvas = jax.device_put(canvas, batch_sharding)
        labels = jax.device_put(labels, batch_sharding)
        captions = jax.device_put(captions, batch_sharding)
        print(f"# data-parallel over {n_dev} devices", file=sys.stderr)
    else:
        n_dev = 1

    if args.dispatch == "scan":
        # whole training loop on device: scan over steps, sampling fresh
        # augmentation parameters from the carried PRNG key each step
        # `frozen` must be an ARGUMENT (not a closure): baking it into the
        # HLO as constants blows the remote-compile HTTP limit (CLAUDE.md)
        def run(trainable, frozen, opt_state, key, canvas, labels,
                caption_tokens):
            def body(carry, _):
                trainable, opt_state, key = carry
                key, sub = jax.random.split(key)
                boxes, flips = sample_rrc_boxes_jax(sub, B)
                trainable, opt_state, loss = one_step(
                    trainable, frozen, opt_state, canvas, boxes, flips,
                    labels, caption_tokens,
                )
                return (trainable, opt_state, key), loss

            (trainable, opt_state, _), losses = jax.lax.scan(
                body, (trainable, opt_state, key), length=args.steps
            )
            return trainable, opt_state, losses[-1]

        runner = jax.jit(run, donate_argnums=(0, 2))
        key = jax.random.PRNGKey(0)
        # warmup: compile + one full execution
        tr_w, os_w, loss = runner(
            prog["trainable"], frozen, opt_state, key, canvas, labels,
            captions,
        )
        jax.device_get(loss)  # tunnel: block_until_ready returns early

        t0 = time.time()
        tr_w, os_w, loss = runner(tr_w, frozen, os_w, key, canvas, labels,
                                  captions)
        loss_val = float(jax.device_get(loss))
        dt = time.time() - t0
    else:
        step = jax.jit(one_step, donate_argnums=(0, 2))
        boxes_np, flips_np = sample_rrc_boxes(rng, B)
        boxes = jnp.asarray(boxes_np)
        flips = jnp.asarray(flips_np)
        trainable, opt_state_l = prog["trainable"], opt_state
        for _ in range(args.warmup):
            trainable, opt_state_l, loss = step(
                trainable, frozen, opt_state_l, canvas, boxes, flips, labels,
                captions,
            )
        jax.device_get(loss)

        t0 = time.time()
        for _ in range(args.steps):
            trainable, opt_state_l, loss = step(
                trainable, frozen, opt_state_l, canvas, boxes, flips, labels,
                captions,
            )
        loss_val = float(jax.device_get(loss))
        dt = time.time() - t0

    ips = args.steps * B / dt / n_dev
    result = {
        "metric": "maple_train_images_per_sec_per_chip",
        "value": round(ips, 2),
        "unit": "images/sec/chip",
        "vs_baseline": round(ips / A100_BASELINE_IPS, 2),
    }
    print(json.dumps(result))
    print(
        f"# batch={B} n_cls={args.n_cls} steps={args.steps} "
        f"dispatch={args.dispatch} devices={n_dev} wall={dt:.2f}s "
        f"loss={loss_val:.4f} device={jax.devices()[0]}",
        file=sys.stderr,
    )


if __name__ == "__main__":
    main()
