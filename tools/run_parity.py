"""One-command HM-accuracy parity runbook (round-4 verdict task 4).

The reference's headline claim is base-to-new HM accuracy with OpenAI CLIP
weights (``/root/reference/README.md:101``: zero-shot CLIP averages 69.34
over the base-to-novel suite; MaPLe improves the HM).  In an air-gapped
container that pillar is environment-blocked (no weights, no BPE merge
table) — this tool makes it a SINGLE command the day they appear, and a
skip-tolerant smoke run today so the orchestration itself stays tested.

Stages (each PASS / SKIP(reason) / FAIL; exit 0 iff nothing FAILED):

  1. environment — resolve the BPE merge table (``--bpe`` or
     ``FMM_TPU_BPE_PATH``) and CLIP weights (``--weights`` path); decide
     ``full`` vs ``smoke`` mode (``--smoke`` forces smoke).
  2. tokenizer — full: id-for-id golden of our BPE against the EXECUTED
     reference ``SimpleTokenizer`` on a string battery (same merge table,
     ``/root/reference/clip/simple_tokenizer.py:62-130``), falling back to
     the embedded public-vocabulary golden + structural invariants when
     the reference tree isn't importable; smoke: fallback-vocab
     determinism + specials.
  3. weights — full: convert the torch checkpoint
     (``models/params.py::load_torch_state_dict`` +
     ``convert_torch_state_dict``) and report the inferred architecture;
     smoke: skipped (CLIP-init random params keep later stages runnable).
  4. zeroshot — ``train.py --trainer ZeroshotCLIP --eval-only`` per
     dataset; in full mode the measured average is compared against the
     published 69.34 (``--expect-zeroshot``, tolerance ``--zeroshot-tol``)
     when the requested dataset list covers the reference suite.
  5. base2new — the REAL ``scripts/maple/base2new_train_maple.sh`` +
     ``base2new_test_maple.sh`` per dataset (train on base classes, test
     on new classes — ``/root/reference/scripts/maple/
     base2new_train_maple.sh:16-38``).
  6. hm-parse — ``tools/parse_test_res.py --base2new --test-log`` over
     the produced tree; reports the harmonic-mean line.

Smoke mode (this container): Tiny backbone + Synthetic dataset + fallback
vocabulary + random weights, CPU platform — the exact stage graph, toy
shapes.  Full mode (weights + merge table present): ViT-B/16 on the real
datasets on the default (TPU) platform.
"""

from __future__ import annotations

import argparse
import os
import os.path as osp
import re
import subprocess
import sys

REPO = osp.dirname(osp.dirname(osp.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

# Public OpenAI CLIP vocabulary golden (ids widely documented; sot=49406,
# eot=49407).  Used only when the reference tokenizer is not importable.
EMBEDDED_GOLDEN = {
    "a photo of a cat": [49406, 320, 1125, 539, 320, 2368, 49407],
    "a photo of a dog": [49406, 320, 1125, 539, 320, 1929, 49407],
}

# The reference evaluates base-to-novel on this suite (README.md:101 table;
# scripts/maple/base2new_*.sh loop over these dataset config names).
REFERENCE_SUITE = (
    "imagenet", "caltech101", "oxford_pets", "stanford_cars",
    "oxford_flowers", "food101", "fgvc_aircraft", "sun397", "dtd",
    "eurosat", "ucf101",
)


class Stage:
    def __init__(self):
        self.results = []  # (name, status, detail)

    def record(self, name, status, detail=""):
        self.results.append((name, status, detail))
        print(f"[{status}] {name}" + (f" — {detail}" if detail else ""),
              flush=True)

    @property
    def failed(self):
        return any(s == "FAIL" for _, s, _ in self.results)


def run_cmd(cmd, env=None, timeout=7200, cwd=REPO):
    merged = dict(os.environ)
    merged.update(env or {})
    return subprocess.run(
        cmd, env=merged, cwd=cwd, capture_output=True, text=True,
        timeout=timeout,
    )


# ---------------------------------------------------------------------------
# stage 2: tokenizer
# ---------------------------------------------------------------------------

TOKENIZER_BATTERY = [
    "a photo of a cat",
    "a photo of a dog",
    "This is a CLIP tokenizer parity check!",
    "satellite imagery of farmland, 2023 edition",
    "the quick brown fox jumps over the lazy dog",
    "  whitespace   and   CASE  Normalisation  ",
    "hyphenated-words and apostrophe's",
]


def stage_tokenizer(st, bpe_path, reference_dir):
    from federated_multi_modal_tpu.tokenizer.bpe import (
        VOCAB_SIZE,
        ClipTokenizer,
    )

    if not bpe_path:
        # smoke: the deterministic fallback vocabulary
        tok = ClipTokenizer(bpe_path="/nonexistent")
        assert tok.fallback_mode
        ids = tok.encode("hello world")
        assert ids == tok.encode("hello world")
        assert tok.decode(ids).strip() == "hello world"
        st.record("tokenizer", "SKIP",
                  "no BPE merge table (FMM_TPU_BPE_PATH unset) — fallback "
                  "vocabulary determinism checked instead")
        return

    tok = ClipTokenizer(bpe_path=bpe_path)
    if tok.fallback_mode:
        st.record("tokenizer", "FAIL", f"could not load merge table {bpe_path}")
        return

    # structural invariants of the real vocabulary
    sot, eot = tok.encoder["<|startoftext|>"], tok.encoder["<|endoftext|>"]
    if (len(tok.encoder), sot, eot) != (VOCAB_SIZE, 49406, 49407):
        st.record("tokenizer", "FAIL",
                  f"vocab structure off: size={len(tok.encoder)} sot={sot} "
                  f"eot={eot} (want {VOCAB_SIZE}/49406/49407)")
        return

    # preferred golden: execute the reference tokenizer with the same table
    ref_tok = None
    if reference_dir and osp.isdir(osp.join(reference_dir, "clip")):
        try:
            sys.path.insert(0, reference_dir)
            from clip.simple_tokenizer import SimpleTokenizer  # type: ignore

            ref_tok = SimpleTokenizer(bpe_path=bpe_path)
        except Exception as e:  # missing reference deps — not a parity fail
            print(f"# reference tokenizer not importable ({e}); "
                  "using the embedded public golden", file=sys.stderr)
        finally:
            if sys.path and sys.path[0] == reference_dir:
                sys.path.pop(0)

    if ref_tok is not None:
        for s in TOKENIZER_BATTERY:
            ours, theirs = tok.encode(s), ref_tok.encode(s)
            if ours != theirs:
                st.record("tokenizer", "FAIL",
                          f"id mismatch on {s!r}: ours={ours} ref={theirs}")
                return
        st.record("tokenizer", "PASS",
                  f"id-for-id vs the executed reference on "
                  f"{len(TOKENIZER_BATTERY)} strings")
        return

    for s, want in EMBEDDED_GOLDEN.items():
        got = [49406] + tok.encode(s) + [49407]
        if got != want:
            st.record("tokenizer", "FAIL",
                      f"embedded golden mismatch on {s!r}: {got} != {want}")
            return
    st.record("tokenizer", "PASS",
              "embedded public-vocabulary golden + structural invariants "
              "(reference tree not importable)")


# ---------------------------------------------------------------------------
# stage 3: weights
# ---------------------------------------------------------------------------

def stage_weights(st, weights):
    if not weights:
        st.record("weights", "SKIP",
                  "no CLIP checkpoint (--weights) — later stages use "
                  "CLIP-init random parameters")
        return None
    from federated_multi_modal_tpu.models.params import (
        convert_torch_state_dict,
        infer_config_from_state_dict,
        load_torch_state_dict,
    )

    sd = load_torch_state_dict(weights)
    arch = infer_config_from_state_dict(sd)
    params = convert_torch_state_dict(sd, arch)
    import jax

    n = sum(x.size for x in jax.tree_util.tree_leaves(params))
    st.record("weights", "PASS",
              f"converted {osp.basename(weights)}: "
              f"vision_layers={arch.vision_layers} width={arch.vision_width} "
              f"embed={arch.embed_dim} ({n / 1e6:.1f}M params)")
    return arch


# ---------------------------------------------------------------------------
# stage 4: zeroshot
# ---------------------------------------------------------------------------

def zeroshot_one(dataset, args, smoke, env):
    out_dir = osp.join(args.output_dir, "zeroshot", dataset)
    cmd = [
        sys.executable, osp.join(REPO, "train.py"),
        "--root", args.root,
        "--trainer", "ZeroshotCLIP",
        "--dataset-config-file", f"configs/datasets/{dataset}.yaml",
        "--config-file", f"configs/trainers/CoOp/{args.zs_cfg}.yaml",
        "--output-dir", out_dir,
        "--eval-only",
    ]
    if args.weights:
        cmd += ["MODEL.BACKBONE.WEIGHTS_PATH", args.weights]
    if smoke:
        cmd += ["MODEL.BACKBONE.NAME", "Tiny", "INPUT.SIZE", "(32, 32)",
                "DATALOADER.TEST.BATCH_SIZE", "8", "VERBOSE", "False"]
    res = run_cmd(cmd, env=env, timeout=args.timeout)
    if res.returncode != 0:
        return None, res
    m = re.findall(r"\* accuracy: ([\d.]+)%", res.stdout)
    return (float(m[-1]) if m else None), res


def stage_zeroshot(st, args, smoke, env):
    accs = {}
    for ds in args.datasets:
        acc, res = zeroshot_one(ds, args, smoke, env)
        if acc is None:
            st.record(f"zeroshot:{ds}", "FAIL",
                      (res.stderr or res.stdout)[-500:])
            return
        accs[ds] = acc
        st.record(f"zeroshot:{ds}", "PASS", f"accuracy {acc:.2f}%")
    avg = sum(accs.values()) / len(accs)
    if smoke:
        st.record("zeroshot", "PASS",
                  f"smoke average {avg:.2f}% (random weights; no "
                  "expectation applies)")
        return
    covers_suite = set(REFERENCE_SUITE) <= set(args.datasets)
    if covers_suite:
        ok = abs(avg - args.expect_zeroshot) <= args.zeroshot_tol
        st.record(
            "zeroshot", "PASS" if ok else "FAIL",
            f"suite average {avg:.2f}% vs published "
            f"{args.expect_zeroshot} (±{args.zeroshot_tol}; reference "
            "README.md:101)")
    else:
        st.record("zeroshot", "PASS",
                  f"average {avg:.2f}% over {len(accs)} dataset(s) — "
                  f"published suite average is {args.expect_zeroshot} over "
                  f"{len(REFERENCE_SUITE)} datasets (run them all to "
                  "assert it)")


# ---------------------------------------------------------------------------
# stages 5+6: base2new + HM parse
# ---------------------------------------------------------------------------

def stage_base2new(st, args, smoke, env):
    outroot = osp.join(args.output_dir, "b2n")
    script_env = dict(env)
    script_env.update(
        DATA=args.root, OUTROOT=outroot, CFG=args.b2n_cfg,
        SHOTS=str(args.shots), LOADEP=str(args.epochs),
    )
    overrides = []
    if args.weights:
        overrides += ["MODEL.BACKBONE.WEIGHTS_PATH", args.weights]
    if smoke:
        overrides += [
            "MODEL.BACKBONE.NAME", "Tiny", "INPUT.SIZE", "(32, 32)",
            "INPUT.CANVAS_SIZE", "40", "TRAINER.MAPLE.PROMPT_DEPTH", "3",
            "TRAINER.MAPLE.PREC", "fp32", "DATALOADER.TEST.BATCH_SIZE", "8",
            "TPU.DATA_PARALLEL", "False", "VERBOSE", "False",
        ]
    overrides += ["OPTIM.MAX_EPOCH", str(args.epochs)]

    for ds in args.datasets:
        for script in ("base2new_train_maple.sh", "base2new_test_maple.sh"):
            res = run_cmd(
                ["bash", osp.join(REPO, "scripts", "maple", script),
                 ds, str(args.seed)] + overrides,
                env=script_env, timeout=args.timeout,
            )
            if res.returncode != 0:
                st.record(f"base2new:{ds}", "FAIL",
                          f"{script}: {(res.stderr or res.stdout)[-500:]}")
                return None
        st.record(f"base2new:{ds}", "PASS")

    # HM parse per dataset over the base/new pair (the reference's
    # parse_test_res --base2new contract)
    hms = {}
    for ds in args.datasets:
        agg = osp.join(args.output_dir, "agg", ds)
        os.makedirs(agg, exist_ok=True)
        for sub, split in (("base", "train_base"), ("new", "test_new")):
            target = osp.join(outroot, "base2new", split, ds,
                              f"shots_{args.shots}", "MaPLe", args.b2n_cfg)
            link = osp.join(agg, sub)
            if not osp.exists(link):
                os.symlink(target, link)
        res = run_cmd(
            [sys.executable, osp.join(REPO, "tools", "parse_test_res.py"),
             agg, "--base2new", "--test-log"],
            timeout=300,
        )
        m = re.search(r"\* H: ([\d.]+)%", res.stdout)
        if res.returncode != 0 or not m:
            st.record(f"hm-parse:{ds}", "FAIL",
                      (res.stderr or res.stdout)[-500:])
            return None
        hms[ds] = float(m.group(1))
        st.record(f"hm-parse:{ds}", "PASS", f"H = {hms[ds]:.2f}%")
    return hms


def main(argv=None):
    p = argparse.ArgumentParser(
        description="one-command base-to-new HM parity runbook")
    p.add_argument("--root", default="/tmp/parity_data",
                   help="dataset root (Synthetic generates itself here)")
    p.add_argument("--output-dir", default="/tmp/parity_out")
    p.add_argument("--datasets", nargs="+", default=None,
                   help="dataset config names (default: the reference "
                        "suite in full mode, synthetic in smoke mode)")
    p.add_argument("--weights", default="",
                   help="OpenAI CLIP torch checkpoint (.pt/.pth); empty = "
                        "random CLIP-init (smoke)")
    p.add_argument("--bpe", default=os.environ.get("FMM_TPU_BPE_PATH", ""),
                   help="bpe_simple_vocab_16e6.txt.gz (default: "
                        "FMM_TPU_BPE_PATH)")
    p.add_argument("--reference", default="/root/reference",
                   help="reference checkout for the executed tokenizer "
                        "golden (optional)")
    p.add_argument("--smoke", action="store_true",
                   help="force smoke mode (Tiny/Synthetic/CPU) even if "
                        "weights are present")
    p.add_argument("--shots", type=int, default=None,
                   help="few-shot shots (full default 16, smoke 2)")
    p.add_argument("--epochs", type=int, default=None,
                   help="MaPLe epochs (full default 5 like the reference "
                        "runbook, smoke 1)")
    p.add_argument("--seed", type=int, default=1)
    p.add_argument("--zs-cfg", default="vit_b16")
    p.add_argument("--b2n-cfg", default="vit_b16_c2_ep5_batch4_2ctx")
    p.add_argument("--expect-zeroshot", type=float, default=69.34,
                   help="published suite-average zero-shot accuracy "
                        "(reference README.md:101)")
    p.add_argument("--zeroshot-tol", type=float, default=2.0)
    p.add_argument("--timeout", type=int, default=7200,
                   help="per-subcommand timeout (seconds)")
    args = p.parse_args(argv)

    smoke = args.smoke or not (args.weights and args.bpe)
    if args.datasets is None:
        args.datasets = ["synthetic"] if smoke else list(REFERENCE_SUITE)
    if args.shots is None:
        args.shots = 2 if smoke else 16
    if args.epochs is None:
        args.epochs = 1 if smoke else 5
    if args.bpe:
        os.environ["FMM_TPU_BPE_PATH"] = args.bpe
    env = {"FMM_TPU_PLATFORM": "cpu"} if smoke else {}
    if args.bpe:
        env["FMM_TPU_BPE_PATH"] = args.bpe

    os.makedirs(args.output_dir, exist_ok=True)
    st = Stage()
    st.record("environment", "PASS",
              f"mode={'smoke' if smoke else 'full'} "
              f"weights={'yes' if args.weights else 'no'} "
              f"bpe={'yes' if args.bpe else 'no'} "
              f"datasets={args.datasets}")

    stage_tokenizer(st, args.bpe, args.reference)
    if not st.failed:
        stage_weights(st, args.weights)
    if not st.failed:
        stage_zeroshot(st, args, smoke, env)
    if not st.failed:
        stage_base2new(st, args, smoke, env)

    n_pass = sum(1 for _, s, _ in st.results if s == "PASS")
    n_skip = sum(1 for _, s, _ in st.results if s == "SKIP")
    status = "FAILED" if st.failed else "ok"
    print(f"PARITY RUNBOOK: {status} ({n_pass} pass, {n_skip} skip)"
          + ("" if not smoke else
             " — smoke mode exercised the orchestration only; provide "
             "--weights and --bpe for the real HM parity run"))
    return 1 if st.failed else 0


if __name__ == "__main__":
    sys.exit(main())
