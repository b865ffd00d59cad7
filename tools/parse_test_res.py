"""Seed-averaged result parser.

Behavioral contract shared with the reference ``parse_test_res.py`` (the
regexes and print formats downstream tooling greps for), implemented
independently:

* a run directory holds ``seed*/log.txt`` files;
* only ``* <keyword>: XX.XX%`` lines AFTER the end signal count
  (``Finished training``, or ``=> result`` with ``--test-log``);
* per-seed lines, then ``===`` / ``Summary of directory: <dir>`` /
  ``* <keyword>: <mean>% +- <std>%`` / ``===``;
* ``--multi-exp`` aggregates one directory level higher and prints
  ``Average performance``;
* ``--base2new`` (extension) aggregates ``<dir>/{base,new}`` and prints
  the harmonic mean ``H`` — the headline base-to-novel metric
  (reference ``README.md:99-120``).

Usage::

    python tools/parse_test_res.py output/my_experiment [--ci95]
    python tools/parse_test_res.py output/my_experiment --multi-exp
    python tools/parse_test_res.py output/base2new/test/dtd --base2new
"""

import argparse
import os
import os.path as osp
import re

import numpy as np

END_SIGNALS = {False: "Finished training", True: "=> result"}


def metric_pattern(keyword: str):
    """The ``* <keyword>: XX.XX%`` line contract (evaluator output)."""
    return re.compile(rf"\* {keyword}: ([\.\deE+-]+)%")


def scan_log(fpath: str, pattern, end_signal: str):
    """Last post-end-signal metric value in one log, or None.

    The end signal gates matching: metric lines printed during training
    (per-epoch evals) are ignored; only the final test block counts.
    Later matches overwrite earlier ones, mirroring the dict-overwrite
    behavior the log contract relies on.
    """
    value = None
    armed = False
    with open(fpath, "r") as f:
        for raw in f:
            line = raw.strip()
            if line == end_signal:
                armed = True
                continue
            if not armed:
                continue
            hit = pattern.search(line)
            if hit:
                value = float(hit.group(1))
    return value


def iter_seed_logs(directory: str):
    """(subdir, log-path) for every non-hidden child, sorted by name.
    Every child must contain a ``log.txt`` (same hard contract as the
    reference: a half-written run is an error, not a skip)."""
    children = sorted(
        d for d in os.listdir(directory) if not d.startswith(".")
    )
    for child in children:
        fpath = osp.join(directory, child, "log.txt")
        assert osp.isfile(fpath), f"Missing log file: {fpath}"
        yield child, fpath


def spread(values, ci95: bool) -> float:
    if ci95:
        return 1.96 * np.std(values) / np.sqrt(len(values))
    return float(np.std(values))


def summarize_directory(directory, keyword, end_signal, ci95=False):
    """Parse one experiment directory; print the per-seed lines and the
    summary block; return the mean."""
    print(f"Parsing files in {directory}")
    pattern = metric_pattern(keyword)

    values = []
    for _, fpath in iter_seed_logs(directory):
        v = scan_log(fpath, pattern, end_signal)
        if v is None:
            continue
        values.append(v)
        print(f"file: {fpath}. {keyword}: {v:.2f}%. ")

    assert values, f"Nothing found in {directory}"

    mean = float(np.mean(values))
    print("===")
    print(f"Summary of directory: {directory}")
    print(f"* {keyword}: {mean:.2f}% +- {spread(values, ci95):.2f}%")
    print("===")
    return mean


def run_multi_exp(directory, keyword, end_signal, ci95):
    means = [
        summarize_directory(osp.join(directory, d), keyword, end_signal, ci95)
        for d in sorted(
            x for x in os.listdir(directory) if not x.startswith(".")
        )
    ]
    print("Average performance")
    print(f"* {keyword}: {np.mean(means):.2f}%")


def run_base2new(directory, keyword, end_signal, ci95):
    means = {}
    for split in ("base", "new"):
        subdir = osp.join(directory, split)
        assert osp.isdir(subdir), f"Missing split directory: {subdir}"
        means[split] = summarize_directory(subdir, keyword, end_signal, ci95)
    hm = 2 * means["base"] * means["new"] / max(
        1e-12, means["base"] + means["new"]
    )
    print("Base-to-new summary")
    print(f"* base: {means['base']:.2f}%")
    print(f"* new: {means['new']:.2f}%")
    print(f"* H: {hm:.2f}%")


def build_cli():
    parser = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    parser.add_argument("directory", type=str, help="path to directory")
    parser.add_argument(
        "--ci95", action="store_true",
        help=r"compute 95% confidence interval instead of std",
    )
    parser.add_argument(
        "--test-log", action="store_true", help="parse test-only logs"
    )
    parser.add_argument(
        "--multi-exp", action="store_true", help="parse multiple experiments"
    )
    parser.add_argument(
        "--base2new", action="store_true",
        help="aggregate <dir>/{base,new} and report the harmonic mean (H)",
    )
    parser.add_argument(
        "--keyword", default="accuracy", type=str,
        help="which keyword to extract",
    )
    return parser


def main(argv=None):
    args = build_cli().parse_args(argv)
    end_signal = END_SIGNALS[args.test_log]
    if args.base2new:
        run_base2new(args.directory, args.keyword, end_signal, args.ci95)
    elif args.multi_exp:
        run_multi_exp(args.directory, args.keyword, end_signal, args.ci95)
    else:
        summarize_directory(
            args.directory, args.keyword, end_signal, args.ci95
        )


if __name__ == "__main__":
    main()
