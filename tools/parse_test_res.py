"""Seed-averaged result parser (behavioral rebuild of the reference
``parse_test_res.py``).

Walks ``<dir>/seed*/log.txt``, extracts ``* <keyword>: XX.XX%`` lines that
appear after the end signal (``Finished training``, or ``=> result`` with
``--test-log``), and prints mean +- std (or 95% CI).  ``--multi-exp``
aggregates one level higher.

Usage::

    python tools/parse_test_res.py output/my_experiment [--ci95]
    python tools/parse_test_res.py output/my_experiment --multi-exp
"""

import argparse
import os
import os.path as osp
import re
from collections import OrderedDict, defaultdict

import numpy as np


def listdir_nohidden(path, sort=False):
    items = [f for f in os.listdir(path) if not f.startswith(".")]
    if sort:
        items.sort()
    return items


def compute_ci95(res):
    return 1.96 * np.std(res) / np.sqrt(len(res))


def parse_function(*metrics, directory="", args=None, end_signal=None):
    print(f"Parsing files in {directory}")
    subdirs = listdir_nohidden(directory, sort=True)

    outputs = []
    for subdir in subdirs:
        fpath = osp.join(directory, subdir, "log.txt")
        assert osp.isfile(fpath), f"Missing log file: {fpath}"
        good_to_go = False
        output = OrderedDict()

        with open(fpath, "r") as f:
            for line in f:
                line = line.strip()
                if line == end_signal:
                    good_to_go = True
                for metric in metrics:
                    match = metric["regex"].search(line)
                    if match and good_to_go:
                        output.setdefault("file", fpath)
                        output[metric["name"]] = float(match.group(1))

        if output:
            outputs.append(output)

    assert len(outputs) > 0, f"Nothing found in {directory}"

    metrics_results = defaultdict(list)
    for output in outputs:
        msg = ""
        for key, value in output.items():
            if isinstance(value, float):
                msg += f"{key}: {value:.2f}%. "
            else:
                msg += f"{key}: {value}. "
            if key != "file":
                metrics_results[key].append(value)
        print(msg)

    output_results = OrderedDict()
    print("===")
    print(f"Summary of directory: {directory}")
    for key, values in metrics_results.items():
        avg = np.mean(values)
        std = compute_ci95(values) if args.ci95 else np.std(values)
        print(f"* {key}: {avg:.2f}% +- {std:.2f}%")
        output_results[key] = avg
    print("===")
    return output_results


def main(args, end_signal):
    metric = {
        "name": args.keyword,
        "regex": re.compile(rf"\* {args.keyword}: ([\.\deE+-]+)%"),
    }

    if args.base2new:
        # harmonic mean of base/new accuracies, the reference's headline
        # base-to-novel metric (README.md:99-120); expects <dir>/{base,new}
        results = {}
        for sub in ("base", "new"):
            subdir = osp.join(args.directory, sub)
            assert osp.isdir(subdir), f"Missing split directory: {subdir}"
            res = parse_function(
                metric, directory=subdir, args=args, end_signal=end_signal
            )
            results[sub] = res[args.keyword]
        hm = 2 * results["base"] * results["new"] / max(
            1e-12, results["base"] + results["new"]
        )
        print("Base-to-new summary")
        print(f"* base: {results['base']:.2f}%")
        print(f"* new: {results['new']:.2f}%")
        print(f"* H: {hm:.2f}%")
        return

    if args.multi_exp:
        final_results = defaultdict(list)
        for directory in listdir_nohidden(args.directory, sort=True):
            directory = osp.join(args.directory, directory)
            results = parse_function(
                metric, directory=directory, args=args, end_signal=end_signal
            )
            for key, value in results.items():
                final_results[key].append(value)
        print("Average performance")
        for key, values in final_results.items():
            print(f"* {key}: {np.mean(values):.2f}%")
    else:
        parse_function(
            metric, directory=args.directory, args=args, end_signal=end_signal
        )


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("directory", type=str, help="path to directory")
    parser.add_argument(
        "--ci95", action="store_true",
        help=r"compute 95% confidence interval instead of std",
    )
    parser.add_argument("--test-log", action="store_true", help="parse test-only logs")
    parser.add_argument(
        "--multi-exp", action="store_true", help="parse multiple experiments"
    )
    parser.add_argument(
        "--base2new", action="store_true",
        help="aggregate <dir>/{base,new} and report the harmonic mean (H)",
    )
    parser.add_argument(
        "--keyword", default="accuracy", type=str, help="which keyword to extract"
    )
    args = parser.parse_args()

    end_signal = "=> result" if args.test_log else "Finished training"
    main(args, end_signal)
