"""Linear-probe stage 2: logistic-regression sweep with binary search on C
(rebuild of ``lpclip/linear_probe.py``, which follows the few-shot protocol
of the CLIP paper Appendix A3).

Reads ``{train,val,test}.npz`` produced by ``feat_extractor.py`` and reports
mean/std test accuracy over runs for each shot count.

Usage::

    python tools/lpclip/linear_probe.py --dataset Caltech101 \
        --feature_dir clip_feat
"""

import argparse
import os

import numpy as np
from sklearn.linear_model import LogisticRegression

VAL_SHOT_LIST = {1: 1, 2: 2, 4: 4, 8: 4, 16: 4}
SEARCH_LIST = [1e6, 1e4, 1e2, 1, 1e-2, 1e-4, 1e-6]


def fit_acc(c, train_x, train_y, val_x, val_y):
    # penalty defaults to l2 (the reference passes it explicitly; sklearn
    # >=1.8 deprecates the kwarg)
    clf = LogisticRegression(solver="lbfgs", max_iter=1000, C=c).fit(
        train_x, train_y
    )
    return clf, float((clf.predict(val_x) == val_y).mean())


def run_probe(train, val, test, num_shot, num_step, seed):
    train_feature, train_label = train
    val_feature, val_label = val
    test_feature, test_label = test

    rng = np.random.RandomState(seed)
    labels = np.unique(train_label)

    def sample(features, y, shots):
        idx = []
        for lb in labels:
            pool = np.where(y == lb)[0]
            take = min(shots, len(pool))
            idx.extend(rng.choice(pool, size=take, replace=False))
        return features[idx], y[idx]

    fs_train_x, fs_train_y = sample(train_feature, train_label, num_shot)
    fs_val_x, fs_val_y = sample(
        val_feature, val_label, VAL_SHOT_LIST.get(num_shot, 4)
    )

    # coarse sweep
    accs = []
    for c in SEARCH_LIST:
        _, acc = fit_acc(c, fs_train_x, fs_train_y, fs_val_x, fs_val_y)
        accs.append(acc)
    c_peak = SEARCH_LIST[int(np.argmax(accs))]
    c_left, c_right = 1e-1 * c_peak, 1e1 * c_peak

    # binary search in log space (CLIP App. A3)
    test_accs = []
    for step in range(num_step):
        clf_l, acc_l = fit_acc(c_left, fs_train_x, fs_train_y, fs_val_x, fs_val_y)
        clf_r, acc_r = fit_acc(c_right, fs_train_x, fs_train_y, fs_val_x, fs_val_y)
        if acc_l < acc_r:
            clf_final, c_final = clf_r, c_right
            c_left = 10 ** (0.5 * (np.log10(c_right) + np.log10(c_left)))
        else:
            clf_final, c_final = clf_l, c_left
            c_right = 10 ** (0.5 * (np.log10(c_right) + np.log10(c_left)))
        test_acc = float((clf_final.predict(test_feature) == test_label).mean())
        test_accs.append(test_acc)
        print(
            f"  step {step}: C={c_final:.4g} "
            f"val L/R = {acc_l * 100:.2f}/{acc_r * 100:.2f} "
            f"test = {test_acc * 100:.2f}"
        )
    return test_accs


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--dataset", type=str, required=True)
    parser.add_argument("--num_step", type=int, default=8)
    parser.add_argument("--num_run", type=int, default=10)
    parser.add_argument("--feature_dir", type=str, default="clip_feat")
    args = parser.parse_args()

    path = os.path.join(args.feature_dir, args.dataset)

    def load(split):
        f = np.load(os.path.join(path, f"{split}.npz"))
        return np.asarray(f["feature_list"]), np.asarray(f["label_list"])

    train, val, test = load("train"), load("val"), load("test")

    os.makedirs("report", exist_ok=True)
    report = []
    for num_shot in [1, 2, 4, 8, 16]:
        acc_matrix = np.zeros([args.num_run, args.num_step])
        for seed in range(1, args.num_run + 1):
            print(f"-- shots {num_shot} seed {seed} --")
            acc_matrix[seed - 1] = run_probe(
                train, val, test, num_shot, args.num_step, seed
            )
        final = acc_matrix[:, -1] * 100
        line = (
            f"{args.dataset} {num_shot}-shot: "
            f"{final.mean():.2f}% +- {final.std():.2f}%"
        )
        print(line)
        report.append(line)

    with open(os.path.join("report", f"{args.dataset}.txt"), "w") as f:
        f.write("\n".join(report) + "\n")


if __name__ == "__main__":
    main()
