"""Detector training / evaluation drivers.

Parity targets:
- sharp_detector_params_estimation_parallel.py:267-319: synthesize blurry
  sequences from sharp videos, extract the 6 focus features, 90/10 split,
  fit LogisticRegression + DecisionTree, pickle as
  `{Model}_{ratio}_{kernel}.pkl`, append metrics to output.csv.
- LD_detector_gopros_train.py:203-322: same on a pre-generated
  blur/label tree.
- test_detector.py:245-276: per-video label accuracy of a pickled
  classifier vs ground-truth labels, with timing.

Feature extraction runs batched on device (detector/features.py); the
fits are milliseconds on host.

Usage:
    python -m speinet_tpu.detector.train --dir-path <sharp-videos> \
        --kernel-size 11 --ratio 0.5 --out-dir pickles/
"""

from __future__ import annotations

import argparse
import csv
import glob
import os
import time
from typing import Tuple

import imageio.v2 as imageio
import numpy as np
import jax.numpy as jnp

from speinet_tpu.data.gopro_rs import generate_blurry_sequence
from speinet_tpu.detector.classifier import (DecisionTree,
                                             LogisticRegressionJAX,
                                             RandomForest,
                                             binary_metrics,
                                             fit_logistic_regression)
from speinet_tpu.detector.features import focus_features


def video_features(frames: np.ndarray, kernel_size: int,
                   batch: int = 16) -> np.ndarray:
    """frames: [N, H, W, 3] uint8-range -> [N, 6] features (device pass)."""
    feats = []
    x = np.asarray(frames, np.float32).transpose(0, 3, 1, 2)
    for i in range(0, len(x), batch):
        feats.append(np.asarray(focus_features(jnp.asarray(x[i : i + batch]),
                                               kernel_size)))
    return np.concatenate(feats, axis=0)


def collate_synthetic(sharp_dir: str, ratio: float, kernel_size: int,
                      seed: int = 0) -> Tuple[np.ndarray, np.ndarray]:
    """Features+labels from synthesized blurry sequences
    (parity: sharp_detector_params_estimation_parallel.py:221-237)."""
    rng = np.random.default_rng(seed)
    all_x, all_y = [], []
    for v in sorted(os.listdir(sharp_dir)):
        vdir = os.path.join(sharp_dir, v)
        if not os.path.isdir(vdir):
            continue
        frames = [imageio.imread(p) for p in
                  sorted(glob.glob(os.path.join(vdir, "*")))]
        blur, _, labels = generate_blurry_sequence(frames, ratio, rng)
        all_x.append(video_features(blur, kernel_size))
        all_y.append(labels)
    return np.concatenate(all_x), np.concatenate(all_y)


def collate_pregenerated(root: str, kernel_size: int
                         ) -> Tuple[np.ndarray, np.ndarray]:
    """Features+labels from a blur/ label/ tree (LD_detector_gopros_train.py)."""
    all_x, all_y = [], []
    for v in sorted(os.listdir(os.path.join(root, "blur"))):
        frames = np.stack([imageio.imread(p) for p in
                           sorted(glob.glob(os.path.join(root, "blur", v, "*")))])
        labels = np.load(os.path.join(root, "label", v + ".npy")).reshape(-1)
        all_x.append(video_features(frames, kernel_size))
        all_y.append(labels[: len(frames)])
    return np.concatenate(all_x), np.concatenate(all_y)


def train_detectors(x: np.ndarray, y: np.ndarray, out_dir: str, ratio: float,
                    kernel_size: int, test_fraction: float = 0.1,
                    seed: int = 0, csv_path: str = None,
                    n_forest_trees: int = 100) -> dict:
    """Fit + evaluate + pickle all three classifier families; append metrics
    CSV (parity: estimate_parameters + metric dump, :239-250,:267-319)."""
    rng = np.random.default_rng(seed)
    order = rng.permutation(len(y))
    n_test = max(1, int(len(y) * test_fraction))
    test_idx, train_idx = order[:n_test], order[n_test:]
    xtr, ytr, xte, yte = x[train_idx], y[train_idx], x[test_idx], y[test_idx]

    os.makedirs(out_dir, exist_ok=True)
    results = {}
    lr = fit_logistic_regression(xtr, ytr)
    lr.save(os.path.join(out_dir, f"LogisticRegression_{ratio}_{kernel_size}.pkl"))
    results["LogisticRegression"] = binary_metrics(yte, np.asarray(lr.predict(xte)))
    dt = DecisionTree().fit(xtr, ytr)
    dt.save(os.path.join(out_dir, f"DecisionTree_{ratio}_{kernel_size}.pkl"))
    results["DecisionTree"] = binary_metrics(yte, dt.predict(xte))
    rf = RandomForest(n_estimators=n_forest_trees, seed=seed).fit(xtr, ytr)
    rf.save(os.path.join(out_dir, f"RandomForest_{ratio}_{kernel_size}.pkl"))
    results["RandomForest"] = binary_metrics(yte, rf.predict(xte))

    if csv_path:
        new = not os.path.exists(csv_path)
        with open(csv_path, "a", newline="") as f:
            w = csv.writer(f)
            if new:
                w.writerow(["model", "ratio", "kernel_size", "accuracy",
                            "recall", "precision", "f1"])
            for name, m in results.items():
                w.writerow([name, ratio, kernel_size, m["accuracy"],
                            m["recall"], m["precision"], m["f1"]])
    return results


def evaluate_videos(root: str, model, kernel_size: int) -> dict:
    """Per-video accuracy vs GT labels with timing
    (parity: test_detector.py:245-276)."""
    per_video = {}
    for v in sorted(os.listdir(os.path.join(root, "blur"))):
        t0 = time.time()
        frames = np.stack([imageio.imread(p) for p in
                           sorted(glob.glob(os.path.join(root, "blur", v, "*")))])
        feats = video_features(frames, kernel_size)
        pred = np.asarray(model.predict(feats)).reshape(-1)
        labels = np.load(os.path.join(root, "label", v + ".npy")).reshape(-1)[: len(pred)]
        per_video[v] = {"accuracy": float((pred == labels).mean()),
                        "n_frames": len(pred),
                        "seconds": time.time() - t0}
    accs = [m["accuracy"] * m["n_frames"] for m in per_video.values()]
    n = sum(m["n_frames"] for m in per_video.values())
    per_video["__total__"] = {"accuracy": sum(accs) / n, "n_frames": n}
    return per_video


def main(argv=None):
    p = argparse.ArgumentParser(description="Sharpness detector estimation")
    p.add_argument("--dir-path", required=True,
                   help="sharp-video dir (synthesize) or blur/label tree root")
    p.add_argument("--pregenerated", action="store_true")
    p.add_argument("--kernel-size", "-k", type=int, default=11)
    p.add_argument("--ratio", type=float, default=0.5)
    p.add_argument("--out-dir", default="./pickle")
    p.add_argument("--csv", default="output.csv")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--grid", action="store_true",
                   help="sweep ratios x kernel sizes (parity: run_detector.sh)")
    args = p.parse_args(argv)

    if args.grid:
        # parity: LD_detector/run_detector.sh grid of 8 ratios x 7 kernels
        ratios = [0.05, 0.1, 0.15, 0.2, 0.25, 0.3, 0.4, 0.5]
        kernels = [3, 5, 7, 9, 11, 13, 15]
        combos = [(r, k) for r in ratios for k in kernels]
    else:
        combos = [(args.ratio, args.kernel_size)]

    for ratio, kernel in combos:
        if args.pregenerated:
            x, y = collate_pregenerated(args.dir_path, kernel)
        else:
            x, y = collate_synthetic(args.dir_path, ratio, kernel, args.seed)
        res = train_detectors(x, y, args.out_dir, ratio, kernel,
                              seed=args.seed, csv_path=args.csv)
        for name, m in res.items():
            print(f"[ratio={ratio} k={kernel}] {name}: "
                  f"acc={m['accuracy']:.4f} recall={m['recall']:.4f} "
                  f"precision={m['precision']:.4f} f1={m['f1']:.4f}")


if __name__ == "__main__":
    main()
