"""Detector accuracy evidence (VERDICT r2 #7): run the classifier grid on
a reproducible synthetic tree and commit the metrics CSV, side by side with
the reference's committed numbers (LD_detector/gopros_output.csv:2 —
LogisticRegression 95.71% acc / 99.88% recall / 92.33% precision on GoProS).

The env has no GoPro data (zero egress), so the evidence tree is the
in-repo generator's synthetic one: textured drifting-pattern sharp videos
(quality_evidence.make_sharp_videos) re-blurred by the GoProRS windowed-mean
generator — the same blur process the reference detector was trained on,
on synthetic texture instead of street scenes.

    JAX_PLATFORMS=cpu python scripts/detector_evidence.py \
        [--out docs/detector_eval]
"""

import argparse
import json
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "scripts"))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--out", default="docs/detector_eval")
    p.add_argument("--root", default="/tmp/detector_evidence")
    p.add_argument("--n_videos", type=int, default=6)
    p.add_argument("--n_frames", type=int, default=200)
    p.add_argument("--ratios", type=float, nargs="+",
                   default=[0.05, 0.25, 0.5])
    p.add_argument("--kernels", type=int, nargs="+", default=[7, 11, 15])
    a = p.parse_args()

    from quality_evidence import make_sharp_videos
    from speinet_tpu.detector.train import collate_synthetic, train_detectors

    sharp = os.path.join(a.root, "sharp")
    if not os.path.isdir(sharp):
        make_sharp_videos(sharp, n_videos=a.n_videos, n_frames=a.n_frames,
                          h=240, w=320, seed=3)
    os.makedirs(a.out, exist_ok=True)
    csv_path = os.path.join(a.out, "output.csv")
    if os.path.exists(csv_path):
        os.remove(csv_path)
    summary = {}
    for ratio in a.ratios:
        for k in a.kernels:
            x, y = collate_synthetic(sharp, ratio, k, seed=17)
            res = train_detectors(x, y, os.path.join(a.root, "pickle"),
                                  ratio, k, seed=17, csv_path=csv_path)
            line = {m: round(v["accuracy"], 4) for m, v in res.items()}
            summary[f"ratio={ratio} k={k}"] = line
            print(f"ratio={ratio} k={k}: "
                  + " ".join(f"{m}={v}" for m, v in line.items()), flush=True)
    with open(os.path.join(a.out, "summary.json"), "w") as f:
        json.dump(summary, f, indent=1)
    best = max((v["LogisticRegression"] for v in summary.values()))
    print(f"best LogisticRegression accuracy: {best:.4f} "
          f"(reference gopros_output.csv: 0.9571)")


if __name__ == "__main__":
    main()
