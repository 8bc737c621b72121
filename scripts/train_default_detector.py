"""Train the packaged fallback sharpness detector.

The reference inference falls back to a shipped sklearn pickle when a video
has no label/ directory (inference_SPEINet.py:349-353; pickles in
LD_detector/pickle/). This script produces our analog: a tiny logistic
regression fitted on frames synthesized by the in-repo GoProRS generator
(data/gopro_rs.py), committed as speinet_tpu/detector/default_logreg.pkl
and loaded by `LogisticRegressionJAX.load(None)` / `default_detector()`.

Deterministic (fixed seeds); runs on CPU in ~1 min:
    JAX_PLATFORMS=cpu python scripts/train_default_detector.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from speinet_tpu.data.gopro_rs import generate_blurry_sequence
from speinet_tpu.detector.classifier import (binary_metrics,
                                             fit_logistic_regression)
from speinet_tpu.detector.train import video_features


def synth_sharp_video(rng, n=120, h=180, w=240):
    """Textured moving-pattern frames: multi-frequency sinusoid mixtures with
    drifting phase plus grain, the same style as the quality-evidence tree —
    enough high-frequency content for the focus measures to separate sharp
    frames from window-averaged blurry ones."""
    yy, xx = np.mgrid[0:h, 0:w]
    freqs = rng.uniform(3.0, 9.0, size=(4, 2))
    amps = rng.uniform(0.1, 0.25, size=4)
    frames = []
    for t in range(n):
        img = 0.5 * np.ones((h, w))
        for (fy, fx), a in zip(freqs, amps):
            img = img + a * np.sin(xx / fx + 0.35 * t) * np.cos(yy / fy - 0.2 * t)
        img = img + 0.04 * rng.standard_normal((h, w))
        img = np.clip(img, 0, 1) * 255.0
        frames.append(np.stack([img, img * 0.95, img * 0.9], -1).astype(np.uint8))
    return frames


def main():
    rng = np.random.default_rng(0)
    xs, ys = [], []
    for ratio in (0.1, 0.3, 0.5):
        for v in range(3):
            frames = synth_sharp_video(rng)
            blur, _, labels = generate_blurry_sequence(frames, ratio, rng)
            xs.append(video_features(blur, kernel_size=11))
            ys.append(labels)
    x, y = np.concatenate(xs), np.concatenate(ys)
    order = np.random.default_rng(1).permutation(len(y))
    n_test = len(y) // 10
    xte, yte = x[order[:n_test]], y[order[:n_test]]
    xtr, ytr = x[order[n_test:]], y[order[n_test:]]
    lr = fit_logistic_regression(xtr, ytr)
    m = binary_metrics(yte, np.asarray(lr.predict(xte)))
    print(f"default detector: n={len(y)} acc={m['accuracy']:.4f} "
          f"recall={m['recall']:.4f} precision={m['precision']:.4f} "
          f"f1={m['f1']:.4f}")
    out = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                       "speinet_tpu", "detector", "default_logreg.pkl")
    lr.save(out)
    print(f"saved {out}")


if __name__ == "__main__":
    main()
