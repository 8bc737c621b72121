"""GoProRS synthetic re-blur dataset generator.

Parity: LD_detector/choice_dataset_train.py:34-59 (and the identical logic
in sharp_detector_params_estimation_parallel.py:50-76 and
mix_choice_dataset.py). Consumes a sharp video greedily: each step draws a
Bernoulli(ratio) label (forced sharp when <= threshold frames remain);
sharp -> average a random window of 1..threshold frames, blurry ->
threshold+1..window_range[1] frames; the blurry frame is the window mean
and the GT is the window center. Deterministic given `seed`.
"""

from __future__ import annotations

import os
from typing import List, Sequence, Tuple

import imageio.v2 as imageio
import numpy as np


def generate_blurry_sequence(
    frames: Sequence[np.ndarray],
    ratio: float,
    rng: np.random.Generator,
    window_range: Tuple[int, int] = (1, 15),
    threshold: int = 5,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Returns (blurry [N,H,W,C] float, gt [N,H,W,C] float, labels [N] int)."""
    frames = list(frames)
    blurry, gts, labels = [], [], []
    while frames:
        label = int((rng.random() < ratio) or (len(frames) <= threshold))
        labels.append(label)
        if label:
            wsize = int(rng.integers(window_range[0], threshold + 1))
        else:
            wsize = int(rng.integers(threshold + 1, window_range[1] + 1))
        window = frames[:wsize]
        frames = frames[wsize:]
        blurry.append(np.mean(window, axis=0))
        gts.append(np.asarray(window[len(window) // 2], np.float32))
    return (np.stack(blurry).astype(np.float32), np.stack(gts),
            np.asarray(labels, np.int64))


def generate_dataset(
    src_dir: str,
    out_dir: str,
    ratios: Sequence[float] = (0.05, 0.25, 0.5),
    seed: int = 0,
    mixed: bool = True,
) -> List[str]:
    """Build the blur/ gt/ label/ tree the training pipeline consumes.

    src_dir: directory of per-video folders of sharp frames.
    mixed=True picks a random ratio per video (mix_choice_dataset.py
    behavior); otherwise ratios[0] applies to all.
    Output layout: {out}/blur/<video>/*.png, {out}/gt/<video>/*.png,
    {out}/label/<video>.npy — the layout videodata_nfs.py:40-48 scans.
    """
    rng = np.random.default_rng(seed)
    videos = sorted(os.listdir(src_dir))
    written = []
    for v in videos:
        vdir = os.path.join(src_dir, v)
        if not os.path.isdir(vdir):
            continue
        names = sorted(os.listdir(vdir))
        frames = [imageio.imread(os.path.join(vdir, n)) for n in names]
        ratio = float(rng.choice(ratios)) if mixed else float(ratios[0])
        blur, gt, labels = generate_blurry_sequence(frames, ratio, rng)
        bdir = os.path.join(out_dir, "blur", v)
        gdir = os.path.join(out_dir, "gt", v)
        ldir = os.path.join(out_dir, "label")
        os.makedirs(bdir, exist_ok=True)
        os.makedirs(gdir, exist_ok=True)
        os.makedirs(ldir, exist_ok=True)
        for i in range(len(labels)):
            imageio.imwrite(os.path.join(bdir, f"{i:08d}.png"),
                            np.clip(blur[i], 0, 255).astype(np.uint8))
            imageio.imwrite(os.path.join(gdir, f"{i:08d}.png"),
                            np.clip(gt[i], 0, 255).astype(np.uint8))
        np.save(os.path.join(ldir, v + ".npy"), labels)
        written.append(v)
    return written


DEFAULT_SPLIT_RATIOS = {
    # per-split ratio menus (parity: mix_choice_dataset.py:137-155 —
    # train/test draw one of {0.1, 0.3, 0.5} per video, val is fixed 0.5)
    "train": (0.1, 0.3, 0.5),
    "val": (0.5,),
    "test": (0.1, 0.3, 0.5),
}


def generate_splits(
    src_dirs: dict,
    out_dir: str,
    split_ratios: dict = None,
    seed: int = 0,
    manifest: str = "dataset_manifest.json",
) -> dict:
    """Per-split generation (parity: mix_choice_dataset.py:78-192): each
    split has its own source tree and its own ratio menu; one ratio is
    drawn per video; output lands under {out}/{split}/{blur,gt,label} and a
    JSON manifest of per-split frame paths + labels is written (the
    reference's save_output_to_file, :121-136).

    src_dirs: {"train": <sharp dir>, "val": ..., "test": ...} (any subset).
    Returns {split: [video names]}.
    """
    import glob
    import json

    split_ratios = split_ratios or DEFAULT_SPLIT_RATIOS
    written = {}
    payload = {}
    for si, (split, src) in enumerate(sorted(src_dirs.items())):
        ratios = tuple(split_ratios[split])
        split_out = os.path.join(out_dir, split)
        written[split] = generate_dataset(src, split_out, ratios=ratios,
                                          seed=seed + si,
                                          mixed=len(ratios) > 1)
        blur_paths, gt_paths, labels = [], [], []
        for v in written[split]:
            blur_paths.append(sorted(glob.glob(
                os.path.join(split_out, "blur", v, "*.png"))))
            gt_paths.append(sorted(glob.glob(
                os.path.join(split_out, "gt", v, "*.png"))))
            labels.append(np.load(
                os.path.join(split_out, "label", v + ".npy")).tolist())
        cap = split.capitalize()
        payload[f"{cap} Blurry Paths"] = blur_paths
        payload[f"{cap} GT Paths"] = gt_paths
        payload[f"{cap} Labels"] = labels
    if manifest:
        os.makedirs(out_dir, exist_ok=True)
        with open(os.path.join(out_dir, manifest), "w") as f:
            json.dump(payload, f, indent=4)
    return written


def split_dataset(root: str, out_train: str, out_val: str, val_fraction: float = 0.1,
                  seed: int = 0) -> None:
    """90/10 video-level split (parity: LD_detector/split.py)."""
    import shutil

    videos = sorted(os.listdir(os.path.join(root, "blur")))
    rng = np.random.default_rng(seed)
    order = rng.permutation(len(videos))
    n_val = max(1, int(len(videos) * val_fraction))
    val_set = {videos[i] for i in order[:n_val]}
    for v in videos:
        dst = out_val if v in val_set else out_train
        for sub in ("blur", "gt"):
            shutil.copytree(os.path.join(root, sub, v),
                            os.path.join(dst, sub, v), dirs_exist_ok=True)
        os.makedirs(os.path.join(dst, "label"), exist_ok=True)
        shutil.copy(os.path.join(root, "label", v + ".npy"),
                    os.path.join(dst, "label", v + ".npy"))
