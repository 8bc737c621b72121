"""One-command pipeline driver: the reference's train.sh analog.

Parity: /root/reference/train.sh:1-22 chains the detector-training stage
(`detector/choice_dataset_train.py`) and the SPEINet training stage
(`main_SPEINet.py --template SPEINet`) with exit-code checks between them.
This driver runs the full loop on either a user-supplied GoProRS tree or a
self-generated synthetic one:

    generate (GoProRS tree)  ->  detector train (focus-measure grid)
        ->  SPEINet train    ->  inference eval (detector-routed)

Each stage is a subprocess with an exit-code check (as in train.sh); any
failure aborts the chain with that stage's code. Stages share one work
directory and can be skipped (--skip gen,detector,...) to resume.

    python scripts/pipeline.py --work /tmp/pipeline [--epochs 1]
    python scripts/pipeline.py --data <existing GoProRS tree> --epochs 120
"""

import argparse
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_stage(name: str, cmd, env=None):
    print(f"\n=== pipeline stage: {name} ===\n  {' '.join(cmd)}", flush=True)
    e = dict(os.environ)
    e["PYTHONPATH"] = REPO + os.pathsep + e.get("PYTHONPATH", "")
    if env:
        e.update(env)
    rc = subprocess.call(cmd, env=e, cwd=REPO)
    if rc != 0:
        # train.sh:7-10 / 18-21: stop the chain on the failing stage
        print(f"{name} encountered an error (exit {rc}).", flush=True)
        sys.exit(rc)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--work", default="/tmp/speinet_pipeline")
    p.add_argument("--data", default="",
                   help="existing GoProRS tree (blur/gt/label); when unset "
                        "a synthetic tree is generated under --work")
    p.add_argument("--epochs", type=int, default=1)
    p.add_argument("--batch_size", type=int, default=4)
    p.add_argument("--patch_size", type=int, default=200)
    p.add_argument("--ratio", type=float, default=0.5)
    p.add_argument("--n_videos", type=int, default=2)
    p.add_argument("--n_frames", type=int, default=30)
    p.add_argument("--skip", default="",
                   help="comma-separated stages to skip: gen,detector,train,infer")
    p.add_argument("--extra_train", nargs=argparse.REMAINDER, default=[],
                   help="extra args forwarded to main_train")
    a = p.parse_args()
    skip = set(s for s in a.skip.split(",") if s)
    py = sys.executable

    tree = a.data or os.path.join(a.work, "rs")
    if not a.data and "gen" not in skip:
        # stage 0 (generator component, data/gopro_rs.py): sharp videos ->
        # windowed-mean blur + per-frame labels
        code = (
            "import sys; sys.path.insert(0, %r); sys.path.insert(0, %r)\n"
            "from quality_evidence import make_sharp_videos\n"
            "from speinet_tpu.data.gopro_rs import generate_dataset\n"
            "make_sharp_videos(%r, n_videos=%d, n_frames=%d, style='natural')\n"
            "generate_dataset(%r, %r, ratios=(%f,), mixed=False, seed=3)\n"
            % (REPO, os.path.join(REPO, "scripts"),
               os.path.join(a.work, "sharp"), a.n_videos, a.n_frames,
               os.path.join(a.work, "sharp"), tree, a.ratio))
        run_stage("generate", [py, "-c", code])

    if "detector" not in skip:
        # train.sh:4 — choice_dataset_train.py
        run_stage("detector", [
            py, "-m", "speinet_tpu.detector.train",
            "--dir-path", tree, "--pregenerated",
            "--out-dir", os.path.join(a.work, "detector"),
            "--csv", os.path.join(a.work, "detector", "output.csv")])

    exp = os.path.join(a.work, "experiment")
    if "train" not in skip:
        # train.sh:15 — main_SPEINet.py --template SPEINet
        run_stage("train", [
            py, "-m", "speinet_tpu.main_train", "--template", "SPEINet",
            "--dir_data", tree, "--dir_data_test", tree,
            "--experiment_dir", exp + "/", "--save", "run",
            "--epochs", str(a.epochs), "--batch_size", str(a.batch_size),
            "--patch_size", str(a.patch_size), "--process", "true",
            "--save_images", "false"] + a.extra_train)

    if "infer" not in skip:
        det_dir = os.path.join(a.work, "detector")
        lr_pkls = [f for f in
                   (os.listdir(det_dir) if os.path.isdir(det_dir) else [])
                   if f.startswith("LogisticRegression")
                   and f.endswith(".pkl")]
        det = [os.path.join(det_dir, sorted(lr_pkls)[0])] if lr_pkls else []
        run_stage("infer", [
            py, "-m", "speinet_tpu.infer",
            "--data_path", tree,
            "--model_path", os.path.join(exp, "run", "model", "model_best"),
            "--result_path", os.path.join(a.work, "results"),
            "--save_image", "false"]
            + (["--detector_pickle"] + det if det else []))

    print("\npipeline complete:", a.work, flush=True)


if __name__ == "__main__":
    main()
