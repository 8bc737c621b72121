"""End-to-end slices: train CLI for one epoch on a synthetic tree (artifact
layout, checkpointing, resume) and the inference engine (log format,
metrics, image dumps)."""

import glob
import os
import re

import numpy as np
import pytest

import imageio.v2 as imageio

from speinet_tpu.config import Config, set_template


def make_tree(root, n_videos=1, n_frames=12, h=48, w=64, seed=0):
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    os.makedirs(os.path.join(root, "label"), exist_ok=True)
    for v in range(n_videos):
        name = f"video{v:02d}"
        os.makedirs(os.path.join(root, "blur", name))
        os.makedirs(os.path.join(root, "gt", name))
        labels = np.zeros(n_frames, np.int64)
        labels[::4] = 1
        for i in range(n_frames):
            img = (127 + 100 * np.sin(xx / 5.0 + i) * np.cos(yy / 4.0))
            img = np.stack([img] * 3, -1).clip(0, 255).astype(np.uint8)
            imageio.imwrite(os.path.join(root, "blur", name, f"{i:08d}.png"), img)
            imageio.imwrite(os.path.join(root, "gt", name, f"{i:08d}.png"), img)
        np.save(os.path.join(root, "label", name + ".npy"), labels)
    return root


TINY_ARGS = ["--n_feat", "8", "--embed_dim", "32", "--depths", "2",
             "--num_heads", "4", "--patch_size", "40", "--batch_size", "2",
             "--n_threads", "2", "--print_every", "2", "--n_frames_per_video", "12"]


def test_main_train_one_epoch(tmp_path):
    from speinet_tpu.main_train import main

    root = make_tree(tmp_path / "ds")
    exp = tmp_path / "exp"
    argv = ["--template", "SPEINet", "--dir_data", str(root),
            "--dir_data_test", str(root), "--experiment_dir", str(exp) + "/",
            "--save", "run1", "--epochs", "1"] + TINY_ARGS
    main(argv)

    d = exp / "run1"
    assert (d / "log.txt").exists()
    assert (d / "config.txt").exists()
    assert (d / "model" / "model_latest").exists()
    assert (d / "model" / "model_best").exists()      # epoch 1 is best
    assert (d / "psnr.npy").exists() and (d / "psnr.pdf").exists()
    psnr = np.load(d / "psnr.npy")
    assert len(psnr) == 1 and np.isfinite(psnr[0])
    # per-component loss matrix + per-type plots (Loss/__init__.py:86-128)
    comp = np.load(d / "loss_components.npy")
    names = (d / "loss_components_names.txt").read_text().split()
    assert names == ["L1", "HEM", "Total"]
    assert comp.shape == (1, 3) and np.isfinite(comp).all()
    assert abs(comp[0, 0] + comp[0, 1] - comp[0, 2]) < 1e-4
    for n in names:
        assert (d / f"loss_loss_{n}.pdf").exists()
    log = (d / "log.txt").read_text()
    assert "Epoch   1 with Lr 1.00e-04" in log
    assert "average PSNR" in log
    # image dumps (save_images default True)
    dumped = glob.glob(str(d / "result" / "DVD_NFS" / "*" / "*_deblur_iter1.png"))
    assert dumped

    # resume: second epoch continues from the checkpoint + metric log
    argv2 = ["--template", "SPEINet", "--dir_data", str(root),
             "--dir_data_test", str(root), "--experiment_dir", str(exp) + "/",
             "--save", "run1", "--load", "run1", "--resume", "true",
             "--epochs", "2"] + TINY_ARGS
    main(argv2)
    psnr2 = np.load(d / "psnr.npy")
    assert len(psnr2) == 2
    assert psnr2[0] == psnr[0]
    comp2 = np.load(d / "loss_components.npy")
    assert comp2.shape == (2, 3)
    np.testing.assert_allclose(comp2[0], comp[0])   # resume kept epoch-1 row


def test_inference_engine(tmp_path):
    from speinet_tpu.infer import Inference

    root = make_tree(tmp_path / "ds", n_frames=10)
    cfg = set_template(Config(template="SPEINet")).replace(
        n_feat=8, embed_dim=32, depths=[2], num_heads=[4], n_threads=2)
    out = tmp_path / "results"
    inf = Inference(cfg, str(root), model_path="", result_path=str(out))
    psnr, ssim = inf.infer()
    assert np.isfinite(psnr) and np.isfinite(ssim)

    logs = glob.glob(str(out / "inference_log_*.txt"))
    assert logs
    text = open(logs[0]).read()
    # reference log format lines
    assert re.search(r"> video00-\d+ PSNR=.*SSIM=.*forward_time:", text)
    assert re.search(r"# Video:video00 AVG-PSNR=", text)
    assert re.search(r"# Total AVG-PSNR=", text)
    # one output image per frame (border mode restores ends: n_frames windows)
    imgs = glob.glob(str(out / "video00" / "*.png"))
    assert len(imgs) == 10


def test_inference_with_detector_fallback(tmp_path):
    """No label/ dir -> labels inferred with the on-device detector
    (inference_SPEINet.py:349-353 path)."""
    from speinet_tpu.detector.classifier import LogisticRegressionJAX
    from speinet_tpu.infer import Inference
    import shutil

    root = make_tree(tmp_path / "ds", n_frames=8)
    shutil.rmtree(os.path.join(root, "label"))
    lr = LogisticRegressionJAX(coef=np.ones(6, np.float32), intercept=0.0)
    pkl = tmp_path / "det.pkl"
    lr.save(str(pkl))
    cfg = set_template(Config(template="SPEINet")).replace(
        n_feat=8, embed_dim=32, depths=[2], num_heads=[4])
    inf = Inference(cfg, str(root), model_path="",
                    result_path=str(tmp_path / "r2"), save_image=False,
                    detector_pickle=str(pkl))
    psnr, ssim = inf.infer()
    assert np.isfinite(psnr)


def test_inference_detector_fallback_without_pickle(tmp_path):
    """No label/ dir and no --detector_pickle -> the packaged default
    logistic detector is used (the reference falls back to its shipped
    pickle, inference_SPEINet.py:349-353)."""
    from speinet_tpu.infer import Inference
    import shutil

    root = make_tree(tmp_path / "ds", n_frames=8)
    shutil.rmtree(os.path.join(root, "label"))
    cfg = set_template(Config(template="SPEINet")).replace(
        n_feat=8, embed_dim=32, depths=[2], num_heads=[4])
    inf = Inference(cfg, str(root), model_path="",
                    result_path=str(tmp_path / "r3"), save_image=False)
    psnr, ssim = inf.infer()
    assert np.isfinite(psnr)
