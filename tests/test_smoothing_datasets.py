"""Classical smoothing library behavior + dataset-variant (bm/plain) tests."""

import os

import numpy as np
import jax.numpy as jnp
import imageio.v2 as imageio

from speinet_tpu.config import Config, set_template
from speinet_tpu.ops.smoothing import ftvd, l0_smoothing, rl_deconv, rtv_smooth
from speinet_tpu.ops.filters import box_kernel, depthwise_conv2d
from speinet_tpu.data.videodata import VideoDataset
from speinet_tpu.data.loader import make_dataset, BatchIterator


def _texture_image(rng, h=48, w=48):
    yy, xx = np.mgrid[0:h, 0:w]
    base = 0.5 + 0.4 * np.sign(np.sin(xx / 6.0))          # piecewise structure
    tex = 0.08 * np.sin(xx * 2.1) * np.sin(yy * 1.7)      # fine texture
    img = np.stack([base + tex] * 3, -1)
    return np.clip(img, 0, 1).astype(np.float32)


def grad_energy(img):
    return float(np.abs(np.diff(np.asarray(img), axis=1)).sum()
                 + np.abs(np.diff(np.asarray(img), axis=0)).sum())


def test_l0_smoothing_removes_texture(rng):
    img = _texture_image(rng)
    out = np.asarray(l0_smoothing(jnp.asarray(img), lam=0.02))
    assert grad_energy(out) < 0.6 * grad_energy(img)   # texture suppressed
    assert np.abs(out - img).mean() < 0.1              # structure preserved


def test_ftvd_deconvolution(rng):
    img = _texture_image(rng)[..., 0]
    psf = np.asarray(box_kernel(5))
    blurred = np.asarray(depthwise_conv2d(
        jnp.asarray(img)[None, None], jnp.asarray(psf)))[0, 0]
    restored = np.asarray(ftvd(jnp.asarray(blurred), jnp.asarray(psf),
                               mu=200.0, n_iter=30))
    err_blur = np.abs(blurred - img)[5:-5, 5:-5].mean()
    err_rest = np.abs(restored - img)[5:-5, 5:-5].mean()
    assert err_rest < 0.75 * err_blur                  # deconvolution helps


def test_rl_deconv_converges(rng):
    img = jnp.asarray(_texture_image(rng).transpose(2, 0, 1)[None])
    psf = box_kernel(5)
    blurred = depthwise_conv2d(img, psf)
    rest = rl_deconv(blurred, psf, n_iter=10)
    err_blur = float(jnp.abs(blurred - img)[..., 5:-5, 5:-5].mean())
    err_rest = float(jnp.abs(rest - img)[..., 5:-5, 5:-5].mean())
    assert err_rest < err_blur


def test_rtv_smooth_runs(rng):
    img = _texture_image(rng, 24, 24)
    out = rtv_smooth(img, lam=0.01, n_iter=2)
    assert out.shape == img.shape
    assert grad_energy(out) < grad_energy(img)


# --- dataset variants -------------------------------------------------------

def _tree(root, with_bm=False, with_label=True, n=10, h=32, w=40):
    rng = np.random.default_rng(0)
    name = "vid"
    os.makedirs(os.path.join(root, "blur", name))
    os.makedirs(os.path.join(root, "gt", name))
    if with_label:
        os.makedirs(os.path.join(root, "label"), exist_ok=True)
        labels = np.zeros(n, np.int64)
        labels[::3] = 1
        np.save(os.path.join(root, "label", name + ".npy"), labels)
    if with_bm:
        os.makedirs(os.path.join(root, "Blur_map", name))
    for i in range(n):
        img = (rng.random((h, w, 3)) * 255).astype(np.uint8)
        imageio.imwrite(os.path.join(root, "blur", name, f"{i:08d}.png"), img)
        imageio.imwrite(os.path.join(root, "gt", name, f"{i:08d}.png"), img)
        if with_bm:
            imageio.imwrite(os.path.join(root, "Blur_map", name, f"{i:08d}.png"),
                            img[..., 0])
    return root


def _cfg(root):
    cfg = set_template(Config(template="SPEINet"))
    return cfg.replace(dir_data=str(root), dir_data_test=str(root),
                       patch_size=16, batch_size=2, n_threads=2)


def test_bm_mode(tmp_path):
    root = _tree(tmp_path / "bm", with_bm=True)
    ds = VideoDataset(_cfg(root), train=True, mode="bm")
    out = ds.__getitem__(0, rng=np.random.default_rng(0))
    assert len(out) == 5
    inputs, gt, labels, names, bms = out
    assert inputs.shape == (5, 3, 16, 16)
    assert bms.shape == (3, 1, 16, 16)
    it = BatchIterator(ds, 2, shuffle=False, seed=0, n_threads=2)
    batch = next(iter(it))
    assert len(batch) == 5 and batch[4].shape == (2, 3, 1, 16, 16)


def test_plain_mode(tmp_path):
    root = _tree(tmp_path / "plain", with_label=False)
    ds = VideoDataset(_cfg(root), train=True, mode="plain")
    inputs, gt, labels, names = ds.__getitem__(0, rng=np.random.default_rng(0))
    assert inputs.shape == (3, 3, 16, 16)   # no sharp frames appended
    assert gt.shape == (3, 3, 16, 16)


def test_make_dataset_registry(tmp_path):
    root = _tree(tmp_path / "r", with_bm=True)
    cfg = _cfg(root)
    assert make_dataset(cfg, "DVD_NFS", True).mode == "nsf"
    assert make_dataset(cfg, "DVD", True).mode == "bm"
    assert make_dataset(cfg, "DVD_ORI", True).mode == "plain"
