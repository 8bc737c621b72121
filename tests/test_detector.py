"""Detector tests: focus-measure parity vs torch reference formulas,
classifier fitting quality, end-to-end detector training pipeline."""

import numpy as np
import jax.numpy as jnp
import pytest
import torch
from torch.nn.functional import avg_pool2d, conv2d, lp_pool2d

from speinet_tpu.detector.classifier import (DecisionTree, LogisticRegressionJAX,
                                             RandomForest, binary_metrics,
                                             fit_logistic_regression)
from speinet_tpu.detector.features import focus_features


def torch_focus(frames_rgb_255: np.ndarray, kernel_size: int):
    """Reference formulas (LD_detector_gopros_train.py:118-175), torch CPU,
    for the 5 non-wavelet measures."""
    t = torch.from_numpy(frames_rgb_255.astype(np.float32))
    gray = (0.2989 * t[:, 0] + 0.587 * t[:, 1] + 0.114 * t[:, 2])[:, None] / 255.0
    k = kernel_size

    lap_k = torch.tensor([[1, 1, 1], [1, -8, 1], [1, 1, 1]], dtype=torch.float32)[None, None]
    la = conv2d(gray, lap_k, padding=1)
    lap1 = (lp_pool2d(la, norm_type=2, kernel_size=k) ** 2).mean(dim=(1, 2, 3))

    mis3_filter = torch.zeros((9, 1, 3, 3))
    mis3_filter[:, :, 1, 1] = 1
    coords = [(0, 0), (0, 1), (0, 2), (1, 0), (1, 1), (1, 2), (2, 0), (2, 1), (2, 2)]
    for i, (r, c) in enumerate(coords):
        if i == 4:
            mis3_filter[4, 0, 1, 1] = 0
        else:
            mis3_filter[i, 0, r, c] = -1
    contrast = conv2d(gray, mis3_filter, padding=1).abs().sum(dim=1, keepdim=True)
    mis3 = lp_pool2d(contrast, norm_type=1, kernel_size=k).mean(dim=(1, 2, 3))

    gx = torch.tensor([[1.0, 0, -1], [2, 0, -2], [1, 0, -1]])
    gy = torch.tensor([[1.0, 2, 1], [0, 0, 0], [-1, -2, -1]])
    g2 = torch.cat([gx[None], gy[None]], 0)[:, None]
    sob = conv2d(gray, g2, padding=1)
    sob = torch.sum(sob ** 2, dim=1, keepdim=True).sqrt()
    g_bar = avg_pool2d(sob, kernel_size=k, padding=k // 2, stride=1)
    gra7 = (lp_pool2d(sob - g_bar, kernel_size=k, norm_type=2) ** 2).mean(dim=(1, 2, 3))

    avg = avg_pool2d(gray, kernel_size=k, padding=k // 2, stride=1)
    sta3 = (lp_pool2d(gray - avg, kernel_size=k, norm_type=2) ** 2).mean(dim=(1, 2, 3))

    mask_k = torch.tensor([[1.0, 1, -1, -1], [1, 1, -1, -1],
                           [-1, -1, 1, 1], [-1, -1, 1, 1]])[None, None]
    dct = conv2d(gray, mask_k)
    dct3 = (lp_pool2d(dct, kernel_size=k, norm_type=1) ** 2).mean(dim=(1, 2, 3))

    return [z.numpy() for z in (lap1, mis3, gra7, sta3, dct3)]


def test_focus_measures_match_torch(rng):
    frames = (rng.random((3, 3, 48, 64)) * 255).astype(np.float32)
    got = np.asarray(focus_features(jnp.asarray(frames), kernel_size=11))
    lap1, mis3, gra7, sta3, dct3 = torch_focus(frames, 11)
    np.testing.assert_allclose(got[:, 0], lap1, rtol=1e-4)
    np.testing.assert_allclose(got[:, 1], mis3, rtol=1e-4)
    np.testing.assert_allclose(got[:, 3], gra7, rtol=1e-3)
    np.testing.assert_allclose(got[:, 4], sta3, rtol=1e-3)
    np.testing.assert_allclose(got[:, 5], dct3, rtol=1e-3, atol=1e-3)


def test_focus_separates_sharp_from_blurry(rng):
    """Sharper frames must score higher on LAP1/GRA7 (the physical property
    the detector relies on)."""
    yy, xx = np.mgrid[0:64, 0:64]
    sharp = (127 + 120 * np.sign(np.sin(xx / 3.0)))[None].repeat(3, 0)[None]
    from scipy.ndimage import uniform_filter
    blurry = uniform_filter(sharp.astype(float), size=(1, 1, 5, 5))
    f = np.asarray(focus_features(jnp.asarray(
        np.concatenate([sharp, blurry]).astype(np.float32)), 11))
    assert f[0, 0] > 2 * f[1, 0]   # lap1
    assert f[0, 3] > 2 * f[1, 3]   # gra7


def test_logistic_regression_fit(rng):
    n = 400
    x = rng.standard_normal((n, 6)) * np.array([1e3, 10, 1e6, 1, 1e-3, 100.0])
    w_true = np.array([1e-3, 0.5, 1e-6, 2.0, 50.0, 0.0])
    y = ((x @ w_true + 0.3 * rng.standard_normal(n)) > 0).astype(int)
    lr = fit_logistic_regression(x, y)
    m = binary_metrics(y, np.asarray(lr.predict(x)))
    assert m["accuracy"] > 0.93
    # save/load roundtrip
    import tempfile, os
    with tempfile.TemporaryDirectory() as d:
        p = os.path.join(d, "lr.pkl")
        lr.save(p)
        lr2 = LogisticRegressionJAX.load(p)
        np.testing.assert_array_equal(np.asarray(lr.predict(x)),
                                      np.asarray(lr2.predict(x)))


def test_logistic_regression_matches_sklearn(rng):
    """Same decision quality as sklearn's default LogisticRegression (the
    reference's classifier) on separable standardized data."""
    from sklearn.linear_model import LogisticRegression
    from sklearn.preprocessing import StandardScaler
    n = 500
    x = rng.standard_normal((n, 6))
    y = ((x @ np.array([1.0, -2, 0.5, 0, 1, -1]) + 0.2 * rng.standard_normal(n)) > 0).astype(int)
    mine = fit_logistic_regression(x, y)
    sk = LogisticRegression().fit(StandardScaler().fit_transform(x), y)
    agree = (np.asarray(mine.predict(x)) == sk.predict(StandardScaler().fit_transform(x))).mean()
    assert agree > 0.98


def test_decision_tree(rng):
    x = rng.standard_normal((300, 4))
    y = ((x[:, 0] > 0.2) & (x[:, 2] < 0.5)).astype(int)
    dt = DecisionTree().fit(x, y)
    assert (dt.predict(x) == y).mean() == 1.0   # CART fits training data fully
    x2 = rng.standard_normal((200, 4))
    y2 = ((x2[:, 0] > 0.2) & (x2[:, 2] < 0.5)).astype(int)
    assert (dt.predict(x2) == y2).mean() > 0.9


def test_random_forest(rng, tmp_path):
    """Bagged ensemble (parity: the reference's RandomForestClassifier,
    sharp_detector_params_estimation_parallel.py:247): generalizes at least
    as well as a single tree on noisy data, pickles, and is deterministic
    per seed."""
    n = 400
    x = rng.standard_normal((n, 6))
    clean = ((x[:, 0] > 0.2) & (x[:, 2] < 0.5)).astype(int)
    flip = rng.random(n) < 0.1                      # 10% label noise
    y = np.where(flip, 1 - clean, clean)
    x2 = rng.standard_normal((500, 6))
    y2 = ((x2[:, 0] > 0.2) & (x2[:, 2] < 0.5)).astype(int)

    rf = RandomForest(n_estimators=30, seed=1).fit(x, y)
    acc_rf = (rf.predict(x2) == y2).mean()
    acc_dt = (DecisionTree().fit(x, y).predict(x2) == y2).mean()
    assert acc_rf > 0.88
    assert acc_rf >= acc_dt - 0.02                  # bagging smooths the noise

    p = str(tmp_path / "rf.pkl")
    rf.save(p)
    rf2 = RandomForest.load(p)
    np.testing.assert_array_equal(rf.predict(x2), rf2.predict(x2))
    rf3 = RandomForest(n_estimators=30, seed=1).fit(x, y)
    np.testing.assert_array_equal(rf.predict(x2), rf3.predict(x2))
    proba = rf.predict_proba(x2)
    assert proba.shape == (500, 2)
    np.testing.assert_allclose(proba.sum(-1), 1.0)


def test_detector_end_to_end(tmp_path, rng):
    """Synthesize videos -> generate GoProRS tree -> train detectors ->
    eval per-video accuracy (the full LD_detector pipeline in miniature)."""
    import imageio.v2 as imageio
    import os
    from speinet_tpu.data.gopro_rs import generate_dataset
    from speinet_tpu.detector.train import (collate_pregenerated,
                                            evaluate_videos, train_detectors)
    from speinet_tpu.detector.classifier import LogisticRegressionJAX

    src = tmp_path / "sharp"
    yy, xx = np.mgrid[0:32, 0:32]
    for v in range(2):
        os.makedirs(src / f"v{v}")
        for i in range(120):
            phase = i * 0.7 + v
            img = (127 + 120 * np.sin(xx / 2.5 + phase) * np.cos(yy / 3.0))
            img = np.stack([img] * 3, -1).clip(0, 255).astype(np.uint8)
            imageio.imwrite(str(src / f"v{v}" / f"{i:04d}.png"), img)
    out = tmp_path / "rs"
    generate_dataset(str(src), str(out), ratios=(0.4,), mixed=False, seed=3)
    x, y = collate_pregenerated(str(out), kernel_size=7)
    assert x.shape[1] == 6 and len(x) == len(y)
    assert 0 < y.mean() < 1    # both classes present
    res = train_detectors(x, y, str(tmp_path / "pkl"), ratio=0.4,
                          kernel_size=7, csv_path=str(tmp_path / "out.csv"),
                          n_forest_trees=20)
    assert res["LogisticRegression"]["accuracy"] > 0.7   # sharp/blur separable
    assert (tmp_path / "pkl" / "RandomForest_0.4_7.pkl").exists()
    assert res["RandomForest"]["accuracy"] > 0.6
    lr = LogisticRegressionJAX.load(str(tmp_path / "pkl" / "LogisticRegression_0.4_7.pkl"))
    ev = evaluate_videos(str(out), lr, kernel_size=7)
    assert ev["__total__"]["accuracy"] > 0.7
    assert (tmp_path / "out.csv").exists()
