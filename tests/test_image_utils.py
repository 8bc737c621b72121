"""Heritage util parity: ycbcr conversions vs the reference formulas (and
cv2), AdaIN vs a torch replica, AverageMeter/crop_border semantics."""

import numpy as np
import torch

from speinet_tpu.utils.image_utils import (AverageMeter,
                                           adaptive_instance_normalization,
                                           bgr2ycbcr, crop_border, crop_like,
                                           rgb2ycbcr)


def test_rgb2ycbcr_uint8_matches_formula(rng):
    img = (rng.random((8, 9, 3)) * 255).astype(np.uint8)
    y = rgb2ycbcr(img)
    ref = (img.astype(np.float64) @ np.array([65.481, 128.553, 24.966])
           / 255.0 + 16.0).round().astype(np.uint8)
    np.testing.assert_array_equal(y, ref)
    assert y.dtype == np.uint8
    full = rgb2ycbcr(img, only_y=False)
    assert full.shape == (8, 9, 3)


def test_bgr2ycbcr_is_rgb_on_reversed_channels(rng):
    img = (rng.random((6, 7, 3)) * 255).astype(np.uint8)
    np.testing.assert_array_equal(bgr2ycbcr(img), rgb2ycbcr(img[..., ::-1]))


def test_rgb2ycbcr_float_range(rng):
    img = rng.random((5, 5, 3)).astype(np.float32)
    y = rgb2ycbcr(img.copy())
    assert y.dtype == np.float32
    assert (y >= 16 / 255 - 1e-5).all() and (y <= 235 / 255 + 1e-5).all()


def test_adain_matches_torch_replica(rng):
    """Parity with network_utils.py:217-234 executed in torch."""
    b, m, c, p, sp, k = 2, 3, 4, 6, 5, 7
    center = rng.standard_normal((b, m, c, p)).astype(np.float32)
    knn = rng.standard_normal((b, m, c, sp, k)).astype(np.float32)

    ct, kt = torch.from_numpy(center), torch.from_numpy(knn)
    c_std = (ct.var(dim=3) + 1e-5).sqrt().view(b, m, c, 1, 1)
    c_mean = ct.mean(dim=3).view(b, m, c, 1, 1)
    k_std = (kt.var(dim=3) + 1e-5).sqrt().view(b, m, c, 1, k)
    k_mean = kt.mean(dim=3).view(b, m, c, 1, k)
    ref = ((kt - k_mean) / k_std) * c_std + c_mean

    got = np.asarray(adaptive_instance_normalization(center, knn))
    np.testing.assert_allclose(got, ref.numpy(), rtol=1e-5, atol=1e-5)


def test_average_meter_and_crops(rng):
    am = AverageMeter()
    am.update(2.0)
    am.update(4.0, n=3)
    assert am.avg == (2.0 + 12.0) / 4
    assert "4.0" in repr(am)

    imgs = [rng.random((10, 12, 3)) for _ in range(2)]
    out = crop_border(imgs, 2)
    assert out[0].shape == (6, 8, 3)
    assert crop_border(imgs[0], 0) is imgs[0]
    assert crop_border(imgs[0], 1).shape == (8, 10, 3)

    a = rng.random((1, 3, 8, 8))
    t = rng.random((1, 3, 6, 7))
    assert crop_like(a, t).shape == (1, 3, 6, 7)
    assert crop_like(a, a) is a
