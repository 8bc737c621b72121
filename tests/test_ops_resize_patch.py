"""Parity tests: bicubic upsample and unfold/fold/gather_fold vs torch."""

import numpy as np
import jax.numpy as jnp
import torch
import torch.nn.functional as F

from speinet_tpu.ops.resize import bicubic_upsample
from speinet_tpu.ops.patch_ops import unfold, fold, gather_fold


def test_bicubic_x2_matches_torch(rng):
    x = rng.random((2, 3, 13, 17)).astype(np.float32)
    got = np.asarray(bicubic_upsample(jnp.asarray(x), 2))
    want = F.interpolate(torch.from_numpy(x), scale_factor=2, mode="bicubic",
                         align_corners=False).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_bicubic_x4_matches_torch(rng):
    x = rng.random((1, 2, 9, 11)).astype(np.float32)
    got = np.asarray(bicubic_upsample(jnp.asarray(x), 4))
    want = F.interpolate(torch.from_numpy(x), scale_factor=4, mode="bicubic",
                         align_corners=False).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_bicubic_nhwc_matches_nchw(rng):
    from speinet_tpu.ops.resize import bicubic_upsample_nhwc

    x = rng.random((2, 7, 9, 5)).astype(np.float32)
    for scale in (2, 4):
        got = np.asarray(bicubic_upsample_nhwc(jnp.asarray(x), scale))
        want = np.asarray(bicubic_upsample(
            jnp.asarray(x.transpose(0, 3, 1, 2)), scale)).transpose(0, 2, 3, 1)
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)
    # bf16 input: taps still accumulate in f32
    xb = jnp.asarray(x, jnp.bfloat16)
    got = np.asarray(bicubic_upsample_nhwc(xb, 2).astype(jnp.float32))
    want = np.asarray(bicubic_upsample(
        jnp.asarray(x.transpose(0, 3, 1, 2)), 2)).transpose(0, 2, 3, 1)
    np.testing.assert_allclose(got, want, rtol=2e-2, atol=2e-2)


def test_unfold_matches_torch(rng):
    x = rng.random((2, 4, 10, 12)).astype(np.float32)
    for k, s, p in [(3, 1, 1), (6, 2, 2), (12, 4, 4)]:
        got = np.asarray(unfold(jnp.asarray(x), k, s, p))
        want = F.unfold(torch.from_numpy(x), kernel_size=k, stride=s, padding=p).numpy()
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6, err_msg=f"k={k}")


def test_fold_matches_torch(rng):
    for (k, s, p), out in [((3, 1, 1), (8, 10)), ((6, 2, 2), (16, 20)), ((12, 4, 4), (32, 40))]:
        nh = (out[0] + 2 * p - k) // s + 1
        nw = (out[1] + 2 * p - k) // s + 1
        patches = rng.random((2, 3 * k * k, nh * nw)).astype(np.float32)
        got = np.asarray(fold(jnp.asarray(patches), out, k, s, p))
        want = F.fold(torch.from_numpy(patches), output_size=out, kernel_size=k,
                      stride=s, padding=p).numpy()
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5, err_msg=f"k={k}")


def torch_bis(inp, dim, index):
    """Reference batched index-select (SearchTransfer.py:12-22)."""
    views = [inp.size(0)] + [1 if i != dim else -1 for i in range(1, len(inp.size()))]
    expanse = list(inp.size())
    expanse[0] = -1
    expanse[dim] = -1
    index = index.view(views).expand(expanse)
    return torch.gather(inp, dim, index)


def test_gather_fold_matches_reference_chain(rng):
    """gather_fold == fold(bis(unfold(ref)), ...) / via torch ops."""
    h, w = 8, 10  # lv3 grid
    for s in (1, 2, 4):
        k, p = 3 * s, s
        ref = rng.random((2, 5, h * s, w * s)).astype(np.float32)
        idx = rng.integers(0, h * w, size=(2, h * w))
        tref = torch.from_numpy(ref)
        tun = F.unfold(tref, kernel_size=k, stride=s, padding=p)
        tgath = torch_bis(tun, 2, torch.from_numpy(idx))
        want = F.fold(tgath, output_size=(h * s, w * s), kernel_size=k, stride=s,
                      padding=p).numpy()
        got = np.asarray(gather_fold(jnp.asarray(ref), jnp.asarray(idx), s))
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5, err_msg=f"s={s}")


def test_gather_fold_seg9_matches_tiles(rng):
    """Single-patch-row gather layout == original 9-row tiles layout."""
    import jax.numpy as jnp
    from speinet_tpu.ops.patch_ops import (gather_fold_nhwc_seg9,
                                           gather_fold_nhwc_tiles)

    for s, h, w, c in ((1, 12, 16, 5), (2, 12, 16, 4), (4, 16, 24, 3)):
        nh, nw = h // s, w // s
        ref = jnp.asarray(rng.random((2, h, w, c)).astype(np.float32))
        idx = jnp.asarray(rng.integers(0, nh * nw, (2, nh * nw)),
                          dtype=jnp.int32)
        a = gather_fold_nhwc_tiles(ref, idx, s)
        b = gather_fold_nhwc_seg9(ref, idx, s)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_gather_fold_shift9_matches_tiles(rng):
    """Pre-shifted-index fold layout (the round-5 default) == the original
    9-row tiles layout, bit-exact, incl. edge tiles where the out-of-range
    query shifts hit the zero-sentinel corner tile."""
    import jax.numpy as jnp
    from speinet_tpu.ops.patch_ops import (gather_fold_nhwc_shift9,
                                           gather_fold_nhwc_tiles)

    for s, h, w, c in ((1, 12, 16, 5), (2, 12, 16, 4), (4, 16, 24, 3)):
        nh, nw = h // s, w // s
        ref = jnp.asarray(rng.random((2, h, w, c)).astype(np.float32))
        idx = jnp.asarray(rng.integers(0, nh * nw, (2, nh * nw)),
                          dtype=jnp.int32)
        a = gather_fold_nhwc_tiles(ref, idx, s)
        b = gather_fold_nhwc_shift9(ref, idx, s)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # corner stress: every query maps to the grid corners
    s, h, w, c = 2, 8, 8, 3
    nh, nw = h // s, w // s
    ref = jnp.asarray(rng.random((1, h, w, c)).astype(np.float32))
    for v in (0, nw - 1, nh * nw - nw, nh * nw - 1):
        idx = jnp.full((1, nh * nw), v, jnp.int32)
        np.testing.assert_array_equal(
            np.asarray(gather_fold_nhwc_tiles(ref, idx, s)),
            np.asarray(gather_fold_nhwc_shift9(ref, idx, s)))
