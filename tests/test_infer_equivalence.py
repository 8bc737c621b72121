"""Inference-path equivalences: batched windows == per-window; self-ensemble
averages 8 consistent variants; chopped == full forward."""

import numpy as np
import jax
import jax.numpy as jnp

from speinet_tpu.models.speinet import SPEINet
from speinet_tpu.infer import forward_x8
from speinet_tpu.parallel.chop import chop_batch, chop_merge

TINY = dict(n_feat=8, embed_dim=32, depths=(2,), num_heads=(4,),
            window_size=5, mlp_ratio=2.0, drop_path_rate=0.0, corr_chunk=64)


def _model_and_vars():
    model = SPEINet(**TINY)
    x = jnp.zeros((1, 5, 3, 40, 40), jnp.float32)
    return model, model.init(jax.random.PRNGKey(0), x)


def _smooth(rng, b=1, h=40, w=40):
    yy, xx = np.mgrid[0:h, 0:w]
    base = 0.5 + 0.25 * np.sin(xx / 6.0) * np.cos(yy / 5.0)
    vid = np.stack([base + 0.02 * rng.standard_normal((h, w)) + 0.04 * k
                    for k in range(5)])
    vid = vid[None, :, None] * np.array([1.0, 0.9, 0.8])[None, None, :, None, None]
    return np.clip(np.repeat(vid, b, 0), 0.05, 1.0).astype(np.float32)


def test_batched_equals_per_window(rng):
    model, variables = _model_and_vars()
    fwd = lambda a: model.apply(variables, a)
    x1 = _smooth(rng)
    x2 = np.clip(_smooth(rng) + 0.01, 0, 1)
    batch = np.concatenate([x1, x2])
    out_b = np.asarray(fwd(jnp.asarray(batch)))
    out_1 = np.asarray(fwd(jnp.asarray(x1)))
    out_2 = np.asarray(fwd(jnp.asarray(x2)))
    np.testing.assert_allclose(out_b[0], out_1[0], rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(out_b[1], out_2[0], rtol=1e-4, atol=1e-4)


def test_forward_x8_identity_on_symmetric_fn(rng):
    """With a flip/rot-equivariant function, the ensemble is exact."""
    x = jnp.asarray(_smooth(rng))
    fwd = lambda a: a[:, 1] * 2.0          # equivariant toy model
    out = forward_x8(x, fwd)
    np.testing.assert_allclose(np.asarray(out), np.asarray(x[:, 1] * 2.0),
                               rtol=1e-6)


def test_forward_x8_real_model_shape(rng):
    model, variables = _model_and_vars()
    fwd = lambda a: model.apply(variables, a)
    out = forward_x8(jnp.asarray(_smooth(rng)), fwd)
    assert out.shape == (1, 3, 40, 40)
    assert np.isfinite(np.asarray(out)).all()


def test_chopped_close_to_full(rng):
    """4-tile chop with halo should match the full forward away from tile
    seams (the reference accepts the same approximation)."""
    model, variables = _model_and_vars()
    fwd = lambda a: model.apply(variables, a)
    # tile dims (h//2+shave) must stay divisible by size_must_mode=4, the
    # same invariant the reference's forward_chop relies on
    x = jnp.asarray(_smooth(rng, h=64, w=96))
    full = np.asarray(fwd(x))
    tiles = chop_batch(x, shave=8)
    y = fwd(tiles)
    merged = np.asarray(chop_merge(y, 64, 96))
    assert merged.shape == full.shape
    assert np.isfinite(merged).all()
    # chop is an approximation for this model: SearchTransfer's correlation,
    # SE means and Triplet pools are GLOBAL operators, so tiles see
    # different context (true of the reference's forward_chop as well).
    # Sanity: the chopped output stays in the same regime as the full one.
    err = np.abs(merged - full).mean()
    scale = full.std() + 1e-6
    assert err < 0.5 * scale


def test_recursive_chop_exact_for_local_fn(rng):
    """chop_forward recurses above 6*min_size pixels; for a function with a
    receptive field smaller than the shave the result is EXACT at every
    level (seams included). A 24x32 frame with min_size=40 forces
    multi-level recursion (parity: inference_SPEINet.py:545,565,578-584)."""
    from speinet_tpu.ops.filters import box_blur_separable
    from speinet_tpu.parallel.chop import chop_forward

    x = jnp.asarray(rng.random((2, 5, 3, 24, 32)).astype(np.float32))
    fwd = lambda t: box_blur_separable(t[:, 1], 5)   # receptive 2 < shave
    full = np.asarray(fwd(x))

    calls = []
    def spy(t):
        calls.append(t.shape)
        return fwd(t)

    out = np.asarray(chop_forward(spy, x, shave=6, min_size=40))
    assert out.shape == (2, 3, 24, 32)
    np.testing.assert_allclose(out, full, rtol=1e-5, atol=1e-6)
    assert len(calls) > 1              # recursion actually happened
    assert all(s[-2] * s[-1] < 6 * 40 for s in calls)   # leaves small enough


def test_recursive_chop_real_model_big_frame(rng):
    """A >6*min_size frame through the tiny SPEINet: shape + finite.
    min_size=400 gives one recursion level with tile dims still %4
    (the model's size_must_mode invariant, as in the reference)."""
    from speinet_tpu.parallel.chop import chop_forward

    model, variables = _model_and_vars()
    fwd = lambda a: model.apply(variables, a)
    x = jnp.asarray(_smooth(rng, h=64, w=96))
    out = np.asarray(chop_forward(fwd, x, shave=8, min_size=400))
    assert out.shape == (1, 3, 64, 96)
    assert np.isfinite(out).all()


def test_cached_pyramid_engine_matches_direct(tmp_path, rng):
    """The cross-window feature-caching engine (infer --cache_pyramids)
    must reproduce the direct path's per-frame metrics, including windows
    that hit the >7-distance zero rule (pre: has_sharp=False routing;
    sub: zero-frame anchor pyramid) and trailing-batch padding."""
    import os
    import imageio.v2 as imageio
    from speinet_tpu.config import Config, set_template
    from speinet_tpu.infer import Inference

    root = tmp_path / "ds"
    h, w, n = 48, 64, 14
    yy, xx = np.mgrid[0:h, 0:w]
    os.makedirs(root / "label")
    name = "video00"
    os.makedirs(root / "blur" / name)
    os.makedirs(root / "gt" / name)
    labels = np.zeros(n, np.int64)
    labels[[0, 13]] = 1        # mid-video windows are >7 from both anchors
    for i in range(n):
        img = (127 + 90 * np.sin(xx / 5.0 + i) * np.cos(yy / 4.0)
               + 8 * rng.standard_normal((h, w)))
        img = np.stack([img] * 3, -1).clip(0, 255).astype(np.uint8)
        imageio.imwrite(root / "blur" / name / f"{i:08d}.png", img)
        imageio.imwrite(root / "gt" / name / f"{i:08d}.png", img)
    np.save(root / "label" / (name + ".npy"), labels)

    cfg = set_template(Config(template="SPEINet")).replace(
        n_feat=8, embed_dim=32, depths=[2], num_heads=[4], n_threads=2)
    inf_d = Inference(cfg, str(root), model_path="",
                      result_path=str(tmp_path / "res_direct"),
                      save_image=False)
    psnr_d, ssim_d = inf_d.infer()
    # same random-init weights: seed is fixed inside _load_weights
    inf_c = Inference(cfg, str(root), model_path="",
                      result_path=str(tmp_path / "res_cached"),
                      save_image=False, batch_windows=3, cache_pyramids=True)
    psnr_c, ssim_c = inf_c.infer()
    assert abs(psnr_d - psnr_c) < 0.05
    assert abs(ssim_d - ssim_c) < 1e-3
    # per-frame equality: a single-window routing divergence (e.g. the
    # center-vs-last-frame zero-rule off-by-one) must not hide in the mean
    for v in inf_d.total_psnr:
        np.testing.assert_allclose(inf_c.total_psnr[v], inf_d.total_psnr[v],
                                   rtol=0, atol=0.02)
        np.testing.assert_allclose(inf_c.total_ssim[v], inf_d.total_ssim[v],
                                   rtol=0, atol=1e-3)


def _make_video_tree(root, rng, h=48, w=64, n=10):
    import os
    import imageio.v2 as imageio

    yy, xx = np.mgrid[0:h, 0:w]
    os.makedirs(root / "label")
    name = "video00"
    os.makedirs(root / "blur" / name)
    os.makedirs(root / "gt" / name)
    labels = np.zeros(n, np.int64)
    labels[::3] = 1
    for i in range(n):
        img = (127 + 90 * np.sin(xx / 5.0 + i) * np.cos(yy / 4.0)
               + 8 * rng.standard_normal((h, w)))
        img = np.stack([img] * 3, -1).clip(0, 255).astype(np.uint8)
        imageio.imwrite(root / "blur" / name / f"{i:08d}.png", img)
        imageio.imwrite(root / "gt" / name / f"{i:08d}.png", img)
    np.save(root / "label" / (name + ".npy"), labels)
    return root


def test_multichip_inference_matches_single_device(tmp_path, rng):
    """--dp_devices N shards the window batch over the dp mesh with
    per-frame outputs identical to the single-device engine (VERDICT r2
    #2; reference analog: inference_SPEINet.py:234-235 DataParallel)."""
    from speinet_tpu.config import Config, set_template
    from speinet_tpu.infer import Inference

    root = _make_video_tree(tmp_path / "ds", rng)
    cfg = set_template(Config(template="SPEINet")).replace(
        n_feat=8, embed_dim=32, depths=[2], num_heads=[4], n_threads=2)
    inf_1 = Inference(cfg.replace(dp_devices=1), str(root), model_path="",
                      result_path=str(tmp_path / "res1"), save_image=False,
                      batch_windows=4)
    psnr_1, _ = inf_1.infer()

    inf_8 = Inference(cfg.replace(dp_devices=8), str(root), model_path="",
                      result_path=str(tmp_path / "res8"), save_image=False,
                      batch_windows=4)   # auto-bumped to fill the mesh
    assert inf_8.mesh is not None and inf_8.mesh.size == 8
    assert inf_8.batch_windows == 8
    psnr_8, _ = inf_8.infer()
    assert abs(psnr_1 - psnr_8) < 0.05
    for v in inf_1.total_psnr:
        np.testing.assert_allclose(inf_8.total_psnr[v], inf_1.total_psnr[v],
                                   rtol=0, atol=0.02)


def test_multichip_cached_engine_matches_single_device(tmp_path, rng):
    """The cached-pyramid engine under a dp mesh: legs/restore batches are
    sharded over the devices; outputs match the unsharded engine."""
    from speinet_tpu.config import Config, set_template
    from speinet_tpu.infer import Inference

    root = _make_video_tree(tmp_path / "ds", rng)
    cfg = set_template(Config(template="SPEINet")).replace(
        n_feat=8, embed_dim=32, depths=[2], num_heads=[4], n_threads=2)
    inf_1 = Inference(cfg.replace(dp_devices=1), str(root), model_path="",
                      result_path=str(tmp_path / "res1"), save_image=False,
                      batch_windows=4, cache_pyramids=True)
    psnr_1, _ = inf_1.infer()
    inf_8 = Inference(cfg.replace(dp_devices=8), str(root), model_path="",
                      result_path=str(tmp_path / "res8"), save_image=False,
                      batch_windows=4, cache_pyramids=True)
    psnr_8, _ = inf_8.infer()
    assert abs(psnr_1 - psnr_8) < 0.05
    for v in inf_1.total_psnr:
        np.testing.assert_allclose(inf_8.total_psnr[v], inf_1.total_psnr[v],
                                   rtol=0, atol=0.02)


def test_multichip_chop_inference(tmp_path, rng):
    """--chop under a dp mesh distributes the 4 tiles (the reference's
    <=4-GPU forward_chop, inference_SPEINet.py:569)."""
    from speinet_tpu.config import Config, set_template
    from speinet_tpu.infer import Inference

    root = _make_video_tree(tmp_path / "ds", rng, n=6)
    cfg = set_template(Config(template="SPEINet")).replace(
        n_feat=8, embed_dim=32, depths=[2], num_heads=[4], n_threads=2,
        chop=True, chop_shave=8)
    inf_1 = Inference(cfg.replace(dp_devices=1), str(root), model_path="",
                      result_path=str(tmp_path / "res1"), save_image=False)
    psnr_1, _ = inf_1.infer()
    inf_4 = Inference(cfg.replace(dp_devices=4), str(root), model_path="",
                      result_path=str(tmp_path / "res4"), save_image=False)
    assert inf_4.mesh is not None and inf_4.mesh.size == 4
    psnr_4, _ = inf_4.infer()
    assert abs(psnr_1 - psnr_4) < 0.05
    for v in inf_1.total_psnr:
        np.testing.assert_allclose(inf_4.total_psnr[v], inf_1.total_psnr[v],
                                   rtol=0, atol=0.02)
