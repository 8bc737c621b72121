"""Model-stack tests: primitive parity vs torch, correlation vs naive
reference math, per-sample routing equivalence, full forward smoke."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch
import torch.nn.functional as F

from speinet_tpu.models.blocks import conv_transpose_torch
from speinet_tpu.models.search_transfer import correlation_argmax, _l2_normalize
from speinet_tpu.models.swinir import window_partition, window_reverse, SwinIRCross
from speinet_tpu.models.speinet import SPEINet
from speinet_tpu.ops.patch_ops import unfold


def test_conv_transpose_matches_torch(rng):
    x = rng.random((2, 6, 7, 4)).astype(np.float32)          # NHWC
    w = rng.random((3, 3, 8, 4)).astype(np.float32) * 0.2    # [kh,kw,out,in]
    b = rng.random((8,)).astype(np.float32)
    got = np.asarray(conv_transpose_torch(jnp.asarray(x), jnp.asarray(w),
                                          jnp.asarray(b), 2, 1, 1))
    tw = torch.from_numpy(w.transpose(3, 2, 0, 1))           # [in,out,kh,kw]
    tx = torch.from_numpy(x.transpose(0, 3, 1, 2))
    want = F.conv_transpose2d(tx, tw, torch.from_numpy(b), stride=2, padding=1,
                              output_padding=1).numpy().transpose(0, 2, 3, 1)
    assert got.shape == want.shape == (2, 12, 14, 8)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_window_partition_roundtrip(rng):
    x = jnp.asarray(rng.random((2, 10, 15, 8)).astype(np.float32))
    w = window_partition(x, 5)
    assert w.shape == (2 * 2 * 3, 25, 8)
    back = window_reverse(w, 5, 10, 15)
    np.testing.assert_array_equal(np.asarray(back), np.asarray(x))


def test_correlation_argmax_matches_naive(rng):
    """Online tiled max/argmax == torch.max(bmm(ref, lr), dim=1)."""
    b, c, h, w = 2, 6, 9, 11
    lr = rng.random((b, c, h, w)).astype(np.float32)
    ref = rng.random((b, c, h, w)).astype(np.float32)
    lru = unfold(jnp.asarray(lr), 3, 1, 1)
    refu = unfold(jnp.asarray(ref), 3, 1, 1).transpose(0, 2, 1)
    lrn = _l2_normalize(lru, axis=1)
    refn = _l2_normalize(refu, axis=2)
    s, idx = correlation_argmax(lrn, refn, chunk=16)  # non-divisible chunking
    r_full = np.einsum("bkd,bdl->bkl", np.asarray(refn), np.asarray(lrn))
    want_s = r_full.max(axis=1)
    want_idx = r_full.argmax(axis=1)
    np.testing.assert_allclose(np.asarray(s), want_s, rtol=1e-5, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(idx), want_idx)


def test_self_reference_unfold_permutation(rng):
    """The TransferUnit derives the SelfTransfer reference unfold as a pure
    permutation of the mid-feature unfold instead of a second unfold pass;
    must hold on NON-square grids (SearchTransfer.py:60 transposes H/W)."""
    b, c, hh, ww = 2, 5, 6, 10
    x = jnp.asarray(rng.standard_normal((b, c, hh, ww)).astype(np.float32))
    self_ref = jnp.flip(x.transpose(0, 1, 3, 2), axis=2)
    want = unfold(self_ref, 3, 1, 1)
    lr6 = unfold(x, 3, 1, 1).reshape(b, c, 3, 3, hh, ww)
    got = jnp.flip(lr6.transpose(0, 1, 3, 2, 5, 4),
                   axis=(2, 4)).reshape(b, c * 9, ww * hh)
    np.testing.assert_array_equal(np.asarray(want), np.asarray(got))


TINY = dict(n_feat=8, embed_dim=32, depths=(2, 2), num_heads=(4, 4),
            window_size=5, mlp_ratio=2.0, drop_path_rate=0.0, corr_chunk=64)


def smooth_video(rng, b=1, t=5, h=40, w=40):
    """Image-like smooth frames. Per-pixel white noise is pathological for
    the RL ratio term (ratio up to ~20x) and, through the reference's
    *unbounded* BatchNorm-calibrated TripletAttention gates, overflows an
    UNTRAINED net in eval mode (the torch reference behaves identically);
    real frames are smooth and stay bounded."""
    yy, xx = np.mgrid[0:h, 0:w]
    base = 0.5 + 0.25 * np.sin(xx / 6.0) * np.cos(yy / 5.0)       # [H, W]
    vid = np.stack([base + 0.02 * rng.standard_normal((h, w)) + 0.05 * k
                    for k in range(t)])                            # [T, H, W]
    vid = vid[None, :, None] * np.array([1.0, 0.9, 0.8])[None, None, :, None, None]
    vid = np.repeat(vid, b, axis=0)                                # [B, T, 3, H, W]
    return np.clip(vid, 0.05, 1.0).astype(np.float32)


@pytest.fixture(scope="module")
def tiny_model_and_params():
    model = SPEINet(**TINY)
    x = jnp.zeros((1, 5, 3, 40, 40), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x)
    return model, variables


def test_speinet_forward_shapes(tiny_model_and_params, rng):
    model, variables = tiny_model_and_params
    x = jnp.asarray(smooth_video(rng, b=2))
    out = model.apply(variables, x)
    assert out.shape == (2, 3, 40, 40)
    assert np.all(np.isfinite(np.asarray(out)))


def test_speinet_train_mode_forward(tiny_model_and_params, rng):
    """train=True path: BatchNorm batch stats mutate, droppath rng wired."""
    model, variables = tiny_model_and_params
    x = jnp.asarray(smooth_video(rng, b=2))
    out, updated = model.apply(variables, x, train=True,
                               mutable=["batch_stats"],
                               rngs={"droppath": jax.random.PRNGKey(1)})
    assert out.shape == (2, 3, 40, 40)
    assert np.all(np.isfinite(np.asarray(out)))
    assert "batch_stats" in updated


def test_speinet_routing_matches_per_sample(tiny_model_and_params, rng):
    """Masked dual-branch forward == running each sample alone (the TPU
    equivalent of the reference's host-side batch split, speinet.py:150-168).
    Eval mode: BatchNorm uses fixed stats, so samples are independent."""
    model, variables = tiny_model_and_params
    x = smooth_video(rng, b=2)
    x[0, 3] = 0.0   # sample 0: no pre-sharp frame -> self-transfer branch
    xj = jnp.asarray(x)
    batch_out = np.asarray(model.apply(variables, xj))
    single0 = np.asarray(model.apply(variables, xj[0:1]))
    single1 = np.asarray(model.apply(variables, xj[1:2]))
    np.testing.assert_allclose(batch_out[0], single0[0], rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(batch_out[1], single1[0], rtol=1e-4, atol=1e-4)
    # the two branches genuinely differ
    assert np.abs(batch_out[0] - batch_out[1]).max() > 1e-4


def test_speinet_zero_sharp_uses_self_branch(tiny_model_and_params, rng):
    """With frame[3] zeroed, changing frame[4] must not affect the output
    (the self-transfer branch ignores the sharp frames)."""
    model, variables = tiny_model_and_params
    x = smooth_video(rng, b=1)
    x[0, 3] = 0.0
    y1 = np.asarray(model.apply(variables, jnp.asarray(x)))
    x2 = x.copy()
    x2[0, 4] = smooth_video(rng, b=1)[0, 0]
    y2 = np.asarray(model.apply(variables, jnp.asarray(x2)))
    np.testing.assert_allclose(y1, y2, rtol=1e-5, atol=1e-6)


def test_swinir_cross_shapes(rng):
    m = SwinIRCross(embed_dim=32, depths=(2,), num_heads=(4,), window_size=5)
    x = jnp.asarray(rng.random((1, 10, 10, 16)).astype(np.float32))
    y = jnp.asarray(rng.random((1, 10, 10, 16)).astype(np.float32))
    variables = m.init(jax.random.PRNGKey(0), x, y)
    out = m.apply(variables, x, y)
    assert out.shape == x.shape
    # non-window-multiple size: padding path
    x2 = jnp.asarray(rng.random((1, 12, 13, 16)).astype(np.float32))
    y2 = jnp.asarray(rng.random((1, 12, 13, 16)).astype(np.float32))
    out2 = m.apply(variables, x2, y2)
    assert out2.shape == x2.shape
    assert np.all(np.isfinite(np.asarray(out2)))


def test_full_template_init_is_bounded(rng):
    """Regression: at initialization the FULL-template forward must stay
    numerically bounded. The reference's TripletAttention gates are
    unbounded (block.py:61-68: relu=False skips sigmoid too), so init
    scale is load-bearing: with flax's default lecun_normal (sqrt(3)x
    torch's kaiming_uniform(a=sqrt(5)) std) the gates compound through
    ~15 gated ResBlocks into absmax ~1e10 outputs and training diverges
    from step one. torch-default init (blocks.torch_kernel_init) keeps
    the forward ~O(0.1) at init, like the reference."""
    from speinet_tpu.config import Config, set_template
    from speinet_tpu.models.speinet import SPEINet

    cfg = set_template(Config(template="SPEINet"))
    model = SPEINet.from_config(cfg)
    x = jnp.asarray(rng.random((1, 5, 3, 80, 80)).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), x)
    out = np.asarray(model.apply(variables, x, train=False))
    assert np.all(np.isfinite(out))
    assert np.abs(out).max() < 10.0, f"init forward exploded: {np.abs(out).max()}"


def test_cached_feature_decomposition_matches_call(tiny_model_and_params, rng):
    """encode_window_legs + anchor_pyramid + restore_from_features ==
    __call__ (the cached-video inference engine's contract). Eval mode:
    the encoder is a per-sample map, so features computed in different
    batch groupings are identical."""
    model, variables = tiny_model_and_params
    x = smooth_video(rng, b=2)
    x[1, 3] = 0.0   # exercise both routing branches
    xj = jnp.asarray(x)
    want = np.asarray(model.apply(variables, xj))

    frames = xj.reshape(-1, 3, 40, 40)                     # [2*5, 3, H, W]
    m_all, n_all = model.apply(variables, frames,
                               method=SPEINet.encode_window_legs)
    p1, p2, p3 = model.apply(variables, frames,
                             method=SPEINet.anchor_pyramid)
    m_all = np.asarray(m_all).reshape(2, 5, *m_all.shape[1:])
    n_all = np.asarray(n_all).reshape(2, 5, *n_all.shape[1:])
    pick = lambda a, i: jnp.asarray(np.asarray(a).reshape(2, 5, *a.shape[1:])[:, i])
    has_sharp = ~jnp.all(xj[:, 3] == 0, axis=(1, 2, 3))
    got = np.asarray(model.apply(
        variables, jnp.asarray(m_all[:, 1]),
        (jnp.asarray(n_all[:, 0]), jnp.asarray(n_all[:, 2])),
        pick(p1, 4), pick(p2, 4), pick(p3, 4), has_sharp,
        method=SPEINet.restore_from_features))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_restore_routing_specializations_match_mixed(tiny_model_and_params,
                                                     rng):
    """The static host-known routing programs ('sharp'/'self') are
    output-identical to the 'mixed' program on batches whose has_sharp
    matches — the contract the cached engine (infer._infer_video_cached)
    and bench.py rely on when dispatching per-chunk."""
    model, variables = tiny_model_and_params
    x = smooth_video(rng, b=2)
    xj = jnp.asarray(x)
    frames = xj.reshape(-1, 3, 40, 40)
    m_all, n_all = model.apply(variables, frames,
                               method=SPEINet.encode_window_legs)
    p1, p2, p3 = model.apply(variables, frames,
                             method=SPEINet.anchor_pyramid)
    pick = lambda a, i: jnp.asarray(np.asarray(a).reshape(2, 5, *a.shape[1:])[:, i])
    m = jnp.asarray(np.asarray(m_all).reshape(2, 5, *m_all.shape[1:])[:, 1])
    nbs = (jnp.asarray(np.asarray(n_all).reshape(2, 5, *n_all.shape[1:])[:, 0]),
           jnp.asarray(np.asarray(n_all).reshape(2, 5, *n_all.shape[1:])[:, 2]))
    args = (m, nbs, pick(p1, 4), pick(p2, 4), pick(p3, 4))

    for hs_val, routing in [(True, "sharp"), (False, "self")]:
        hs = jnp.full((2,), hs_val, bool)
        want = np.asarray(model.apply(variables, *args, hs,
                                      method=SPEINet.restore_from_features))
        got = np.asarray(model.apply(variables, *args, hs, routing=routing,
                                     method=SPEINet.restore_from_features))
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6,
                                   err_msg=f"routing={routing}")


def test_convt_subpixel_matches_conv_transpose(rng):
    """ConvT(k3,s2,p1,op1) == depth_to_space(2x2-valid conv) with the
    transformed kernel (the decoder fast path, blocks.convt_subpixel_kernel)."""
    from speinet_tpu.models.blocks import convt_subpixel_kernel
    from speinet_tpu.ops.s2d import depth_to_space

    x = rng.random((2, 6, 7, 4)).astype(np.float32)          # NHWC
    w = rng.random((3, 3, 8, 4)).astype(np.float32) * 0.2    # [kh,kw,out,in]
    b = rng.random((8,)).astype(np.float32)
    want = np.asarray(conv_transpose_torch(jnp.asarray(x), jnp.asarray(w),
                                           jnp.asarray(b), 2, 1, 1))
    k2 = convt_subpixel_kernel(jnp.asarray(w))
    xp = jnp.pad(jnp.asarray(x), ((0, 0), (0, 1), (0, 1), (0, 0)))
    y = jax.lax.conv_general_dilated(
        xp, k2, (1, 1), "VALID", dimension_numbers=("NHWC", "HWIO", "NHWC"))
    got = np.asarray(depth_to_space(y + jnp.tile(jnp.asarray(b), 4)))
    assert got.shape == want.shape == (2, 12, 14, 8)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)
