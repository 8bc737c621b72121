"""Granular slope-profile of the video-mode per-frame cost at bench
conditions (batch 8, bf16, 720p): swin kernel vs swin glue (rolls, RSTB
conv, embed), encoder legs, ResBlock internals, decode sub-stages, bicubic
upsample sites, corr prep, gather_folds, and the full restore tail at
routing='sharp'. Run on the TPU when it is free; each piece is its own
jitted program chained through a scalar data dependency (the remote relay
evaluates lazily, so cost is the slope between 1- and n-iteration runs).

    python scripts/ab_restore.py [batch=8] [filter-substrings ...]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

FILTERS = [a for a in sys.argv[2:]]


def want(name):
    return not FILTERS or any(f in name for f in FILTERS)


def slope(fn, x0, name, n=4, reps=2):
    import jax.numpy as jnp

    if not want(name):
        return

    def run(k):
        x = x0
        out = None
        t0 = time.time()
        for _ in range(k):
            x, out = fn(x)
        float(jnp.sum(out.astype(jnp.float32)))
        return time.time() - t0

    t0 = time.time()
    run(1)
    comp = time.time() - t0
    t1 = min(run(1) for _ in range(reps))
    t2 = min(run(1 + n) for _ in range(reps))
    print(f"{name:44s} {(t2-t1)/n*1000:9.2f} ms   (compile {comp:.0f}s)",
          flush=True)


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from speinet_tpu.utils.compile_cache import enable_compile_cache
    enable_compile_cache()
    from speinet_tpu.config import Config, set_template
    from speinet_tpu.models.speinet import SPEINet
    from speinet_tpu.models.swinir import SwinBlock
    from speinet_tpu.models.recons_video import ReconsVideo
    from speinet_tpu.ops.resize import bicubic_upsample_nhwc
    from speinet_tpu.utils.init_cache import cached_init

    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    dt = jnp.bfloat16
    cfg = set_template(Config(template="SPEINet")).replace(
        compute_dtype="bfloat16")
    model = SPEINet.from_config(cfg)
    variables = cached_init(model, jax.random.PRNGKey(0),
                            jnp.zeros((1, 5, 3, 80, 80), jnp.float32))
    h, w = 720, 1280
    h4, w4 = h // 4, w // 4
    f = cfg.n_feat
    key = jax.random.PRNGKey(1)

    def mk(shape, scale=0.1, dtype=dt):
        return (jax.random.normal(key, shape, jnp.float32) * scale).astype(dtype)

    def chain(jfn):
        @jax.jit
        def step(x):
            out = jfn(x)
            leaves = jax.tree_util.tree_leaves(out)
            s = sum(jnp.mean(l.astype(jnp.float32)) for l in leaves)
            return x * (1.0 + 1e-12 * s), leaves[0]
        return step

    # ---------------- restore tail (the actual video-mode per-frame tail)
    m_feat = mk((batch, h4, w4, 4 * f))
    nb1 = mk((batch, h4, w4, 4 * f))
    nb2 = mk((batch, h4, w4, 4 * f))
    s1 = mk((batch, h, w, f))
    s2 = mk((batch, h // 2, w // 2, 2 * f))
    s3 = mk((batch, h4, w4, 4 * f))
    hs = jnp.ones((batch,), bool)

    def _restore(x):
        return model.apply(variables, x, (nb1, nb2), s1, s2, s3, hs,
                           False, "sharp",
                           method=SPEINet.restore_from_features)
    slope(chain(_restore), m_feat, f"restore tail sharp x{batch}")

    # ---------------- swin pieces at video batch (2 legs x batch)
    b2 = 2 * batch
    xs = mk((b2, h4 * w4, 256))
    blk_w = SwinBlock(dim=256, num_heads=8, window_size=5, shift_size=0,
                      mlp_ratio=2.0, dtype=dt)
    blk_sw = SwinBlock(dim=256, num_heads=8, window_size=5, shift_size=2,
                       mlp_ratio=2.0, dtype=dt)
    vw = blk_w.init(jax.random.PRNGKey(0), xs[:1], xs[:1], (h4, w4), True)
    vsw = blk_sw.init(jax.random.PRNGKey(0), xs[:1], xs[:1], (h4, w4), True)
    slope(chain(lambda t: blk_w.apply(vw, t, t, (h4, w4), True)), xs,
          f"swin W block x{b2}")
    slope(chain(lambda t: blk_sw.apply(vsw, t, t, (h4, w4), True)), xs,
          f"swin SW block x{b2}")

    ximg = mk((b2, h4, w4, 256))
    slope(chain(lambda t: jnp.roll(t, (2, 2), axis=(1, 2))), ximg,
          f"jnp.roll x{b2} (1 of 3/SW-block)")

    from speinet_tpu.models.swinir import RSTB
    rstb = RSTB(256, 6, 8, 5, 2.0, drop_path=[0.0] * 6, dtype=dt)
    vr = rstb.init(jax.random.PRNGKey(0), xs[:1], xs[:1], (h4, w4), True)
    slope(chain(lambda t: rstb.apply(vr, t, t, (h4, w4), True)), xs,
          f"RSTB (6 blocks + conv) x{b2}")

    # ---------------- encoder (video: 3 legs per new frame)
    frames = mk((batch, 3, h, w), scale=0.3, dtype=jnp.float32)

    def _legs(x):
        return model.apply(variables, x, method=SPEINet.encode_window_legs)
    slope(chain(_legs), frames, f"encode_window_legs x{batch} (3 legs ea)")

    enc = ReconsVideo(n_feat=f, n_resblock=cfg.n_resblock, out_channels=3,
                      dtype=dt)
    ev = {"params": variables["params"]["recons_net"]}
    x7 = mk((3 * batch, h, w, 3), scale=0.3)
    slope(chain(lambda t: enc.apply(
        ev, t, method=lambda m, u: m.encode_pyramid(u))), x7,
        f"encode_pyramid x{3*batch}")

    # in-stage split: s2d in_block / enc1 / enc2
    from speinet_tpu.ops.s2d import (depth_to_space, s2d_bias,
                                     s2d_consume_kernel, s2d_kernel,
                                     space_to_depth)
    from speinet_tpu.ops.pallas_conv import conv2d_mxu

    def _in_fast(m, x):
        xs_ = space_to_depth(x.astype(m.dtype))
        kin, bin_ = m.in_conv.params()
        h1 = conv2d_mxu(xs_, s2d_kernel(kin).astype(m.dtype), s2d_bias(bin_),
                        relu=True)
        return m.in_res.call_fast(h1, train=False, s2d=True)
    slope(chain(lambda t: enc.apply(ev, t, method=_in_fast)), x7,
          f"  in_block s2d x{3*batch}")

    h1s = mk((3 * batch, h // 2, w // 2, 4 * f))   # s2d of lv1

    def _enc1_fast(m, t):
        k1, b1 = m.enc1_conv.params()
        l2 = conv2d_mxu(t, s2d_consume_kernel(k1).astype(m.dtype), b1,
                        relu=True)
        h2 = space_to_depth(l2)
        return m.enc1_res.call_fast(h2, train=False, s2d=True)
    slope(chain(lambda t: enc.apply(ev, t, method=_enc1_fast)), h1s,
          f"  enc1 s2d x{3*batch}")

    # ---------------- ResBlock internals at 720p/32ch (s2d layout)
    from speinet_tpu.models.blocks import ResBlock
    rb = ResBlock(f, 5, dtype=dt)
    xs2d = mk((3 * batch, h // 2, w // 2, 4 * f))
    vrb = rb.init(jax.random.PRNGKey(0), mk((1, 40, 40, f)))
    slope(chain(lambda t: rb.apply(vrb, t, False, method=lambda m, u, tr:
                                   m.call_fast(u, train=tr, s2d=True))), xs2d,
          f"  ResBlock s2d 720p x{3*batch}")

    # ---------------- decode sub-stages
    dec_in = mk((batch, h4, w4, 4 * f))
    slope(chain(lambda t: enc.apply(ev, t, method=lambda m, u:
                                    m.decoder_second(u))), dec_in,
          f"decoder_second x{batch}")
    d2 = mk((batch, h // 2, w // 2, 2 * f))
    slope(chain(lambda t: enc.apply(ev, t, method=lambda m, u:
                                    m.decoder_first(u))), d2,
          f"decoder_first x{batch}")
    d1 = mk((batch, h, w, f))
    slope(chain(lambda t: enc.apply(ev, t, method=lambda m, u:
                                    m.out_block(u))), d1,
          f"out_block x{batch}")

    # ---------------- _decode total (glue + decoder)
    ws_map = mk((batch, h4, w4, 1), scale=1.0)

    def _dec(x):
        return model.apply(variables, x, ws_map, s3, s2, s1, False,
                           method=lambda m, *a: m._decode(*a))
    slope(chain(_dec), dec_in, f"_decode total x{batch}")

    # ---------------- bicubic upsample sites
    slope(chain(lambda t: bicubic_upsample_nhwc(t, 2)),
          mk((batch, h4, w4, 4 * f)), f"up2 128ch 180x320 x{batch}")
    slope(chain(lambda t: bicubic_upsample_nhwc(t, 2)),
          mk((batch, h // 2, w // 2, 2 * f)), f"up2 64ch 360x640 x{batch}")
    slope(chain(lambda t: bicubic_upsample_nhwc(t, 2)),
          mk((batch, h4, w4, 1)), f"up2 1ch 180x320 x{batch}")

    # ---------------- corr prep (unfold + normalize + transposes)
    from speinet_tpu.models.search_transfer import _l2_normalize
    from speinet_tpu.ops.patch_ops import unfold, gather_fold_nhwc

    def _prep(x):
        lr_unfold = unfold(x.transpose(0, 3, 1, 2), 3, 1, 1)
        lr_n = _l2_normalize(lr_unfold.astype(jnp.float32), axis=1)
        ref_n = _l2_normalize(
            unfold(s3.transpose(0, 3, 1, 2), 3, 1, 1).astype(jnp.float32),
            axis=1).transpose(0, 2, 1)
        return lr_n.astype(dt) + 0 * ref_n[:, :1, :1, None].sum(), ref_n
    slope(chain(lambda t: _prep(t)[0]), m_feat, f"corr prep x{batch}")

    # raw-unfold prep (SPEINET_CORR_RAW path): no f32 normalize, no
    # [B, Lr, D] transpose; inv-norms via the 3x3 box filter
    from speinet_tpu.models.search_transfer import _patch_inv_norms

    def _prep_raw(x):
        lr_u = unfold(x.transpose(0, 3, 1, 2), 3, 1, 1).astype(dt)
        inv_lr = _patch_inv_norms(x)
        ref_u = unfold(s3.transpose(0, 3, 1, 2), 3, 1, 1)
        inv_ref = _patch_inv_norms(s3)
        ref_sc = ref_u.astype(dt) * inv_ref[:, None, :].astype(dt)
        return lr_u + 0 * inv_lr[:, :1, None], ref_sc
    slope(chain(lambda t: _prep_raw(t)[0]), m_feat, f"corr prep RAW x{batch}")

    # correlation kernels head-to-head at 720p-lv3 geometry
    from speinet_tpu.ops.pallas_corr import (correlation_argmax_pallas,
                                             correlation_argmax_pallas_ld)
    d_ = 4 * f * 9
    l_ = h4 * w4
    lr_n_ = mk((batch, d_, l_))
    ref_n_ = mk((batch, l_, d_))
    ref_ld_ = mk((batch, d_, l_))
    slope(chain(lambda t: correlation_argmax_pallas(t, ref_n_)[0]), lr_n_,
          f"corr kernel [Lr,D] x{batch}")
    slope(chain(lambda t: correlation_argmax_pallas_ld(t, ref_ld_)[0]), lr_n_,
          f"corr kernel LD x{batch}")

    # ---------------- gather_folds
    idx = jnp.asarray(
        np.random.default_rng(0).integers(0, h4 * w4, (batch, h4 * w4)),
        jnp.int32)
    slope(chain(lambda t: gather_fold_nhwc(s3 + 0 * t[..., :1], idx, 1)),
          m_feat, f"gather_fold lv3 x{batch}")
    slope(chain(lambda t: gather_fold_nhwc(s2 + 0 * t[..., :1, :1].mean(),
                                           idx, 2)),
          m_feat, f"gather_fold lv2 x{batch}")
    slope(chain(lambda t: gather_fold_nhwc(s1 + 0 * t[..., :1, :1].mean(),
                                           idx, 4)),
          m_feat, f"gather_fold lv1 x{batch}")


if __name__ == "__main__":
    main()
