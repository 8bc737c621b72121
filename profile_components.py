"""Component-level timing of the 720p SPEINet forward on the real TPU.

Times each hot stage separately (jit'd in isolation) so the perf work
targets the real bottleneck. Prints one line per stage.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def timed(fn, *args, n=5, name=""):
    import jax
    t0 = time.time()
    out = fn(*args)
    jax.block_until_ready(out)
    compile_s = time.time() - t0
    t0 = time.time()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.time() - t0) / n
    print(f"{name:30s} {dt*1000:9.1f} ms   (compile {compile_s:6.1f} s)", flush=True)
    return dt


def main():
    import jax
    import jax.numpy as jnp

    from speinet_tpu.utils.compile_cache import enable_compile_cache
    enable_compile_cache()
    from speinet_tpu.config import Config, set_template
    from speinet_tpu.models.speinet import SPEINet
    from speinet_tpu.models.swinir import SwinIRCross
    from speinet_tpu.models.search_transfer import TransferUnit
    from speinet_tpu.models.recons_video import ReconsVideo
    from speinet_tpu.ops.filters import box_kernel, richardson_lucy

    dtype = jnp.bfloat16
    cfg = set_template(Config(template="SPEINet")).replace(compute_dtype="bfloat16")
    h, w = 720, 1280
    h4, w4 = h // 4, w // 4
    b = int(os.environ.get("PROF_BATCH", "1"))
    rng = jax.random.PRNGKey(0)

    # --- RL edge branch (720p, f32) ---
    kernel = box_kernel(5, dtype=jnp.float32)
    img = jnp.ones((b, 3, h, w), jnp.float32) * 0.5
    rl5 = jax.jit(lambda x: richardson_lucy(x, kernel, 5, 0.01))
    timed(rl5, img, name="RL deconv x5 (mid)")
    img2 = jnp.ones((2 * b, 3, h, w), jnp.float32) * 0.5
    rl1 = jax.jit(lambda x: richardson_lucy(x, kernel, 1, 0.01))
    timed(rl1, img2, name="RL deconv x1 (2 neighbors)")

    # --- encoder legs: 7b stacked through ReconsVideo encoder ---
    enc = ReconsVideo(n_feat=32, n_resblock=3, out_channels=3, dtype=dtype)
    x7 = jnp.ones((7 * b, h, w, 3), dtype) * 0.5
    ev = enc.init(rng, x7[:1], method=lambda m, x: m.encoder_second(
        m.encoder_first(m.in_block(x))))

    def enc_fn(x):
        def run(m, x):
            lv1 = m.in_block(x)
            lv2 = m.encoder_first(lv1)
            lv3 = m.encoder_second(lv2)
            return lv1, lv2, lv3
        return enc.apply(ev, x, method=run)

    enc_j = jax.jit(enc_fn)
    lv1, lv2, lv3 = enc_j(x7)
    timed(enc_j, x7, name="encoder x7 legs")

    # --- swin fusion: batched 2b call at lv3 ---
    swin = SwinIRCross(embed_dim=256, depths=(6,) * 6, num_heads=(8,) * 6,
                       window_size=5, mlp_ratio=2.0, dtype=dtype)
    f_mid = jnp.ones((2 * b, h4, w4, 128), dtype) * 0.5
    sv = swin.init(rng, f_mid[:1], f_mid[:1], deterministic=True)
    swin_j = jax.jit(lambda x, y: swin.apply(sv, x, y, deterministic=True))
    timed(swin_j, f_mid, f_mid, name="swin fusion (2b batched)")

    # --- transfer unit (correlation + gather_fold) ---
    tr = TransferUnit(n_feat=32, dtype=dtype)
    ff = jnp.ones((b, h4, w4, 128), dtype) * 0.5
    s1 = jnp.ones((b, h, w, 32), dtype) * 0.5
    s2 = jnp.ones((b, h // 2, w // 2, 64), dtype) * 0.5
    s3 = jnp.ones((b, h4, w4, 128), dtype) * 0.5
    hs = jnp.ones((b,), bool)
    tv = tr.init(rng, ff, s1, s2, s3, hs)
    tr_j = jax.jit(lambda *a: tr.apply(tv, *a))
    timed(tr_j, ff, s1, s2, s3, hs, name="transfer (corr+gather_fold)")

    # correlation kernel alone
    from speinet_tpu.ops.pallas_corr import correlation_argmax_pallas
    l = h4 * w4
    d = 128 * 9
    lr_n = jnp.ones((b, d, l), jnp.float32) * 0.03
    ref_n = jnp.ones((b, l, d), jnp.float32) * 0.03
    corr_j = jax.jit(correlation_argmax_pallas)
    timed(corr_j, lr_n, ref_n, name="corr kernel f32")

    # --- decoder-ish: full model forward for the total ---
    model = SPEINet.from_config(cfg)
    x = jnp.ones((b, 5, 3, h, w), jnp.float32) * 0.5
    xs = jnp.zeros((1, 5, 3, 80, 80), jnp.float32)
    variables = model.init(rng, xs)
    fwd = jax.jit(lambda inp: model.apply(variables, inp, train=False))
    timed(fwd, x, name="FULL forward")


if __name__ == "__main__":
    main()
