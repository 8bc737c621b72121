"""Micro-profile of the encoder stages + ResBlock internals at 720p on TPU."""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def timed(fn, *args, n=10, name=""):
    import jax
    t0 = time.time()
    out = fn(*args)
    jax.block_until_ready(out)
    c = time.time() - t0
    t0 = time.time()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.time() - t0) / n
    print(f"{name:38s} {dt*1000:9.2f} ms  (compile {c:5.1f}s)", flush=True)
    return dt


def main():
    import jax
    import jax.numpy as jnp
    import flax.linen as nn

    from speinet_tpu.utils.compile_cache import enable_compile_cache
    enable_compile_cache()
    from speinet_tpu.models.recons_video import ReconsVideo
    from speinet_tpu.models.blocks import ResBlock, SEBlock, TripletAttention

    dtype = jnp.bfloat16
    h, w = 720, 1280
    rng = jax.random.PRNGKey(0)
    bs = 7

    enc = ReconsVideo(n_feat=32, n_resblock=3, out_channels=3, dtype=dtype)
    x = jnp.ones((bs, h, w, 3), dtype) * 0.5
    ev = enc.init(rng, x[:1], method=lambda m, t: m.encoder_second(
        m.encoder_first(m.in_block(t))))

    ib = jax.jit(lambda t: enc.apply(ev, t, method=lambda m, u: m.in_block(u)))
    lv1 = ib(x)
    timed(ib, x, name=f"in_block x{bs} (3->32 @720p)")
    e1 = jax.jit(lambda t: enc.apply(ev, t, method=lambda m, u: m.encoder_first(u)))
    lv2 = e1(lv1)
    timed(e1, lv1, name=f"encoder_first x{bs} (32->64 @360p)")
    e2 = jax.jit(lambda t: enc.apply(ev, t, method=lambda m, u: m.encoder_second(u)))
    timed(e2, lv2, name=f"encoder_second x{bs} (64->128 @180p)")

    # ResBlock internals at the lv1 shape (the dominant stage)
    rb = ResBlock(features=32, dtype=dtype)
    rv = rb.init(rng, lv1[:1])
    rb_j = jax.jit(lambda t: rb.apply(rv, t))
    timed(rb_j, lv1, name=f"ResBlock(32) x{bs} @720p")

    convs = nn.Sequential([
        nn.Conv(32, (5, 5), padding=2, dtype=dtype),
        nn.Conv(32, (5, 5), padding=2, dtype=dtype)])
    cv = convs.init(rng, lv1[:1])
    cj = jax.jit(lambda t: convs.apply(cv, t))
    timed(cj, lv1, name=f"2x conv5x5(32) x{bs} @720p")

    se = SEBlock(dtype=dtype)
    sev = se.init(rng, lv1[:1])
    timed(jax.jit(lambda t: se.apply(sev, t)), lv1, name=f"SEBlock x{bs} @720p")

    te = TripletAttention(dtype=dtype)
    tev = te.init(rng, lv1[:1])
    timed(jax.jit(lambda t: te.apply(tev, t)), lv1,
          name=f"TripletAttention x{bs} @720p")

    # 3x3 conv for comparison + wider-channel efficiency check
    c3 = nn.Conv(32, (3, 3), padding=1, dtype=dtype)
    c3v = c3.init(rng, lv1[:1])
    timed(jax.jit(lambda t: c3.apply(c3v, t)), lv1, name=f"conv3x3(32) x{bs} @720p")

    x128 = jnp.ones((bs, h // 4, w // 4, 128), dtype)
    c5w = nn.Conv(128, (5, 5), padding=2, dtype=dtype)
    c5wv = c5w.init(rng, x128[:1])
    timed(jax.jit(lambda t: c5w.apply(c5wv, t)), x128,
          name=f"conv5x5(128) x{bs} @180p (same FLOPs/4)")


if __name__ == "__main__":
    main()
