"""Decompose fused_swin_block time by stage ablation (SPEINET_SWIN_ABLATE):
full vs noln / noattn / nosoftmax / nogelu / nomlp at the 720p-lv3 shape.
Ablated variants compute WRONG numbers — timing only. The env knob is read
at trace time, so re-jitting per variant in one process works.

    python scripts/ab_swin4.py [b=2] [iters=16]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from speinet_tpu.utils.compile_cache import enable_compile_cache
    enable_compile_cache()

    b = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    dt = jnp.bfloat16
    h4, w4, c = 180, 320, 256
    heads, ws = 8, 5
    hidden = 512
    rng = np.random.default_rng(0)

    def mk(*shape):
        return jnp.asarray(rng.standard_normal(shape) * 0.05, dt)

    x = mk(b, h4, w4, c)
    y = mk(b, h4, w4, c)
    ln1s = jnp.ones((c,), jnp.float32)
    ln1b = jnp.zeros((c,), jnp.float32)
    wkv = mk(c, 2 * c).astype(jnp.float32)
    bkv = jnp.zeros((2 * c,), jnp.float32)
    wq = mk(c, c).astype(jnp.float32)
    bq = jnp.zeros((c,), jnp.float32)
    wp = mk(c, c).astype(jnp.float32)
    bp = jnp.zeros((c,), jnp.float32)
    bias = jnp.asarray(rng.standard_normal((heads, ws * ws, ws * ws)) * 0.02,
                       jnp.float32)
    ln2s, ln2b = ln1s, ln1b
    w1 = mk(c, hidden).astype(jnp.float32)
    b1 = jnp.zeros((hidden,), jnp.float32)
    w2 = mk(hidden, c).astype(jnp.float32)
    b2 = jnp.zeros((c,), jnp.float32)

    from speinet_tpu.ops import pallas_swin

    def run_variant(name, ablate, shift):
        os.environ["SPEINET_SWIN_ABLATE"] = ablate

        @jax.jit
        def f(x_, prev):
            # chain-mix INSIDE the jitted program: an un-jitted 59 MB add is
            # its own relay dispatch (~3 ms) that would swamp the kernel
            return pallas_swin.fused_swin_block(
                x_ + prev * jnp.asarray(1e-6, dt), y,
                ln1s, ln1b, wkv, bkv, wq, bq, wp, bp, bias,
                ln2s, ln2b, w1, b1, w2, b2,
                ws=ws, shift=shift, pad_h=0, pad_w=0, heads=heads)

        o = f(x, jnp.zeros_like(x))
        float(o.astype(jnp.float32).sum())   # real readback (lazy relay)
        best = float("inf")
        for _ in range(3):
            t0 = time.time()
            prev = o
            for _ in range(iters):
                prev = f(x, prev)
            float(prev.astype(jnp.float32).sum())
            best = min(best, (time.time() - t0) / iters)
        print(f"{name:<28s} {best*1000:8.3f} ms", flush=True)
        os.environ["SPEINET_SWIN_ABLATE"] = ""
        return best

    full = run_variant("W full", "", 0)
    for ab in ("noln", "noattn", "nosoftmax", "nogelu", "nomlp"):
        t = run_variant(f"W {ab}", ab, 0)
        print(f"    -> {ab} accounts for {1000*(full-t):7.3f} ms", flush=True)
    run_variant("SW full", "", 2)
    # MLP-only reference (the separate fused_ln_mlp kernel at same tokens)
    xt = mk(b, h4 * w4, c)

    @jax.jit
    def fm(x_, prev):
        return pallas_swin.fused_ln_mlp(x_ + prev * jnp.asarray(1e-6, dt),
                                        ln2s, ln2b, w1, b1, w2, b2)
    o = fm(xt, jnp.zeros_like(xt))
    float(o.astype(jnp.float32).sum())
    best = float("inf")
    for _ in range(3):
        t0 = time.time()
        prev = o
        for _ in range(iters):
            prev = fm(xt, prev)
        float(prev.astype(jnp.float32).sum())
        best = min(best, (time.time() - t0) / iters)
    print(f"{'fused_ln_mlp alone':<28s} {best*1000:8.3f} ms", flush=True)


if __name__ == "__main__":
    main()
