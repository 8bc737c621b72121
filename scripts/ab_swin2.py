"""Split timing: fused attention kernel alone vs fused LN/MLP kernel alone
at the 720p lv3 shape, plus extra knob combos. One process.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timeit(step, x0, readback):
    def run(k):
        x = x0
        t0 = time.time()
        for _ in range(k):
            x, out = step(x)
        readback(out)
        return time.time() - t0

    t0 = time.time()
    run(1)
    c = time.time() - t0
    t1 = min(run(1) for _ in range(3))
    t2 = min(run(5) for _ in range(3))
    return (t2 - t1) / 4, c


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from speinet_tpu.utils.compile_cache import enable_compile_cache
    enable_compile_cache()
    from speinet_tpu.ops.pallas_swin import (fused_ln_mlp,
                                             fused_window_cross_attention)

    dtype = jnp.bfloat16
    b, hp, wp, c = 2, 180, 320, 256
    heads, ws = 8, 5
    l = hp * wp
    key = jax.random.PRNGKey(1)
    x = jax.random.normal(key, (b, hp, wp, c), dtype) * 0.1
    y = x + 0.01
    xt = x.reshape(b, l, c)
    ls = jnp.ones((c,), jnp.float32)
    lb = jnp.zeros((c,), jnp.float32)
    wkv = jax.random.normal(key, (c, 2 * c), jnp.float32) * 0.02
    bkv = jnp.zeros((2 * c,), jnp.float32)
    wq = jax.random.normal(key, (c, c), jnp.float32) * 0.02
    bq = jnp.zeros((c,), jnp.float32)
    wp_ = jax.random.normal(key, (c, c), jnp.float32) * 0.02
    bp = jnp.zeros((c,), jnp.float32)
    bias = jnp.asarray(np.random.randn(heads, ws * ws, ws * ws).astype(np.float32))
    w1 = jax.random.normal(key, (c, 2 * c), jnp.float32) * 0.02
    b1 = jnp.zeros((2 * c,), jnp.float32)
    w2 = jax.random.normal(key, (2 * c, c), jnp.float32) * 0.02
    b2 = jnp.zeros((c,), jnp.float32)

    def rb(out):
        float(jnp.sum(out.astype(jnp.float32)))

    combos = [
        ("attn G16 R1 (default)", {}),
        ("attn G8 R1", {"SPEINET_SWIN_G": "8"}),
        ("attn G32 R1", {"SPEINET_SWIN_G": "32"}),
    ]
    # NOTE (round 3-4 record): a "wide" single-matmul head-expansion path
    # was measured here; it passed interpret parity but failed Mosaic
    # lowering on hardware, and the compact quad-group kernel superseded it.
    # The branch was removed from pallas_swin.py in round 5 (VERDICT r4 #8).
    if len(sys.argv) > 1:   # e.g. "G16R1W;G8R2" quick filter by substring
        combos = [c for c in combos if any(s in c[0] for s in sys.argv[1:])]
    for name, env in combos:
        for k in ("SPEINET_SWIN_G", "SPEINET_SWIN_R", "SPEINET_SWIN_HEADBATCH"):
            os.environ.pop(k, None)
        os.environ.update(env)

        @jax.jit
        def step(t):
            out = fused_window_cross_attention(
                t, y, ls, lb, wkv, bkv, wq, bq, wp_, bp, bias,
                ws=ws, shift=0, pad_h=0, pad_w=0, heads=heads)
            return t * (1.0 + 1e-12 * jnp.mean(out.astype(jnp.float32))), out

        try:
            per, comp = timeit(step, x, rb)
            print(f"{name}: {per*1000:8.2f} ms (compile {comp:.0f}s)", flush=True)
        except Exception as e:
            print(f"{name}: FAILED {type(e).__name__}", flush=True)

    for name, tl in [("mlp TL1024", 1024), ("mlp TL2048", 2048),
                     ("mlp TL512", 512)]:
        os.environ["SPEINET_MLP_TL"] = str(tl)

        @jax.jit
        def step(t):
            out = fused_ln_mlp(t, ls, lb, w1, b1, w2, b2)
            return t * (1.0 + 1e-12 * jnp.mean(out.astype(jnp.float32))), out

        try:
            per, comp = timeit(step, xt, rb)
            print(f"{name}: {per*1000:8.2f} ms (compile {comp:.0f}s)", flush=True)
        except Exception as e:
            print(f"{name}: FAILED {type(e).__name__}", flush=True)


main()
