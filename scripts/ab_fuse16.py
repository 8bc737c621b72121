"""Measure the fused swin block + rolls at the restore batch (b=16,
720p-lv3) to decompose the 775 ms fuse: kernel scaling vs roll traffic.

All params are passed as traced jit args — closed-over device arrays get
embedded as HLO literals, and at this size that overflows the relay's
remote-compile request-body limit (HTTP 413).

    python scripts/ab_fuse16.py [batch=16]
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
    from speinet_tpu.ops.pallas_swin import fused_swin_block

    dt = jnp.bfloat16
    rng = np.random.default_rng(0)
    b = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    h, w, c, heads, ws = 180, 320, 256, 8, 5
    x = jnp.asarray(rng.standard_normal((b, h, w, c)) * 0.1, dt)
    f32 = lambda *s: jnp.asarray(rng.standard_normal(s) * 0.05, jnp.float32)
    params = dict(
        ls=jnp.ones((c,), jnp.float32), lb=jnp.zeros((c,), jnp.float32),
        wkv=f32(c, 2 * c), bkv=jnp.zeros((2 * c,), jnp.float32),
        wq=f32(c, c), bq=jnp.zeros((c,), jnp.float32),
        wp=f32(c, c), bp=jnp.zeros((c,), jnp.float32),
        bias=f32(heads, 25, 25),
        ls2=jnp.ones((c,), jnp.float32), lb2=jnp.zeros((c,), jnp.float32),
        w1=f32(c, 2 * c), b1=jnp.zeros((2 * c,), jnp.float32),
        w2=f32(2 * c, c), b2=jnp.zeros((c,), jnp.float32),
    )

    def chain_time(fn, n=8, reps=2):
        out = fn(x, params); float(out.mean())
        def run(kk):
            o = x
            t0 = time.time()
            for _ in range(kk):
                o = fn(o, params)
            float(o.mean())
            return time.time() - t0
        t1 = min(run(1) for _ in range(reps))
        t2 = min(run(1 + n) for _ in range(reps))
        return (t2 - t1) / n

    def blk(xx, p, s):
        return fused_swin_block(
            xx, xx + 0.01, p["ls"], p["lb"], p["wkv"], p["bkv"], p["wq"],
            p["bq"], p["wp"], p["bp"], p["bias"], p["ls2"], p["lb2"],
            p["w1"], p["b1"], p["w2"], p["b2"],
            ws=ws, shift=s, pad_h=0, pad_w=0, heads=heads)

    cases = {
        "W  block": jax.jit(lambda x, p: blk(x, p, 0)),
        "SW block": jax.jit(lambda x, p: blk(x, p, 2)),
        "roll": jax.jit(lambda x, p: jnp.roll(x, (-2, -2), axis=(1, 2))),
        "SW+2rolls": jax.jit(lambda x, p: jnp.roll(
            blk(jnp.roll(x, (-2, -2), axis=(1, 2)), p, 2), (2, 2),
            axis=(1, 2))),
    }
    for name, fn in cases.items():
        t0 = time.time()
        d = chain_time(fn)
        print(f"{name:10s} b={b}: {d*1000:7.2f} ms   (compile+meas "
              f"{time.time()-t0:.0f}s)", flush=True)


if __name__ == "__main__":
    main()
