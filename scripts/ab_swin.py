"""A/B the Pallas swin kernel knobs (SPEINET_SWIN_{G,R,HEADBATCH}) on the
real TPU at the 720p fusion shape. Run one combo per process invocation:

    python scripts/ab_swin.py G R HEADBATCH
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

g, r, hb = sys.argv[1:4]
os.environ["SPEINET_SWIN_G"] = g
os.environ["SPEINET_SWIN_R"] = r
os.environ["SPEINET_SWIN_HEADBATCH"] = hb


def main():
    import jax
    import jax.numpy as jnp

    from speinet_tpu.utils.compile_cache import enable_compile_cache
    enable_compile_cache()
    from speinet_tpu.models.swinir import SwinIRCross

    dtype = jnp.bfloat16
    h4, w4 = 180, 320
    b = 2
    rng = jax.random.PRNGKey(0)
    key = jax.random.PRNGKey(1)
    swin = SwinIRCross(embed_dim=256, depths=(6,) * 6, num_heads=(8,) * 6,
                       window_size=5, mlp_ratio=2.0, dtype=dtype)
    f_mid = jax.random.normal(key, (b, h4, w4, 128), dtype) * 0.1
    sv = swin.init(rng, f_mid[:1], f_mid[:1], deterministic=True)

    @jax.jit
    def step(x):
        out = swin.apply(sv, x, x, deterministic=True)
        return x * (1.0 + 1e-12 * jnp.mean(out.astype(jnp.float32))), out

    def run(k):
        x = f_mid
        t0 = time.time()
        for _ in range(k):
            x, out = step(x)
        float(jnp.sum(out.astype(jnp.float32)))
        return time.time() - t0

    t0 = time.time()
    run(1)
    compile_s = time.time() - t0
    t1 = min(run(1) for _ in range(3))
    t2 = min(run(5) for _ in range(3))
    per = (t2 - t1) / 4
    print(f"G={g} R={r} HB={hb}: {per*1000:8.1f} ms  (compile {compile_s:.0f}s)",
          flush=True)


main()
