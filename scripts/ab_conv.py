"""A/B the Pallas conv row-tile (SPEINET_CONV_TR) on the real TPU at the
720p 7-leg encode_pyramid shape. All combos in ONE process.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

COMBOS = [8, 16, 32, 64]
if len(sys.argv) > 1:
    COMBOS = [int(v) for v in sys.argv[1].split(",")]


def main():
    import jax
    import jax.numpy as jnp

    from speinet_tpu.utils.compile_cache import enable_compile_cache
    enable_compile_cache()
    from speinet_tpu.models.recons_video import ReconsVideo

    dtype = jnp.bfloat16
    h, w = 720, 1280
    rng = jax.random.PRNGKey(0)
    key = jax.random.PRNGKey(1)
    enc = ReconsVideo(n_feat=32, n_resblock=3, out_channels=3, dtype=dtype)
    x7 = jax.random.uniform(key, (7, h, w, 3), dtype)
    ev = enc.init(rng, jnp.zeros((1, 40, 40, 3), dtype))

    for tr in COMBOS:
        os.environ["SPEINET_CONV_TR"] = str(tr)

        @jax.jit
        def step(t):
            l1, l2, l3 = enc.apply(ev, t,
                                   method=lambda m, u: m.encode_pyramid(u))
            return t * (1.0 + 1e-12 * jnp.mean(l3.astype(jnp.float32))), l3

        def run(k):
            x = x7
            t0 = time.time()
            for _ in range(k):
                x, out = step(x)
            float(jnp.sum(out.astype(jnp.float32)))
            return time.time() - t0

        try:
            t0 = time.time()
            run(1)
            compile_s = time.time() - t0
            t1 = min(run(1) for _ in range(3))
            t2 = min(run(5) for _ in range(3))
            print(f"TR={tr}: {(t2-t1)/4*1000:8.1f} ms  (compile {compile_s:.0f}s)",
                  flush=True)
        except Exception as e:
            print(f"TR={tr}: FAILED {type(e).__name__}: {e}", flush=True)


main()
