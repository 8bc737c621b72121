"""A/B the Pallas swin kernel knobs (SPEINET_SWIN_{G,R,HEADBATCH},
SPEINET_MLP_TL) on the real TPU at the 720p fusion shape. All combos run
in ONE process (axon cold-init is minutes; knobs are read at trace time).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# (G, R, HB, MLP_TL)
COMBOS = [
    (8, 1, 0, 1024),      # current default
    (8, 2, 0, 1024),
    (8, 4, 0, 1024),
    (8, 4, 1, 1024),
    (8, 4, 0, 4096),
    (8, 6, 0, 4096),
    (8, 2, 1, 4096),
]
if len(sys.argv) > 1:     # override: "G,R,HB,TL;G,R,HB,TL;..."
    COMBOS = [tuple(int(v) for v in c.split(","))
              for c in sys.argv[1].split(";")]


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

    for g, r, hb, tl in COMBOS:
        os.environ["SPEINET_SWIN_G"] = str(g)
        os.environ["SPEINET_SWIN_R"] = str(r)
        os.environ["SPEINET_SWIN_HEADBATCH"] = str(hb)
        os.environ["SPEINET_MLP_TL"] = str(tl)

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

        try:
            t0 = time.time()
            run(1)
            compile_s = time.time() - t0
            t1 = min(run(1) for _ in range(3))
            t2 = min(run(5) for _ in range(3))
            print(f"G={g} R={r} HB={hb} MLPTL={tl}: {(t2-t1)/4*1000:8.1f} ms"
                  f"  (compile {compile_s:.0f}s)", flush=True)
        except Exception as e:
            print(f"G={g} R={r} HB={hb} MLPTL={tl}: FAILED "
                  f"{type(e).__name__}: {e}", flush=True)


main()
