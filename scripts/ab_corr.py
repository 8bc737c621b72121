"""A/B the correlation-kernel tile sizes on the real TPU at the 720p
lv3 shape. All combos run in ONE process (the axon backend cold-init is
minutes; the knobs are read at trace time, so re-jitting per combo works).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

COMBOS = [(512, 512), (1024, 512), (512, 1024), (1024, 1024), (2048, 512),
          (512, 2048), (2048, 2048)]


def main():
    import jax
    import jax.numpy as jnp

    from speinet_tpu.utils.compile_cache import enable_compile_cache
    enable_compile_cache()
    from speinet_tpu.ops.pallas_corr import correlation_argmax_pallas

    b, d = 1, 1152
    l = 180 * 320
    key = jax.random.PRNGKey(1)
    lr_n = jax.random.normal(key, (b, d, l), jnp.bfloat16) * 0.03
    ref_n = jax.random.normal(key, (b, l, d), jnp.bfloat16) * 0.03

    for tl, tk in COMBOS:
        os.environ["SPEINET_CORR_TL"] = str(tl)
        os.environ["SPEINET_CORR_TK"] = str(tk)

        @jax.jit
        def step(x):
            s, _ = correlation_argmax_pallas(x, ref_n)
            return x * (1.0 + 1e-12 * jnp.mean(s)), s

        def run(k):
            x = lr_n
            t0 = time.time()
            for _ in range(k):
                x, s = step(x)
            float(jnp.sum(s))
            return time.time() - t0

        try:
            run(1)
            t1 = min(run(1) for _ in range(3))
            t2 = min(run(5) for _ in range(3))
            print(f"TL={tl} TK={tk}: {(t2-t1)/4*1000:8.1f} ms", flush=True)
        except Exception as e:  # VMEM overflow etc. — report and continue
            print(f"TL={tl} TK={tk}: FAILED {type(e).__name__}", flush=True)


main()
