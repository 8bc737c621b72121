"""Slope-profile the full _decode stage (decoder + S-weighted injection +
search refinement convs + bicubic upsamples) at 720p on the TPU — the gap
between the component sum and the FULL forward in profile_components.py.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    from speinet_tpu.utils.compile_cache import enable_compile_cache
    enable_compile_cache()
    from speinet_tpu.config import Config, set_template
    from speinet_tpu.models.speinet import SPEINet

    cfg = set_template(Config(template="SPEINet")).replace(
        compute_dtype="bfloat16")
    model = SPEINet.from_config(cfg)
    from speinet_tpu.utils.init_cache import cached_init
    variables = cached_init(model, jax.random.PRNGKey(0),
                            jnp.zeros((1, 5, 3, 80, 80), jnp.float32))

    b = 1
    h4, w4 = 180, 320
    dt = jnp.bfloat16
    key = jax.random.PRNGKey(1)
    f_fusion = jax.random.normal(key, (b, h4, w4, 128), dt) * 0.1
    weight_s = jax.random.uniform(key, (b, h4, w4, 1), dt)
    t3 = jax.random.normal(key, (b, h4, w4, 128), dt) * 0.1
    t2 = jax.random.normal(key, (b, 2 * h4, 2 * w4, 64), dt) * 0.1
    t1 = jax.random.normal(key, (b, 4 * h4, 4 * w4, 32), dt) * 0.1

    @jax.jit
    def step(x):
        out = model.apply(variables, x, weight_s, t3, t2, t1, False,
                          method=lambda m, *a: m._decode(*a))
        return x * (1.0 + 1e-12 * jnp.mean(out.astype(jnp.float32))), out

    def run(k):
        x = f_fusion
        t0 = time.time()
        for _ in range(k):
            x, out = step(x)
        float(jnp.sum(out.astype(jnp.float32)))
        return time.time() - t0

    t0 = time.time()
    run(1)
    print(f"compile {time.time()-t0:.0f}s", flush=True)
    t1_ = min(run(1) for _ in range(3))
    t2_ = min(run(5) for _ in range(3))
    print(f"_decode full: {(t2_-t1_)/4*1000:8.1f} ms", flush=True)


main()
