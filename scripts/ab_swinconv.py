"""A/B: XLA conv emitter vs Pallas conv2d_mxu for the SwinIRCross 3x3
convs at the 720p-lv3 fusion shape ([16, 180, 320, C] bf16, C=128/256).
These 10 convs (conv_first x2, 6 RSTB convs, conv_after_body, conv_last)
total ~9.2 TFLOP per batch-8 restore and ran through plain nn.Conv.

    python scripts/ab_swinconv.py [iters=8]
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
    from speinet_tpu.ops.pallas_conv import conv2d_mxu

    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    dt = jnp.bfloat16
    rng = np.random.default_rng(0)
    b, h, w = 16, 180, 320

    for cin, cout in ((128, 256), (256, 256), (256, 128)):
        x = jnp.asarray(rng.standard_normal((b, h, w, cin)) * 0.1, dt)
        k = jnp.asarray(rng.standard_normal((3, 3, cin, cout)) * 0.02, dt)
        bias = jnp.zeros((cout,), jnp.float32)
        tf = 2 * b * h * w * 9 * cin * cout / 1e12

        def xla_conv(x):
            y = jax.lax.conv_general_dilated(
                x, k, (1, 1), [(1, 1), (1, 1)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            return y + bias.astype(dt)

        variants = {"xla": jax.jit(xla_conv)}
        for kcat in (False, True):
            for tr in (8, 16):
                def pf(x, kcat=kcat, tr=tr):
                    return conv2d_mxu(x, k, bias, relu=False, tr=tr, kcat=kcat)
                variants[f"pallas kcat={int(kcat)} tr={tr}"] = jax.jit(pf)

        for name, fn in variants.items():
            try:
                # chained loop, padded output back to input channels
                def chain(x0, n):
                    o = x0
                    for _ in range(n):
                        y = fn(o)
                        o = (x0 + 1e-6 * jnp.mean(y).astype(dt))
                    return jnp.mean(y)

                jc = jax.jit(chain, static_argnums=1)
                float(jc(x, 1))
                t0 = time.time(); float(jc(x, 1)); t1 = min(time.time() - t0,
                                                            1e9)
                t0 = time.time(); float(jc(x, 1 + iters))
                t2 = time.time() - t0
                dtm = (t2 - t1) / iters
                print(f"[{cin}->{cout}] {name:22s}: {dtm*1000:7.2f} ms  "
                      f"{tf/dtm:6.1f} TFLOPS", flush=True)
            except Exception as e:
                print(f"[{cin}->{cout}] {name:22s}: FAILED "
                      f"{type(e).__name__}: {str(e)[:100]}", flush=True)


if __name__ == "__main__":
    main()
