"""A/B the 2-D roll at the swin SW-block shape ([16, 180, 320, 256] bf16):
jnp.roll (two concat passes) vs quadrant-concat vs the Pallas one-pass
roll2d. The SW blocks pay 3 rolls each (x in/out + y in) = 54 per
batch-8 restore, so every ms here is ~6.7 ms/frame.

Measured (v5e, b=16, bf16, 2026-08-19 round 4):
    jnp.roll   4.36 ms   quadrant 3.01 ms   pallas roll2d 1.87 ms (2.3x)

    python scripts/ab_roll.py [batch=16]
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
    from speinet_tpu.ops.pallas_roll import roll2d

    b = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    h, w, c = 180, 320, 256
    ss = 2
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((b, h, w, c)) * 0.1, jnp.bfloat16)

    def quadrant(x):
        top = jnp.concatenate([x[:, ss:, ss:], x[:, ss:, :ss]], axis=2)
        bot = jnp.concatenate([x[:, :ss, ss:], x[:, :ss, :ss]], axis=2)
        return jnp.concatenate([top, bot], axis=1)

    cases = {
        "jnp.roll": jax.jit(lambda x: jnp.roll(x, (-ss, -ss), axis=(1, 2))),
        "quadrant": jax.jit(quadrant),
        "pallas roll2d": jax.jit(lambda x: roll2d(x, ss, ss)),
    }

    ref = np.asarray(cases["jnp.roll"](x).astype(jnp.float32))
    for name, fn in cases.items():
        got = np.asarray(fn(x).astype(jnp.float32))
        ok = np.array_equal(got, ref)
        def run(k):
            o = x
            t0 = time.time()
            for _ in range(k):
                o = fn(o)
            float(o.mean())
            return time.time() - t0
        run(1)
        t1 = min(run(1) for _ in range(2))
        t2 = min(run(9) for _ in range(2))
        d = (t2 - t1) / 8
        print(f"{name:14s} b={b}: {d*1000:6.2f} ms  parity={'OK' if ok else 'FAIL'}",
              flush=True)


if __name__ == "__main__":
    main()
