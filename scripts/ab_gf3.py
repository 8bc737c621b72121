"""A/B: combined 3-scale gather_fold (one 9L-row gather of ~1.75 KB rows)
vs three separate per-scale gather_folds (27L rows), at bench geometry.

    python scripts/ab_gf3.py [b=4] [iters=8]
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
    from speinet_tpu.ops.patch_ops import gather_fold_nhwc_tiles, gather_fold3_nhwc

    b = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    dt = jnp.bfloat16
    h, w = 720, 1280
    h4, w4 = h // 4, w // 4
    l = h4 * w4
    f = 32
    rng = np.random.default_rng(0)
    s1 = jnp.asarray(rng.random((b, h, w, f), np.float32), dt)
    s2 = jnp.asarray(rng.random((b, h // 2, w // 2, 2 * f), np.float32), dt)
    s3 = jnp.asarray(rng.random((b, h4, w4, 4 * f), np.float32), dt)
    idx = jnp.asarray(rng.integers(0, l, (b, l)), jnp.int32)

    def timeit(name, fn, *args):
        def leaf(o):
            while isinstance(o, (tuple, list)):
                o = o[0]
            return o

        @jax.jit
        def step(prev, a):
            v = jnp.mean(leaf(prev).astype(jnp.float32)).astype(a[0].dtype)
            return fn(a[0] + v * 1e-6, *a[1:])

        o = step(args[0], args)
        float(leaf(o).astype(jnp.float32).sum())

        def run(k):
            o = step(args[0], args)
            t0 = time.time()
            for _ in range(k):
                o = step(o, args)
            float(leaf(o).astype(jnp.float32).sum())
            return time.time() - t0

        best = min(run(iters) for _ in range(3)) / iters
        print(f"{name:<42s} {best*1000:8.2f} ms", flush=True)

    def three(a1, a2, a3, i):
        return (gather_fold_nhwc_tiles(a3, i, 1) / 9.0,
                gather_fold_nhwc_tiles(a2, i, 2) / 9.0,
                gather_fold_nhwc_tiles(a1, i, 4) / 9.0)

    timeit("3x separate gather_fold (tiles)",
           jax.jit(three), s1, s2, s3, idx)

    def combined(a1, a2, a3, i):
        t3, t2, t1 = gather_fold3_nhwc(a1, a2, a3, i)
        return t3 / 9.0, t2 / 9.0, t1 / 9.0

    timeit("combined gather_fold3 (one gather)",
           jax.jit(combined), s1, s2, s3, idx)


if __name__ == "__main__":
    main()
