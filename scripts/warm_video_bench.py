"""AOT-compile the video-mode bench programs (no execution, no HBM) so the
measurement run — and the driver's bench — hit a warm persistent cache.
Usage: python scripts/warm_video_bench.py [batch ...]"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from speinet_tpu.utils.compile_cache import enable_compile_cache
enable_compile_cache()

import jax
import jax.numpy as jnp
from speinet_tpu.config import Config, set_template
from speinet_tpu.models.speinet import SPEINet


def main():
    batches = [int(a) for a in sys.argv[1:]] or [4]
    dtype = os.environ.get("BENCH_DTYPE", "bfloat16")
    cfg = set_template(Config(template="SPEINet")).replace(compute_dtype=dtype)
    model = SPEINet.from_config(cfg)
    x_small = jnp.zeros((1, 5, 3, 80, 80), jnp.float32)
    from speinet_tpu.utils.init_cache import cached_init
    variables = cached_init(model, jax.random.PRNGKey(0), x_small)
    h, w = 720, 1280
    f32 = jnp.float32
    sds = lambda *s: jax.ShapeDtypeStruct(s, f32)
    cdt = jnp.dtype(dtype)

    # NOTE: the persistent-cache key includes the jitted function's name, so
    # these are spelled exactly like bench.py's. Measured caveat: through the
    # axon relay the cache key for these full-model programs is unstable
    # across processes anyway (same code+weights writes a new hash each run),
    # so this warming primarily primes the remote compile server, not the
    # client-side persistent cache.
    def legs(fr):
        return model.apply(variables, fr, method=SPEINet.encode_window_legs)

    def anchor(fr):
        return model.apply(variables, fr, method=SPEINet.anchor_pyramid)

    def restore(m, n0, n1, p1, p2, p3, hs):
        return model.apply(variables, m, (n0, n1), p1, p2, p3, hs,
                           method=SPEINet.restore_from_features)

    jl, ja, jr = jax.jit(legs), jax.jit(anchor), jax.jit(restore)

    f4 = cfg.n_feat * 4
    for b in batches:
        na = max(1, round(b * 0.5))
        t0 = time.time()
        jl.lower(sds(b, 3, h, w)).compile()
        print(f"legs b={b}: {time.time()-t0:.0f}s", flush=True)
        t0 = time.time()
        ja.lower(sds(na, 3, h, w)).compile()
        print(f"anchor b={na}: {time.time()-t0:.0f}s", flush=True)
        feat = jax.ShapeDtypeStruct((b, h // 4, w // 4, f4), cdt)
        p1 = jax.ShapeDtypeStruct((b, h, w, cfg.n_feat), cdt)
        p2 = jax.ShapeDtypeStruct((b, h // 2, w // 2, cfg.n_feat * 2), cdt)
        t0 = time.time()
        jr.lower(feat, feat, feat, p1, p2, feat,
                 jax.ShapeDtypeStruct((b,), jnp.bool_)).compile()
        print(f"restore b={b}: {time.time()-t0:.0f}s", flush=True)


if __name__ == "__main__":
    main()
