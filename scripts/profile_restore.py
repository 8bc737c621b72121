"""Fine-grained slope profile of the restore tail (everything after the
swin fuse): fusion conv, correlation search, gather_fold transfer, self
path, and the decoder — each timed as its own jitted program at bench
conditions (batch 8, bf16, 720p). Identifies where the non-swin ~160 ms
per frame of restore actually goes.

    python scripts/profile_restore.py [batch=8]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def chain_time(fn, mix, args, n=4, reps=2):
    out = fn(*args)
    float(out.sum() if hasattr(out, "sum") else out[0].sum())

    def run(k):
        a = args
        t0 = time.time()
        o = None
        for _ in range(k):
            o = fn(*a)
            a = mix(a, o)
        float(o.sum() if hasattr(o, "sum") else o[0].sum())
        return time.time() - t0

    t1 = min(run(1) for _ in range(reps))
    t2 = min(run(1 + n) for _ in range(reps))
    return (t2 - t1) / n


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from speinet_tpu.utils.compile_cache import enable_compile_cache
    enable_compile_cache()
    from speinet_tpu.config import Config, set_template
    from speinet_tpu.models.speinet import SPEINet

    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    dt = jnp.bfloat16
    cfg = set_template(Config(template="SPEINet")).replace(
        compute_dtype="bfloat16")
    model = SPEINet.from_config(cfg)
    rng = np.random.default_rng(0)
    from speinet_tpu.utils.init_cache import cached_init
    variables = cached_init(model, jax.random.PRNGKey(0),
                            jnp.zeros((1, 5, 3, 80, 80), jnp.float32))
    h, w = 720, 1280
    h4, w4 = h // 4, w // 4
    f = cfg.n_feat

    m = jnp.asarray(rng.random((batch, h4, w4, 4 * f), np.float32), dt)
    ff = jnp.asarray(rng.random((batch, h4, w4, 4 * f), np.float32), dt)
    s1 = jnp.asarray(rng.random((batch, h, w, f), np.float32), dt)
    s2 = jnp.asarray(rng.random((batch, h // 2, w // 2, 2 * f), np.float32), dt)
    s3 = jnp.asarray(rng.random((batch, h4, w4, 4 * f), np.float32), dt)
    ws_map = jnp.asarray(rng.random((batch, h4, w4, 1), np.float32), dt)
    idx = jnp.asarray(rng.integers(0, h4 * w4, (batch, h4 * w4)), jnp.int32)
    hs = jnp.ones((batch,), bool)

    mix1 = lambda a, o: (a[0] + 1e-6 * jnp.mean(o if hasattr(o, "shape")
                                                else o[0]).astype(a[0].dtype),
                         *a[1:])

    # (1) full transfer unit (fusion conv + corr + gather_fold + self path)
    def _transfer(v, ffi):
        def run(mod, x):
            x = mod.fusion(jnp.concatenate([x, x, x], -1))
            return mod.transfer(x, s1, s2, s3, hs)
        return model.apply(v, ffi, method=run)

    jtr = jax.jit(_transfer)
    t = chain_time(lambda x: jtr(variables, x), mix1, (m,))
    print(f"fusion+transfer x{batch}:  {t*1000:8.1f} ms", flush=True)

    # (2) correlation search alone (unfold + normalize + online max/argmax)
    def _corr(v, ffi):
        def run(mod, x):
            from speinet_tpu.models.search_transfer import _l2_normalize
            from speinet_tpu.ops.patch_ops import unfold
            from speinet_tpu.ops.pallas_corr import correlation_argmax_pallas
            b_, hh, ww_, c4 = x.shape
            lr_nchw = x.transpose(0, 3, 1, 2)
            lr_unfold = unfold(lr_nchw, 3, 1, 1)
            lr_n = _l2_normalize(lr_unfold.astype(jnp.float32), axis=1)
            ref_n = _l2_normalize(
                unfold(s3.transpose(0, 3, 1, 2), 3, 1, 1).astype(jnp.float32),
                axis=1).transpose(0, 2, 1)
            s, i = correlation_argmax_pallas(lr_n.astype(dt), ref_n.astype(dt))
            return s
        return model.apply(v, ffi, method=run)

    jc = jax.jit(_corr)
    t = chain_time(lambda x: jc(variables, x), mix1, (m,))
    print(f"  corr search x{batch}:    {t*1000:8.1f} ms", flush=True)

    # (3) gather_fold transfer at the 3 scales
    def _gf(x, i):
        from speinet_tpu.ops.patch_ops import gather_fold_nhwc
        return (gather_fold_nhwc(s3 + 0 * x[..., :1], i, 1) / 9.0,
                gather_fold_nhwc(s2, i, 2) / 9.0,
                gather_fold_nhwc(s1, i, 4) / 9.0)

    jg = jax.jit(_gf)
    t = chain_time(lambda x: jg(x, idx), mix1, (m,))
    print(f"  gather_fold x{batch}:    {t*1000:8.1f} ms", flush=True)

    # (4) decode alone
    def _decode(v, ffi):
        def run(mod, x):
            return mod._decode(x, ws_map, s3, s2, s1, False)
        return model.apply(v, ffi, method=run)

    jd = jax.jit(_decode)
    t = chain_time(lambda x: jd(variables, x), mix1, (ff,))
    print(f"decode x{batch}:           {t*1000:8.1f} ms", flush=True)


if __name__ == "__main__":
    main()
