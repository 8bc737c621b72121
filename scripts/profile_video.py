"""Per-program slope profile of the video-mode engine at bench conditions
(batch 8, bf16, 720p): encode_window_legs / anchor_pyramid /
restore_from_features timed separately (chained iterations, readback sync),
plus a restore-stage decomposition (fusion+swin vs search/transfer vs
decode) to target kernel work where the time actually goes.

    PYTHONPATH=. python scripts/profile_video.py [batch=8]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def chain_time(fn, mix, args, n=4, reps=2):
    """fn(*args) -> out; mix(args, out) -> new args (data dependence)."""
    out = fn(*args)
    float(out.sum() if hasattr(out, "sum") else out[0].sum())  # compile+sync

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

    x = jnp.asarray(rng.random((batch, 3, h, w), np.float32))

    jl = jax.jit(lambda v, fr: model.apply(v, fr,
                                           method=SPEINet.encode_window_legs))
    ja = jax.jit(lambda v, fr: model.apply(v, fr,
                                           method=SPEINet.anchor_pyramid))
    jr = jax.jit(lambda v, m, n0, n1, p1, p2, p3, hs: model.apply(
        v, m, (n0, n1), p1, p2, p3, hs, method=SPEINet.restore_from_features))

    t_legs = chain_time(
        lambda fr: jl(variables, fr),
        lambda a, o: (a[0] * (1.0 + 1e-6 * jnp.mean(o[0]).astype(jnp.float32)),),
        (x,))
    print(f"legs (enc+RL1+RL5 x {batch}): {t_legs*1000:8.1f} ms", flush=True)

    t_anchor = chain_time(
        lambda fr: ja(variables, fr),
        lambda a, o: (a[0] * (1.0 + 1e-6 * jnp.mean(o[0]).astype(jnp.float32)),),
        (x,))
    print(f"anchor pyramid x {batch}:     {t_anchor*1000:8.1f} ms", flush=True)

    legs = jl(variables, x)
    f_mid, _ = legs[0], legs
    m = f_mid.astype(dt)
    n0 = jnp.roll(m, 1, axis=0)
    n1 = jnp.roll(m, 2, axis=0)
    p1, p2, p3 = ja(variables, x)
    hs = jnp.ones((batch,), bool)

    t_restore = chain_time(
        lambda mm: jr(variables, mm, n0, n1, p1, p2, p3, hs),
        lambda a, o: (a[0] + 1e-6 * jnp.mean(o).astype(a[0].dtype),),
        (m,))
    print(f"restore x {batch}:            {t_restore*1000:8.1f} ms", flush=True)

    # restore decomposition: (a) neighbor fusion (2 batched swin passes)
    jfuse = jax.jit(lambda v, mm: model.apply(v, mm, [n0, n1], True,
                                              method=SPEINet._fuse))
    try:
        t_fuse = chain_time(
            lambda mm: jfuse(variables, mm),
            lambda a, o: (a[0] + 1e-6 * jnp.mean(o).astype(a[0].dtype),),
            (m,))
        print(f"  fuse(2x swin) x {batch}:  {t_fuse*1000:8.1f} ms", flush=True)
    except Exception as e:
        print(f"  fuse decomposition unavailable: {type(e).__name__}: "
              f"{str(e)[:120]}")
    # (b) transfer (search + gather_fold, masked sharp/self select)
    f_fus = jnp.concatenate([m, m, m], axis=-1)

    def _transfer(v, ff):
        def run(mod, ffi):
            ff2 = mod.fusion(ffi)
            return mod.transfer(ff2, p1, p2, p3, hs)
        return model.apply(v, ff, method=run)

    jtr = jax.jit(_transfer)
    try:
        t_tr = chain_time(
            lambda ff: jtr(variables, ff),
            lambda a, o: (a[0] + 1e-6 * jnp.mean(o[0]).astype(a[0].dtype),),
            (f_fus,))
        print(f"  fusion+transfer x {batch}: {t_tr*1000:8.1f} ms", flush=True)
    except Exception as e:
        print(f"  transfer decomposition unavailable: {type(e).__name__}: "
              f"{str(e)[:120]}")

    per_frame = (t_legs + t_restore) / batch + t_anchor / batch * 0.5
    print(f"-> sec/frame ~{per_frame:.3f}  fps/chip ~{1/per_frame:.2f}",
          flush=True)


if __name__ == "__main__":
    main()
