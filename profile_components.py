"""Component-level timing of the 720p SPEINet forward on the real TPU.

Methodology: the remote TPU relay evaluates lazily (block_until_ready can
return before execution; identical calls can be elided), so every
measurement chains iterations through a scalar data dependency and ends
with a host readback; cost is the SLOPE between an n1- and n2-iteration
run (constant readback overhead cancels).
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def slope(fn, x0, name="", n1=1, n2=5, reps=3):
    """fn: x -> (x_next, out). Returns true per-iteration seconds.
    PROF_ONLY=<substr>[,<substr>...] runs only matching stages."""
    import jax.numpy as jnp

    only = os.environ.get("PROF_ONLY", "")
    if only and not any(s in name for s in only.split(",")):
        return None

    def run(k):
        x = x0
        t0 = time.time()
        for _ in range(k):
            x, out = fn(x)
        float(jnp.sum(out.astype(jnp.float32)))
        return time.time() - t0

    run(1)  # compile
    t1 = min(run(n1) for _ in range(reps))
    t2 = min(run(n2) for _ in range(reps))
    per = (t2 - t1) / (n2 - n1)
    print(f"{name:40s} {per*1000:9.1f} ms", flush=True)
    return per


def chained(jit_fn, *extra):
    """Wrap out = f(x, *extra) into x' = x*(1+eps*mean(out)) for
    serialization. `extra` tensors are passed as TRACED ARGS — closing over
    large device arrays embeds them as constants in the serialized program
    and overflows the remote-compile relay's request limit at batch >= 4."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def step(x, *e):
        out = jit_fn(x, *e)
        leaves = jax.tree_util.tree_leaves(out)
        s = sum(jnp.mean(l.astype(jnp.float32)) for l in leaves)
        return x * (1.0 + 1e-12 * s), leaves[0]

    return lambda x: step(x, *extra)


def main():
    import jax
    import jax.numpy as jnp

    from speinet_tpu.utils.compile_cache import enable_compile_cache
    enable_compile_cache()
    from speinet_tpu.config import Config, set_template
    from speinet_tpu.models.speinet import SPEINet
    from speinet_tpu.models.swinir import SwinIRCross
    from speinet_tpu.models.search_transfer import TransferUnit
    from speinet_tpu.models.recons_video import ReconsVideo
    from speinet_tpu.ops.filters import box_kernel, richardson_lucy

    dtype = jnp.bfloat16
    cfg = set_template(Config(template="SPEINet")).replace(compute_dtype="bfloat16")
    h, w = 720, 1280
    h4, w4 = h // 4, w // 4
    b = int(os.environ.get("PROF_BATCH", "1"))
    rng = jax.random.PRNGKey(0)
    key = jax.random.PRNGKey(1)

    # --- RL edge branch ---
    kernel = box_kernel(5, dtype=jnp.float32)
    img = jax.random.uniform(key, (3 * b, 3, h, w), jnp.float32, 0.1, 1.0)
    slope(chained(lambda x: richardson_lucy(x, kernel, 5, 0.01, box_size=5)),
          img, name="RL x5 (3b imgs, sep box)")

    # --- encoder pyramid (fast path) x7 legs ---
    enc = ReconsVideo(n_feat=32, n_resblock=3, out_channels=3, dtype=dtype)
    x7 = jax.random.uniform(key, (7 * b, h, w, 3), dtype)
    ev = enc.init(rng, jnp.zeros((1, 40, 40, 3), dtype))
    slope(chained(lambda t: enc.apply(
        ev, t, method=lambda m, u: m.encode_pyramid(u))), x7,
        name="encode_pyramid x7 (pallas s2d)")

    # --- swin fusion 2b batched ---
    swin = SwinIRCross(embed_dim=256, depths=(6,) * 6, num_heads=(8,) * 6,
                       window_size=5, mlp_ratio=2.0, dtype=dtype)
    f_mid = jax.random.normal(key, (2 * b, h4, w4, 128), dtype) * 0.1
    sv = swin.init(rng, f_mid[:1], f_mid[:1], deterministic=True)
    slope(chained(lambda t: swin.apply(sv, t, t, deterministic=True)), f_mid,
          name="swin fusion (2b batched)")

    # --- transfer unit ---
    tr = TransferUnit(n_feat=32, dtype=dtype)
    ff = jax.random.normal(key, (b, h4, w4, 128), dtype) * 0.1
    s1 = jax.random.normal(key, (b, h, w, 32), dtype) * 0.1
    s2 = jax.random.normal(key, (b, h // 2, w // 2, 64), dtype) * 0.1
    s3 = jax.random.normal(key, (b, h4, w4, 128), dtype) * 0.1
    hs = jnp.ones((b,), bool)
    tv = tr.init(rng, ff, s1, s2, s3, hs)
    slope(chained(lambda t, a1, a2, a3: tr.apply(tv, t, a1, a2, a3, hs),
                  s1, s2, s3), ff,
          name="transfer (corr+gather_fold)")

    # the ENGINE's transfer: host-known routing='sharp' (banded corr path,
    # single texture branch) — what video mode actually pays per restore
    slope(chained(lambda t, a1, a2, a3: tr.apply(tv, t, a1, a2, a3, hs,
                                                 routing="sharp"),
                  s1, s2, s3), ff,
          name="transfer sharp-routed (engine)")

    # --- correlation kernel alone (bf16) ---
    from speinet_tpu.ops.pallas_corr import correlation_argmax_pallas
    l = h4 * w4
    d = 128 * 9
    lr_n = jax.random.normal(key, (b, d, l), dtype) * 0.03
    ref_n = jax.random.normal(key, (b, l, d), dtype) * 0.03
    slope(chained(lambda t, r: correlation_argmax_pallas(t, r)[0], ref_n),
          lr_n, name="corr kernel bf16")

    # --- decoder stages at batch b ---
    dec_in = jax.random.normal(key, (b, h4, w4, 128), dtype) * 0.1

    def decode(m, t):
        d2 = m.decoder_second(t)
        d1 = m.decoder_first(d2)
        return m.out_block(d1)

    slope(chained(lambda t: enc.apply(ev, t, method=decode)), dec_in,
          name="decoder (d2+d1+out, fast)")

    # --- FULL forward ---
    model = SPEINet.from_config(cfg)
    x = jax.random.uniform(key, (b, 5, 3, h, w), jnp.float32, 0.1, 1.0)
    from speinet_tpu.utils.init_cache import cached_init
    variables = cached_init(model, rng, jnp.zeros((1, 5, 3, 80, 80), jnp.float32))

    @jax.jit
    def full_step(t):
        out = model.apply(variables, t, train=False)
        return t.at[:, 1].add(out * 1e-9), out

    slope(full_step, x, name="FULL forward", n1=1, n2=4)


if __name__ == "__main__":
    main()
