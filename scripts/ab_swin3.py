"""Diagnose the compact-path W/SW asymmetry: time fused_swin_block
directly (no SwinBlock wrapper, no rolls) at the 720p-lv3 shape with long
chained loops, isolating the mask input from the shift itself.

    python scripts/ab_swin3.py [b=2] [iters=20]

Variants:
  W  compact          shift=0 (no mask input)
  SW compact          shift=2 (dedup 5-D compact mask)
  SW compact nomask   shift=2 geometry but has_mask forced off (WRONG
                      numbers, timing only — isolates the mask-add cost)
  W/SW noncompact     the round-3 [sgn, sgn] path for reference
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

    b = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 20
    h, w, c, heads, ws = 180, 320, 256, 8, 5
    hp = h     # 180 % 5 == 0: no pad
    dtype = jnp.bfloat16
    rng = np.random.default_rng(0)

    x = jnp.asarray(rng.standard_normal((b, hp, w, c)).astype(np.float32) * 0.1).astype(dtype)
    y = x + 0.01
    ls1 = jnp.ones((c,), jnp.float32); lb1 = jnp.zeros((c,), jnp.float32)
    wkv = jnp.asarray(rng.standard_normal((c, 2 * c)).astype(np.float32) * 0.05)
    bkv = jnp.zeros((2 * c,), jnp.float32)
    wq = jnp.asarray(rng.standard_normal((c, c)).astype(np.float32) * 0.05)
    bq = jnp.zeros((c,), jnp.float32)
    wp = jnp.asarray(rng.standard_normal((c, c)).astype(np.float32) * 0.05)
    bp = jnp.zeros((c,), jnp.float32)
    bias = jnp.asarray(rng.standard_normal((heads, ws * ws, ws * ws)).astype(np.float32) * 0.02)
    ls2, lb2 = ls1, lb1
    w1 = jnp.asarray(rng.standard_normal((c, 2 * c)).astype(np.float32) * 0.05)
    b1 = jnp.zeros((2 * c,), jnp.float32)
    w2 = jnp.asarray(rng.standard_normal((2 * c, c)).astype(np.float32) * 0.05)
    b2 = jnp.zeros((c,), jnp.float32)

    def run_one(name, env, shift, force_nomask=False):
        for k in ("SPEINET_SWIN_G", "SPEINET_SWIN_S", "SPEINET_SWIN_COMPACT",
                  "SPEINET_SWIN_GW", "SPEINET_SWIN_QH"):
            os.environ.pop(k, None)
        os.environ.update(env)
        import speinet_tpu.ops.pallas_swin as ps

        eff_shift = 0 if force_nomask else shift

        @jax.jit
        def step(t):
            out = ps.fused_swin_block(
                t, y, ls1, lb1, wkv, bkv, wq, bq, wp, bp, bias,
                ls2, lb2, w1, b1, w2, b2,
                ws=ws, shift=eff_shift, pad_h=0, pad_w=0, heads=heads)
            return (t + out * 1e-6).astype(t.dtype)

        try:
            t0 = time.time()
            o = step(x)
            float(o.astype(jnp.float32).sum())
            comp = time.time() - t0

            def chain(k):
                t = x
                tt = time.time()
                for _ in range(k):
                    t = step(t)
                float(t.astype(jnp.float32).sum())
                return time.time() - tt

            t1 = min(chain(2) for _ in range(2))
            t2 = min(chain(2 + iters) for _ in range(2))
            per = (t2 - t1) / iters
            print(f"b={b} {name}: {per*1000:8.3f} ms (compile {comp:.0f}s)",
                  flush=True)
        except Exception as e:
            print(f"b={b} {name}: FAILED {type(e).__name__}: {str(e)[:160]}",
                  flush=True)

    filt = sys.argv[3:] if len(sys.argv) > 3 else None
    variants = [
        ("W  compact GW4 QH4", {"SPEINET_SWIN_G": "8"}, 0, False),
        ("SW compact GW4 QH4", {"SPEINET_SWIN_G": "8"}, 2, False),
        ("SW compact nomask (timing only)", {"SPEINET_SWIN_G": "8"}, 2, True),
        ("W  noncompact", {"SPEINET_SWIN_G": "8",
                           "SPEINET_SWIN_COMPACT": "0"}, 0, False),
        ("SW noncompact", {"SPEINET_SWIN_G": "8",
                           "SPEINET_SWIN_COMPACT": "0"}, 2, False),
        ("SW compact GW2", {"SPEINET_SWIN_G": "8",
                            "SPEINET_SWIN_GW": "2"}, 2, False),
        ("SW compact GW8", {"SPEINET_SWIN_G": "8",
                            "SPEINET_SWIN_GW": "8"}, 2, False),
        # linear (not quadratic) packing waste in compact mode: larger
        # stream batches per grid step may now win (S=4 lost 2.51 vs 2.92
        # fps under the old [sgn, sgn] packing); needs b % S == 0
        ("W  compact S4", {"SPEINET_SWIN_G": "8",
                           "SPEINET_SWIN_S": "4"}, 0, False),
        ("SW compact S4", {"SPEINET_SWIN_G": "8",
                           "SPEINET_SWIN_S": "4"}, 2, False),
        ("W  compact G16", {"SPEINET_SWIN_G": "16"}, 0, False),
        ("SW compact G16", {"SPEINET_SWIN_G": "16"}, 2, False),
        ("W  compact G32", {"SPEINET_SWIN_G": "32"}, 0, False),
        ("SW compact G32", {"SPEINET_SWIN_G": "32"}, 2, False),
        ("W  compact G64", {"SPEINET_SWIN_G": "64"}, 0, False),
        ("SW compact G64", {"SPEINET_SWIN_G": "64"}, 2, False),
        ("W  compact G16 S4", {"SPEINET_SWIN_G": "16",
                               "SPEINET_SWIN_S": "4"}, 0, False),
        ("SW compact G16 S4", {"SPEINET_SWIN_G": "16",
                               "SPEINET_SWIN_S": "4"}, 2, False),
        ("W  compact G16 GW2", {"SPEINET_SWIN_G": "16",
                                "SPEINET_SWIN_GW": "2"}, 0, False),
        ("SW compact G16 GW2", {"SPEINET_SWIN_G": "16",
                                "SPEINET_SWIN_GW": "2"}, 2, False),
    ]
    for name, env, shift, nomask in variants:
        if filt and not any(s in name for s in filt):
            continue
        run_one(name, env, shift, nomask)


main()
