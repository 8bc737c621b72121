"""A/B: whole-block fused swin kernel vs split attention+MLP kernels, on
hardware at the 720p lv3 shape (180x320, C=256, 8 heads, ws=5).

    python scripts/ab_block.py [b=2] [combo-filter ...]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timeit(step, x0, readback):
    def run(k):
        x = x0
        t0 = time.time()
        for _ in range(k):
            x, out = step(x)
        readback(out)
        return time.time() - t0

    t0 = time.time()
    run(1)
    c = time.time() - t0
    t1 = min(run(1) for _ in range(3))
    t2 = min(run(5) for _ in range(3))
    return (t2 - t1) / 4, c


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from speinet_tpu.utils.compile_cache import enable_compile_cache
    enable_compile_cache()
    import speinet_tpu.models.swinir as swinir_mod
    from speinet_tpu.models.swinir import SwinBlock

    b = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    h, w, c, heads, ws = 180, 320, 256, 8, 5
    dtype = jnp.bfloat16

    block_w = SwinBlock(dim=c, num_heads=heads, window_size=ws, shift_size=0,
                        mlp_ratio=2.0, dtype=dtype)
    block_sw = SwinBlock(dim=c, num_heads=heads, window_size=ws, shift_size=2,
                         mlp_ratio=2.0, dtype=dtype)
    key = jax.random.PRNGKey(1)
    x = (jax.random.normal(key, (b, h * w, c), jnp.float32) * 0.1).astype(dtype)
    y = x + 0.01
    variables_w = block_w.init(jax.random.PRNGKey(0), x, y, (h, w), True)
    variables_sw = block_sw.init(jax.random.PRNGKey(0), x, y, (h, w), True)

    def rb(out):
        float(jnp.sum(out.astype(jnp.float32)))

    combos = [
        ("split G8 (r2 default)", {"SPEINET_SWIN_FUSEBLOCK": "0",
                                   "SPEINET_SWIN_G": "8",
                                   "SPEINET_SWIN_COMPACT": "0"}),
        ("block S2 G8", {"SPEINET_SWIN_G": "8",
                         "SPEINET_SWIN_COMPACT": "0"}),
        ("block S1 G8", {"SPEINET_SWIN_G": "8", "SPEINET_SWIN_S": "1",
                         "SPEINET_SWIN_COMPACT": "0"}),
        ("block S2 G4", {"SPEINET_SWIN_G": "4",
                         "SPEINET_SWIN_COMPACT": "0"}),
        ("block S4 G8", {"SPEINET_SWIN_G": "8", "SPEINET_SWIN_S": "4",
                         "SPEINET_SWIN_COMPACT": "0"}),
        ("block S2 G16", {"SPEINET_SWIN_G": "16",
                          "SPEINET_SWIN_COMPACT": "0"}),
        ("compact S2 G8 GW4 QH4", {"SPEINET_SWIN_G": "8"}),
        ("compact S2 G8 GW2 QH4", {"SPEINET_SWIN_G": "8",
                                   "SPEINET_SWIN_GW": "2"}),
        ("compact S2 G8 GW8 QH4", {"SPEINET_SWIN_G": "8",
                                   "SPEINET_SWIN_GW": "8"}),
        ("compact S2 G8 GW4 QH2", {"SPEINET_SWIN_G": "8",
                                   "SPEINET_SWIN_QH": "2"}),
        ("compact S2 G8 GW4 QH8", {"SPEINET_SWIN_G": "8",
                                   "SPEINET_SWIN_QH": "8"}),
        ("compact S4 G8 GW4 QH4", {"SPEINET_SWIN_G": "8",
                                   "SPEINET_SWIN_S": "4"}),
        ("compact S2 G16 GW4 QH4", {"SPEINET_SWIN_G": "16"}),
        ("compact S1 G8 GW4 QH4", {"SPEINET_SWIN_G": "8",
                                   "SPEINET_SWIN_S": "1"}),
        # compact packing's score waste is linear in the packing, so unlike
        # the [sgn, sgn] path bigger S/G only cut grid steps (same issued
        # FLOPs) until VMEM runs out
        ("compact S4 G16 GW4 QH4", {"SPEINET_SWIN_G": "16",
                                    "SPEINET_SWIN_S": "4"}),
        ("compact S8 G16 GW4 QH4", {"SPEINET_SWIN_G": "16",
                                    "SPEINET_SWIN_S": "8"}),
        ("compact S2 G32 GW4 QH4", {"SPEINET_SWIN_G": "32"}),
        ("compact S4 G32 GW4 QH4", {"SPEINET_SWIN_G": "32",
                                    "SPEINET_SWIN_S": "4"}),
    ]
    if len(sys.argv) > 2:
        combos = [cc for cc in combos if any(s in cc[0] for s in sys.argv[2:])]
    for name, env in combos:
        for k in ("SPEINET_SWIN_G", "SPEINET_SWIN_R", "SPEINET_SWIN_S",
                  "SPEINET_SWIN_FUSEBLOCK",
                  "SPEINET_SWIN_COMPACT", "SPEINET_SWIN_GW",
                  "SPEINET_SWIN_QH"):
            os.environ.pop(k, None)
        os.environ.update(env)
        for tag, blk, vv in (("W", block_w, variables_w),
                             ("SW", block_sw, variables_sw)):
            # pass params/y as traced args: closed-over device arrays embed
            # as HLO literals and at b>=16 overflow the relay's
            # remote-compile request body (HTTP 413)
            @jax.jit
            def step_(t, yv, vvv):
                out = blk.apply(vvv, t, yv, (h, w), True)
                return (t * (1.0 + 1e-12 * jnp.mean(out.astype(jnp.float32))),
                        out)

            step = lambda t: step_(t, y, vv)
            try:
                per, comp = timeit(step, x, rb)
                print(f"b={b} {name} [{tag}]: {per*1000:8.2f} ms "
                      f"(compile {comp:.0f}s)", flush=True)
            except Exception as e:
                print(f"b={b} {name} [{tag}]: FAILED {type(e).__name__}: "
                      f"{str(e)[:200]}", flush=True)


main()
