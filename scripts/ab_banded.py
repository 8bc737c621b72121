"""A/B the banded correlation kernel vs the flat lds kernel at the 720p
lv3 restore shapes (b x 180 x 320 x 128, sharp routing): ms/frame for
  flat:   unfold prep + correlation_argmax_pallas_lds ([TK,1152]x[1152,TL])
  banded: slab prep + _corr_impl_banded (3 x [TK+2,128]x[128,TL+2] + diag adds)
Both timed end-to-end including their prep (the banded win includes
skipping the unfold materializations).

    python scripts/ab_banded.py [batch=8] [variants...]
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
    import speinet_tpu.ops.pallas_corr as pc
    from speinet_tpu.models.search_transfer import _patch_inv_norms
    from speinet_tpu.ops.patch_ops import unfold

    b = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    want = sys.argv[2:]
    h, w, c = 180, 320, 128
    dt = jnp.bfloat16
    rng = np.random.default_rng(0)
    f = jnp.asarray(rng.standard_normal((b, h, w, c)) * 0.1, jnp.float32)
    g = jnp.asarray(rng.standard_normal((b, h, w, c)) * 0.1, jnp.float32)

    def flat(fm, gm):
        inv_lr = _patch_inv_norms(fm)
        lr_u = unfold(fm.transpose(0, 3, 1, 2), 3, 1, 1)
        ref_u = unfold(gm.transpose(0, 3, 1, 2), 3, 1, 1)
        inv_ref = _patch_inv_norms(gm)
        s, idx = pc.correlation_argmax_pallas_lds(
            lr_u.astype(dt), ref_u.astype(dt), inv_ref)
        return s * inv_lr, idx

    def banded(fm, gm):
        inv_lr = _patch_inv_norms(fm)
        inv_ref = _patch_inv_norms(gm)
        s, idx = pc.banded_corr_argmax(fm.astype(dt), gm.astype(dt), inv_ref)
        return s * inv_lr, idx

    for name, fn in (("flat", flat), ("banded", banded)):
        if want and not any(v in name for v in want):
            continue

        @jax.jit
        def step(fm, gm):
            s, idx = fn(fm, gm)
            # chain so the lazy relay cannot elide repeats
            return fm * (1.0 + 1e-12 * jnp.mean(s).astype(fm.dtype)), s, idx

        try:
            t0 = time.time()
            fm, s, idx = step(f, g)
            float(jnp.sum(s)); float(jnp.sum(idx))
            comp = time.time() - t0

            def run(reps):
                a = f
                t0 = time.time()
                for _ in range(reps):
                    a, s, _ = step(a, g)
                float(jnp.sum(s))
                return time.time() - t0

            t1 = min(run(2) for _ in range(2))
            t2 = min(run(10) for _ in range(2))
            per = (t2 - t1) / 8 / b
            print(f"b={b} {name}: {per*1000:8.2f} ms/frame "
                  f"(compile {comp:.0f}s)", flush=True)
        except Exception as e:
            print(f"b={b} {name}: FAILED {type(e).__name__}: {str(e)[:300]}",
                  flush=True)


if __name__ == '__main__':
    main()
