"""Fine-grained timing of the transfer GLUE (everything around the
correlation kernel) at bench conditions (720p, bf16, sharp routing):
unfold prep, patch norms, the take_along_axis gathers of gather_fold at
each scale, the slab-add epilogue, and the full TransferUnit. Identifies
which of the ~40 ms of non-kernel transfer time is real and where.

    python scripts/ab_glue.py [b=2] [iters=8]
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
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    dt = jnp.bfloat16
    h, w = 720, 1280
    h4, w4 = h // 4, w // 4
    l = h4 * w4
    f = 32
    rng = np.random.default_rng(0)

    ff = jnp.asarray(rng.random((b, h4, w4, 4 * f), np.float32), dt)
    s1 = jnp.asarray(rng.random((b, h, w, f), np.float32), dt)
    s2 = jnp.asarray(rng.random((b, h // 2, w // 2, 2 * f), np.float32), dt)
    s3 = jnp.asarray(rng.random((b, h4, w4, 4 * f), np.float32), dt)
    idx = jnp.asarray(rng.integers(0, l, (b, l)), jnp.int32)

    def timeit(name, fn, *args):
        """Chained timing with a host readback: the lazy relay elides
        repeated independent calls and returns from block_until_ready
        early, so each iteration mixes the previous output into the first
        argument INSIDE the jitted program (an un-jitted 30 MB mix add is
        its own ~2 ms relay dispatch) and the loop ends with float(sum)."""
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
        return best

    from speinet_tpu.ops.patch_ops import (gather_fold_nhwc,
                                           gather_fold_nhwc_seg9, unfold)
    from speinet_tpu.models.search_transfer import _patch_inv_norms

    # 1. lr-side prep: unfold to [B, D, L]
    ju = jax.jit(lambda x: unfold(x.transpose(0, 3, 1, 2), 3, 1, 1))
    timeit("unfold lr [B,1152,L]", ju, ff)

    # 2. patch inv-norms
    jn_ = jax.jit(_patch_inv_norms)
    timeit("_patch_inv_norms", jn_, ff)

    # 3. ref-side prep: unfold + norms + broadcast scale (bf16 out)
    def refprep(x):
        u = unfold(x.transpose(0, 3, 1, 2), 3, 1, 1)
        inv = _patch_inv_norms(x)
        return u.astype(dt) * inv[:, None, :].astype(dt)
    jr = jax.jit(refprep)
    timeit("ref prep (unfold+norm+scale)", jr, s3)

    # 4. gather_fold at each scale (full: tiles build + gather + slab add)
    for name, ref, s in (("lv3 s=1", s3, 1), ("lv2 s=2", s2, 2),
                         ("lv1 s=4", s1, 4)):
        jg = jax.jit(lambda r, i, s=s: gather_fold_nhwc(r, i, s) / 9.0)
        timeit(f"gather_fold {name}", jg, ref, idx)

    # 4b. seg9 variant (one L-row patch gather instead of 9L tile rows)
    for name, ref, s in (("lv3 s=1", s3, 1), ("lv2 s=2", s2, 2),
                         ("lv1 s=4", s1, 4)):
        jg = jax.jit(lambda r, i, s=s: gather_fold_nhwc_seg9(r, i, s) / 9.0)
        timeit(f"gather_fold_seg9 {name}", jg, ref, idx)

    # 4c. shift9 variant (overlap-add moved into index space: same single
    # gather, fold = sum over 9 adjacent rows — no pad/slice relayouts)
    from speinet_tpu.ops.patch_ops import gather_fold_nhwc_shift9
    for name, ref, s in (("lv3 s=1", s3, 1), ("lv2 s=2", s2, 2),
                         ("lv1 s=4", s1, 4)):
        jg = jax.jit(lambda r, i, s=s: gather_fold_nhwc_shift9(r, i, s) / 9.0)
        timeit(f"gather_fold_shift9 {name}", jg, ref, idx)

    # 5. the raw take_along_axis gather alone at lv1 geometry
    def gather_only(ref, index):
        s = 4
        bb, hh, ww, c = ref.shape
        nh, nw = hh // s, ww // s
        refp = jnp.pad(ref, ((0, 0), (s, s), (s, s), (0, 0)))
        tiles = refp.reshape(bb, nh + 2, s, nw + 2, s, c).transpose(0, 1, 3, 2, 4, 5)
        tiles = tiles.reshape(bb, (nh + 2) * (nw + 2), s * s * c)
        idx_h = index // nw
        idx_w = index % nw
        offs = jnp.asarray([(di, dj) for di in range(3) for dj in range(3)],
                           dtype=index.dtype)
        flat = ((idx_h[:, None, :] + offs[None, :, 0:1]) * (nw + 2)
                + idx_w[:, None, :] + offs[None, :, 1:2])
        g = jnp.take_along_axis(tiles, flat.reshape(bb, 9 * l)[:, :, None], axis=1)
        return g
    jgo = jax.jit(gather_only)
    timeit("  lv1 take_along_axis only", jgo, s1, idx)

    # 6. tiles build alone at lv1 geometry
    def tiles_only(ref):
        s = 4
        bb, hh, ww, c = ref.shape
        nh, nw = hh // s, ww // s
        refp = jnp.pad(ref, ((0, 0), (s, s), (s, s), (0, 0)))
        tiles = refp.reshape(bb, nh + 2, s, nw + 2, s, c).transpose(0, 1, 3, 2, 4, 5)
        return tiles.reshape(bb, (nh + 2) * (nw + 2), s * s * c)
    jt = jax.jit(tiles_only)
    timeit("  lv1 tiles build only", jt, s1)

    # 7. full TransferUnit routing='sharp' (bench video-mode condition)
    from speinet_tpu.models.search_transfer import TransferUnit
    tu = TransferUnit(n_feat=f, dtype=dt)
    vs = tu.init(jax.random.PRNGKey(0),
                 jnp.zeros((1, 20, 20, 4 * f), dt),
                 jnp.zeros((1, 80, 80, f), dt),
                 jnp.zeros((1, 40, 40, 2 * f), dt),
                 jnp.zeros((1, 20, 20, 4 * f), dt),
                 jnp.ones((1,), bool), routing="mixed")
    hsx = jnp.ones((b,), bool)
    # side tensors as traced args: closures embed them as constants and
    # overflow the remote-compile request limit at b >= 4
    jtu = jax.jit(lambda x, a1, a2, a3: tu.apply(vs, x, a1, a2, a3, hsx,
                                                 routing="sharp"))
    timeit("TransferUnit routing=sharp (full)", jtu, ff, s1, s2, s3)

    jtm = jax.jit(lambda x, a1, a2, a3: tu.apply(vs, x, a1, a2, a3, hsx,
                                                 routing="mixed"))
    timeit("TransferUnit routing=mixed (full)", jtm, ff, s1, s2, s3)


if __name__ == "__main__":
    main()
