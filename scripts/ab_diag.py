"""Micro-benchmark: cost of the banded-correlation building blocks on TPU.

The 3x3-patch correlation R[p,q] = <unfold(f)[p], unfold(g)[q]> (D=1152)
decomposes exactly into 9 diagonal-shifted D=128 products:
    R[p,q] = sum_{o in offsets} C0[p+o, q+o],   C0[u,v] = <f[u], g[v]>
Grouping the 9 offsets into 3 row-clusters (each covering 3 column
micro-shifts with ONE expanded matmul) cuts matmul FLOPs 3x — IF the
per-cluster "diagonal add" (r += c0[j:j+TK, j:j+TL] for j=0,1,2, i.e. a
(sublane, lane) shifted read) is cheap on the VPU. Mosaic relayouts for
lane shifts have burned us before (compact swin mask), so measure the
pattern in isolation before building the kernel:

  variant 'diag':   3 cluster matmuls [TK+2,128]x[128,TL+2] + 9 diagonal
                    adds + running max/argmax    (banded prototype step)
  variant 'flat':   1 matmul [TK,1152]x[1152,TL] + running max/argmax
                    (today's kernel step, same output work)

Equal tile counts => per-step times compare directly; 'diag' wins iff
its step time < flat's. Prints ms/step and the implied 720p corr ms.

    python scripts/ab_diag.py [tl=512] [variants...]
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from speinet_tpu.utils.compile_cache import enable_compile_cache
    enable_compile_cache()

    tl = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    tk = tl
    want = sys.argv[2:]
    d_small, d_big = 128, 1152
    n_k = 16            # sequential ref chunks per query tile
    dt = jnp.bfloat16
    rng = np.random.default_rng(0)

    # ---- 'flat': today's kernel step ------------------------------------
    def flat_kernel(lr_ref, ref_ref, s_ref, idx_ref, best, best_idx):
        k = pl.program_id(1)

        @pl.when(k == 0)
        def _():
            best[:] = jnp.full_like(best, -jnp.inf)
            best_idx[:] = jnp.zeros_like(best_idx)

        r = jax.lax.dot_general(ref_ref[0], lr_ref[:],
                                (((0,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        cmax = jnp.max(r, axis=0)
        carg = jnp.argmax(r, axis=0).astype(jnp.int32) + k * tk
        upd = cmax > best[0]
        best[0] = jnp.where(upd, cmax, best[0])
        best_idx[0] = jnp.where(upd, carg, best_idx[0])

        @pl.when(k == pl.num_programs(1) - 1)
        def _():
            s_ref[0] = best[0]
            idx_ref[0] = best_idx[0]

    def run_flat():
        lr = jnp.asarray(rng.standard_normal((d_big, tl)) * 0.1, dt)
        ref = jnp.asarray(rng.standard_normal((n_k, d_big, tk)) * 0.1, dt)
        f = pl.pallas_call(
            flat_kernel,
            grid=(1, n_k),
            in_specs=[
                pl.BlockSpec((d_big, tl), lambda i, k: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, d_big, tk), lambda i, k: (k, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((1, tl), lambda i, k: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, tl), lambda i, k: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_shape=[jax.ShapeDtypeStruct((1, tl), jnp.float32),
                       jax.ShapeDtypeStruct((1, tl), jnp.int32)],
            scratch_shapes=[pltpu.VMEM((1, tl), jnp.float32),
                            pltpu.VMEM((1, tl), jnp.int32)],
        )
        return f, (lr, ref)

    # ---- 'diag': banded prototype step ----------------------------------
    # operands arrive pre-sliced per cluster (the real kernel would slice
    # them from a wide DMA'd slab; static slices of VMEM are the same cost)
    def diag_kernel(lr_ref, ref_ref, s_ref, idx_ref, best, best_idx):
        k = pl.program_id(1)

        @pl.when(k == 0)
        def _():
            best[:] = jnp.full_like(best, -jnp.inf)
            best_idx[:] = jnp.zeros_like(best_idx)

        r = jnp.zeros((tk, tl), jnp.float32)
        for cl in range(3):
            c0 = jax.lax.dot_general(ref_ref[cl], lr_ref[cl],
                                     (((0,), (0,)), ((), ())),
                                     preferred_element_type=jnp.float32)
            for j in range(3):
                r = r + jax.lax.dynamic_slice(c0, (j, j), (tk, tl))
        cmax = jnp.max(r, axis=0)
        carg = jnp.argmax(r, axis=0).astype(jnp.int32) + k * tk
        upd = cmax > best[0]
        best[0] = jnp.where(upd, cmax, best[0])
        best_idx[0] = jnp.where(upd, carg, best_idx[0])

        @pl.when(k == pl.num_programs(1) - 1)
        def _():
            s_ref[0] = best[0]
            idx_ref[0] = best_idx[0]

    def run_diag():
        lr = jnp.asarray(rng.standard_normal((3, d_small, tl + 2)) * 0.1, dt)
        ref = jnp.asarray(
            rng.standard_normal((n_k, 3, d_small, tk + 2)) * 0.1, dt)
        f = pl.pallas_call(
            diag_kernel,
            grid=(1, n_k),
            in_specs=[
                pl.BlockSpec((3, d_small, tl + 2), lambda i, k: (0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 3, d_small, tk + 2),
                             lambda i, k: (k, 0, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((1, tl), lambda i, k: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, tl), lambda i, k: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_shape=[jax.ShapeDtypeStruct((1, tl), jnp.float32),
                       jax.ShapeDtypeStruct((1, tl), jnp.int32)],
            scratch_shapes=[pltpu.VMEM((1, tl), jnp.float32),
                            pltpu.VMEM((1, tl), jnp.int32)],
        )
        return f, (lr, ref)

    variants = {"flat": run_flat, "diag": run_diag}
    # 720p: L = Lr = 58604 padded positions
    l720 = 58604
    steps_720 = (l720 / tl) * (l720 / tk)
    for name, build in variants.items():
        if want and not any(w in name for w in want):
            continue
        f, args = build()

        @jax.jit
        def step(lr, rest):
            s, i = f(lr, rest)
            # chain: mix the output into the next input so the lazy relay
            # cannot elide repeated identical calls
            return lr * (1 + 1e-12 * jnp.mean(s).astype(lr.dtype)), s

        t0 = time.time()
        _, s = step(*args)
        float(jnp.sum(s))
        comp = time.time() - t0

        def run(reps):
            a = args[0]
            t0 = time.time()
            out = None
            for _ in range(reps):
                a, out = step(a, args[1])
            float(jnp.sum(out))
            return time.time() - t0

        t1 = min(run(2) for _ in range(2))
        t2 = min(run(10) for _ in range(2))
        per_call = (t2 - t1) / 8
        per_step = per_call / n_k
        print(f"{name}: {per_step*1e6:8.1f} us/step "
              f"-> 720p corr ~{per_step*steps_720*1000:6.1f} ms/frame "
              f"(compile {comp:.0f}s)", flush=True)


main()
