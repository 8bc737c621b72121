"""A/B: Pallas scalar-prefetch row_gather vs XLA take_along_axis on TPU.

Geometries = the seg9 gather_fold row layouts at 720p (B=2 window frames),
L = 180*320 = 57600 patch origins at every scale, R = 9*s*s*C:
  lv3 (s=1, C=128): R=1152   lv2 (s=2, C=64): R=2304   lv1 (s=4, C=32): R=4608
Checks bit-equality vs take_along_axis, then times both with the
chained-readback harness (lazy axon relay elides independent repeats).

Measured (v5e relay): take_along_axis 7.9/12.0/20.0 ms (67/88/106 GB/s);
row_gather best-K 15.1/19.3/29.4 ms — the Pallas kernel LOSES at every
scale; the shipped path stays seg9 + XLA gather.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from speinet_tpu.ops.pallas_gather import row_gather


def timeit(name, fn, a, idx, iters=8):
    @jax.jit
    def step(prev, a, idx):
        v = jnp.mean(prev[:, :1, :1].astype(jnp.float32)).astype(a.dtype)
        return fn(a + v * jnp.asarray(1e-6, a.dtype), idx)

    o = step(a, a, idx)
    float(o.astype(jnp.float32)[0, 0, 0])
    best = float("inf")
    for _ in range(3):
        o = step(a, a, idx)
        t0 = time.time()
        for _ in range(iters):
            o = step(o[:, : a.shape[1]], a, idx)
        float(o.astype(jnp.float32)[0, 0, 0])
        best = min(best, (time.time() - t0) / iters)
    gb = 2 * a.shape[0] * idx.shape[1] * a.shape[2] * a.dtype.itemsize / 1e9
    print(f"{name:<34s} {best*1000:8.2f} ms  {gb/best:7.1f} GB/s", flush=True)
    return best


def main():
    rng = np.random.default_rng(0)
    b = 2
    # True seg9 geometries at 720p (gather_fold_nhwc_seg9 row layout):
    # L = 180*320 = 57600 patch origins at every scale; R = 9*s*s*C with
    # (s, C) = (1, 128) / (2, 64) / (4, 32) -> 1152 / 2304 / 4608 lanes.
    for tag, l, r in (("lv3", 57600, 1152), ("lv2", 57600, 2304),
                      ("lv1", 57600, 4608)):
        rows = jnp.asarray(
            rng.standard_normal((b, l, r), np.float32), jnp.bfloat16)
        idx = jnp.asarray(rng.integers(0, l, (b, l)), jnp.int32)

        xla = jax.jit(lambda a, i: jnp.take_along_axis(a, i[:, :, None], 1))
        pal = jax.jit(lambda a, i: row_gather(a, i, k=8))
        got_x = np.asarray(xla(rows, idx))
        got_p = np.asarray(pal(rows, idx))
        ok = np.array_equal(got_x, got_p)
        print(f"{tag}: L={l} R={r} parity={'OK' if ok else 'FAIL'}",
              flush=True)
        if not ok:
            bad = np.argwhere((got_x != got_p).any(-1))[:4]
            print("  first bad rows:", bad.tolist(), flush=True)
            continue
        timeit(f"  take_along_axis {tag}", lambda a, i: jnp.take_along_axis(
            a, i[:, :, None], 1), rows, idx)
        for k in (4, 8, 16):
            timeit(f"  row_gather k={k} {tag}",
                   lambda a, i, k=k: row_gather(a, i, k=k), rows, idx)


if __name__ == "__main__":
    main()
