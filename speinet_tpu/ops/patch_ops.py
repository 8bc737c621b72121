"""Patch extraction (unfold) / overlap-add (fold) and fused gather+fold.

TPU-native equivalents of the `F.unfold` / `F.fold` pipeline inside the
reference's SearchTransfer attention (model/SearchTransfer.py:24-51). All the
fold configurations used by the model have kernel = 3 * stride and
padding = stride (k/s/p = 3/1/1, 6/2/2, 12/4/4), which lets fold decompose
into 9 dense shifted adds — no scatter, fully vectorized on the VPU — and
lets the gather-then-fold of transferred textures run directly on the
reference image as s x s tile gathers, never materializing the
[B, C*k*k, H*W] unfold of the reference pyramid (1 GB at 720p in the
reference implementation).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def unfold(x: jnp.ndarray, kernel_size: int, stride: int = 1, padding: int = 0) -> jnp.ndarray:
    """im2col, matching `torch.nn.functional.unfold`.

    x: [B, C, H, W] -> [B, C*k*k, L] with channel-major patch ordering
    (channel, then kernel row, then kernel col), L = nH * nW.
    """
    patches = jax.lax.conv_general_dilated_patches(
        x,
        filter_shape=(kernel_size, kernel_size),
        window_strides=(stride, stride),
        padding=[(padding, padding), (padding, padding)],
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
        # identity-kernel conv: force full precision or the TPU MXU rounds
        # the copied values through bf16
        precision=jax.lax.Precision.HIGHEST,
    )  # [B, C*k*k, nH, nW], channels ordered (c, kh, kw)
    b, ckk, nh, nw = patches.shape
    return patches.reshape(b, ckk, nh * nw)


def fold(
    patches: jnp.ndarray,
    output_size: tuple,
    kernel_size: int,
    stride: int,
    padding: int,
) -> jnp.ndarray:
    """Overlap-add, matching `torch.nn.functional.fold` for k = 3s, p = s.

    patches: [B, C*k*k, L] -> [B, C, H_out, W_out]. Decomposes the k x k
    patch into a 3x3 grid of s x s sub-tiles; each (di, dj) sub-tile of all
    patches forms a dense image that is added at tile offset (di-1, dj-1).
    """
    k, s, p = kernel_size, stride, padding
    assert k == 3 * s and p == s, "fold specialized for kernel=3*stride, pad=stride"
    h_out, w_out = output_size
    nh = (h_out + 2 * p - k) // s + 1
    nw = (w_out + 2 * p - k) // s + 1
    b = patches.shape[0]
    c = patches.shape[1] // (k * k)
    x = patches.reshape(b, c, 3, s, 3, s, nh, nw)
    canvas = jnp.zeros((b, c, (nh + 2) * s, (nw + 2) * s), dtype=patches.dtype)
    for di in range(3):
        for dj in range(3):
            block = x[:, :, di, :, dj, :, :, :]            # [B, C, s, s, nh, nw]
            img = block.transpose(0, 1, 4, 2, 5, 3).reshape(b, c, nh * s, nw * s)
            canvas = jax.lax.dynamic_update_slice(
                canvas,
                jax.lax.dynamic_slice(canvas, (0, 0, di * s, dj * s), (b, c, nh * s, nw * s)) + img,
                (0, 0, di * s, dj * s),
            )
    return canvas[:, :, p : p + h_out, p : p + w_out]


def gather_fold_nhwc_seg9(ref: jnp.ndarray, index: jnp.ndarray,
                          stride: int) -> jnp.ndarray:
    """gather_fold_nhwc with the gather restructured to ONE row-gather of
    whole 3x3-tile patches.

    The tiles-layout gather reads 9L rows of s*s*C (9 sub-tile rows per
    output position); XLA's TPU gather is row-count-bound (~30 GB/s
    measured at 720p lv1 — scripts/ab_glue.py). Here the 9 (di, dj)
    sub-tiles of every patch ORIGIN are pre-packed densely (XLA fuses the
    9 shifted slices + relayout into one HBM pass) so the data-dependent
    step is a single take_along_axis of L rows of 9*s*s*C — 9x fewer
    gather rows for the same volume, and XLA runs it at 67-106 GB/s
    (scripts/ab_gather.py). End-to-end the two layouts time within noise
    (67.8 vs 67.9 ms for the full 3-scale glue, scripts/ab_glue.py): the
    gather win is offset by the dense pre-pack HBM pass — and that pre-pack
    is ~4.3 GB of transient HBM per scale at batch 8, which OOMs the 720p
    restore program, so seg9 is OPT-IN (SPEINET_GF_SEG9=1), useful at small
    batch and as the row layout a future fused gather+fold epilogue wants.
    A Pallas scalar-prefetch row-gather alternative measured strictly
    slower than XLA's gather on this layout (ops/pallas_gather.py)."""
    s = stride
    b, hh, ww, c = ref.shape
    nh, nw = hh // s, ww // s
    l = nh * nw
    assert index.shape[-1] == l
    refp = jnp.pad(ref, ((0, 0), (s, s), (s, s), (0, 0)))
    t6 = refp.reshape(b, nh + 2, s, nw + 2, s, c)
    # seg[b, i, j, di, dj] = padded-grid tile (i+di, j+dj): all 9 sub-tiles
    # of the patch with origin (i, j) in one contiguous row; origins only
    # ever come from argmax positions, i in 0..nh-1, j in 0..nw-1
    parts = [t6[:, di : di + nh, :, dj : dj + nw].transpose(0, 1, 3, 2, 4, 5)
             for di in range(3) for dj in range(3)]   # 9 x [b, nh, nw, s, s, c]
    seg = jnp.stack(parts, axis=3)                    # [b, nh, nw, 9, s, s, c]
    rows = seg.reshape(b, l, 9 * s * s * c)
    g = jnp.take_along_axis(rows, index[:, :, None], axis=1)   # [b, L, 9ssc]
    g = g.reshape(b, nh, nw, 3, 3, s, s, c).transpose(0, 3, 4, 1, 2, 5, 6, 7)
    # identical overlap-add epilogue to gather_fold_nhwc below
    gp = jnp.pad(g, ((0, 0), (0, 0), (0, 0), (1, 1), (1, 1),
                     (0, 0), (0, 0), (0, 0)))
    acc = None
    for di in range(3):
        for dj in range(3):
            sl = gp[:, di, dj, 2 - di : 2 - di + nh, 2 - dj : 2 - dj + nw]
            acc = sl if acc is None else acc + sl
    return acc.transpose(0, 1, 3, 2, 4, 5).reshape(b, nh * s, nw * s, c)


def gather_fold_nhwc(ref: jnp.ndarray, index: jnp.ndarray,
                     stride: int) -> jnp.ndarray:
    """Dispatch: 9-row tiles layout (default) or the seg9 single-gather
    layout (SPEINET_GF_SEG9=1). Identical outputs
    (tests/test_ops_resize_patch.py). seg9 gathers 9x fewer rows and was
    end-to-end NEUTRAL at batch 2 (67.8 vs 67.9 ms, scripts/ab_glue.py),
    but its dense [B, L, 9*s*s*C] pre-pack materializes ~4.3 GB per scale
    at the bench batch 8 — the restore program OOMs HBM (21.6 G needed of
    15.75 G) — so the low-footprint tiles layout is the default."""
    import os

    if os.environ.get("SPEINET_GF_SEG9", "0") == "1":
        return gather_fold_nhwc_seg9(ref, index, stride)
    return gather_fold_nhwc_tiles(ref, index, stride)


def gather_fold_nhwc_tiles(ref: jnp.ndarray, index: jnp.ndarray, stride: int) -> jnp.ndarray:
    """Fused `bis(unfold(ref)) -> fold` of the texture-transfer step, NHWC.

    Equivalent to the reference chain (SearchTransfer.py:36-46):
        ref_unfold = F.unfold(ref, k=3s, stride=s, pad=s)
        T_unfold   = gather(ref_unfold, dim=2, index)    # `bis`
        T          = F.fold(T_unfold, out_size, k=3s, stride=s, pad=s)
    without materializing ref_unfold. ref: [B, nH*s, nW*s, C];
    index: [B, L] int32 with L = nH*nW (argmax over ref patch positions);
    returns [B, nH*s, nW*s, C] (the caller divides by 9).

    The 9 (di, dj) sub-tiles of each gathered k x k patch are s x s tiles
    of `ref` at coordinate (idx_h+di, idx_w+dj) in a one-tile-padded grid
    (channels minor => each gather reads one contiguous [s*s*C] block).
    The overlap-add reduces to a sum of 9 static slices of the gathered
    tensor — no scatter, no serialized canvas updates.
    """
    s = stride
    b, hh, ww, c = ref.shape
    nh, nw = hh // s, ww // s
    l = nh * nw
    assert index.shape[-1] == l
    refp = jnp.pad(ref, ((0, 0), (s, s), (s, s), (0, 0)))
    tiles = refp.reshape(b, nh + 2, s, nw + 2, s, c).transpose(0, 1, 3, 2, 4, 5)
    tiles = tiles.reshape(b, (nh + 2) * (nw + 2), s * s * c)
    idx_h = index // nw
    idx_w = index % nw
    # all 9 sub-tile gathers batched into one take_along_axis
    offs = jnp.asarray([(di, dj) for di in range(3) for dj in range(3)],
                       dtype=index.dtype)                        # [9, 2]
    flat = ((idx_h[:, None, :] + offs[None, :, 0:1]) * (nw + 2)
            + idx_w[:, None, :] + offs[None, :, 1:2])            # [B, 9, L]
    g = jnp.take_along_axis(tiles, flat.reshape(b, 9 * l)[:, :, None], axis=1)
    g = g.reshape(b, 3, 3, nh, nw, s, s, c)
    # contribution of (di, dj) lands at output tile (i+di-1, j+dj-1):
    # out[t] = sum_{di,dj} g[di, dj, t - di + 1, t_w - dj + 1]
    gp = jnp.pad(g, ((0, 0), (0, 0), (0, 0), (1, 1), (1, 1),
                     (0, 0), (0, 0), (0, 0)))
    acc = None
    for di in range(3):
        for dj in range(3):
            sl = gp[:, di, dj, 2 - di : 2 - di + nh, 2 - dj : 2 - dj + nw]
            acc = sl if acc is None else acc + sl
    img = acc.transpose(0, 1, 3, 2, 4, 5).reshape(b, nh * s, nw * s, c)
    return img


def gather_fold(ref: jnp.ndarray, index: jnp.ndarray, stride: int) -> jnp.ndarray:
    """NCHW wrapper around gather_fold_nhwc (reference tensor convention)."""
    out = gather_fold_nhwc(ref.transpose(0, 2, 3, 1), index, stride)
    return out.transpose(0, 3, 1, 2)
