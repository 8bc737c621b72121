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
    """Dispatch: shift9 pre-shifted-index layout (default), the 9-row tiles
    layout (SPEINET_GF_SHIFT9=0), or the seg9 single-gather layout
    (SPEINET_GF_SEG9=1). Identical outputs (tests/test_ops_resize_patch.py).

    seg9 gathers 9x fewer rows and was end-to-end NEUTRAL at batch 2
    (67.8 vs 67.9 ms, scripts/ab_glue.py), but its dense [B, L, 9*s*s*C]
    pre-pack materializes ~4.3 GB per scale at the bench batch 8 — the
    restore program OOMs HBM — so it stays opt-in. shift9 keeps the tiles
    layout's single low-footprint gather but moves the overlap-add's 9
    tile-grid shifts into the INDEX arithmetic (a [B, L] int map, ~0.2 MB),
    so the fold epilogue is a sum over 9 adjacent gathered rows instead of
    pad + 9 shifted slices of the 9x-volume gathered tensor."""
    import os

    if os.environ.get("SPEINET_GF_SEG9", "0") == "1":
        return gather_fold_nhwc_seg9(ref, index, stride)
    if os.environ.get("SPEINET_GF_SHIFT9", "1") == "1":
        return gather_fold_nhwc_shift9(ref, index, stride)
    return gather_fold_nhwc_tiles(ref, index, stride)


def gather_fold_nhwc_shift9(ref: jnp.ndarray, index: jnp.ndarray,
                            stride: int) -> jnp.ndarray:
    """gather_fold with the overlap-add pre-applied in index space.

    The tiles-layout fold (gather_fold_nhwc_tiles) pays a pad + 9 shifted
    slices + transpose over the GATHERED tensor (9x the output volume —
    ~93 ms of the 170 ms lv1 gather_fold at b=4, scripts/ab_glue.py).
    Here the contribution of patch-offset (di, dj) to output tile t is
    fetched by shifting the (tiny) [B, nh, nw] argmax maps by (di-1, dj-1)
    in QUERY space before building the flat gather indices: the gathered
    array arrives already fold-aligned, and the overlap-add is a sum over
    the 9 adjacent rows of each output position. Out-of-range query shifts
    point at tile (0, 0) of the one-tile-padded grid, which lies entirely
    in the zero padding — a free zero sentinel (collisions with legitimate
    (0,0) fetches just add zero).
    """
    s = stride
    b, hh, ww, c = ref.shape
    nh, nw = hh // s, ww // s
    l = nh * nw
    assert index.shape[-1] == l
    refp = jnp.pad(ref, ((0, 0), (s, s), (s, s), (0, 0)))
    tiles = refp.reshape(b, nh + 2, s, nw + 2, s, c).transpose(0, 1, 3, 2, 4, 5)
    tiles = tiles.reshape(b, (nh + 2) * (nw + 2), s * s * c)
    ih = (index // nw).reshape(b, nh, nw)
    iw = (index % nw).reshape(b, nh, nw)
    tt = jnp.arange(nh)[:, None]
    tw = jnp.arange(nw)[None, :]
    flats = []
    for di in range(3):
        for dj in range(3):
            dh, dw = di - 1, dj - 1
            # value at output tile t = index map at query t - (dh, dw)
            ihs = jnp.roll(ih, (dh, dw), axis=(1, 2))
            iws = jnp.roll(iw, (dh, dw), axis=(1, 2))
            f = (ihs + di) * (nw + 2) + (iws + dj)
            valid = ((tt - dh >= 0) & (tt - dh < nh)
                     & (tw - dw >= 0) & (tw - dw < nw))
            flats.append(jnp.where(valid[None], f, 0))
    flat = jnp.stack(flats, axis=3).reshape(b, l * 9)     # offset-minor
    g = jnp.take_along_axis(tiles, flat[:, :, None], axis=1)
    g = g.reshape(b, nh, nw, 9, s, s, c).sum(axis=3)
    return g.transpose(0, 1, 3, 2, 4, 5).reshape(b, nh * s, nw * s, c)


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


def _tiles_rows(ref: jnp.ndarray, s: int, nh: int, nw: int) -> jnp.ndarray:
    """One-tile-padded s x s tile rows: [B, (nh+2)*(nw+2), s*s*C]."""
    b, _, _, c = ref.shape
    refp = jnp.pad(ref, ((0, 0), (s, s), (s, s), (0, 0)))
    t = refp.reshape(b, nh + 2, s, nw + 2, s, c).transpose(0, 1, 3, 2, 4, 5)
    return t.reshape(b, (nh + 2) * (nw + 2), s * s * c)


def _shift9_flat(index: jnp.ndarray, nh: int, nw: int) -> jnp.ndarray:
    """Pre-shifted flat tile indices [B, L*9] (offset-minor) with the
    zero-sentinel edge masking of gather_fold_nhwc_shift9."""
    b = index.shape[0]
    l = nh * nw
    ih = (index // nw).reshape(b, nh, nw)
    iw = (index % nw).reshape(b, nh, nw)
    tt = jnp.arange(nh)[:, None]
    tw = jnp.arange(nw)[None, :]
    flats = []
    for di in range(3):
        for dj in range(3):
            dh, dw = di - 1, dj - 1
            ihs = jnp.roll(ih, (dh, dw), axis=(1, 2))
            iws = jnp.roll(iw, (dh, dw), axis=(1, 2))
            f = (ihs + di) * (nw + 2) + (iws + dj)
            valid = ((tt - dh >= 0) & (tt - dh < nh)
                     & (tw - dw >= 0) & (tw - dw < nw))
            flats.append(jnp.where(valid[None], f, 0))
    return jnp.stack(flats, axis=3).reshape(b, l * 9)


def gather_fold3_nhwc(ref1: jnp.ndarray, ref2: jnp.ndarray,
                      ref3: jnp.ndarray, index: jnp.ndarray
                      ) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """All three texture-transfer gather_folds in ONE combined gather.

    ref1/ref2/ref3: the sharp encoder pyramid at strides 4/2/1 (lv1
    [B, 4H, 4W, C], lv2 [B, 2H, 2W, 2C], lv3 [B, H, W, 4C]); index: [B, L]
    argmax positions on the lv3 grid. Returns (T3, T2, T1) — each equal to
    gather_fold_nhwc(ref_k, index, s_k) (caller divides by 9).

    Why: XLA's TPU row gather is row-COUNT-bound (~30 ns/row at these row
    widths, scripts/ab_glue.py), and the three scales gather with the SAME
    tile-grid indices — so concatenating the per-coordinate tile rows of
    all three pyramids (128 + 256 + 512 elems = one ~1.75 KB bf16 row)
    turns 27L gathered rows into 9L for identical volume. The shift9 index
    trick keeps the fold a 9-adjacent-row sum on each column slice.
    """
    import os

    b, hh, ww, c3 = ref3.shape
    nh, nw = hh, ww                     # lv3 tile grid (s=1)
    l = nh * nw
    assert index.shape[-1] == l
    w3 = c3                             # 1*1*c3
    w2 = 4 * ref2.shape[-1]             # 2*2*c2
    width = w3 + w2 + 16 * ref1.shape[-1]
    rows = jnp.concatenate([
        _tiles_rows(ref3, 1, nh, nw),
        _tiles_rows(ref2, 2, nh, nw),
        _tiles_rows(ref1, 4, nh, nw),
    ], axis=-1)                          # [B, (nh+2)(nw+2), w3+w2+w1]
    flat = _shift9_flat(index, nh, nw)

    # the gathered [chunk, 9L, W] tensor materializes (~0.93 GB/sample at
    # 720p bf16) before its per-scale 9-row folds; an unchunked batch-8
    # restore program exceeds HBM by 5.3 G. Gather time is row-count-bound,
    # so sequential batch chunks under a transient budget cost ~nothing.
    budget = int(os.environ.get("SPEINET_GF3_MB", "2048")) * (1 << 20)
    per_sample = 9 * l * width * rows.dtype.itemsize
    cb = max(1, min(b, budget // max(per_sample, 1)))
    while b % cb:
        cb -= 1

    def fold(cols: jnp.ndarray, s: int, c: int) -> jnp.ndarray:
        t = cols.sum(axis=3).reshape(cb, nh, nw, s, s, c)
        return t.transpose(0, 1, 3, 2, 4, 5).reshape(cb, nh * s, nw * s, c)

    outs = []
    for i in range(0, b, cb):
        g = jnp.take_along_axis(rows[i : i + cb],
                                flat[i : i + cb, :, None], axis=1)
        g = g.reshape(cb, nh, nw, 9, -1)
        outs.append((fold(g[..., :w3], 1, c3),
                     fold(g[..., w3 : w3 + w2], 2, ref2.shape[-1]),
                     fold(g[..., w3 + w2 :], 4, ref1.shape[-1])))
    if len(outs) == 1:
        return outs[0]
    return tuple(jnp.concatenate([o[k] for o in outs]) for k in range(3))
