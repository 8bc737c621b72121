"""Pallas TPU kernel: fused windowed cross-attention for the Swin fusion.

XLA lowers the reference's 5x5-window attention (swinir.py:115-149) to
thousands of [25, 32] matmuls that run at ~4% MXU utilization plus
HBM-materialized score tensors; measured ~8 ms per block at 720p-lv3.
This kernel fuses, per grid step, for a group of G adjacent windows:

    window partition -> QKV projections -> packed scores on the MXU
    (G windows block-diagonally masked in one [G*N, G*N] matmul)
    -> +relative-position bias -> +shift/pad mask -> f32 softmax
    -> P @ V -> output projection -> window reverse

Scores never leave VMEM, projections run as [G*N, C] x [C, *] MXU
matmuls, and the window partition/reverse transposes disappear into
block indexing. Shift rolls are applied by the caller (cheap jnp.roll).

Used for deterministic (inference) passes; training falls back to the
XLA path in models/swinir.py (same parameters, same math).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(x_ref, y_ref, ls_ref, lb_ref, wkv_ref, bkv_ref, wq_ref, bq_ref,
            wp_ref, bp_ref, bias_ref, mask_ref, o_ref, *, ws: int, g: int,
            r_rows: int, heads: int, scale: float):
    n = ws * ws
    gn = g * n
    c = x_ref.shape[-1]
    hd = c // heads

    # norm1 (shared weights for x and y, swinir.py:244-245) fused in
    xb = _ln(x_ref[0], ls_ref[:], lb_ref[:]).astype(x_ref.dtype)
    yb = _ln(y_ref[0], ls_ref[:], lb_ref[:]).astype(y_ref.dtype)

    def partition(img):
        # [R*ws, g*ws, C] -> [R*g*N, C] (row-group major, window major);
        # one transpose instead of per-window slice+concat — Mosaic lowers
        # this to a single relayout
        t = img.reshape(r_rows, ws, g, ws, c).transpose(0, 2, 1, 3, 4)
        return t.reshape(r_rows * gn, c)

    xw = partition(xb)
    yw = partition(yb)

    # projections over all R row-groups at once (M = R*g*N)
    kv = jnp.dot(xw, wkv_ref[:], preferred_element_type=jnp.float32) + bkv_ref[:]
    q = jnp.dot(yw, wq_ref[:], preferred_element_type=jnp.float32) + bq_ref[:]
    q = (q * scale).astype(xw.dtype)
    kv = kv.astype(xw.dtype)

    outs = []
    for r in range(r_rows):
        mask = mask_ref[r, 0]
        qr = q[r * gn : (r + 1) * gn]
        kvr = kv[r * gn : (r + 1) * gn]
        heads_out = []
        for h in range(heads):
            qh = qr[:, h * hd : (h + 1) * hd]
            kh = kvr[:, h * hd : (h + 1) * hd]
            vh = kvr[:, c + h * hd : c + (h + 1) * hd]
            s = jax.lax.dot_general(qh, kh, (((1,), (1,)), ((), ())),
                                    preferred_element_type=jnp.float32)
            # mask carries the shift/pad masks + off-block -1e9; bias_ref is
            # the packed block-diagonal rel-pos bias
            s = s + mask + bias_ref[h]
            p = jax.nn.softmax(s, axis=-1).astype(xw.dtype)
            heads_out.append(jnp.dot(p, vh, preferred_element_type=jnp.float32))
        outs.append(jnp.concatenate(heads_out, axis=1))
    out = jnp.concatenate(outs, axis=0)               # [R*g*N, C]

    res = jnp.dot(out.astype(xw.dtype), wp_ref[:],
                  preferred_element_type=jnp.float32) + bp_ref[:]
    res = res.astype(o_ref.dtype)
    # reverse: [R*g*N, C] -> [R*ws, g*ws, C], again one transpose
    seg = res.reshape(r_rows, g, ws, ws, c).transpose(0, 2, 1, 3, 4)
    o_ref[0] = seg.reshape(r_rows * ws, g * ws, c)


def _ln(x, scale, bias, eps=1e-5):
    """LayerNorm over the last axis, f32 math (torch eps)."""
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.maximum(jnp.mean(xf * xf, axis=-1, keepdims=True) - mu * mu, 0.0)
    return ((xf - mu) * jax.lax.rsqrt(var + eps) * scale + bias)


def _erf(x):
    """erf via Abramowitz-Stegun 7.1.26 (|err| < 1.5e-7); Mosaic has no
    erf/erfc lowering. f32 in/out."""
    a1, a2, a3, a4, a5 = (0.254829592, -0.284496736, 1.421413741,
                          -1.453152027, 1.061405429)
    p = 0.3275911
    s = jnp.sign(x)
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + p * ax)
    poly = ((((a5 * t + a4) * t + a3) * t + a2) * t + a1) * t
    return s * (1.0 - poly * jnp.exp(-ax * ax))


def _ln_mlp_kernel(x_ref, ls_ref, lb_ref, w1_ref, b1_ref, w2_ref, b2_ref, o_ref):
    x = x_ref[0]
    xn = _ln(x, ls_ref[:], lb_ref[:]).astype(x.dtype)
    h = jnp.dot(xn, w1_ref[:], preferred_element_type=jnp.float32) + b1_ref[:]
    h = (0.5 * h * (1.0 + _erf(h * (2.0 ** -0.5)))).astype(x.dtype)
    y = jnp.dot(h, w2_ref[:], preferred_element_type=jnp.float32) + b2_ref[:]
    o_ref[0] = x + y.astype(x.dtype)


def fused_ln_mlp(x: jnp.ndarray, ln_scale, ln_bias, w1, b1, w2, b2,
                 tl: int | None = None) -> jnp.ndarray:
    """x + fc2(gelu(fc1(LN(x)))) over [B, L, C] — the MLP half of a Swin
    block (swinir.py:279) as one VMEM-resident kernel."""
    import os

    if tl is None:
        tl = int(os.environ.get("SPEINET_MLP_TL", "1024"))
    b, l, c = x.shape
    pad = (-l) % tl
    xp = jnp.pad(x, ((0, 0), (0, pad), (0, 0))) if pad else x
    lp = l + pad
    hidden = w1.shape[1]
    out = pl.pallas_call(
        _ln_mlp_kernel,
        grid=(b, lp // tl),
        in_specs=[
            pl.BlockSpec((1, tl, c), lambda bi, i: (bi, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tl, c), lambda bi, i: (bi, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, lp, c), x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * lp * c * hidden,
            bytes_accessed=2 * b * lp * c * x.dtype.itemsize,
            transcendentals=b * lp * hidden,
        ),
    )(xp, ln_scale, ln_bias, w1.astype(x.dtype), b1, w2.astype(x.dtype), b2)
    return out[:, :l] if pad else out


def _attn_compact(q, kv, bias4_ref, mask, *, n: int, group_w: int,
                  heads: int, quad_h: int, c: int, hd: int,
                  groups_per_stream: int, ablate: str = ""):
    """Column-grouped, head-quad-packed window attention.

    q, kv: [M, C] / [M, 2C] rows in (stream, window, token) order. Scores
    are computed per COLUMN GROUP of `group_w` adjacent windows (N =
    group_w*n ~ one 128-lane tile) instead of per the full window packing,
    and per HEAD QUAD of `quad_h` heads merged into the contraction
    (K = quad_h*hd = 128) by tiling Q `quad_h`x along rows under an
    iota-derived head-selector mask. vs. the old [sgn, sgn] block-diagonal
    packing this cuts the AV-matmul MXU cycles and the softmax/mask VPU
    width by sgn/(group_w*n) (4x at the template's S=2 G=8) while keeping
    the same matmul instruction count — and every op used (concat,
    multiply, dot_general, static 2-D slices) has a Mosaic lowering, unlike
    the round-3 "wide" head-expansion reshape.

    bias4_ref: [n_quads, quad_h*gq, gq] packed rel-pos bias with off-window
    blocks at -1e9 (gq = group_w*n). mask: [groups_per_stream, quad_h*gq,
    gq] shift/pad mask already in compact layout (leading-axis indexed per
    group — in-kernel [gq, gq] diagonal slices at 100-row offsets forced
    lane/sublane relayouts that made the shifted block 1.4x SLOWER than
    the non-compact path; pre-sliced input makes it free), or None.
    """
    m_rows = q.shape[0]
    gq = group_w * n
    qk = quad_h * hd                      # contraction width per quad
    n_quads = heads // quad_h
    n_groups = m_rows // gq
    dtype = q.dtype

    # head-selector: row-block h_loc keeps channel block h_loc (shared by
    # the Q pre-mask and the output fold — same [quad_h*gq, qk] pattern)
    rr = jax.lax.broadcasted_iota(jnp.int32, (quad_h * gq, qk), 0) // gq
    cc = jax.lax.broadcasted_iota(jnp.int32, (quad_h * gq, qk), 1) // hd
    hsel = (rr == cc).astype(dtype)

    outs = []
    for gi in range(n_groups):
        qg = q[gi * gq : (gi + 1) * gq]
        kg = kv[gi * gq : (gi + 1) * gq, :c]
        vg = kv[gi * gq : (gi + 1) * gq, c:]
        if mask is not None:
            mt = mask[gi % groups_per_stream]
        quad_outs = []
        for qd in range(n_quads):
            qs = qg[:, qd * qk : (qd + 1) * qk]
            ks = kg[:, qd * qk : (qd + 1) * qk]
            vs = vg[:, qd * qk : (qd + 1) * qk]
            q4 = jnp.concatenate([qs] * quad_h, axis=0) * hsel
            s = jax.lax.dot_general(q4, ks, (((1,), (1,)), ((), ())),
                                    preferred_element_type=jnp.float32)
            s = s + (bias4_ref[qd] + mt if mask is not None else bias4_ref[qd])
            if ablate == "nosoftmax":   # timing diagnostic: WRONG numbers
                p = (s * 0.01).astype(dtype)
            else:
                p = jax.nn.softmax(s, axis=-1).astype(dtype)
            o4 = jax.lax.dot_general(p, vs, (((1,), (0,)), ((), ())),
                                     preferred_element_type=jnp.float32)
            o4 = o4 * hsel
            oq = o4[:gq]
            for h in range(1, quad_h):
                oq = oq + o4[h * gq : (h + 1) * gq]
            quad_outs.append(oq)
        outs.append(quad_outs[0] if n_quads == 1
                    else jnp.concatenate(quad_outs, axis=1))
    return outs[0] if n_groups == 1 else jnp.concatenate(outs, axis=0)


def compact_geometry(g: int, n: int, heads: int, hd: int):
    """(group_w, quad_h) for the compact attention path: the largest
    divisor of g with group_w*n <= 128 lanes, and the largest divisor of
    heads with quad_h*hd <= 128 contraction. Env overrides: SPEINET_SWIN_GW
    / SPEINET_SWIN_QH (0 = auto)."""
    import os

    gw_env = int(os.environ.get("SPEINET_SWIN_GW", "0"))
    qh_env = int(os.environ.get("SPEINET_SWIN_QH", "0"))
    group_w = gw_env if gw_env and g % gw_env == 0 else max(
        (d for d in range(1, g + 1) if g % d == 0 and d * n <= 128),
        default=1)
    quad_h = qh_env if qh_env and heads % qh_env == 0 else max(
        (d for d in range(1, heads + 1) if heads % d == 0 and d * hd <= 128),
        default=1)
    return group_w, quad_h


def _block_kernel(x_ref, y_ref, ls1_ref, lb1_ref, wkv_ref, bkv_ref, wq_ref,
                  bq_ref, wp_ref, bp_ref, bias_ref, mask_ref, ls2_ref,
                  lb2_ref, w1_ref, b1_ref, w2_ref, b2_ref, o_ref, *, ws: int,
                  g: int, s_batch: int, heads: int, scale: float,
                  has_mask: bool, compact: bool = False, group_w: int = 1,
                  quad_h: int = 1, ablate: str = ""):
    """One FULL Swin block (attn + both residuals + LN2 + MLP) per grid
    step, for `s_batch` batch entries of one window row-group at once:

        x' = x + proj(softmax(QK^T/s + bias + mask) V)
        o  = x' + fc2(gelu(fc1(LN2(x'))))

    The `s_batch` entries' windows are packed block-diagonally into ONE
    score matmul per head (M = s_batch*g*N instead of g*N), which doubles
    the MXU M-dimension and halves grid steps vs the attention-only kernel;
    scores/intermediates never leave VMEM and the block's intermediate
    stream never round-trips HBM. bias_ref arrives pre-expanded to
    [heads, S*g*N, S*g*N] with the cross-stream/cross-window -1e9 already
    folded in, so non-shifted blocks (has_mask=False) skip the per-step
    mask add entirely."""
    n = ws * ws
    gn = g * n
    sgn = s_batch * gn
    c = x_ref.shape[-1]
    hd = c // heads

    def partition(img):
        # [S, ws, g*ws, C] -> [S*g*N, C] (stream major, window major)
        t = img.reshape(s_batch, ws, g, ws, c).transpose(0, 2, 1, 3, 4)
        return t.reshape(sgn, c)

    xw_raw = partition(x_ref[:])
    yw_raw = partition(y_ref[:])
    if ablate == "noln":     # timing diagnostic only: WRONG numbers
        xw, yw = xw_raw.astype(x_ref.dtype), yw_raw.astype(y_ref.dtype)
    else:
        xw = _ln(xw_raw, ls1_ref[:], lb1_ref[:]).astype(x_ref.dtype)
        yw = _ln(yw_raw, ls1_ref[:], lb1_ref[:]).astype(y_ref.dtype)

    kv = jnp.dot(xw, wkv_ref[:], preferred_element_type=jnp.float32) + bkv_ref[:]
    q = jnp.dot(yw, wq_ref[:], preferred_element_type=jnp.float32) + bq_ref[:]
    q = (q * scale).astype(xw.dtype)
    kv = kv.astype(xw.dtype)

    if ablate == "noattn":   # skip scores/softmax/AV entirely
        out = kv[:, :c]
    elif compact:
        out = _attn_compact(
            q, kv, bias_ref, mask_ref[0, 0] if has_mask else None,
            n=n, group_w=group_w, heads=heads, quad_h=quad_h, c=c, hd=hd,
            groups_per_stream=g // group_w, ablate=ablate).astype(xw.dtype)
    else:
        if has_mask:
            # per-window shift/pad mask, identical for every stream: tile to
            # [sgn, sgn] once (the off-stream blocks are already -1e9 in bias)
            m = mask_ref[0, 0]
            mtile = jnp.concatenate([jnp.concatenate([m] * s_batch, axis=0)]
                                    * s_batch, axis=1)
        heads_out = []
        for h in range(heads):
            qh = q[:, h * hd : (h + 1) * hd]
            kh = kv[:, h * hd : (h + 1) * hd]
            vh = kv[:, c + h * hd : c + (h + 1) * hd]
            s = jax.lax.dot_general(qh, kh, (((1,), (1,)), ((), ())),
                                    preferred_element_type=jnp.float32)
            s = s + (bias_ref[h] + mtile if has_mask else bias_ref[h])
            p = jax.nn.softmax(s, axis=-1).astype(xw.dtype)
            heads_out.append(jnp.dot(p, vh, preferred_element_type=jnp.float32))
        out = jnp.concatenate(heads_out, axis=1).astype(xw.dtype)

    res = jnp.dot(out, wp_ref[:], preferred_element_type=jnp.float32) + bp_ref[:]
    x2 = xw_raw.astype(jnp.float32) + res          # first residual (f32)

    if ablate == "nomlp":    # timing diagnostic only: WRONG numbers
        o = x2.astype(o_ref.dtype)
    else:
        xn2 = _ln(x2, ls2_ref[:], lb2_ref[:]).astype(xw.dtype)
        hmid = jnp.dot(xn2, w1_ref[:], preferred_element_type=jnp.float32) + b1_ref[:]
        if ablate == "nogelu":
            hmid = jnp.maximum(hmid, 0.0).astype(xw.dtype)
        else:
            hmid = (0.5 * hmid * (1.0 + _erf(hmid * (2.0 ** -0.5)))).astype(xw.dtype)
        y2 = jnp.dot(hmid, w2_ref[:], preferred_element_type=jnp.float32) + b2_ref[:]
        o = (x2 + y2).astype(o_ref.dtype)

    seg = o.reshape(s_batch, g, ws, ws, c).transpose(0, 2, 1, 3, 4)
    o_ref[:] = seg.reshape(s_batch, ws, g * ws, c)


def fused_swin_block(
    x: jnp.ndarray, y: jnp.ndarray,
    ln1_scale, ln1_bias, wkv, bkv, wq, bq, wp_, bp, bias,
    ln2_scale, ln2_bias, w1, b1, w2, b2,
    ws: int, shift: int, pad_h: int, pad_w: int, heads: int,
) -> jnp.ndarray:
    """x, y: [B, Hp, Wp, C] RAW (un-normalized) already rolled/padded.
    Returns the FULL block output (x + attn + MLP), still rolled/padded —
    the caller un-rolls/crops. Numerics match SwinBlock's XLA path
    (tests/test_pallas_swin.py)."""
    import os

    b, hp, wpx, c = x.shape
    compact_on = os.environ.get("SPEINET_SWIN_COMPACT", "1") == "1"
    # compact packing's score waste is LINEAR in g (vs quadratic for the
    # [sgn, sgn] path), so bigger window groups win: G16 measured 1.40 vs
    # 2.30 ms/block at G8 (b=2, 720p-lv3; the old path's optimum was G8
    # and its G16 was +47%). Non-compact keeps the measured G8 optimum.
    g = pick_group(wpx // ws, max_g=int(os.environ.get(
        "SPEINET_SWIN_G", "16" if compact_on else "8")))
    n = ws * ws
    s_batch = int(os.environ.get("SPEINET_SWIN_S", "2"))
    while b % s_batch:
        s_batch -= 1
    sgn = s_batch * g * n
    has_mask = bool(shift > 0 or pad_h or pad_w)
    nr, nc = hp // ws, wpx // (g * ws)
    dedup = shift > 0 and not (pad_h or pad_w)
    hd = c // heads
    scale = float(hd ** -0.5)
    compact = os.environ.get("SPEINET_SWIN_COMPACT", "1") == "1"
    group_w, quad_h = compact_geometry(g, n, heads, hd) if compact else (1, 1)
    # the per-(row, col) shift/pad mask stays [gN, gN] (tiled to streams
    # in-kernel only when needed); when there is no mask the kernel skips
    # it entirely, since cross-window/-stream -1e9 is folded into the bias.
    # Shift-only masks are deduplicated to the 4 distinct blocks
    # (packed_mask_dedup) so no 46 MB constant lands in the module. The
    # compact path gets its mask pre-sliced per column group (5-D layout)
    # so the kernel does leading-axis indexing only.
    if compact and has_mask:
        if dedup:
            mask = jnp.asarray(packed_mask_dedup_compact(
                hp, wpx, ws, shift, g, group_w * n, quad_h))
        else:
            mask = jnp.asarray(packed_mask_compact(
                hp, wpx, ws, shift, pad_h, pad_w, g, group_w * n, quad_h))
    elif dedup:
        mask = jnp.maximum(jnp.asarray(
            packed_mask_dedup(hp, wpx, ws, shift, g)), -200.0)
    elif has_mask:
        # strip packed_mask's own off-block -1e9 (it lives in the bias now)
        mask = jnp.maximum(jnp.asarray(
            packed_mask(hp, wpx, ws, shift, pad_h, pad_w, g)), -200.0)
    else:
        mask = jnp.asarray(np.zeros((nr, nc, 1, 1), np.float32))
    if compact:
        # packed rel-pos bias for the compact path: per head-quad, the
        # quad's heads stacked along rows, windows block-diagonal with
        # off-window positions at -1e9 (built in XLA, tiny)
        gq = group_w * n
        n_quads = heads // quad_h
        eye_w = jnp.eye(group_w, dtype=jnp.float32)
        bd = jnp.einsum("uv,hij->huivj", eye_w, bias).reshape(heads, gq, gq)
        off = (1.0 - jnp.repeat(jnp.repeat(eye_w, n, axis=0), n, axis=1)) * (-1e9)
        bias_packed = (bd + off[None]).reshape(n_quads, quad_h * gq, gq)
    else:
        # rel-pos bias pre-expanded to the stream-packed score shape with the
        # cross-window/cross-stream blocks at -1e9 (built in XLA, tiny inputs)
        eye = jnp.eye(s_batch * g, dtype=jnp.float32)
        bias_diag = jnp.einsum("ij,hmn->himjn", eye, bias).reshape(heads, sgn, sgn)
        offblock = (1.0 - jnp.repeat(jnp.repeat(eye, n, axis=0), n, axis=1)) * (-1e9)
        bias_packed = bias_diag + offblock[None]

    # SPEINET_SWIN_ABLATE in {noln, noattn, nosoftmax, nomlp, nogelu}:
    # timing-only diagnostics that skip one stage (WRONG numbers; used by
    # scripts/ab_swin4.py to decompose the block's time). Default "".
    kernel = functools.partial(_block_kernel, ws=ws, g=g, s_batch=s_batch,
                               heads=heads, scale=scale, has_mask=has_mask,
                               compact=compact, group_w=group_w,
                               quad_h=quad_h,
                               ablate=os.environ.get("SPEINET_SWIN_ABLATE", ""))
    grid = (b // s_batch, hp // ws, wpx // (g * ws))
    gws = g * ws
    dtype = x.dtype
    hidden = w1.shape[1]
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((s_batch, ws, gws, c), lambda bi, i, j: (bi, i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((s_batch, ws, gws, c), lambda bi, i, j: (bi, i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),   # ln1 scale
            pl.BlockSpec(memory_space=pltpu.VMEM),   # ln1 bias
            pl.BlockSpec(memory_space=pltpu.VMEM),   # wkv
            pl.BlockSpec(memory_space=pltpu.VMEM),   # bkv
            pl.BlockSpec(memory_space=pltpu.VMEM),   # wq
            pl.BlockSpec(memory_space=pltpu.VMEM),   # bq
            pl.BlockSpec(memory_space=pltpu.VMEM),   # wp
            pl.BlockSpec(memory_space=pltpu.VMEM),   # bp
            pl.BlockSpec(memory_space=pltpu.VMEM),   # bias (packed layout)
            _mask_block_spec(mask, dedup, nr, nc),
            pl.BlockSpec(memory_space=pltpu.VMEM),   # ln2 scale
            pl.BlockSpec(memory_space=pltpu.VMEM),   # ln2 bias
            pl.BlockSpec(memory_space=pltpu.VMEM),   # w1
            pl.BlockSpec(memory_space=pltpu.VMEM),   # b1
            pl.BlockSpec(memory_space=pltpu.VMEM),   # w2
            pl.BlockSpec(memory_space=pltpu.VMEM),   # b2
        ],
        out_specs=pl.BlockSpec((s_batch, ws, gws, c),
                               lambda bi, i, j: (bi, i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, hp, wpx, c), dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel"),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * hp * wpx * c * (4 * c + 2 * hidden
                                          + 2 * s_batch * g * n),
            bytes_accessed=3 * b * hp * wpx * c * x.dtype.itemsize,
            transcendentals=b * hp * wpx * (g * n + hidden),
        ),
    )(x.astype(dtype), y.astype(dtype), ln1_scale, ln1_bias,
      wkv.astype(dtype), bkv, wq.astype(dtype), bq, wp_.astype(dtype), bp,
      bias_packed, mask, ln2_scale, ln2_bias, w1.astype(dtype), b1,
      w2.astype(dtype), b2)
    return out


def pick_group(n_w_w: int, max_g: int = 8) -> int:
    """Largest divisor of the per-row window count that is <= max_g."""
    for g in range(min(max_g, n_w_w), 0, -1):
        if n_w_w % g == 0:
            return g
    return 1


@functools.lru_cache(maxsize=None)
def packed_mask(hp: int, wp: int, ws: int, shift: int, pad_h: int, pad_w: int,
                g: int) -> np.ndarray:
    """[Hp/ws, Wp/(g*ws), g*N, g*N] f32: off-block -1e9, on-block the
    shift/pad mask of that window (0 if none)."""
    n = ws * ws
    n_rows, n_cols = hp // ws, wp // (g * ws)
    base = np.zeros((hp // ws, wp // ws, n, n), np.float32)
    if shift > 0 or pad_h or pad_w:
        img = np.zeros((hp, wp), np.float32)
        if shift > 0:
            cnt = 0
            for hs in (slice(0, -ws), slice(-ws, -shift), slice(-shift, None)):
                for wsl in (slice(0, -ws), slice(-ws, -shift), slice(-shift, None)):
                    img[hs, wsl] = cnt
                    cnt += 1
        pad = np.zeros((hp, wp), np.float32)
        if pad_h:
            pad[hp - pad_h :, :] = 1.0
        if pad_w:
            pad[:, wp - pad_w :] = 1.0
        if shift > 0:
            pad = np.roll(pad, (-shift, -shift), axis=(0, 1))
        win = img.reshape(n_rows, ws, wp // ws, ws).transpose(0, 2, 1, 3)
        win = win.reshape(n_rows, wp // ws, n)
        diff = win[:, :, None, :] - win[:, :, :, None]
        base = np.where(diff != 0, -100.0, 0.0).astype(np.float32)
        pw_ = pad.reshape(n_rows, ws, wp // ws, ws).transpose(0, 2, 1, 3)
        pw_ = pw_.reshape(n_rows, wp // ws, n)
        base = base + np.where(pw_[:, :, None, :] > 0, -100.0, 0.0)
    out = np.full((n_rows, n_cols, g * n, g * n), -1e9, np.float32)
    # fill diagonal blocks with the per-window masks (windows are grouped
    # as consecutive columns: group j covers windows j*g .. j*g+g-1)
    for r in range(n_rows):
        for jcol in range(n_cols):
            for gi in range(g):
                out[r, jcol, gi * n : (gi + 1) * n, gi * n : (gi + 1) * n] = \
                    base[r, jcol * g + gi]
    return out


@functools.lru_cache(maxsize=None)
def packed_mask_dedup(hp: int, wp: int, ws: int, shift: int,
                      g: int) -> np.ndarray:
    """[2, 2, g*N, g*N]: the packed shift mask deduplicated by (is-last-
    window-row, is-last-window-colgroup). A shifted swin mask only differs
    in the last window row/column (the wrap regions), so the full
    [Hp/ws, Wp/(g*ws), gN, gN] constant — 46 MB at 720p-lv3, repeated once
    per RSTB trace, 276 MB of the restore program's 343 MB serialized
    module, which overflowed the remote-compile relay's request limit —
    collapses to 4 blocks selected by the BlockSpec index map. pad==0 only
    (padding can spill outside the last window row when pad+shift > ws)."""
    full = packed_mask(hp, wp, ws, shift, 0, 0, g)
    nr, nc = full.shape[:2]
    out = np.stack([np.stack([full[0, 0], full[0, nc - 1]]),
                    np.stack([full[nr - 1, 0], full[nr - 1, nc - 1]])])
    # verify the redundancy assumption on the actual array (cached, cheap)
    assert (full[: nr - 1, : nc - 1] == full[0, 0]).all()
    assert (full[: nr - 1, nc - 1] == full[0, nc - 1]).all()
    assert (full[nr - 1, : nc - 1] == full[nr - 1, 0]).all()
    return out


def _dedup_index_map(nr: int, nc: int, extra_dims: int = 2):
    """Index map selecting the packed_mask_dedup block for grid step (i, j):
    interior -> (0, 0), last window row -> (1, *), last colgroup -> (*, 1)."""
    def imap(bi, i, j):
        return (jnp.minimum(i // max(nr - 1, 1), 1),
                jnp.minimum(j // max(nc - 1, 1), 1)) + (0,) * extra_dims
    return imap


def _mask_block_spec(mask, dedup: bool, nr: int, nc: int):
    """Per-grid-step mask block: one (row, colgroup)-indexed block of
    whatever trailing layout the mask carries (4-D classic [gN, gN] or 5-D
    compact [gps, quad_h*gq, gq])."""
    block = (1, 1) + tuple(mask.shape[2:])
    trail = mask.ndim - 2
    if dedup:
        return pl.BlockSpec(block, _dedup_index_map(nr, nc, trail),
                            memory_space=pltpu.VMEM)
    return pl.BlockSpec(block,
                        lambda bi, i, j, _t=trail: (i, j) + (0,) * _t,
                        memory_space=pltpu.VMEM)


def _to_compact_layout(m4: np.ndarray, gq: int, quad_h: int) -> np.ndarray:
    """[A, B, gN, gN] diag-blocked window masks -> [A, B, gN/gq, quad_h*gq,
    gq]: the per-column-group diagonal [gq, gq] slice, tiled quad_h x along
    rows, pre-sliced on the host so the kernel never lane-shifts."""
    a_n, b_n, g_n, _ = m4.shape
    gps = g_n // gq
    out = np.empty((a_n, b_n, gps, quad_h * gq, gq), m4.dtype)
    for a in range(a_n):
        for b in range(b_n):
            for gi in range(gps):
                s = m4[a, b, gi * gq : (gi + 1) * gq, gi * gq : (gi + 1) * gq]
                out[a, b, gi] = np.tile(s, (quad_h, 1))
    return out


@functools.lru_cache(maxsize=None)
def packed_mask_compact(hp: int, wp: int, ws: int, shift: int, pad_h: int,
                        pad_w: int, g: int, gq: int, quad_h: int) -> np.ndarray:
    full = np.maximum(packed_mask(hp, wp, ws, shift, pad_h, pad_w, g), -200.0)
    return _to_compact_layout(full, gq, quad_h)


@functools.lru_cache(maxsize=None)
def packed_mask_dedup_compact(hp: int, wp: int, ws: int, shift: int, g: int,
                              gq: int, quad_h: int) -> np.ndarray:
    ded = np.maximum(packed_mask_dedup(hp, wp, ws, shift, g), -200.0)
    return _to_compact_layout(ded, gq, quad_h)


def fused_window_cross_attention(
    xn: jnp.ndarray, yn: jnp.ndarray,
    ln_scale: jnp.ndarray, ln_bias: jnp.ndarray,
    wkv: jnp.ndarray, bkv: jnp.ndarray,
    wq: jnp.ndarray, bq: jnp.ndarray,
    wp_: jnp.ndarray, bp: jnp.ndarray,
    bias: jnp.ndarray,
    ws: int, shift: int, pad_h: int, pad_w: int, heads: int,
) -> jnp.ndarray:
    """xn, yn: [B, Hp, Wp, C] RAW (un-normalized) but already rolled/padded;
    norm1 runs inside the kernel. Returns the attention output image
    [B, Hp, Wp, C] (pre-residual, still rolled)."""
    import os

    b, hp, wpx, c = xn.shape
    g = pick_group(wpx // ws, max_g=int(os.environ.get("SPEINET_SWIN_G", "8")))
    n = ws * ws
    # window rows per grid step (tunable; larger R amortizes weight reads,
    # smaller R pipelines better — R=1 measured fastest on v5e)
    r_rows = int(os.environ.get("SPEINET_SWIN_R", "1"))
    while (hp // ws) % r_rows:
        r_rows -= 1
    nr, nc = hp // ws, wpx // (g * ws)
    dedup = shift > 0 and not (pad_h or pad_w) and r_rows == 1
    if dedup:
        mask = jnp.asarray(packed_mask_dedup(hp, wpx, ws, shift, g))
    else:
        mask = jnp.asarray(packed_mask(hp, wpx, ws, shift, pad_h, pad_w, g))
        mask = mask.reshape(nr, nc, g * n, g * n)
    scale = float((c // heads) ** -0.5)
    # block-diagonal packed relative-position bias, built in XLA (tiny)
    eye = jnp.eye(g, dtype=bias.dtype)
    bias_packed = jnp.einsum("ij,hmn->himjn", eye, bias).reshape(heads, g * n, g * n)

    kernel = functools.partial(_kernel, ws=ws, g=g, r_rows=r_rows, heads=heads,
                               scale=scale)
    grid = (b, hp // (r_rows * ws), wpx // (g * ws))
    gws = g * ws
    rws = r_rows * ws
    dtype = xn.dtype
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, rws, gws, c), lambda bi, i, j: (bi, i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, rws, gws, c), lambda bi, i, j: (bi, i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),   # ln scale
            pl.BlockSpec(memory_space=pltpu.VMEM),   # ln bias
            pl.BlockSpec(memory_space=pltpu.VMEM),   # wkv
            pl.BlockSpec(memory_space=pltpu.VMEM),   # bkv
            pl.BlockSpec(memory_space=pltpu.VMEM),   # wq
            pl.BlockSpec(memory_space=pltpu.VMEM),   # bq
            pl.BlockSpec(memory_space=pltpu.VMEM),   # wp
            pl.BlockSpec(memory_space=pltpu.VMEM),   # bp
            pl.BlockSpec(memory_space=pltpu.VMEM),   # bias [h, gN, gN]
            pl.BlockSpec((1, 1, g * n, g * n), _dedup_index_map(nr, nc),
                         memory_space=pltpu.VMEM)
            if dedup else
            pl.BlockSpec((r_rows, 1, g * n, g * n),
                         lambda bi, i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, rws, gws, c), lambda bi, i, j: (bi, i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, hp, wpx, c), dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel"),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * hp * wpx * c * (4 * c + 2 * g * n),
            bytes_accessed=3 * b * hp * wpx * c * xn.dtype.itemsize,
            transcendentals=b * hp * wpx * g * n,
        ),
    )(xn.astype(dtype), yn.astype(dtype), ln_scale, ln_bias,
      wkv.astype(dtype), bkv, wq.astype(dtype), bq, wp_.astype(dtype), bp,
      bias_packed, mask)
    return out
