"""Patch-correlation search & transfer attention (parity: model/SearchTransfer.py).

TTSR-style: unfold 3x3 patches of the fused mid features and of a reference
feature map, L2-normalize, correlate (cosine), take per-position max over
reference positions, then transfer reference textures at 3 pyramid scales
weighted by the confidence map S.

TPU-first redesign:
- The reference materializes R = [N, Hr*Wr, H*W] (SearchTransfer.py:33) —
  13 GB at 720p lv3. Here the correlation runs as an *online* tiled
  max/argmax (flash-attention-style) over reference chunks via lax.scan:
  peak memory is B x chunk x HW.
- The texture transfer never materializes the reference unfolds
  (C*k*k x H*W, ~1 GB at 720p for lv1); `gather_fold` gathers s x s tiles
  straight from the reference map (ops/patch_ops.py).
- Both branches of the reference's data-dependent routing (SearchTransfer
  with a sharp reference vs SelfTransfer with a rotated self-reference,
  speinet.py:150-168) share one correlation pass: the reference patches are
  selected per sample *before* the scan, so the O(N^2) work is done once
  per sample regardless of routing.
"""

from __future__ import annotations

from typing import Any, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

from speinet_tpu.ops.patch_ops import unfold, gather_fold_nhwc
from speinet_tpu.ops.resize import bicubic_upsample_nhwc

Dtype = Any


def _l2_normalize(x: jnp.ndarray, axis: int, eps: float = 1e-12) -> jnp.ndarray:
    """F.normalize semantics: x / max(||x||, eps)."""
    norm = jnp.sqrt(jnp.sum(x * x, axis=axis, keepdims=True))
    return x / jnp.maximum(norm, eps)


def _patch_inv_norms(x_nhwc: jnp.ndarray, eps: float = 1e-12) -> jnp.ndarray:
    """1 / max(||3x3 patch||, eps) per position: [B, H, W, C] -> [B, H*W]
    f32. Equals the column norms of unfold(x, 3, 1, 1) (zero padding): the
    squared patch norm is the 3x3 box sum of per-pixel squared channel
    norms — computed from the feature map directly, never touching the
    [B, C*9, L] unfold. Lets the correlation consume RAW unfolds: the
    argmax over reference rows is invariant to the per-column (lr) norm, so
    only S needs the post-kernel rescale, and the reference rows fold their
    norm into one broadcast multiply."""
    b, h, w, _ = x_nhwc.shape
    sq = jnp.sum(jnp.square(x_nhwc.astype(jnp.float32)), axis=-1)
    p = jnp.pad(sq, ((0, 0), (1, 1), (1, 1)))
    acc = None
    for di in range(3):
        for dj in range(3):
            sl = p[:, di:di + h, dj:dj + w]
            acc = sl if acc is None else acc + sl
    return (1.0 / jnp.maximum(jnp.sqrt(acc), eps)).reshape(b, h * w)


def correlation_argmax(
    lr_unfold: jnp.ndarray,
    ref_unfold: jnp.ndarray,
    chunk: int = 2048,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Online max/argmax of the patch-correlation matrix.

    lr_unfold:  [B, D, L]  (columns L2-normalized), D = C*9
    ref_unfold: [B, Lr, D] (rows L2-normalized)
    Returns (S, argmax): [B, L] float max-correlation and int32 index into
    the reference positions. Equivalent to
    `torch.max(bmm(ref, lr), dim=1)` (SearchTransfer.py:33-34) without
    materializing [B, Lr, L].
    """
    b, d, l = lr_unfold.shape
    l_ref = ref_unfold.shape[1]
    chunk = min(chunk, l_ref)
    pad = (-l_ref) % chunk
    if pad:
        # zero rows; masked to -inf inside the scan body
        ref_unfold = jnp.pad(ref_unfold, ((0, 0), (0, pad), (0, 0)))
    n_chunks = ref_unfold.shape[1] // chunk
    ref_chunks = ref_unfold.reshape(b, n_chunks, chunk, d).transpose(1, 0, 2, 3)

    init = (jnp.full((b, l), -jnp.inf, dtype=jnp.float32),
            jnp.zeros((b, l), dtype=jnp.int32))

    def body(carry, inp):
        best, best_idx = carry
        ci, rc = inp  # chunk index, [B, chunk, D]
        r = jnp.einsum("bkd,bdl->bkl", rc, lr_unfold,
                       preferred_element_type=jnp.float32)  # [B, chunk, L]
        if pad:
            # mask rows beyond the true reference length
            row_ids = ci * chunk + jax.lax.broadcasted_iota(jnp.int32, (chunk, 1), 0)[:, 0]
            r = jnp.where((row_ids < l_ref)[None, :, None], r, -jnp.inf)
        cmax = jnp.max(r, axis=1)
        carg = jnp.argmax(r, axis=1).astype(jnp.int32) + ci * chunk
        upd = cmax > best
        return (jnp.where(upd, cmax, best),
                jnp.where(upd, carg, best_idx)), None

    (best, best_idx), _ = jax.lax.scan(
        body, init, (jnp.arange(n_chunks), ref_chunks))
    return best, best_idx


class TransferUnit(nn.Module):
    """Unified SearchTransfer + SelfTransfer with per-sample routing.

    __call__(f_fusion, sharp_lv1, sharp_lv2, sharp_lv3, has_sharp):
      f_fusion: [B, H, W, 4f] NHWC fused mid features (lrsr_lv3)
      sharp_lv*: sharp-frame encoder pyramid, NHWC ([B,4H,4W,f], [B,2H,2W,2f],
                 [B,H,W,4f])
      has_sharp: [B] bool — True => SearchTransfer semantics
                 (speinet.py:135), False => SelfTransfer (speinet.py:147)
    Returns (S [B,H,W,1], T_lv3 [B,H,W,4f], T_lv2 [B,2H,2W,2f],
             T_lv1 [B,4H,4W,f]).
    """

    n_feat: int = 32
    chunk: int = 2048
    use_pallas: bool = True     # fused online-max kernel on TPU backends
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, f_fusion, sharp_lv1, sharp_lv2, sharp_lv3, has_sharp,
                 routing: str = "mixed"):
        """`routing` is a STATIC specialization hint the host may pass when
        it already knows the batch's sharp/self split (the reference engine
        routes host-side too: speinet.py:150-168 splits the batch into
        `_forwardb`/`_forwardbs` programs). 'sharp' skips the SelfTransfer
        compute, 'self' skips the sharp-texture gather_folds; both are
        output-identical to 'mixed' for batches whose has_sharp matches."""
        assert routing in ("mixed", "sharp", "self")
        import os

        b, hh, ww, c4 = f_fusion.shape
        l = hh * ww
        # NCHW for patch ops
        lr_nchw = f_fusion.transpose(0, 3, 1, 2)

        from speinet_tpu.models.swinir import _fused_enabled
        use_kernel = self.use_pallas and _fused_enabled()

        if use_kernel and os.environ.get("SPEINET_CORR_RAW", "1") == "1":
            # RAW-unfold fast path: the kernel consumes un-normalized bf16
            # unfolds in [B, D, *] layout. The cosine normalization folds
            # around the kernel — inv-norms come from a 3x3 box filter of
            # the squared-channel-norm map (_patch_inv_norms), the reference
            # rows get one broadcast scale, and S is rescaled per column
            # after the argmax (which is invariant to column scales). This
            # skips both [B, D, L] f32 normalize materializations and the
            # [B, Lr, D] host transpose of the old prep (~2 GB of HBM
            # traffic per 720p frame).
            from speinet_tpu.ops.pallas_corr import (
                banded_corr_argmax, correlation_argmax_pallas_ld,
                correlation_argmax_pallas_lds)

            inv_lr = _patch_inv_norms(f_fusion)                # [B, L] f32
            if (os.environ.get("SPEINET_CORR_BANDED", "1") == "1"
                    and routing in ("sharp", "self")):
                # banded fast path: 3 shifted C-deep matmuls + diagonal adds
                # instead of the [TK, 9C] x [9C, TL] product — no unfold
                # materializations at all (ops/pallas_corr.py banded
                # section). Host-known routing only: the self reference
                # lives on the TRANSPOSED grid (SearchTransfer.py:60), so a
                # per-sample mixed batch cannot share one slab layout.
                if routing == "sharp":
                    ref_map = sharp_lv3
                    inv_ref_map = _patch_inv_norms(sharp_lv3)
                else:
                    # x.transpose(2,3).flip(2) in map space; per-position
                    # patch norms follow the same permutation
                    ref_map = jnp.flip(jnp.swapaxes(f_fusion, 1, 2), axis=1)
                    inv_ref_map = jnp.flip(
                        inv_lr.reshape(b, hh, ww).transpose(0, 2, 1),
                        axis=1).reshape(b, l)
                s, idx = banded_corr_argmax(f_fusion.astype(self.dtype),
                                            ref_map.astype(self.dtype),
                                            inv_ref_map)
                s = s * inv_lr
                weight_s = s.reshape(b, hh, ww, 1)
                return self._transfer_tail(
                    f_fusion, sharp_lv1, sharp_lv2, sharp_lv3, has_sharp,
                    routing, weight_s, idx)
            lr_u = unfold(lr_nchw, 3, 1, 1)                    # [B, D, L]
            if routing != "sharp":
                # SelfTransfer reference: pure permutation of the unfold
                # (see the non-raw branch below); per-position norms follow
                # the same spatial permutation (patch content is a
                # transposed/flipped window => identical multiset => equal
                # norm)
                lr6 = lr_u.reshape(b, c4, 3, 3, hh, ww)
                ref_self = jnp.flip(lr6.transpose(0, 1, 3, 2, 5, 4),
                                    axis=(2, 4)).reshape(b, c4 * 9, l)
                inv_self = jnp.flip(inv_lr.reshape(b, hh, ww).transpose(0, 2, 1),
                                    axis=1).reshape(b, l)
            if routing != "self":
                ref_search = unfold(sharp_lv3.transpose(0, 3, 1, 2), 3, 1, 1)
                inv_search = _patch_inv_norms(sharp_lv3)
            if routing == "sharp":
                ref_u, inv_ref = ref_search, inv_search
            elif routing == "self":
                ref_u, inv_ref = ref_self, inv_self
            else:
                sel = has_sharp[:, None, None]
                ref_u = jnp.where(sel, ref_search, ref_self)
                inv_ref = jnp.where(has_sharp[:, None], inv_search, inv_self)
            if os.environ.get("SPEINET_CORR_SCALED", "1") == "1":
                # per-row scale applied inside the kernel (the bf16 cast of
                # inv_ref matches the old host-side multiply bit-for-bit;
                # saves the [B, D, Lr] scaled-copy materialization)
                s, idx = correlation_argmax_pallas_lds(
                    lr_u.astype(self.dtype), ref_u.astype(self.dtype),
                    inv_ref)
            else:
                ref_sc = ref_u.astype(self.dtype) * inv_ref[:, None, :].astype(
                    self.dtype)
                s, idx = correlation_argmax_pallas_ld(lr_u.astype(self.dtype),
                                                      ref_sc)
            s = s * inv_lr
        else:
            lr_unfold = unfold(lr_nchw, 3, 1, 1)              # [B, D, L]
            lr_n = _l2_normalize(lr_unfold.astype(jnp.float32), axis=1)
            if routing != "sharp":
                # SelfTransfer reference (SearchTransfer.py:60:
                # x.transpose(2,3).flip(2)): its 3x3 unfold is an exact
                # permutation of lr_unfold — swap the kernel axes + flip one,
                # transpose the patch grid + flip one axis — so no second
                # unfold pass is needed, and because L2-normalization is
                # per-patch it commutes with the permutation. All-reshape/
                # transpose/flip: XLA fuses it into the select below.
                lr6 = lr_n.reshape(b, c4, 3, 3, hh, ww)
                ref_self_n = jnp.flip(lr6.transpose(0, 1, 3, 2, 5, 4),
                                      axis=(2, 4)).reshape(b, c4 * 9, l)
            if routing != "self":
                sharp3_nchw = sharp_lv3.transpose(0, 3, 1, 2)
                ref_search_n = _l2_normalize(
                    unfold(sharp3_nchw, 3, 1, 1).astype(jnp.float32), axis=1)
            if routing == "sharp":
                ref_n = ref_search_n.transpose(0, 2, 1)
            elif routing == "self":
                ref_n = ref_self_n.transpose(0, 2, 1)
            else:
                sel = has_sharp[:, None, None]
                ref_n = jnp.where(sel, ref_search_n,
                                  ref_self_n).transpose(0, 2, 1)

            if use_kernel:
                from speinet_tpu.ops.pallas_corr import correlation_argmax_pallas

                # when the model runs bf16, feed the correlation matmul bf16
                # operands (f32 accumulation inside the kernel) — the MXU
                # runs bf16 ~4x faster and the cosine scores only gate a
                # max/argmax
                s, idx = correlation_argmax_pallas(lr_n.astype(self.dtype),
                                                   ref_n.astype(self.dtype))
            else:
                s, idx = correlation_argmax(lr_n, ref_n, chunk=self.chunk)

        weight_s = s.reshape(b, hh, ww, 1)
        return self._transfer_tail(f_fusion, sharp_lv1, sharp_lv2, sharp_lv3,
                                   has_sharp, routing, weight_s, idx)

    def _transfer_tail(self, f_fusion, sharp_lv1, sharp_lv2, sharp_lv3,
                       has_sharp, routing, weight_s, idx):
        """Texture transfer + per-sample routing select, shared by the
        banded and unfold correlation paths (called from the compact
        __call__, so the self_search conv submodules resolve normally)."""
        if routing != "self":
            # --- SearchTransfer texture path: gather+fold of the sharp
            # pyramid (NHWC throughout; bf16 when the model runs bf16).
            # The three scales share the argmax index and tile grid, so one
            # combined gather of concatenated per-coordinate rows replaces
            # 27L gathered rows with 9L — XLA's TPU gather is row-count-
            # bound, measured 124.6 vs 286.1 ms at b=4 (scripts/ab_gf3.py).
            import os

            if os.environ.get("SPEINET_GF3", "1") == "1":
                from speinet_tpu.ops.patch_ops import gather_fold3_nhwc

                t3_search, t2_search, t1_search = (
                    t / 9.0 for t in gather_fold3_nhwc(
                        sharp_lv1, sharp_lv2, sharp_lv3, idx))
            else:
                t3_search = gather_fold_nhwc(sharp_lv3, idx, 1) / 9.0
                t2_search = gather_fold_nhwc(sharp_lv2, idx, 2) / 9.0
                t1_search = gather_fold_nhwc(sharp_lv1, idx, 4) / 9.0

        # routing='sharp' skips the SelfTransfer branch, so an init trace
        # driven through it would silently create a param tree WITHOUT the
        # self_search convs and break later 'mixed'/'self' applies
        # (ADVICE r3); every init path must trace routing='mixed'
        if self.is_initializing() and routing == "sharp":
            raise ValueError(
                "TransferUnit must be initialized with routing='mixed' "
                "(or 'self') so the self_search conv params are created; "
                "routing='sharp' is an inference-time specialization only")
        if routing != "sharp":
            # --- SelfTransfer texture path (SearchTransfer.py:72-76)
            t3_self = f_fusion
            up2 = bicubic_upsample_nhwc(f_fusion, 2)  # NHWC in place, f32 taps
            from speinet_tpu.models.blocks import torch_bias_init, torch_kernel_init
            t2_self = nn.relu(nn.Conv(self.n_feat * 2, (1, 1), dtype=self.dtype,
                                      kernel_init=torch_kernel_init,
                                      bias_init=torch_bias_init(self.n_feat * 4),
                                      name="self_search1")(up2.astype(self.dtype)))
            up4 = bicubic_upsample_nhwc(t2_self, 2)
            t1_self = nn.relu(nn.Conv(self.n_feat, (1, 1), dtype=self.dtype,
                                      kernel_init=torch_kernel_init,
                                      bias_init=torch_bias_init(self.n_feat * 2),
                                      name="self_search2")(up4.astype(self.dtype)))

        if routing == "sharp":
            t_lv3, t_lv2, t_lv1 = t3_search, t2_search, t1_search
        elif routing == "self":
            t_lv3, t_lv2, t_lv1 = t3_self, t2_self, t1_self
        else:
            sel4 = has_sharp[:, None, None, None]
            t_lv3 = jnp.where(sel4, t3_search, t3_self)
            t_lv2 = jnp.where(sel4, t2_search, t2_self)
            t_lv1 = jnp.where(sel4, t1_search, t1_self)
        return weight_s, t_lv3.astype(self.dtype), t_lv2.astype(self.dtype), \
            t_lv1.astype(self.dtype)
