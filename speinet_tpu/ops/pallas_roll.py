"""One-pass 2-D cyclic roll for NHWC tensors (TPU Pallas).

`jnp.roll(x, (-sh, -sw), axis=(1, 2))` lowers to one concat pass per axis
— two full HBM read+write round trips (measured 4.2 ms = 224 GB/s
effective on [16, 180, 320, 256] bf16). The swin shifted-window blocks
(models/swinir.py, parity: reference SwinIR swinir.py:210-217 torch.roll)
pay this 3x per SW block. This kernel instead DMAs each output row-block
directly from its rolled source coordinates: ONE HBM read + ONE write,
with the column rotation folded into the destination offsets of the same
copies — no compute at all.

Layout: grid (B, H//bh); the input stays in ANY (HBM) memory space and
the kernel issues 2 async copies per step (4 on the single wrapping row
block), sliced dynamically from `(i*bh + sh) % H`.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _roll_kernel(x_ref, o_ref, scratch, sems, *, bh, H, W, sh, sw, wrap_i,
                 len1):
    # Rows (dim 1, untiled) may be DMA-sliced at any offset; columns (dim 2)
    # are the sublane dim of the (8, 128) tiling, so Mosaic requires
    # 8-aligned column slices on HBM refs. Hence: DMA full-width row blocks
    # from the rolled row offset into VMEM scratch, then rotate columns as
    # an in-VMEM store (a sublane shift — register relayout, no HBM pass).
    b = pl.program_id(0)
    i = pl.program_id(1)
    row0 = (i * bh + sh) % H

    if wrap_i is None:
        cp = pltpu.make_async_copy(x_ref.at[b, pl.ds(row0, bh)], scratch,
                                   sems.at[0])
        cp.start()
        cp.wait()
    else:
        @pl.when(i != wrap_i)
        def _():
            cp = pltpu.make_async_copy(x_ref.at[b, pl.ds(row0, bh)],
                                       scratch, sems.at[0])
            cp.start()
            cp.wait()

        @pl.when(i == wrap_i)
        def _():
            cp1 = pltpu.make_async_copy(
                x_ref.at[b, pl.ds(H - len1, len1)],
                scratch.at[pl.ds(0, len1)], sems.at[0])
            cp2 = pltpu.make_async_copy(
                x_ref.at[b, pl.ds(0, bh - len1)],
                scratch.at[pl.ds(len1, bh - len1)], sems.at[1])
            cp1.start()
            cp2.start()
            cp1.wait()
            cp2.wait()

    if sw:
        o_ref[0] = jnp.concatenate([scratch[:, sw:], scratch[:, :sw]],
                                   axis=1)
    else:
        o_ref[0] = scratch[:]


def _pick_bh(H: int) -> int:
    # largest divisor of H with a <=24-row block (<=4 MB VMEM at 320x256
    # bf16, x2 for the pipeline's double buffer)
    for bh in range(min(24, H), 0, -1):
        if H % bh == 0:
            return bh
    return H


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3))
@functools.partial(jax.jit, static_argnums=(1, 2, 3))
def roll2d(x: jnp.ndarray, sh: int, sw: int,
           interpret: bool = False) -> jnp.ndarray:
    """out[b, i, j, :] = x[b, (i+sh) % H, (j+sw) % W, :] — equivalent to
    ``jnp.roll(x, (-sh, -sw), axis=(1, 2))`` in one HBM pass.

    sh/sw are static Python ints (any sign; reduced mod H/W).
    Differentiable: the VJP of a roll is the inverse roll."""
    B, H, W, C = x.shape
    sh %= H
    sw %= W
    if sh == 0 and sw == 0:
        return x
    dev = jax.config.jax_default_device
    on_tpu = (dev.platform == "tpu" if dev is not None
              else jax.default_backend() == "tpu")
    # Mosaic constraint: HBM memref slices must be tile-aligned in the
    # last two (tiled) dims — W to the 8-wide sublane, C to the 128 lane
    # (seen: "Slice shape along dimension 2 must be aligned to tiling (8),
    # but is 50" at the 50x50 training shape). Fall back for those shapes.
    if not interpret and (not on_tpu or W % 8 or C % 128):
        return jnp.roll(x, (-sh, -sw), axis=(1, 2))
    bh = _pick_bh(H)
    # exactly one grid row-block wraps iff sh is not a multiple of bh:
    # row starts are == sh (mod bh), so the wrapping start is the unique
    # r0 in (H-bh, H); solve i from r0 = (i*bh + sh) % H
    if sh % bh == 0:
        wrap_i, len1 = None, 0
    else:
        r0w = H - bh + (sh % bh)
        wrap_i = ((r0w - sh) % H) // bh
        len1 = H - r0w
    kernel = functools.partial(_roll_kernel, bh=bh, H=H, W=W, sh=sh, sw=sw,
                               wrap_i=wrap_i, len1=len1)
    return pl.pallas_call(
        kernel,
        grid=(B, H // bh),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((1, bh, W, C), lambda b, i: (b, i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        scratch_shapes=[pltpu.VMEM((bh, W, C), x.dtype),
                        pltpu.SemaphoreType.DMA((2,))],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(x)


def _roll2d_fwd(x, sh, sw, interpret):
    return roll2d(x, sh, sw, interpret), None


def _roll2d_bwd(sh, sw, interpret, _, g):
    return (roll2d(g, -sh, -sw, interpret),)


roll2d.defvjp(_roll2d_fwd, _roll2d_bwd)
