"""Spatial 4-tile chopped forward — TPU analog of `forward_chop`.

The reference recursively splits the frame into 4 overlapping quadrants and
round-robins them over <=4 GPUs with `P.data_parallel`
(trainer_swint_hsa_nsf.py:96-156, inference_SPEINet.py:545-607). Here the 4
tiles simply become extra batch entries — one jitted forward over a batch
of 4B tiles, sharded over the dp mesh like any other batch (SURVEY.md §2.2
option (a)).

Shapes must have even H and W (guaranteed by size_must_mode=4, the same
invariant the reference relies on).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def chop_batch(x: jnp.ndarray, shave: int = 20) -> jnp.ndarray:
    """[..., H, W] -> 4 overlapping tiles stacked into the batch axis.

    x: [B, T, C, H, W] -> [4*B, T, C, H//2+shave, W//2+shave]
    Tile order: (top,left), (top,right), (bottom,left), (bottom,right) —
    matching the reference's torch.cat order (inference_SPEINet.py:557-562).
    """
    h, w = x.shape[-2:]
    hs, ws = h // 2 + shave, w // 2 + shave
    tl = x[..., :hs, :ws]
    tr = x[..., :hs, w - ws:]
    bl = x[..., h - hs:, :ws]
    br = x[..., h - hs:, w - ws:]
    return jnp.concatenate([tl, tr, bl, br], axis=0)


def chop_forward(forward_fn, x: jnp.ndarray, shave: int = 20,
                 min_size: int = 160000, tile_sharding=None) -> jnp.ndarray:
    """Recursive 4-quadrant chopped forward (parity:
    inference_SPEINet.py:545-607). Below `6 * min_size` pixels the four
    overlapping tiles run as ONE batched forward; above it each tile
    recurses, so arbitrarily large frames (>720p) fit in memory. Shapes are
    static per recursion level, so the whole tree traces into one jitted
    program.

    `tile_sharding` (a NamedSharding over the batch axis) distributes the
    4B tiles across the dp mesh — the TPU analog of the reference engine
    dispatching quadrants over <=4 GPUs (inference_SPEINet.py:569).

    forward_fn: [4B, T, C, hs, ws] -> [4B, C, hs, ws]
    x: [B, T, C, H, W] -> [B, C, H, W]
    """
    h, w = x.shape[-2:]
    tiles = chop_batch(x, shave=shave)
    if tile_sharding is not None and tiles.shape[0] % tile_sharding.mesh.size == 0:
        tiles = jax.lax.with_sharding_constraint(tiles, tile_sharding)
    # leaf when small enough — or when tiles would stop shrinking (tile
    # size floors at ~2*shave), which would otherwise recurse forever
    shrinking = (h // 2 + shave < h) and (w // 2 + shave < w)
    if h * w < 6 * min_size or not shrinking:
        y = forward_fn(tiles)
    else:
        b = x.shape[0]
        y = jnp.concatenate(
            [chop_forward(forward_fn, tiles[i * b:(i + 1) * b], shave,
                          min_size, tile_sharding)
             for i in range(4)], axis=0)
    return chop_merge(y, h, w)


def chop_merge(y: jnp.ndarray, h: int, w: int) -> jnp.ndarray:
    """Reassemble tiles from chop_batch's output.

    y: [4*B, C, hs, ws] -> [B, C, h, w]; each output quadrant is taken from
    the corresponding tile (overlap halo discarded,
    inference_SPEINet.py:586-602).
    """
    b4 = y.shape[0]
    b = b4 // 4
    tl, tr, bl, br = y[:b], y[b:2 * b], y[2 * b:3 * b], y[3 * b:]
    top = jnp.concatenate([tl[..., : h // 2, : w // 2],
                           tr[..., : h // 2, -(w - w // 2):]], axis=-1)
    bottom = jnp.concatenate([bl[..., -(h - h // 2):, : w // 2],
                              br[..., -(h - h // 2):, -(w - w // 2):]], axis=-1)
    return jnp.concatenate([top, bottom], axis=-2)
