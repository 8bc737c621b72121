"""Halo-exchange spatial sharding primitives (shard_map + ppermute).

The reference's only spatial parallelism is the 4-quadrant forward_chop
with a 20px overlap halo recomputed per quadrant
(inference_SPEINet.py:545-607); `parallel.chop` reproduces that as batched
tiles. This module provides the genuinely-sharded alternative (SURVEY.md
§2.2 option (b)): the H axis sharded over a mesh axis, with neighbor rows
exchanged over ICI via `jax.lax.ppermute` so convolutions see a real halo
instead of recomputing overlap.

`halo_exchange` is the building block; `sharded_conv2d` shows the pattern
end-to-end (tested against the unsharded conv on the virtual CPU mesh).
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax.experimental.shard_map import shard_map


def halo_exchange(x: jnp.ndarray, halo: int, axis_name: str) -> jnp.ndarray:
    """Pad the sharded H axis (axis 1 of [B, H_loc, W, C]) with `halo` rows
    from each neighbor shard (zeros at the global borders).

    Runs inside shard_map; the two ppermutes ride ICI on TPU meshes.
    """
    n = jax.lax.axis_size(axis_name)
    idx = jax.lax.axis_index(axis_name)
    top_rows = x[:, :halo]          # my first rows -> previous shard's bottom halo
    bot_rows = x[:, -halo:]         # my last rows  -> next shard's top halo
    # receive from the previous shard (their bottom rows)
    from_prev = jax.lax.ppermute(bot_rows, axis_name,
                                 [(i, (i + 1) % n) for i in range(n)])
    # receive from the next shard (their top rows)
    from_next = jax.lax.ppermute(top_rows, axis_name,
                                 [(i, (i - 1) % n) for i in range(n)])
    zeros = jnp.zeros_like(from_prev)
    top_halo = jnp.where(idx == 0, zeros, from_prev)
    bot_halo = jnp.where(idx == n - 1, jnp.zeros_like(from_next), from_next)
    return jnp.concatenate([top_halo, x, bot_halo], axis=1)


def sharded_conv2d(mesh: Mesh, kernel: jnp.ndarray, axis_name: str = "sp"
                   ) -> Callable:
    """Build an H-sharded SAME depthwise conv: [B, H, W, C] sharded on H.

    kernel: [kh, kw]; zero padding semantics identical to the unsharded
    `ops.filters.depthwise_conv2d`.
    """
    kh, kw = kernel.shape
    halo = kh // 2

    def local_conv(x_loc):
        xh = halo_exchange(x_loc, halo, axis_name)
        c = xh.shape[-1]
        k = jnp.broadcast_to(kernel[:, :, None, None], (kh, kw, 1, c)).astype(xh.dtype)
        return jax.lax.conv_general_dilated(
            xh, k, (1, 1), [(0, 0), (kw // 2, kw // 2)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=c,
        )

    return shard_map(local_conv, mesh=mesh,
                     in_specs=P(None, axis_name, None, None),
                     out_specs=P(None, axis_name, None, None))
