"""Halo-exchange spatial sharding vs the unsharded conv (8-device mesh)."""

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from speinet_tpu.ops.filters import depthwise_conv2d, box_kernel
from speinet_tpu.parallel.halo import sharded_conv2d


def test_sharded_conv_matches_unsharded(rng):
    devs = np.array(jax.devices())
    mesh = Mesh(devs, axis_names=("sp",))
    x = rng.random((2, 64, 40, 8)).astype(np.float32)   # H=64 over 8 shards
    k = np.asarray(box_kernel(5))
    want = np.asarray(depthwise_conv2d(
        jnp.asarray(x.transpose(0, 3, 1, 2)), jnp.asarray(k))).transpose(0, 2, 3, 1)

    xj = jax.device_put(jnp.asarray(x), NamedSharding(mesh, P(None, "sp")))
    conv = jax.jit(sharded_conv2d(mesh, jnp.asarray(k)))
    got = np.asarray(conv(xj))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)
