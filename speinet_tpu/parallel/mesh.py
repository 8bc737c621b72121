"""Device mesh + sharding rules.

TPU-native replacement for the reference's `nn.DataParallel(range(n_GPUs))`
(model/__init__.py:19-20, Loss/__init__.py:61-64, SURVEY.md §2.2): a 1-D
'dp' mesh over which the batch of frame windows is sharded; parameters are
replicated; gradient all-reduce is inserted by XLA's SPMD partitioner and
rides ICI. Multi-host extends the same mesh over DCN via
`jax.distributed.initialize` (call `maybe_init_distributed` first on each
process).

The reference's spatial 4-quadrant `forward_chop` maps to `parallel.chop`:
overlapping tiles become extra batch entries sharded over the same mesh.
"""

from __future__ import annotations

import os
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def maybe_init_distributed() -> None:
    """Initialize multi-host JAX when launched under a cluster env."""
    if os.environ.get("JAX_COORDINATOR_ADDRESS"):
        jax.distributed.initialize()


def make_mesh(dp_devices: int = 0, devices=None) -> Mesh:
    """1-D data-parallel mesh. dp_devices=0 -> all available devices."""
    devs = list(devices if devices is not None else jax.devices())
    if dp_devices and dp_devices > 0:
        devs = devs[:dp_devices]
    return Mesh(devs, axis_names=("dp",))


def make_mesh_for_batch(batch_size: int, dp_devices: int = 0, devices=None) -> Mesh:
    """Mesh whose dp size divides the global batch (largest such divisor)."""
    devs = list(devices if devices is not None else jax.devices())
    if dp_devices and dp_devices > 0:
        devs = devs[:dp_devices]
    n = len(devs)
    while n > 1 and batch_size % n != 0:
        n -= 1
    return Mesh(devs[:n], axis_names=("dp",))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis over 'dp'."""
    return NamedSharding(mesh, P("dp"))


def replicate_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, array):
    return jax.device_put(array, batch_sharding(mesh))
