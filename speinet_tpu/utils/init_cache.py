"""Disk cache for initialized model variables.

`model.init` of the full SPEINet is pure compile overhead for benchmarks,
profilers and warm-up scripts: at 720p-bench conditions it costs ~2 min on
the CPU backend (XLA CPU compile of the 36-block forward, re-done every
process — the CPU AOT cache rejects entries across machine-feature
mismatches on this host) and ~10 min through the TPU relay (dozens of
small init programs, each a multi-second relay round trip). The variables
themselves are ~110 MB and deterministic in (config, seed), so caching the
*values* keyed by the param-tree structure makes every later process start
in ~1 s.

Real entry points that load trained checkpoints (infer.py, resumed
training) never need this; it is for tools that measure the architecture
with fresh weights (bench.py, profile/ab scripts, warm_video_bench).
"""

from __future__ import annotations

import hashlib
import os

DEFAULT_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))), ".jax_cache")


def cached_init(model, rng, sample, cache_dir: str | None = None):
    """model.init(rng, sample) with a disk value-cache.

    The cache key hashes the variable-tree *structure* (every leaf path,
    shape, dtype — via jax.eval_shape, no compile) plus the rng key and the
    sample shape/dtype, so any change to the architecture or seed misses.
    """
    import jax
    import numpy as np
    from flax import serialization

    cache_dir = cache_dir or os.environ.get("SPEINET_INIT_CACHE", DEFAULT_DIR)
    shapes = jax.eval_shape(model.init, rng, sample)
    desc = [f"rng={np.asarray(jax.random.key_data(rng)).tolist()}",
            f"sample={sample.shape}/{sample.dtype}"]
    flat, _ = jax.tree_util.tree_flatten_with_path(shapes)
    for path, leaf in flat:
        desc.append(f"{jax.tree_util.keystr(path)}:{leaf.shape}/{leaf.dtype}")
    key = hashlib.sha256("\n".join(desc).encode()).hexdigest()[:32]
    path = os.path.join(cache_dir, f"init-{key}.msgpack")

    if os.path.exists(path):
        with open(path, "rb") as f:
            data = f.read()
        target = jax.tree.map(lambda s: np.zeros(s.shape, s.dtype), shapes)
        # commit to the default device ONCE — numpy leaves passed as jit
        # args would re-transfer ~110 MB through the TPU relay every call
        return jax.device_put(serialization.from_bytes(target, data))

    # init on the CPU backend: the values are identical (init math is
    # backend-agnostic here) and it avoids dozens of relay round trips
    with jax.default_device(jax.devices("cpu")[0]):
        variables = model.init(rng, sample)
    variables = jax.device_get(variables)
    os.makedirs(cache_dir, exist_ok=True)
    tmp = path + f".tmp{os.getpid()}"
    with open(tmp, "wb") as f:
        f.write(serialization.to_bytes(variables))
    os.replace(tmp, path)
    return jax.device_put(variables)
