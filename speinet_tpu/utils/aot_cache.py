"""Disk cache of *compiled executables* (AOT warm start).

The persistent XLA compilation cache misses across processes on this TPU
relay — the cache key changes per process for full-model programs (README
"Compile-time note"), so every engine start pays minutes of compilation.
This sidesteps the key problem entirely: serialize the compiled executable
itself (`jax.experimental.serialize_executable`) keyed on things we
control — code hash, jax version, backend platform, arg shapes/dtypes —
and deserialize at startup, skipping XLA compilation.

Usage:
    fn = aot_cached(lambda x: model.apply(v, x), (x0,), tag="fwd-720p")
    y = fn(x0)

Fail-open by design: any serialize/deserialize error (relay without
executable-serialization support, version skew, corrupt file) falls back
to plain `jax.jit` — behaviour is identical, only the warm-start time
differs. Set SPEINET_NO_AOT_CACHE=1 to disable.
"""

from __future__ import annotations

import hashlib
import logging
import os
import pickle

import jax

log = logging.getLogger(__name__)

_DEFAULT_DIR = os.path.join(os.path.expanduser("~"), ".cache", "speinet_aot")


def _key(tag: str, args, static: str) -> str:
    h = hashlib.sha256()
    h.update(jax.__version__.encode())
    h.update(jax.default_backend().encode())
    d = jax.devices()[0]
    h.update(f"{d.platform}:{getattr(d, 'device_kind', '')}".encode())
    h.update(tag.encode())
    h.update(static.encode())
    for a in jax.tree_util.tree_leaves(args):
        h.update(str((getattr(a, "shape", ()), str(getattr(a, "dtype", type(a))))).encode())
    return h.hexdigest()[:32]


def code_version() -> str:
    """Hash of every .py source in the package — the executable cache key
    component standing in for 'the traced code' (aot_cached keys on tags,
    not jaxprs, so any source change must invalidate)."""
    pkg = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    h = hashlib.sha256()
    for root, _, files in sorted(os.walk(pkg)):
        for f in sorted(files):
            if f.endswith(".py"):
                with open(os.path.join(root, f), "rb") as fh:
                    h.update(fh.read())
    return h.hexdigest()[:16]


def aot_cached(fn, example_args: tuple, tag: str, static: str = "",
               cache_dir: str | None = None, **jit_kwargs):
    """Return a compiled callable for `fn(*example_args)`, loading the
    executable from disk when a matching serialization exists.

    `tag` must change whenever the traced code changes (e.g. a code/version
    hash or a bench revision string) — the executable is keyed on it, NOT
    on the jaxpr. `static` folds extra config (dtype flags, env knobs)
    into the key."""
    if os.environ.get("SPEINET_NO_AOT_CACHE"):
        return jax.jit(fn, **jit_kwargs)
    from jax.experimental.serialize_executable import (deserialize_and_load,
                                                       serialize)

    cache_dir = cache_dir or os.environ.get("SPEINET_AOT_CACHE_DIR",
                                            _DEFAULT_DIR)
    os.makedirs(cache_dir, exist_ok=True)
    path = os.path.join(cache_dir, _key(tag, example_args, static) + ".aot")

    if os.path.exists(path):
        try:
            with open(path, "rb") as f:
                payload, in_tree, out_tree = pickle.load(f)
            compiled = deserialize_and_load(payload, in_tree, out_tree)
            log.info("aot_cache: loaded %s (%s)", tag, path)
            return compiled
        except Exception as e:   # fail-open: recompile below
            log.warning("aot_cache: load failed for %s (%s) — recompiling",
                        tag, e)

    # NOTE: a deserialized executable binds to the backend's FULL local
    # device set; on a multi-device platform pass explicit in_shardings
    # (e.g. replicated over a mesh of all devices) — on the 1-chip TPU
    # target the default is correct.
    compiled = jax.jit(fn, **jit_kwargs).lower(*example_args).compile()
    try:
        payload, in_tree, out_tree = serialize(compiled)
        tmp = path + f".tmp{os.getpid()}"
        with open(tmp, "wb") as f:
            pickle.dump((payload, in_tree, out_tree), f)
        os.replace(tmp, path)
        log.info("aot_cache: saved %s (%d bytes)", tag, len(payload))
    except Exception as e:       # relay may not support serialization
        log.warning("aot_cache: serialize failed for %s (%s)", tag, e)
    return compiled
