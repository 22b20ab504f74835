"""On-disk cache of packed scenes.

The reference caches BC-compressed DDS textures per model in a
``.content-cache`` directory next to the asset (ref: src/scene.cpp:1103-1113);
the asset tree here is read-only, so the cache lives inside the repo at
``.content_cache/`` (gitignored) and holds the fully packed scene (geometry +
atlas), keyed by source path, mtime, and texture size.
"""

from __future__ import annotations

import hashlib
import pathlib
import pickle

import jax
import numpy as np
import jax.numpy as jnp

CACHE_DIR = pathlib.Path(__file__).resolve().parents[2] / ".content_cache"

# Bump whenever the Scene pytree schema changes — stale pickles fail to
# round-trip otherwise.
SCHEMA_VERSION = "v17-amask5"


def _key(path: pathlib.Path, texture_max_dim: int) -> str:
    h = hashlib.sha1()
    h.update(str(path.resolve()).encode())
    h.update(str(path.stat().st_mtime_ns).encode())
    h.update(str(texture_max_dim).encode())
    h.update(SCHEMA_VERSION.encode())
    return h.hexdigest()[:20]


def _to_host(tree):
    return jax.tree_util.tree_map(
        lambda x: np.asarray(x) if isinstance(x, jnp.ndarray) else x, tree)


def _to_device(tree):
    return jax.tree_util.tree_map(
        lambda x: jnp.asarray(x) if isinstance(x, np.ndarray) else x, tree)


def load_scene_cached(path, texture_max_dim: int = 2048, tod_sun=None,
                      use_cache: bool = True, progress=None):
    """load_scene with a transparent pickle cache."""
    from .loader import load_scene
    path = pathlib.Path(path)
    cache_file = CACHE_DIR / f"{path.stem}-{_key(path, texture_max_dim)}.pkl"
    if use_cache and cache_file.exists():
        with open(cache_file, "rb") as f:
            host = pickle.load(f)
        host.scene = _to_device(host.scene)
        host.source_path = str(path)
        return host
    host = load_scene(path, texture_max_dim=texture_max_dim, tod_sun=tod_sun,
                      progress=progress)
    if use_cache:
        CACHE_DIR.mkdir(exist_ok=True)
        host_np = pickle.dumps(_replace_scene(host, _to_host(host.scene)))
        cache_file.write_bytes(host_np)
    host.source_path = str(path)
    return host


def _replace_scene(host, scene):
    import copy
    h = copy.copy(host)
    h.scene = scene
    return h


def load_probe_cached(builder, key: str, use_cache: bool = True):
    """Environment probe cache (the reference caches processed environment
    content similarly, ref: src/scene.cpp:1103-1113). `builder` is a
    zero-arg callable producing the probe; `key` identifies the inputs
    (hdri path+mtime, or sun/turbidity for the dynamic sky)."""
    # v5: CubeMips grew the u32 RGBE texel table (the sub-2MB fast-tier
    # stochastic fetch); stale pickles lack it and fall back to flat4 rows
    h = hashlib.sha1((key + ":v5").encode()).hexdigest()[:20]
    cache_file = CACHE_DIR / f"probe-{h}.pkl"
    if use_cache and cache_file.exists():
        with open(cache_file, "rb") as f:
            return _to_device(pickle.load(f))
    probe = builder()
    if use_cache:
        CACHE_DIR.mkdir(exist_ok=True)
        cache_file.write_bytes(pickle.dumps(_to_host(probe)))
    return probe
