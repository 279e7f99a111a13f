"""Hit-kernel backend selection.

``auto`` uses the Pallas kernel on TPU (the production path) and the pure
jnp implementation elsewhere (CPU tests, oracle comparisons).  The jnp path
is also the correctness oracle for the Pallas kernel.
"""

from __future__ import annotations

import functools

import jax

from ..config import RenderConfig
from ..ops.hit import hit_spheres as hit_spheres_jnp
from .hit_pallas import hit_spheres_pallas


@functools.lru_cache(maxsize=None)
def _default_platform() -> str:
    return jax.devices()[0].platform


def get_hit_fn(cfg: RenderConfig, scene=None):
    """Resolve cfg.backend ('auto' | 'pallas' | 'jnp') to a hit function.

    When ``scene`` is given, the returned function also handles triangle
    and composite scenes (spheres on the selected backend; triangles on
    the jnp sweep)."""
    backend = cfg.backend
    if backend == "auto":
        # The axon platform is the TPU tunnel; plain 'tpu' for direct runs.
        backend = "pallas" if _default_platform() in ("tpu", "axon") else "jnp"
    if backend == "pallas":
        sphere_fn = hit_spheres_pallas
    elif backend == "jnp":
        sphere_fn = hit_spheres_jnp
    else:
        raise ValueError(f"unknown backend {backend!r} (use auto|pallas|jnp)")
    if scene is None:
        return sphere_fn
    from ..scene.composite import make_hit_fn
    return make_hit_fn(scene, sphere_fn)
