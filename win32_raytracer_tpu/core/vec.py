"""Vec3 helpers over ``[..., 3]`` jnp arrays.

The reference uses DirectXTK SimpleMath ``Vector3``/``Color`` value types
(win32-raytracer/RayTracer.cpp:72 etc.); here a vector is just the trailing
axis of an array so every op vectorizes over arbitrary ray batches.
"""

from __future__ import annotations

import jax.numpy as jnp


def dot(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Batched dot product over the trailing axis -> [...]."""
    return jnp.sum(a * b, axis=-1)


def length_sq(a: jnp.ndarray) -> jnp.ndarray:
    return dot(a, a)


def length(a: jnp.ndarray) -> jnp.ndarray:
    return jnp.sqrt(length_sq(a))


def normalize(a: jnp.ndarray) -> jnp.ndarray:
    """Normalize like SimpleMath ``Vector3::Normalize`` (1/sqrt scaling)."""
    return a / jnp.maximum(length(a), 1e-37)[..., None]


def cross(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    return jnp.cross(a, b)
