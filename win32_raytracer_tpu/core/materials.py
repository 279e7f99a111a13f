"""Material scatter math.

Pure-jnp reproductions of the reference's helpers, batched over ray arrays:

* ``quantize``  — [-1,1] -> [0,1] (RayTracer.cpp:139-143)
* ``reflect``   — mirror reflection (RayTracer.cpp:146-152)
* ``refract``   — Snell refraction with the reference's **2.0** discriminant
                  quirk (textbook uses 1.0; RayTracer.cpp:155-175); returns
                  (refracted_dir, ok_mask) instead of std::optional
* ``schlick``   — Fresnel approximation (RayTracer.cpp:178-184)

Material ids match the reference enum order (RayTracer.cpp:93-98).
"""

from __future__ import annotations

import jax.numpy as jnp

from .vec import dot, normalize

LAMBERTIAN = 0
METAL = 1
DIELECTRIC = 2


def quantize(x: jnp.ndarray) -> jnp.ndarray:
    """[-1, 1] -> [0, 1] (RayTracer.cpp:139-143)."""
    return 0.5 * (x + 1.0)


def reflect(v: jnp.ndarray, n: jnp.ndarray) -> jnp.ndarray:
    """``v - 2 (v.n) n`` (RayTracer.cpp:146-152). v need not be normalized."""
    return v - (2.0 * dot(v, n))[..., None] * n


def refract(
    d: jnp.ndarray,
    n: jnp.ndarray,
    ni_over_nt: jnp.ndarray,
    discriminant_bias: float = 2.0,
):
    """Refract ``d`` about ``n``.

    Mirrors RayTracer.cpp:155-175: ``d`` is normalized internally; the
    discriminant is ``bias - ni_over_nt^2 (1 - dt^2)`` where the reference's
    bias is the non-textbook 2.0.  Returns ``(refracted, ok)`` where ``ok``
    is the total-internal-reflection mask (discriminant > 0).
    """
    nd = normalize(d)
    dt = dot(nd, n)
    disc = discriminant_bias - ni_over_nt * ni_over_nt * (1.0 - dt * dt)
    ok = disc > 0.0
    safe = jnp.sqrt(jnp.maximum(disc, 0.0))
    refr = ni_over_nt[..., None] * (nd - n * dt[..., None]) - n * safe[..., None]
    return refr, ok


def schlick(cos_theta: jnp.ndarray, refractive_index: jnp.ndarray) -> jnp.ndarray:
    """Schlick Fresnel approximation (RayTracer.cpp:178-184)."""
    r0 = (1.0 - refractive_index) / (1.0 + refractive_index)
    r0 = r0 * r0
    return r0 + (1.0 - r0) * jnp.power(1.0 - cos_theta, 5.0)


def sky_color(d: jnp.ndarray) -> jnp.ndarray:
    """Background gradient on normalized dir.y (RayTracer.cpp:690-701)."""
    t = quantize(normalize(d)[..., 1])[..., None]
    white = jnp.asarray([1.0, 1.0, 1.0], dtype=jnp.float32)
    tint = jnp.asarray([0.5, 0.7, 1.0], dtype=jnp.float32)
    return (1.0 - t) * white + t * tint
