"""Ray-sphere intersection (pure jnp reference path).

This is the batched descendant of the reference's AVX sweep
(win32-raytracer/RayTracer.cpp:433-589): brute-force ray-vs-all-spheres with
a running nearest-t.  Differences by design:

* whole-array masking replaces movemask early-outs (no divergence on TPU);
* spheres are streamed in lane-width tiles via ``lax.scan`` carrying the
  running (t, index) — so no ``[N_rays, N_spheres]`` buffer is materialized;
* the winning sphere's normal/hit-point are reconstructed once per ray in a
  post-pass (the reference computes them per pair and selects,
  RayTracer.cpp:526-549);
* padded/inactive spheres are masked, fixing the reference's silent
  ``size % 8`` sphere dropout (RayTracer.cpp:432-434).

Tie-breaking matches the reference: strictly-nearer t wins, so the earliest
sphere index is kept on exact ties (RayTracer.cpp:515, 576-589).

This implementation is also the CI oracle for the Pallas kernel
(kernels/hit_pallas.py).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..config import MIN_HIT_T
from ..scene.spheres import SphereScene

F32_MAX = jnp.float32(3.4028235e38)  # reference uses numeric_limits<float>::max


class HitRecord(NamedTuple):
    """Batched analogue of ``ptr::HitRecord`` (RayTracer.cpp:120-127)."""

    hit: jnp.ndarray     # [N] bool
    t: jnp.ndarray       # [N] f32 (F32_MAX where no hit)
    point: jnp.ndarray   # [N, 3] f32
    normal: jnp.ndarray  # [N, 3] f32 (flipped for negative radii)
    idx: jnp.ndarray     # [N] int32 winning sphere index (0 where no hit)


def _scene_tiles(scene: SphereScene, tile: int):
    """Reshape SoA scene arrays into [K, tile] stacks for lax.scan."""
    s = scene.padded_size
    assert s % tile == 0, (s, tile)
    k = s // tile

    def rs(x):
        return x.reshape(k, tile)

    dc = scene.center2 - scene.center1
    return dict(
        c1x=rs(scene.center1[:, 0]), c1y=rs(scene.center1[:, 1]), c1z=rs(scene.center1[:, 2]),
        dcx=rs(dc[:, 0]), dcy=rs(dc[:, 1]), dcz=rs(dc[:, 2]),
        t1=rs(scene.t1), inv_dt=rs(1.0 / (scene.t2 - scene.t1)),
        radius=rs(scene.radius),
        active=rs(scene.active),
    )


def hit_spheres(
    scene: SphereScene,
    origin: jnp.ndarray,
    direction: jnp.ndarray,
    time: jnp.ndarray,
    min_t: float = MIN_HIT_T,
    tile: int = 128,
) -> HitRecord:
    """Nearest front-face hit of each ray against every (active) sphere.

    The quadratic matches RayTracer.cpp:454-488: only the near root is
    tested (back faces are a TODO in the reference too), hits require
    ``discriminant >= 0`` and ``t > min_t``.
    """
    n = origin.shape[0]
    tiles = _scene_tiles(scene, tile)

    ox, oy, oz = origin[:, 0:1], origin[:, 1:2], origin[:, 2:3]
    dx, dy, dz = direction[:, 0:1], direction[:, 1:2], direction[:, 2:3]
    a = dx * dx + dy * dy + dz * dz            # [N,1] (d need not be unit)
    tcol = time[:, None]

    init = (jnp.full((n,), F32_MAX, jnp.float32), jnp.zeros((n,), jnp.int32))

    def body(carry, args):
        k, tl = args
        best_t, best_i = carry
        # Motion blur: lerp centers by shutter time (RayTracer.cpp:449-452).
        lerp = (tcol - tl["t1"][None, :]) * tl["inv_dt"][None, :]
        cx = tl["c1x"][None, :] + tl["dcx"][None, :] * lerp
        cy = tl["c1y"][None, :] + tl["dcy"][None, :] * lerp
        cz = tl["c1z"][None, :] + tl["dcz"][None, :] * lerp
        # oc = origin - center
        ocx, ocy, ocz = ox - cx, oy - cy, oz - cz
        b_half = dx * ocx + dy * ocy + dz * ocz
        r = tl["radius"][None, :]
        c = ocx * ocx + ocy * ocy + ocz * ocz - r * r
        disc = b_half * b_half - a * c          # = discriminant / 4
        t = (-b_half - jnp.sqrt(jnp.maximum(disc, 0.0))) / a
        valid = (disc >= 0.0) & (t > min_t) & tl["active"][None, :]
        t = jnp.where(valid, t, F32_MAX)
        tile_arg = jnp.argmin(t, axis=1)
        tile_t = jnp.take_along_axis(t, tile_arg[:, None], axis=1)[:, 0]
        better = tile_t < best_t
        best_t = jnp.where(better, tile_t, best_t)
        best_i = jnp.where(better, k * tile + tile_arg.astype(jnp.int32), best_i)
        return (best_t, best_i), None

    k_ids = jnp.arange(scene.padded_size // tile, dtype=jnp.int32)
    (best_t, best_i), _ = jax.lax.scan(body, init, (k_ids, tiles))

    hit = best_t < F32_MAX
    t_safe = jnp.where(hit, best_t, 0.0)
    point = origin + t_safe[:, None] * direction

    # Post-pass: reconstruct the winner's center at ray time and its normal
    # ``(point - center) / radius`` (RayTracer.cpp:531-533; signed radius
    # flips normals for the hollow-glass spheres).
    c1 = jnp.take(scene.center1, best_i, axis=0)
    dc = jnp.take(scene.center2 - scene.center1, best_i, axis=0)
    t1 = jnp.take(scene.t1, best_i)
    inv_dt = jnp.take(1.0 / (scene.t2 - scene.t1), best_i)
    radius = jnp.take(scene.radius, best_i)
    center = c1 + dc * ((time - t1) * inv_dt)[:, None]
    denom = jnp.where(radius == 0.0, 1.0, radius)
    normal = (point - center) / denom[:, None]

    return HitRecord(hit=hit, t=best_t, point=point, normal=normal, idx=best_i)
