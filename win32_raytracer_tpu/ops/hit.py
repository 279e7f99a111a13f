"""Ray-sphere intersection (pure jnp reference path).

This is the batched descendant of the reference's AVX sweep
(win32-raytracer/RayTracer.cpp:433-589): brute-force ray-vs-all-spheres with
a running nearest-t.  Differences by design:

* whole-array masking replaces movemask early-outs (no divergence on TPU);
* spheres are streamed in lane-width tiles via ``lax.scan`` carrying the
  running (t, index, winner attributes) — so no ``[N_rays, N_spheres]``
  buffer is materialized;
* the winning sphere's attributes (center at ray time, radius, material
  parameters) are carried through the scan with masked selects — the direct
  analogue of the reference's ``conditionalAssign`` running state
  (RayTracer.cpp:536-549).  NO dynamic gathers: gather ops are
  catastrophically slow on the target TPU runtime, and the select-based
  carry is pure VPU work;
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

# No-hit sentinel.  The reference uses numeric_limits<float>::max
# (RayTracer.cpp:404); we use 1e30 because the f32-max literal itself
# knocks the axon TPU runtime into a ~30x slower execution mode (empirically
# bisected — any jitted program containing the 3.4028235e38 constant
# degrades every subsequent dispatch in the process).  Semantics are
# identical: any real hit t is << 1e30.
F32_MAX = jnp.float32(1e30)


class HitRecord(NamedTuple):
    """Batched analogue of ``ptr::HitRecord`` (RayTracer.cpp:120-127),
    with the winning sphere's material parameters already selected."""

    hit: jnp.ndarray     # [N] bool
    t: jnp.ndarray       # [N] f32 (F32_MAX where no hit)
    point: jnp.ndarray   # [N, 3] f32
    normal: jnp.ndarray  # [N, 3] f32 (flipped for negative radii)
    idx: jnp.ndarray     # [N] int32 winning sphere index (0 where no hit)
    mat_id: jnp.ndarray  # [N] int32
    albedo: jnp.ndarray  # [N, 3] f32
    fuzz: jnp.ndarray    # [N] f32
    ior: jnp.ndarray     # [N] f32


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
        mat_id=rs(scene.mat_id),
        alr=rs(scene.albedo[:, 0]), alg=rs(scene.albedo[:, 1]), alb=rs(scene.albedo[:, 2]),
        fuzz=rs(scene.fuzz), ior=rs(scene.ior),
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
    lane_f = jax.lax.broadcasted_iota(jnp.float32, (1, tile), 1)

    zero = jnp.zeros((n,), jnp.float32)
    init = dict(
        t=jnp.full((n,), F32_MAX, jnp.float32),
        idx=jnp.zeros((n,), jnp.int32),
        cx=zero, cy=zero, cz=zero, radius=jnp.ones((n,), jnp.float32),
        mat_id=jnp.zeros((n,), jnp.int32),
        alr=zero, alg=zero, alb=zero, fuzz=zero, ior=jnp.ones((n,), jnp.float32),
    )

    def body(carry, args):
        k, tl = args
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

        # Winner within this tile, then conditional-assign into the carry.
        # NO argmin: `argmin` + broadcast-compare triggers a pathological
        # XLA:TPU path on this runtime (minutes-long compiles + persistent
        # ~30ms dispatch degradation).  Instead: min + first-occurrence
        # one-hot (cumsum tie-break keeps the reference's earliest-index
        # tie rule, RayTracer.cpp:576-589) — pure VPU work.
        tile_t = jnp.min(t, axis=1)                              # [N]
        eq = (t == tile_t[:, None]).astype(jnp.float32)          # [N,T]
        onehot = (eq * (jnp.cumsum(eq, axis=1) == 1.0)) > 0.0    # first match

        def sel(x):  # [N,T] -> [N] value at the winning lane
            return jnp.sum(jnp.where(onehot, x, jnp.zeros_like(x)), axis=1)

        def sel_row(row):  # [T] table row -> [N]
            return sel(jnp.broadcast_to(row[None, :], onehot.shape))

        tile_arg = sel(jnp.broadcast_to(lane_f, onehot.shape))   # winner lane id

        better = tile_t < carry["t"]

        def upd(cur, new):
            return jnp.where(better, new, cur)

        new_carry = dict(
            t=upd(carry["t"], tile_t),
            idx=upd(carry["idx"],
                    (jnp.float32(k * tile) + tile_arg).astype(jnp.int32)),
            cx=upd(carry["cx"], sel(cx)),
            cy=upd(carry["cy"], sel(cy)),
            cz=upd(carry["cz"], sel(cz)),
            radius=upd(carry["radius"], sel_row(tl["radius"])),
            mat_id=upd(carry["mat_id"], sel_row(tl["mat_id"])),
            alr=upd(carry["alr"], sel_row(tl["alr"])),
            alg=upd(carry["alg"], sel_row(tl["alg"])),
            alb=upd(carry["alb"], sel_row(tl["alb"])),
            fuzz=upd(carry["fuzz"], sel_row(tl["fuzz"])),
            ior=upd(carry["ior"], sel_row(tl["ior"])),
        )
        return new_carry, None

    k_ids = jnp.arange(scene.padded_size // tile, dtype=jnp.int32)
    out, _ = jax.lax.scan(body, init, (k_ids, tiles))

    best_t = out["t"]
    hit = best_t < F32_MAX
    t_safe = jnp.where(hit, best_t, 0.0)
    point = origin + t_safe[:, None] * direction

    # normal = (point - center) / radius (RayTracer.cpp:531-533; signed
    # radius flips normals for the hollow-glass spheres).
    center = jnp.stack([out["cx"], out["cy"], out["cz"]], axis=-1)
    normal = (point - center) / out["radius"][:, None]

    return HitRecord(
        hit=hit, t=best_t, point=point, normal=normal, idx=out["idx"],
        mat_id=out["mat_id"],
        albedo=jnp.stack([out["alr"], out["alg"], out["alb"]], axis=-1),
        fuzz=out["fuzz"], ior=out["ior"],
    )
