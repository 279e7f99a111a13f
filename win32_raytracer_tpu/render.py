"""Wavefront renderer core (single device).

The reference's recursive ``getColor`` (win32-raytracer/RayTracer.cpp:392-704,
depth-limited to MAX_RECURSION=10) becomes an iterative ``lax.fori_loop``
over bounce depth carrying ``(origin, direction, time, throughput, radiance,
alive)`` for a whole ``[N]`` ray batch — SURVEY.md §7's wavefront
formulation.  Termination semantics are preserved exactly:

* miss at depth <= max_depth -> sky gradient scaled by throughput
  (RayTracer.cpp:690-701);
* metal absorb -> black (RayTracer.cpp:625-628);
* still alive after depth max_depth -> black (``recurseDepth >
  MAX_RECURSION`` check, RayTracer.cpp:399-402) — i.e. max_depth+1 scatter
  events are allowed, matching the reference's ``++recurseDepth`` chain.

The per-tile pixel loop (``generateImage``, RayTracer.cpp:894-959) becomes
:func:`render_image`: pixel/sample lanes are flattened to ``[rows*W*spp]``
chunks, jitter/camera draws come from counter-based keys, and the final
mean -> sqrt-gamma -> u8 conversion matches RayTracer.cpp:946-954.
"""

from __future__ import annotations

import functools
from typing import Callable, Optional

import numpy as np

import jax
import jax.numpy as jnp

from .config import RenderConfig
from .core.materials import sky_color
from .core.rng import uniform01
from .ops.hit import hit_spheres
from .ops.scatter import scatter
from .scene.camera import Camera, camera_rays, default_camera
from .scene.spheres import SphereScene

HitFn = Callable[..., object]


def trace(
    scene: SphereScene,
    origin: jnp.ndarray,
    direction: jnp.ndarray,
    time: jnp.ndarray,
    key: jax.Array,
    cfg: RenderConfig,
    hit_fn: HitFn = hit_spheres,
) -> jnp.ndarray:
    """Trace [N] rays to completion; returns linear radiance [N, 3]."""
    n = origin.shape[0]
    state = (
        origin,
        direction,
        time,
        jnp.ones((n, 3), jnp.float32),   # throughput
        jnp.zeros((n, 3), jnp.float32),  # radiance
        jnp.ones((n,), bool),            # alive
    )

    def bounce(depth, st):
        o, d, tm, thr, rad, alive = st
        rec = hit_fn(scene, o, d, tm, min_t=cfg.min_hit_t)

        # Miss -> sky, weighted by current throughput (RayTracer.cpp:690-701).
        miss = alive & ~rec.hit
        rad = rad + jnp.where(miss[:, None], thr * sky_color(d), 0.0)

        if cfg.deterministic:
            draws = jnp.full((n, 5), 0.5, jnp.float32)
        else:
            draws = uniform01(jax.random.fold_in(key, depth), (n, 5))
        sc = scatter(scene, d, rec, draws, cfg)

        live_hit = alive & rec.hit
        thr = jnp.where(live_hit[:, None], thr * sc.attenuation, thr)
        o = jnp.where(live_hit[:, None], sc.origin, o)
        d = jnp.where(live_hit[:, None], sc.direction, d)
        alive = live_hit & sc.alive

        if cfg.russian_roulette:
            p = jnp.clip(jnp.max(thr, axis=-1), 0.05, 1.0)
            rr_on = alive & (depth >= cfg.rr_start_depth)
            survive = draws[:, 4] < p
            thr = jnp.where(rr_on[:, None], thr / p[:, None], thr)
            alive = alive & jnp.where(rr_on, survive, True)

        return (o, d, tm, thr, rad, alive)

    # max_depth+1 scatter events (depths 0..max_depth); survivors are black.
    state = jax.lax.fori_loop(0, cfg.max_depth + 1, bounce, state)
    return state[4]


@functools.partial(
    jax.jit, static_argnames=("cfg", "width", "height", "spp", "rows", "hit_fn")
)
def _render_rows(
    scene: SphereScene,
    cam: Camera,
    y0: jnp.ndarray,
    key: jax.Array,
    *,
    cfg: RenderConfig,
    width: int,
    height: int,
    spp: int,
    rows: int,
    hit_fn: HitFn = hit_spheres,
) -> jnp.ndarray:
    """Render ``rows`` image rows starting at global row ``y0``.

    Returns linear (pre-gamma) per-pixel mean radiance [rows, width, 3].
    """
    n = rows * width * spp
    lane = jnp.arange(n, dtype=jnp.int32)
    y = y0 + lane // (width * spp)
    x = (lane // spp) % width

    if cfg.deterministic:
        # Pixel centers, shutter-open time, fixed lens draw (pair with
        # aperture=0 for oracle-exact renders).
        draws = jnp.full((n, 5), 0.5, jnp.float32)
        draws = draws.at[:, 2].set(0.0)
    else:
        ckey = jax.random.fold_in(key, 0)
        draws = uniform01(ckey, (n, 5))
    # Pixel jitter (RayTracer.cpp:941-943): u=(x+r0)/W, v=(H-y+r1)/H — note
    # the reference's y-flip uses H-y, not H-1-y.
    u = (x.astype(jnp.float32) + draws[:, 0]) / width
    v = ((height - y).astype(jnp.float32) + draws[:, 1]) / height

    o, d, tm = camera_rays(cam, u, v, draws[:, 2:5])
    tkey = jax.random.fold_in(key, 1)
    radiance = trace(scene, o, d, tm, tkey, cfg, hit_fn=hit_fn)
    return radiance.reshape(rows, width, spp, 3).mean(axis=2)


def render_image(
    scene: SphereScene,
    cam: Optional[Camera],
    cfg: RenderConfig,
    hit_fn: HitFn = hit_spheres,
) -> jnp.ndarray:
    """Render the full image; returns linear radiance [H, W, 3] f32.

    Rows are processed in fixed-size chunks (bounding wavefront memory); the
    per-chunk RNG key is folded with the chunk's global start row so the
    image is deterministic for a given (seed, chunk size).
    """
    w, h, spp = cfg.width, cfg.height, cfg.samples
    rows = max(1, min(h, cfg.rays_per_chunk // max(1, w * spp)))
    key = jax.random.PRNGKey(cfg.seed)

    out = []
    for y0 in range(0, h, rows):
        ckey = jax.random.fold_in(key, y0)
        block = _render_rows(
            scene, cam, jnp.int32(y0), ckey,
            cfg=cfg, width=w, height=h, spp=spp, rows=rows, hit_fn=hit_fn,
        )
        take = min(rows, h - y0)
        out.append(block[:take] if take < rows else block)
    return jnp.concatenate(out, axis=0)


def tonemap(linear: jnp.ndarray) -> jnp.ndarray:
    """Gamma-2 + u8 quantization (RayTracer.cpp:948-954)."""
    c = jnp.sqrt(jnp.maximum(linear, 0.0))
    return jnp.clip(jnp.floor(255.99 * c), 0.0, 255.0).astype(jnp.uint8)


def render(
    scene: SphereScene,
    cam: Optional[Camera] = None,
    cfg: Optional[RenderConfig] = None,
    hit_fn: HitFn = hit_spheres,
) -> np.ndarray:
    """Render to a u8 [H, W, 3] image (top row first, like the reference)."""
    cfg = cfg or RenderConfig()
    if cam is None:
        cam = default_camera(cfg.width, cfg.height)
    linear = render_image(scene, cam, cfg, hit_fn=hit_fn)
    return np.asarray(tonemap(linear))
