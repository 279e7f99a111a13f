"""Persistent wavefront scheduler.

The fixed-depth wavefront (render.py) retires lanes as their paths end, so
by depth 5+ most of the batch is dead weight — the SPMD analogue of the
reference's observation that some image regions are far more expensive than
others (win32-raytracer/RayTracer.cpp:973-978).  This scheduler instead
pins one lane per *pixel* and runs that pixel's samples sequentially: the
moment a path terminates (sky, metal absorb, depth exhaustion) the lane
immediately respawns the next camera sample.  Lanes idle only in the final
tail, so utilization tracks the mean path length instead of the worst case
(~3x less work on the RTIOW final scene at depth 10).

Semantics are identical to the reference recursion: hit tests happen at
recursion levels 0..max_depth (RayTracer.cpp:399-402); a miss at any level
adds throughput-weighted sky (RayTracer.cpp:690-701); a path still alive
after its level-max_depth scatter contributes black.

The step programs (hit / scatter / respawn) are three small jits driven and
pipelined from Python, with one device sync per ``check_period`` steps to
test all-done — the same small-program discipline as render.py
(docs/axon_runtime_notes.md).
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import numpy as np

import jax
import jax.numpy as jnp

from .config import RenderConfig
from .core.materials import sky_color
from .core.rng import uniform01
from .ops.hit import hit_spheres
from .ops.scatter import scatter
from .render import HitFn, tonemap
from .scene.camera import Camera, camera_rays, default_camera
from .scene.spheres import SphereScene


class PathState(NamedTuple):
    origin: jnp.ndarray        # [N, 3]
    direction: jnp.ndarray     # [N, 3]
    time: jnp.ndarray          # [N]
    throughput: jnp.ndarray    # [N, 3]
    radiance_sum: jnp.ndarray  # [N, 3] — summed over completed samples
    depth: jnp.ndarray         # [N] i32 — recursion level of the next hit
    sample: jnp.ndarray        # [N] i32 — current sample index (-1 = none)
    path_alive: jnp.ndarray    # [N] bool


@functools.partial(jax.jit, static_argnames=("cfg", "hit_fn"))
def p_hit_step(scene: SphereScene, st: PathState, *, cfg: RenderConfig,
               hit_fn: HitFn = hit_spheres):
    rec = hit_fn(scene, st.origin, st.direction, st.time,
                 min_t=cfg.min_hit_t)
    miss = st.path_alive & ~rec.hit
    rad = st.radiance_sum + jnp.where(
        miss[:, None], st.throughput * sky_color(st.direction), 0.0)
    return rec, st._replace(radiance_sum=rad,
                            path_alive=st.path_alive & rec.hit)


@functools.partial(jax.jit, static_argnames=("cfg",))
def p_scatter_step(scene: SphereScene, st: PathState, rec, key: jax.Array,
                   step_i: jnp.ndarray, *, cfg: RenderConfig) -> PathState:
    n = st.origin.shape[0]
    draws = uniform01(jax.random.fold_in(key, step_i), (n, 5))
    sc = scatter(scene, st.direction, rec, draws, cfg)

    live = st.path_alive  # already restricted to hits by p_hit_step
    thr = jnp.where(live[:, None], st.throughput * sc.attenuation,
                    st.throughput)
    o = jnp.where(live[:, None], sc.origin, st.origin)
    d = jnp.where(live[:, None], sc.direction, st.direction)
    depth = jnp.where(live, st.depth + 1, st.depth)
    alive = live & sc.alive & (depth <= cfg.max_depth)

    if cfg.russian_roulette:
        p = jnp.clip(jnp.max(thr, axis=-1), 0.05, 1.0)
        rr_on = alive & (depth >= cfg.rr_start_depth)
        survive = draws[:, 4] < p
        thr = jnp.where(rr_on[:, None], thr / p[:, None], thr)
        alive = alive & jnp.where(rr_on, survive, True)

    return st._replace(origin=o, direction=d, throughput=thr, depth=depth,
                       path_alive=alive)


@functools.partial(
    jax.jit, static_argnames=("cfg", "width", "height", "spp", "rows"))
def p_respawn_step(cam: Camera, st: PathState, y0: jnp.ndarray,
                   key: jax.Array, step_i: jnp.ndarray, *,
                   cfg: RenderConfig, width: int, height: int, spp: int,
                   rows: int) -> PathState:
    """Start the next camera sample on every lane whose path just ended."""
    n = rows * width
    lane = jnp.arange(n, dtype=jnp.int32)
    y = y0 + lane // width
    x = lane % width

    start = ~st.path_alive & (st.sample < spp - 1)
    new_sample = jnp.where(start, st.sample + 1, st.sample)

    draws = uniform01(jax.random.fold_in(key, step_i), (n, 5))
    u_j, v_j = draws[:, 0], draws[:, 1]
    if cfg.stratify:
        k = int(np.sqrt(spp))
        if k * k == spp and k > 1:
            sx = (new_sample % k).astype(jnp.float32)
            sy = ((new_sample // k) % k).astype(jnp.float32)
            u_j = (sx + u_j) / k
            v_j = (sy + v_j) / k
    # Pixel mapping as RayTracer.cpp:941-943 (u=(x+r0)/W, v=(H-y+r1)/H).
    u = (x.astype(jnp.float32) + u_j) / width
    v = ((height - y).astype(jnp.float32) + v_j) / height
    o, d, tm = camera_rays(cam, u, v, draws[:, 2:5])

    s = start[:, None]
    return st._replace(
        origin=jnp.where(s, o, st.origin),
        direction=jnp.where(s, d, st.direction),
        time=jnp.where(start, tm, st.time),
        throughput=jnp.where(s, 1.0, st.throughput),
        depth=jnp.where(start, 0, st.depth),
        sample=new_sample,
        path_alive=st.path_alive | start,
    )


def render_image_persistent(
    scene: SphereScene,
    cam: Optional[Camera],
    cfg: RenderConfig,
    hit_fn: HitFn = hit_spheres,
) -> jnp.ndarray:
    """Render the full image; returns linear radiance [H, W, 3] f32."""
    if cam is None:
        cam = default_camera(cfg.width, cfg.height)
    w, h, spp = cfg.width, cfg.height, cfg.samples
    rows = max(1, min(h, cfg.rays_per_chunk // max(1, w)))
    key = jax.random.PRNGKey(cfg.seed)
    check_period = cfg.check_period or max(8, spp)
    # Hard upper bound: every sample could run the full depth budget.
    max_steps = spp * (cfg.max_depth + 2)

    out = []
    for y0 in range(0, h, rows):
        n = rows * w
        ckey = jax.random.fold_in(key, y0)
        rkey = jax.random.fold_in(ckey, 1)
        skey = jax.random.fold_in(ckey, 2)
        st = PathState(
            origin=jnp.zeros((n, 3), jnp.float32),
            direction=jnp.zeros((n, 3), jnp.float32).at[:, 2].set(1.0),
            time=jnp.zeros((n,), jnp.float32),
            throughput=jnp.ones((n, 3), jnp.float32),
            radiance_sum=jnp.zeros((n, 3), jnp.float32),
            depth=jnp.zeros((n,), jnp.int32),
            sample=jnp.full((n,), -1, jnp.int32),
            path_alive=jnp.zeros((n,), bool),
        )
        step = 0
        st = p_respawn_step(cam, st, jnp.int32(y0), rkey, jnp.int32(step),
                            cfg=cfg, width=w, height=h, spp=spp, rows=rows)
        while step < max_steps:
            budget = min(check_period, max_steps - step)
            for _ in range(budget):
                step += 1
                rec, st = p_hit_step(scene, st, cfg=cfg, hit_fn=hit_fn)
                st = p_scatter_step(scene, st, rec, skey, jnp.int32(step),
                                    cfg=cfg)
                st = p_respawn_step(cam, st, jnp.int32(y0), rkey,
                                    jnp.int32(step), cfg=cfg, width=w,
                                    height=h, spp=spp, rows=rows)
            if not bool(jnp.any(st.path_alive)):  # one sync per period
                break
        block = (st.radiance_sum / spp).reshape(rows, w, 3)
        take = min(rows, h - y0)
        out.append(block[:take] if take < rows else block)
    return jnp.concatenate(out, axis=0)
