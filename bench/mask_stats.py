#!/usr/bin/env python
"""Footprint-mask statistics on REAL mid-render states (TPU).

Questions this answers (all per-ray / per-block, no kernel timing):
1. How fast does the per-block active-tile union saturate with step index?
2. What's the per-RAY footprint tile-count distribution (are unions
   poisoned by a few long-footprint rays)?
3. What would cell-sorted lane order buy, at ray_block in {512, 2048},
   immediately after a sort and k steps later (decay)?
"""

import os
import sys
import time

_ROOT = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, _ROOT)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(_ROOT, ".jax_cache"))
from win32_raytracer_tpu._cache import enable_compile_cache

enable_compile_cache()  # env var alone is read-too-late (runtime notes #21)

import numpy as np
import jax
import jax.numpy as jnp

t0 = time.perf_counter()
np.asarray(jnp.ones((8,)) + 1)
print(f"# sync flip: {time.perf_counter() - t0:.1f}s", flush=True)

from win32_raytracer_tpu.config import RenderConfig
from win32_raytracer_tpu.kernels.dispatch import (
    get_hit_fn_rows, get_hit_fn_rows_accel,
)
from win32_raytracer_tpu.kernels.hit_pallas_v4 import (
    _hit_pallas_v4_raw, pack_rays_rows,
)
from win32_raytracer_tpu.persistent import (
    PathState, _COMPACT_FLOOR, _compact, _grid_size, _next_pow2,
    p_hit_step, p_respawn_step, p_scatter_respawn_step, _split,
)
from win32_raytracer_tpu.scene.builders import random_scene
from win32_raytracer_tpu.scene.camera import default_camera

W, H, SPP = 1200, 800, 100
cfg = RenderConfig(width=W, height=H, samples=SPP, seed=3,
                   rays_per_chunk=1 << 22).replace(seed=0)
gcfg = cfg.replace(accel="grid")  # force the GridScene (auto = brute now)
scene = random_scene()
cam = default_camera(W, H)
brute_fn = get_hit_fn_rows(cfg)
gscene, _ = get_hit_fn_rows_accel(gcfg, scene, cam)

kpp = 4
quota = SPP // kpp
key = jax.random.PRNGKey(3)
salt = np.uint32(0x12345)

boxes = np.asarray(gscene.tile_boxes)   # [T, 4]
y_slab = np.asarray(gscene.y_slab)
T = boxes.shape[0]


@jax.jit
def ray_boxes(origin, direction, t_cap):
    """Per-ray (x_min, x_max, z_min, z_max) footprint box, rows layout."""
    y_lo, y_hi = gscene.y_slab[0], gscene.y_slab[1]
    ox, oy, oz = origin[0], origin[1], origin[2]
    dx, dy, dz = direction[0], direction[1], direction[2]
    eps = np.float32(1e-12)
    dy_safe = jnp.where(jnp.abs(dy) < eps, jnp.where(dy < 0, -eps, eps), dy)
    ta = (y_lo - oy) / dy_safe
    tb = (y_hi - oy) / dy_safe
    lo_t = jnp.maximum(jnp.minimum(ta, tb), np.float32(0.001))
    hi_t = jnp.minimum(jnp.maximum(ta, tb), jnp.minimum(t_cap, 1e8))
    empty = lo_t > hi_t
    xa, xb = ox + lo_t * dx, ox + hi_t * dx
    za, zb = oz + lo_t * dz, oz + hi_t * dz
    big = np.float32(1e8)
    return (jnp.where(empty, big, jnp.minimum(xa, xb)),
            jnp.where(empty, -big, jnp.maximum(xa, xb)),
            jnp.where(empty, big, jnp.minimum(za, zb)),
            jnp.where(empty, -big, jnp.maximum(za, zb)))


@jax.jit
def per_ray_tiles(origin, direction, t_cap):
    """[N] int32: number of tiles each ray's own footprint overlaps."""
    x0, x1, z0, z1 = ray_boxes(origin, direction, t_cap)
    bx = gscene.tile_boxes
    ov = ((x0[:, None] <= bx[None, :, 1]) & (x1[:, None] >= bx[None, :, 0])
          & (z0[:, None] <= bx[None, :, 3]) & (z1[:, None] >= bx[None, :, 2]))
    return jnp.sum(ov, axis=1, dtype=jnp.int32)


@jax.jit
def t_cap_globals(origin, direction, time):
    rays_t = pack_rays_rows(origin, direction, time)
    t_g, _ = _hit_pallas_v4_raw(rays_t, gscene.glob_attrs, min_t=0.001,
                                ray_block=2048)
    return t_g[0]


def block_union_tiles(origin, direction, t_cap, rb):
    """Mean active tiles per rb-lane block, given per-ray boxes."""
    x0, x1, z0, z1 = (np.asarray(a) for a in ray_boxes(origin, direction,
                                                       t_cap))
    n = len(x0) // rb * rb
    x0 = x0[:n].reshape(-1, rb).min(1)
    x1 = x1[:n].reshape(-1, rb).max(1)
    z0 = z0[:n].reshape(-1, rb).min(1)
    z1 = z1[:n].reshape(-1, rb).max(1)
    ov = ((x0[:, None] <= boxes[None, :, 1]) & (x1[:, None] >= boxes[None, :, 0])
          & (z0[:, None] <= boxes[None, :, 3]) & (z1[:, None] >= boxes[None, :, 2]))
    return ov.sum(1).mean()


def cell_key(origin, direction, t_cap):
    """Sort key: footprint-center tile cell (big-footprint rays last)."""
    x0, x1, z0, z1 = (np.asarray(a) for a in ray_boxes(origin, direction,
                                                       t_cap))
    ntile = np.asarray(per_ray_tiles(origin, direction, t_cap))
    gx0, gx1 = boxes[:, 0].min(), boxes[:, 1].max()
    gz0, gz1 = boxes[:, 2].min(), boxes[:, 3].max()
    cx = np.clip((0.5 * (x0 + x1) - gx0) / max(gx1 - gx0, 1e-6) * 16, 0, 15)
    cz = np.clip((0.5 * (z0 + z1) - gz0) / max(gz1 - gz0, 1e-6) * 16, 0, 15)
    cell = cx.astype(np.int64) * 16 + cz.astype(np.int64)
    # Long-footprint rays (>6 tiles) and empty-footprint rays get parked in
    # their own buckets so they can't poison spatial blocks.
    cell = np.where(ntile > 6, 1 << 20, cell)
    cell = np.where(ntile == 0, (1 << 20) + 1, cell)
    return cell, ntile


def report(label, st):
    tc = t_cap_globals(st.origin, st.direction, st.time)
    ntile = np.asarray(per_ray_tiles(st.origin, st.direction, tc))
    alive = np.asarray(st.path_alive[0])
    a = ntile[alive]
    hist = [int((a == 0).sum()), int((a == 1).sum()),
            int(((a >= 2) & (a <= 3)).sum()),
            int(((a >= 4) & (a <= 6)).sum()), int((a > 6).sum())]
    u2048 = block_union_tiles(st.origin, st.direction, tc, 2048)
    u512 = block_union_tiles(st.origin, st.direction, tc, 512)
    # Cell-sorted order (alive only for fairness: dead lanes park at end).
    cell, _ = cell_key(st.origin, st.direction, tc)
    cell = np.where(alive, cell, (1 << 20) + 2)
    perm = np.argsort(cell, kind="stable")
    o_s = jnp.take(st.origin, jnp.asarray(perm), axis=1)
    d_s = jnp.take(st.direction, jnp.asarray(perm), axis=1)
    tc_s = jnp.take(tc, jnp.asarray(perm))
    s2048 = block_union_tiles(o_s, d_s, tc_s, 2048)
    s512 = block_union_tiles(o_s, d_s, tc_s, 512)
    print(f"{label:<26} alive={alive.mean()*100:5.1f}% "
          f"ntile[0/1/2-3/4-6/>6]={hist} "
          f"union2048={u2048:5.1f} union512={u512:5.1f} "
          f"sorted2048={s2048:5.1f} sorted512={s512:5.1f}", flush=True)
    return perm


# ---- build a chunk and walk it, reporting as we go ----
n = H * W * kpp
st = PathState(
    origin=jnp.zeros((3, n), jnp.float32),
    direction=jnp.zeros((3, n), jnp.float32).at[2, :].set(1.0),
    time=jnp.zeros((1, n), jnp.float32),
    throughput=jnp.ones((3, n), jnp.float32),
    radiance_sum=jnp.zeros((3, n), jnp.float32),
    depth=jnp.zeros((1, n), jnp.int32),
    sample=jnp.full((1, n), -1, jnp.int32),
    pixel=jnp.arange(0, n, dtype=jnp.int32)[None],
    path_alive=jnp.zeros((1, n), bool),
    s_base=(jnp.arange(n, dtype=jnp.int32) % kpp * quota)[None],
    s_quota=jnp.full((1, n), quota, jnp.int32),
)
st = p_respawn_step(cam, st, salt, jnp.int32(0), cfg=cfg,
                    width=W, height=H, spp=SPP, lanes_per_pixel=kpp)

step = 0
for k in range(13):
    if k in (0, 1, 2, 3, 4, 6, 8, 12):
        report(f"step {step}", st)
    step += 1
    rec, st = p_hit_step(scene, st, cfg=cfg, hit_fn=brute_fn)
    st = p_scatter_respawn_step(scene, cam, st, rec, salt,
                                jnp.int32(step), cfg=cfg, width=W, height=H,
                                spp=SPP, lanes_per_pixel=kpp)

# Decay after a cell sort: sort the live state, then step and re-measure.
print("# --- decay after cell-sort at step 13 ---", flush=True)
tc = t_cap_globals(st.origin, st.direction, st.time)
cell, _ = cell_key(st.origin, st.direction, tc)
cell = np.where(np.asarray(st.path_alive[0]), cell, (1 << 20) + 2)
perm = jnp.asarray(np.argsort(cell, kind="stable"))
st = PathState(*(jnp.take(getattr(st, f), perm, axis=1)
                 for f in PathState._fields))
for k in range(7):
    if k in (0, 1, 2, 4, 6):
        report(f"sorted +{k}", st)
    step += 1
    rec, st = p_hit_step(scene, st, cfg=cfg, hit_fn=brute_fn)
    st = p_scatter_respawn_step(scene, cam, st, rec, salt,
                                jnp.int32(step), cfg=cfg, width=W, height=H,
                                spp=SPP, lanes_per_pixel=kpp)
print("# done", flush=True)

# --- static sort: order lanes ONCE by their step-0 (primary-target) cell,
# then step WITHOUT re-sorting and watch the union (decay-free?) ---
print("# --- static step-0 target-cell sort ---", flush=True)
st = PathState(
    origin=jnp.zeros((3, n), jnp.float32),
    direction=jnp.zeros((3, n), jnp.float32).at[2, :].set(1.0),
    time=jnp.zeros((1, n), jnp.float32),
    throughput=jnp.ones((3, n), jnp.float32),
    radiance_sum=jnp.zeros((3, n), jnp.float32),
    depth=jnp.zeros((1, n), jnp.int32),
    sample=jnp.full((1, n), -1, jnp.int32),
    pixel=jnp.arange(0, n, dtype=jnp.int32)[None],
    path_alive=jnp.zeros((1, n), bool),
    s_base=(jnp.arange(n, dtype=jnp.int32) % kpp * quota)[None],
    s_quota=jnp.full((1, n), quota, jnp.int32),
)
st = p_respawn_step(cam, st, salt, jnp.int32(0), cfg=cfg,
                    width=W, height=H, spp=SPP, lanes_per_pixel=kpp)
tc = t_cap_globals(st.origin, st.direction, st.time)
cell, _ = cell_key(st.origin, st.direction, tc)
perm = jnp.asarray(np.argsort(cell, kind="stable"))
st = PathState(*(jnp.take(getattr(st, f), perm, axis=1)
                 for f in PathState._fields))
step = 0
for k in range(13):
    if k in (0, 1, 2, 4, 8, 12):
        report(f"static +{k}", st)
    step += 1
    rec, st = p_hit_step(scene, st, cfg=cfg, hit_fn=brute_fn)
    st = p_scatter_respawn_step(scene, cam, st, rec, salt,
                                jnp.int32(step), cfg=cfg, width=W, height=H,
                                spp=SPP, lanes_per_pixel=kpp)
print("# done static", flush=True)
