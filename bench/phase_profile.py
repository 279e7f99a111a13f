#!/usr/bin/env python
"""Phase-level A/B of hit variants on REAL mid-render wavefront states.

Drives the persistent loop at the headline config, snapshotting the lane
state at the start and after every compaction; then, per snapshot, times
pipelined reps of (brute v4 hit | grid hit | scatter+respawn) and reports
the footprint mask's active-tile stats.  All interleaved in one process
(docs/axon_runtime_notes.md rule 12).
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
from win32_raytracer_tpu.kernels.hit_grid_rows import (
    footprint_block_mask_rows,
)
from win32_raytracer_tpu.kernels.hit_pallas_v4 import _hit_pallas_v4_raw, pack_rays_rows
from win32_raytracer_tpu.persistent import (
    PathState, _COMPACT_FLOOR, _compact, _grid_size, _next_pow2,
    p_hit_step, p_respawn_step, p_scatter_respawn_step, _split,
)
from win32_raytracer_tpu.scene.builders import random_scene
from win32_raytracer_tpu.scene.camera import default_camera

W, H, SPP = 1200, 800, 100
cfg = RenderConfig(width=W, height=H, samples=SPP, seed=3,
                   rays_per_chunk=1 << 22).replace(seed=0)
scene = random_scene()
cam = default_camera(W, H)
brute_fn = get_hit_fn_rows(cfg)
gscene, grid_fn = get_hit_fn_rows_accel(cfg.replace(accel="grid"), scene, cam)
assert gscene is not scene, "grid accel must resolve on TPU"

kpp = 1
for cand in (8, 4, 2):
    if SPP % cand == 0 and SPP // cand >= 4:
        kpp = cand
        break
rows = max(1, min(H, cfg.rays_per_chunk // (W * kpp)))
quota = SPP // kpp
check_period = cfg.check_period or 8
first_check = quota + 2
max_steps = (quota + 1) * (cfg.max_depth + 2)
min_lanes = 1 << 12
key = jax.random.PRNGKey(3)
print(f"# kpp={kpp} rows/chunk={rows} quota={quota} tiles={gscene.n_tiles} "
      f"tile_rows={gscene.tile_rows}", flush=True)

# ---- drive one chunk, snapshot states ----
snapshots = []  # (label, PathState)
y0 = 0
take = min(rows, H - y0)
n = take * W * kpp
salt = np.uint32(0x54321)
st = PathState(
    origin=jnp.zeros((3, n), jnp.float32),
    direction=jnp.zeros((3, n), jnp.float32).at[2, :].set(1.0),
    time=jnp.zeros((1, n), jnp.float32),
    throughput=jnp.ones((3, n), jnp.float32),
    radiance_sum=jnp.zeros((3, n), jnp.float32),
    depth=jnp.zeros((1, n), jnp.int32),
    sample=jnp.full((1, n), -1, jnp.int32),
    pixel=jnp.arange(y0 * W * kpp, (y0 + take) * W * kpp, dtype=jnp.int32)[None],
    path_alive=jnp.zeros((1, n), bool),
    s_base=(jnp.arange(n, dtype=jnp.int32) % kpp * quota)[None],
    s_quota=jnp.full((1, n), quota, jnp.int32),
)
accum = jnp.zeros((3, H * W), jnp.float32)
step = 0
st = p_respawn_step(cam, st, salt, jnp.int32(step), cfg=cfg,
                    width=W, height=H, spp=SPP, lanes_per_pixel=kpp)
snapshots.append((f"primary n={n}", st, 0))
period = check_period
last_alive = n
t_render = time.perf_counter()
n_steps_by_size = {}
while step < max_steps:
    next_check = first_check if step < first_check else (step + period)
    budget = min(next_check, max_steps) - step
    cur = st.pixel.shape[1]
    for _ in range(budget):
        step += 1
        rec, st = p_hit_step(scene, st, cfg=cfg, hit_fn=brute_fn)
        st = p_scatter_respawn_step(scene, cam, st, rec, salt,
                                    jnp.int32(step), cfg=cfg, width=W,
                                    height=H, spp=SPP, lanes_per_pixel=kpp)
    n_steps_by_size[cur] = n_steps_by_size.get(cur, 0) + budget
    n_alive = int(jnp.sum(st.path_alive))
    if n_alive == 0:
        break
    if cur < _COMPACT_FLOOR:
        period = 32
    elif n_alive > 0.9 * last_alive:
        period = min(period * 2, 32)
    else:
        period = check_period
    last_alive = n_alive
    if cur <= _COMPACT_FLOOR:
        k_new = max(min_lanes, _next_pow2(n_alive))
        if k_new <= cur // 2:
            st, accum = _compact(st, accum, k_new=k_new, lanes_per_pixel=kpp)
            st = _split(st)
            snapshots.append((f"post-split n={st.pixel.shape[1]} "
                              f"step={step}", st, step))
        continue
    k_new = _grid_size(n_alive, min_lanes)
    if k_new <= int(cur * 0.55):
        st, accum = _compact(st, accum, k_new=k_new, lanes_per_pixel=kpp)
        snapshots.append((f"post-compact n={k_new} step={step} "
                          f"alive={n_alive}", st, step))
print(f"# brute render (1 chunk): {time.perf_counter() - t_render:.2f}s, "
      f"{step} steps", flush=True)
print(f"# steps by size: {sorted(n_steps_by_size.items(), reverse=True)}",
      flush=True)

REPS = 16


def timeit(fn, *args, reps=REPS, **kw):
    out = None
    for _ in range(reps):
        out = fn(*args, **kw)
    jax.tree.leaves(out)[0].block_until_ready()
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args, **kw)
    jax.tree.leaves(out)[0].block_until_ready()
    return (time.perf_counter() - t0) / reps


print("#\n# label | n | alive% | act.tiles/blk | brute-hit ms | grid-hit ms "
      "| scat+resp ms", flush=True)
for label, s, stp in snapshots:
    nn = s.pixel.shape[1]
    alive = float(jnp.mean(s.path_alive)) * 100
    # Mask stats (one-off, not timed).
    rays_t = pack_rays_rows(s.origin, s.direction, s.time)
    pad = (-nn) % 2048
    if pad:
        filler = (jnp.zeros((8, pad), jnp.float32)
                  .at[1, :].set(-1e9).at[5, :].set(1.0).at[7, :].set(1.0))
        rays_t = jnp.concatenate([rays_t, filler], axis=1)
    t_g, _ = _hit_pallas_v4_raw(rays_t, gscene.glob_attrs, min_t=0.001,
                                ray_block=2048)
    mask = footprint_block_mask_rows(gscene, rays_t[0:3], rays_t[3:6], t_g,
                                     0.001, 2048)
    act = float(jnp.mean(jnp.sum(mask, axis=1)))

    tb = timeit(p_hit_step, scene, s, cfg=cfg, hit_fn=brute_fn)
    tg = timeit(p_hit_step, gscene, s, cfg=cfg, hit_fn=grid_fn)
    rec, s2 = p_hit_step(scene, s, cfg=cfg, hit_fn=brute_fn)
    ts = timeit(p_scatter_respawn_step, scene, cam, s2, rec, salt,
                jnp.int32(stp + 1), cfg=cfg, width=W, height=H, spp=SPP,
                lanes_per_pixel=kpp)
    print(f"{label:<34} {nn:>8} {alive:5.1f}% {act:7.1f}/{gscene.n_tiles} "
          f"{1e3 * tb:8.2f} {1e3 * tg:8.2f} {1e3 * ts:8.2f}", flush=True)
