#!/usr/bin/env python
"""Phase-level profile of the persistent scheduler at the headline config.

Replicates render_image_persistent's driver loop with wall-clock
instrumentation: per-period step time, alive trajectory, compaction cost.
Run on the TPU (no JAX_PLATFORMS override).
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

np.asarray(jnp.ones((8,)) + 1)  # flip axon relay to sync mode

from win32_raytracer_tpu.config import RenderConfig
from win32_raytracer_tpu.persistent import (
    PathState, p_hit_step, p_scatter_respawn_step, p_respawn_step, _compact,
    _grid_size, _COMPACT_FLOOR, p_bounce_step, _split, _next_pow2)
from win32_raytracer_tpu.kernels.dispatch import get_hit_fn_rows
from win32_raytracer_tpu.scene.builders import random_scene
from win32_raytracer_tpu.scene.camera import default_camera

W, H, SPP = 1200, 800, 100
cfg = RenderConfig(width=W, height=H, samples=SPP, seed=3,
                   rays_per_chunk=1 << 22).replace(seed=0)
scene = random_scene()
cam = default_camera(W, H)
hit_fn = get_hit_fn_rows(cfg)

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

print(f"# kpp={kpp} rows/chunk={rows} chunks={-(-H // rows)} "
      f"max_steps={max_steps}")

from win32_raytracer_tpu.persistent import render_image_persistent

t0 = time.perf_counter()
render_image_persistent(scene, cam, cfg.replace(seed=0)).block_until_ready()
print(f"# warm-up render: {time.perf_counter() - t0:.1f}s")

accum = jnp.zeros((3, H * W), jnp.float32)
t_total = time.perf_counter()
lane_steps = 0          # sum of batch_size over executed steps
step_time_by_size = {}  # batch_size -> [steps, seconds]
compact_s = 0.0
sync_s = 0.0
n_compacts = 0
total_steps = 0

for y0 in range(0, H, rows):
    take = min(rows, H - y0)
    n = take * W * kpp
    salt = np.uint32((3 * 0x9E3779B1 ^ (y0 + 1) * 0x85EBCA77) & 0xFFFFFFFF)
    st = PathState(
        origin=jnp.zeros((3, n), jnp.float32),
        direction=jnp.zeros((3, n), jnp.float32).at[2, :].set(1.0),
        time=jnp.zeros((1, n), jnp.float32),
        throughput=jnp.ones((3, n), jnp.float32),
        radiance_sum=jnp.zeros((3, n), jnp.float32),
        depth=jnp.zeros((1, n), jnp.int32),
        sample=jnp.full((1, n), -1, jnp.int32),
        pixel=jnp.arange(y0 * W * kpp, (y0 + take) * W * kpp,
                         dtype=jnp.int32)[None],
        path_alive=jnp.zeros((1, n), bool),
        s_base=(jnp.arange(n, dtype=jnp.int32) % kpp * (SPP // kpp))[None],
        s_quota=jnp.full((1, n), SPP // kpp, jnp.int32),
    )
    step = 0
    st = p_respawn_step(cam, st, salt, jnp.int32(step), cfg=cfg,
                        width=W, height=H, spp=SPP, lanes_per_pixel=kpp)
    period = check_period
    last_alive = n
    while step < max_steps:
        next_check = first_check if step < first_check else (step + period)
        budget = min(next_check, max_steps) - step
        cur = st.pixel.shape[1]
        fuse = cur < _COMPACT_FLOOR
        t0 = time.perf_counter()
        for _ in range(budget):
            step += 1
            if fuse:
                st = p_bounce_step(scene, cam, st, salt, jnp.int32(step),
                                   cfg=cfg, hit_fn=hit_fn, width=W, height=H,
                                   spp=SPP, lanes_per_pixel=kpp)
            else:
                rec, st = p_hit_step(scene, st, cfg=cfg, hit_fn=hit_fn)
                st = p_scatter_respawn_step(scene, cam, st, rec, salt,
                                            jnp.int32(step), cfg=cfg,
                                            width=W, height=H, spp=SPP,
                                            lanes_per_pixel=kpp)
        st.path_alive.block_until_ready()
        dt = time.perf_counter() - t0
        e = step_time_by_size.setdefault(cur, [0, 0.0])
        e[0] += budget
        e[1] += dt
        lane_steps += cur * budget
        total_steps += budget
        t0 = time.perf_counter()
        n_alive = int(jnp.sum(st.path_alive))
        sync_s += time.perf_counter() - t0
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
                t0 = time.perf_counter()
                st, accum = _compact(st, accum, k_new=k_new, lanes_per_pixel=kpp)
                st = _split(st)
                jax.tree.leaves(st)[0].block_until_ready()
                compact_s += time.perf_counter() - t0
                n_compacts += 1
            continue
        k_new = _grid_size(n_alive, min_lanes)
        if k_new <= int(cur * 0.7):
            t0 = time.perf_counter()
            st, accum = _compact(st, accum, k_new=k_new, lanes_per_pixel=kpp)
            accum.block_until_ready()
            compact_s += time.perf_counter() - t0
            n_compacts += 1
    accum = accum.at[:, st.pixel[0] // kpp].add(st.radiance_sum)

img = (accum / SPP).T.reshape(H, W, 3)
img.block_until_ready()
total = time.perf_counter() - t_total

print(f"# total {total:.2f}s  steps={total_steps}  lane-steps={lane_steps/1e6:.0f}M")
print(f"# compactions: {n_compacts} x -> {compact_s:.2f}s; alive-syncs {sync_s:.2f}s")
print("# batch_size steps seconds ms/step us/lane-step")
for sz in sorted(step_time_by_size, reverse=True):
    cnt, sec = step_time_by_size[sz]
    print(f"{sz:>9} {cnt:>5} {sec:8.2f} {1e3 * sec / cnt:8.2f} "
          f"{1e9 * sec / (cnt * sz):8.1f}n")
print(f"# image mean {float(img.mean()):.4f}")
