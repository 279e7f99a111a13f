#!/usr/bin/env python
"""Hit vs scatter split of the CURRENT production bounce step.

Builds the real initial headline batch (1200x800@100spp, kpp=4 ->
3.84M lanes), runs a few bounces to a representative mixed state, then
times pipelined reps of (grid hit alone | pallas scatter alone | full
bounce) interleaved in one process (docs/axon_runtime_notes.md rule 12).
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
from win32_raytracer_tpu.kernels.dispatch import get_hit_fn_rows_accel
from win32_raytracer_tpu.kernels.scatter_pallas import scatter_respawn_pallas
from win32_raytracer_tpu.persistent import (
    PathState, p_hit_step, p_respawn_step, p_scatter_respawn_step,
)
from win32_raytracer_tpu.scene.builders import random_scene
from win32_raytracer_tpu.scene.camera import default_camera

W, H, SPP, KPP = 1200, 800, 100, 4
cfg = RenderConfig(width=W, height=H, samples=SPP, seed=0,
                   lanes_per_pixel=KPP)
scene0 = random_scene()
cam = default_camera(W, H)
scene, hit_fn = get_hit_fn_rows_accel(cfg, scene0, cam)

n = H * W * KPP
quota = SPP // KPP
st = PathState(
    origin=jnp.zeros((3, n), jnp.float32),
    direction=jnp.zeros((3, n), jnp.float32).at[2, :].set(1.0),
    time=jnp.zeros((1, n), jnp.float32),
    throughput=jnp.ones((3, n), jnp.float32),
    radiance_sum=jnp.zeros((3, n), jnp.float32),
    depth=jnp.zeros((1, n), jnp.int32),
    sample=jnp.full((1, n), -1, jnp.int32),
    pixel=jnp.arange(n, dtype=jnp.int32)[None],
    path_alive=jnp.zeros((1, n), bool),
    s_base=(jnp.arange(n, dtype=jnp.int32) % KPP * quota)[None],
    s_quota=jnp.full((1, n), quota, jnp.int32),
)
salt = np.uint32(0xBEEF)
st = p_respawn_step(cam, st, salt, jnp.int32(0), cfg=cfg, width=W, height=H,
                    spp=SPP, lanes_per_pixel=KPP)
for k in (1, 2, 3):
    rec, st = p_hit_step(scene, st, cfg=cfg, hit_fn=hit_fn)
    st = scatter_respawn_pallas(scene, cam, st, rec, salt, jnp.int32(k),
                                cfg=cfg, width=W, height=H, spp=SPP,
                                lanes_per_pixel=KPP)
st.origin.block_until_ready()
rec, _ = p_hit_step(scene, st, cfg=cfg, hit_fn=hit_fn)
rec.t.block_until_ready()
print(f"# state ready: {n/1e6:.2f}M lanes, "
      f"{int(st.path_alive.sum())/1e6:.2f}M alive", flush=True)

REPS = 20


def timed(label, fn):
    for trial in range(3):
        t0 = time.perf_counter()
        out = None
        for _ in range(REPS):
            out = fn()
        jax.tree_util.tree_leaves(out)[0].block_until_ready()
        dt = (time.perf_counter() - t0) / REPS * 1e3
        print(f"{label:>14}[{trial}]: {dt:7.2f} ms/step", flush=True)


timed("hit", lambda: p_hit_step(scene, st, cfg=cfg, hit_fn=hit_fn))
timed("scat_pallas", lambda: scatter_respawn_pallas(
    scene, cam, st, rec, salt, jnp.int32(9), cfg=cfg, width=W, height=H,
    spp=SPP, lanes_per_pixel=KPP))
timed("scat_jnp", lambda: p_scatter_respawn_step(
    scene, cam, st, rec, salt, jnp.int32(9), cfg=cfg, width=W, height=H,
    spp=SPP, lanes_per_pixel=KPP))


def bounce():
    r, s = p_hit_step(scene, st, cfg=cfg, hit_fn=hit_fn)
    return scatter_respawn_pallas(scene, cam, s, r, salt, jnp.int32(9),
                                  cfg=cfg, width=W, height=H, spp=SPP,
                                  lanes_per_pixel=KPP)


timed("bounce", bounce)
