#!/usr/bin/env python
"""Compile-check the Pallas scatter+respawn kernel on the real TPU."""

import os
import sys

_ROOT = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, _ROOT)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(_ROOT, ".jax_cache"))
from win32_raytracer_tpu._cache import enable_compile_cache

enable_compile_cache()  # env var alone is read-too-late (runtime notes #21)

import numpy as np
import jax
import jax.numpy as jnp

np.asarray(jnp.ones((8,)) + 1)  # flip to sync mode

from win32_raytracer_tpu.config import RenderConfig
from win32_raytracer_tpu.kernels.scatter_pallas import scatter_respawn_pallas
from win32_raytracer_tpu.persistent import PathState
from win32_raytracer_tpu.ops.rows import HitRecordRows
from win32_raytracer_tpu.scene.builders import random_scene
from win32_raytracer_tpu.scene.camera import default_camera

W, H, SPP, KPP = 64, 32, 8, 2
n = H * W * KPP
cfg = RenderConfig(width=W, height=H, samples=SPP, lanes_per_pixel=KPP)
scene = random_scene()
cam = default_camera(W, H)
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
rec = HitRecordRows(
    hit=jnp.ones((1, n), bool),
    t=jnp.ones((1, n), jnp.float32),
    point=jnp.zeros((3, n), jnp.float32),
    normal=jnp.zeros((3, n), jnp.float32).at[1, :].set(1.0),
    idx=jnp.zeros((1, n), jnp.int32),
    mat_id=jnp.zeros((1, n), jnp.int32),
    albedo=jnp.full((3, n), 0.5, jnp.float32),
    fuzz=jnp.zeros((1, n), jnp.float32),
    ior=jnp.full((1, n), 1.5, jnp.float32),
)
out = scatter_respawn_pallas(scene, cam, st, rec, np.uint32(123),
                             jnp.int32(1), cfg=cfg, width=W, height=H,
                             spp=SPP, lanes_per_pixel=KPP, ray_block=2048)
print("alive:", int(out.path_alive.sum()), "sample mean:",
      float(out.sample.mean()))
print("OK")
