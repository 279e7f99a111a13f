#!/usr/bin/env python
"""A/B: lanes_per_pixel (tail shaping) at the headline config, one chunk."""

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
from win32_raytracer_tpu.persistent import render_image_persistent
from win32_raytracer_tpu.scene.builders import random_scene
from win32_raytracer_tpu.scene.camera import default_camera

W, H, SPP = 1200, 800, 100
scene = random_scene()
cam = default_camera(W, H)

KPPS = [4, 10, 20]


def run(label, cfg):
    t0 = time.perf_counter()
    img = render_image_persistent(scene, cam, cfg)
    img.block_until_ready()
    dt = time.perf_counter() - t0
    print(f"{label:>9}: {dt:.2f}s = {W*H*SPP/dt/1e6:.1f} Mrays/s "
          f"(mean {float(img.mean()):.4f})", flush=True)


cfgs = {k: RenderConfig(width=W, height=H, samples=SPP, seed=3,
                        lanes_per_pixel=k, rays_per_chunk=W * H * k)
        for k in KPPS}
for k in KPPS:
    run(f"warm k{k}", cfgs[k])
for rep in range(2):
    for k in KPPS:
        run(f"k{k}[{rep}]", cfgs[k])
