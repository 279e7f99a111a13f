#!/usr/bin/env python
"""A/B: scatter_backend (pallas kernel vs XLA row math), interleaved
full renders at the headline config in ONE process (rule 12)."""

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

cfgs = {sb: RenderConfig(width=W, height=H, samples=SPP, seed=3,
                         lanes_per_pixel=4, rays_per_chunk=W * H * 4,
                         scatter_backend=sb)
        for sb in ("jnp", "pallas")}


def run(label, cfg):
    t0 = time.perf_counter()
    img = render_image_persistent(scene, cam, cfg)
    img.block_until_ready()
    dt = time.perf_counter() - t0
    print(f"{label:>12}: {dt:.2f}s = {W*H*SPP/dt/1e6:.1f} Mrays/s "
          f"(mean {float(img.mean()):.4f})", flush=True)


for sb, cfg in cfgs.items():
    run(f"warm {sb}", cfg)
for rep in range(3):
    for sb, cfg in cfgs.items():
        run(f"{sb}[{rep}]", cfg)
