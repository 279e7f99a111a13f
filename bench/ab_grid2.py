#!/usr/bin/env python
"""A/B #2: headline renders with grid hit at ray_block in {2048,1024,512},
brute as control — interleaved in one process.
"""

import functools
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
from win32_raytracer_tpu.kernels.hit_grid_rows import hit_spheres_grid_rows
from win32_raytracer_tpu.persistent import render_image_persistent
from win32_raytracer_tpu.scene.builders import random_scene
from win32_raytracer_tpu.scene.camera import default_camera

W, H, SPP = 1200, 800, 100
cfg = RenderConfig(width=W, height=H, samples=SPP, seed=3,
                   rays_per_chunk=1 << 22)
scene = random_scene()
cam = default_camera(W, H)

brute_fn = get_hit_fn_rows(cfg)
gscene, _ = get_hit_fn_rows_accel(cfg.replace(accel="grid"), scene, cam)

variants = [("brute", scene, brute_fn)]
for rb in (2048, 1024, 512):
    variants.append((f"grid{rb}", gscene,
                     functools.partial(hit_spheres_grid_rows, ray_block=rb)))


def run(label, sc, fn):
    t0 = time.perf_counter()
    img = render_image_persistent(sc, cam, cfg, hit_fn=fn)
    img.block_until_ready()
    dt = time.perf_counter() - t0
    print(f"{label:>9}: {dt:.2f}s = {W*H*SPP/dt/1e6:.1f} Mrays/s "
          f"(mean {float(img.mean()):.4f})", flush=True)


for label, sc, fn in variants:
    run("warm " + label, sc, fn)
for rep in range(2):
    for label, sc, fn in variants:
        run(f"{label}[{rep}]", sc, fn)
