#!/usr/bin/env python
"""A/B: persistent scheduler with brute v4 hit vs grid-rows hit (TPU).

Interleaved in one process (docs/axon_runtime_notes.md rule 12): warm both,
then time brute, grid, brute, grid at the headline config.
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
np.asarray(jnp.ones((8,)) + 1)  # flip axon relay to sync mode
print(f"# sync flip: {time.perf_counter() - t0:.1f}s", flush=True)

from win32_raytracer_tpu.config import RenderConfig
from win32_raytracer_tpu.kernels.dispatch import (
    get_hit_fn_rows, get_hit_fn_rows_accel,
)
from win32_raytracer_tpu.persistent import render_image_persistent
from win32_raytracer_tpu.scene.builders import random_scene
from win32_raytracer_tpu.scene.camera import default_camera

W, H, SPP = 1200, 800, 100
cfg = RenderConfig(width=W, height=H, samples=SPP, seed=3,
                   rays_per_chunk=1 << 22)
scene = random_scene()
cam = default_camera(W, H)

brute_fn = get_hit_fn_rows(cfg)
gscene, grid_fn = get_hit_fn_rows_accel(cfg.replace(accel="grid"), scene, cam)
is_grid = gscene is not scene
print(f"# accel resolved: grid={is_grid} "
      f"tiles={getattr(gscene, 'n_tiles', 0)} "
      f"tile_rows={getattr(gscene, 'tile_rows', 0)} "
      f"glob={np.asarray(gscene.glob_attrs).shape if is_grid else None}",
      flush=True)


def run(label, sc, fn):
    t0 = time.perf_counter()
    img = render_image_persistent(sc, cam, cfg, hit_fn=fn)
    img.block_until_ready()
    dt = time.perf_counter() - t0
    mrays = W * H * SPP / dt / 1e6
    print(f"{label}: {dt:.2f}s = {mrays:.1f} Mrays/s "
          f"(mean {float(img.mean()):.4f})", flush=True)
    return dt


print("# warm-up (compiles)...", flush=True)
t0 = time.perf_counter()
run("warm brute", scene, brute_fn)
run("warm grid ", gscene, grid_fn)
print(f"# warm-up total: {time.perf_counter() - t0:.1f}s", flush=True)

for rep in range(2):
    run(f"brute[{rep}]", scene, brute_fn)
    run(f"grid [{rep}]", gscene, grid_fn)
