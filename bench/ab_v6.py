#!/usr/bin/env python
"""A/B: hit kernel v4 (VPU) vs v5 (MXU HIGHEST) vs v6 (split-bf16 MXU),
timed interleaved on a real mid-render state, plus v6-vs-v4 winner-flip
and t-error statistics."""

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
from win32_raytracer_tpu.kernels.hit_pallas_v4 import hit_spheres_pallas_v4
from win32_raytracer_tpu.kernels.experimental.hit_pallas_v5 import hit_spheres_pallas_v5
from win32_raytracer_tpu.kernels.hit_pallas_v6 import hit_spheres_pallas_v6
from win32_raytracer_tpu.persistent import (
    PathState, p_hit_step, p_respawn_step, p_scatter_respawn_step,
)
from win32_raytracer_tpu.kernels.dispatch import get_hit_fn_rows
from win32_raytracer_tpu.scene.builders import random_scene
from win32_raytracer_tpu.scene.camera import default_camera

W, H, SPP, KPP = 1200, 800, 100, 4
cfg = RenderConfig(width=W, height=H, samples=SPP, seed=0,
                   lanes_per_pixel=KPP)
scene = random_scene()
cam = default_camera(W, H)
hit_fn = get_hit_fn_rows(cfg)

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
salt = np.uint32(0xFEED)
st = p_respawn_step(cam, st, salt, jnp.int32(0), cfg=cfg, width=W, height=H,
                    spp=SPP, lanes_per_pixel=KPP)
for k in (1, 2, 3):
    rec, st = p_hit_step(scene, st, cfg=cfg, hit_fn=hit_fn)
    st = p_scatter_respawn_step(scene, cam, st, rec, salt, jnp.int32(k),
                                cfg=cfg, width=W, height=H, spp=SPP,
                                lanes_per_pixel=KPP)
st.origin.block_until_ready()
print(f"# state ready: {n/1e6:.2f}M lanes after 3 bounces", flush=True)

VARIANTS = {
    "v4": lambda: hit_spheres_pallas_v4(scene, st.origin, st.direction,
                                        st.time),
    "v5_highest": lambda: hit_spheres_pallas_v5(scene, st.origin,
                                                st.direction, st.time),
    "v6_t3": lambda: hit_spheres_pallas_v6(scene, st.origin, st.direction,
                                           st.time, n_terms=3),
    "v6_t6": lambda: hit_spheres_pallas_v6(scene, st.origin, st.direction,
                                           st.time, n_terms=6),
}

# --- accuracy: v6 vs v4 on this state ---
r4 = VARIANTS["v4"]()
for name in ("v6_t3", "v6_t6"):
    r6 = VARIANTS[name]()
    hit4 = np.asarray(r4.hit[0])
    hit6 = np.asarray(r6.hit[0])
    flip = (hit4 != hit6).mean()
    both = hit4 & hit6
    idx_flip = (np.asarray(r4.idx[0])[both]
                != np.asarray(r6.idx[0])[both]).mean()
    dt_rel = np.abs(np.asarray(r6.t[0])[both] - np.asarray(r4.t[0])[both]) \
        / np.maximum(np.asarray(r4.t[0])[both], 1e-6)
    print(f"# {name} vs v4: hit flips {flip:.2e}, winner flips {idx_flip:.2e},"
          f" t rel err p50/p99/max {np.percentile(dt_rel, 50):.2e}/"
          f"{np.percentile(dt_rel, 99):.2e}/{dt_rel.max():.2e}", flush=True)

REPS = 20


def timed(label, fn):
    for trial in range(3):
        t0 = time.perf_counter()
        out = None
        for _ in range(REPS):
            out = fn()
        out.t.block_until_ready()
        dt = (time.perf_counter() - t0) / REPS * 1e3
        print(f"{label:>12}[{trial}]: {dt:7.2f} ms ({n/1e6/dt*1e3:6.1f} "
              f"Mray-sweeps/s)", flush=True)


for name, fn in VARIANTS.items():
    timed(name, fn)
