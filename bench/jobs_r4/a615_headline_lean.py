# job 615 (reissue after host restart wiped /tmp + .jax_cache):
# headline steady state with the FULL shipping stack — traced dims +
# mantissa compaction grid + jitted fused-bounce wrappers + static lean
# kernel variant (commit 814af94, unpriced on chip).  Also repopulates
# the persistent compile cache for the driver's bench.py run.
t_all = time.perf_counter()
from win32_raytracer_tpu.config import RenderConfig
from win32_raytracer_tpu.render import render
from win32_raytracer_tpu.scene.builders import random_scene

scene = random_scene()
cfg = RenderConfig(width=1200, height=800, samples=100, seed=99,
                   rays_per_chunk=1 << 22)
t0 = time.perf_counter()
img = render(scene, cfg=cfg)
m = float(img.mean())
assert 1.0 <= m <= 254.0, m
print(f"warm seed99: {time.perf_counter()-t0:.1f}s mean {m:.2f}", flush=True)

best = float("inf")
for rep in range(3):
    for seed in (3, 4, 5):
        t0 = time.perf_counter()
        img = render(scene, cfg=cfg.replace(seed=seed))
        dt = time.perf_counter() - t0
        best = min(best, dt)
        print(f"rep{rep} seed{seed}: {dt:.3f}s mean {float(img.mean()):.2f}"
              f" -> {96.0/dt:.2f} Mrays/s", flush=True)
print(f"job615 best {best:.3f}s = {96.0/best:.2f} Mrays/s; "
      f"total {time.perf_counter()-t_all:.1f}s", flush=True)
