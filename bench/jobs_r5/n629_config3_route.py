# job n629: config 3 (4K@1000 stratified+RR) on the ROUTE compactor —
# the router's per-pair programs compile in seconds instead of the
# multi-minute sort networks g999 walked, so config 3's first-visit
# ladder stops being a warm-up hazard (verdict item 8), and the
# compaction share of its wall shrinks.  Run after l627 prices route.
t_all = time.perf_counter()
import win32_raytracer_tpu.persistent as P
from win32_raytracer_tpu.config import RenderConfig
from win32_raytracer_tpu.render import render
from win32_raytracer_tpu.scene.builders import get_scene

assert hasattr(P, "_compact_route"), "stale worker"
scene = get_scene("final")
cfg = RenderConfig(width=3840, height=2160, samples=1000, seed=99,
                   stratify=True, russian_roulette=True,
                   scheduler="persistent", rays_per_chunk=1 << 22,
                   compactor="route")
t0 = time.perf_counter()
img = render(scene, cfg=cfg)
m = float(img.mean())
assert 1.0 <= m <= 254.0, m
print(f"warm seed99 (route): {time.perf_counter()-t0:.1f}s mean {m:.2f}",
      flush=True)
rays = 3840 * 2160 * 1000 / 1e6
best = float("inf")
for rep in range(2):
    t0 = time.perf_counter()
    img = render(scene, cfg=cfg.replace(seed=3 + rep))
    dt = time.perf_counter() - t0
    best = min(best, dt)
    print(f"rep{rep}: {dt:.1f}s mean {float(img.mean()):.2f} -> "
          f"{rays/dt:.1f} Mrays/s", flush=True)
print(f"n629 best {best:.1f}s = {rays/best:.1f} Mrays/s (route)",
      flush=True)
print(f"total {time.perf_counter()-t_all:.1f}s", flush=True)
