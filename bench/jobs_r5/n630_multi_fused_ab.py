# job n630: below-floor multi-bounce engine A/B at the headline config,
# interleaved — cfg.multi_backend "xla" (shipped fori XLA cores) vs
# "fused" (k unrolled Mosaic fused bounces per dispatch).  Anatomy
# pricing (tpu_jobs 990): multi group 0.274 s of the 1.9 s wall at
# ~9.5-10 ns/lane-step vs the fused kernel's 5.6 -> ~0.1 s expected.
# Requires a worker started after commit 7c12a03.
t_all = time.perf_counter()
import win32_raytracer_tpu.kernels.bounce_pallas as BP
from win32_raytracer_tpu.config import RenderConfig
from win32_raytracer_tpu.render import render as _render
from win32_raytracer_tpu.scene.builders import random_scene

assert hasattr(BP, "p_bounce_multi_fused"), "stale worker"
scene_n = random_scene()
cfg_n = RenderConfig(width=1200, height=800, samples=100, seed=51,
                     rays_per_chunk=1 << 22)

for name in ("xla", "fused"):
    t0 = time.perf_counter()
    img = _render(scene_n, cfg=cfg_n.replace(multi_backend=name))
    print(f"warm {name}: {time.perf_counter()-t0:.1f}s mean "
          f"{float(img.mean()):.2f}", flush=True)

best = {"xla": float("inf"), "fused": float("inf")}
for rep in range(4):
    for name in ("xla", "fused"):
        t0 = time.perf_counter()
        _render(scene_n, cfg=cfg_n.replace(multi_backend=name,
                                           seed=3 + rep))
        dt = time.perf_counter() - t0
        best[name] = min(best[name], dt)
        print(f"rep{rep} {name}: {dt:.3f}s", flush=True)
rays = 1200 * 800 * 100 / 1e6
print(f"n630 best xla {best['xla']:.3f}s = {rays/best['xla']:.2f}; "
      f"fused {best['fused']:.3f}s = {rays/best['fused']:.2f} Mrays/s "
      f"({(best['xla']/best['fused']-1)*100:+.1f}% fused win)", flush=True)
print(f"total {time.perf_counter()-t_all:.1f}s", flush=True)
