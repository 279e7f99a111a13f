# job 623b: config 4 (mesh20k, shipped defaults) after the XLA-core
# divmod+lean fix — every one of this config's scatter+respawn steps is
# the XLA core (CompositeScene: pallas tri hit + XLA scatter), so the
# fix should recover most of the r3->r4 regression (1.60 -> 1.795 s).
# Bar: >= 12 Mrays/s; r3's sub-gate q2 arm measured 11.25 best.
t_all = time.perf_counter()
from win32_raytracer_tpu.config import RenderConfig
from win32_raytracer_tpu.render import render
from win32_raytracer_tpu.scene.builders import mesh_scene

scene4b = mesh_scene(subdivisions=5)
cfg4b = RenderConfig(width=800, height=450, samples=50, seed=99)
t0 = time.perf_counter()
img = render(scene4b, cfg=cfg4b)
print(f"warm: {time.perf_counter()-t0:.1f}s mean {float(img.mean()):.2f}",
      flush=True)
rays = 800 * 450 * 50 / 1e6
best = float("inf")
for rep in range(4):
    t0 = time.perf_counter()
    render(scene4b, cfg=cfg4b.replace(seed=3 + rep))
    dt = time.perf_counter() - t0
    best = min(best, dt)
    print(f"rep{rep}: {dt:.3f}s -> {rays/dt:.2f} Mrays/s", flush=True)
print(f"job623b best {best:.3f}s = {rays/best:.2f} Mrays/s "
      f"(pre-fix 1.795/10.03; r3 1.60/11.25)", flush=True)
print(f"total {time.perf_counter()-t_all:.1f}s", flush=True)
