# job 616: config 4 (mesh20k 800x450@50) with SHIPPED defaults after the
# traced-dims + lean refactors — the VERDICT bar is >= 12 Mrays/s.
# Interleaved A/B: defaults (sub_gate auto->q2 at St=128) vs sub_gate=1
# (whole-block gate) to confirm the q2 win survived the refactor.
t_all = time.perf_counter()
from win32_raytracer_tpu.config import RenderConfig
from win32_raytracer_tpu.render import render
from win32_raytracer_tpu.scene.builders import mesh_scene

scene4 = mesh_scene(subdivisions=5)
cfg4 = RenderConfig(width=800, height=450, samples=50, seed=99)
arms = {"default": cfg4, "subgate1": cfg4.replace(tri_sub_gate=1)}
for name, c in arms.items():
    t0 = time.perf_counter()
    img = render(scene4, cfg=c)
    print(f"warm {name}: {time.perf_counter()-t0:.1f}s mean "
          f"{float(img.mean()):.2f}", flush=True)
rays = 800 * 450 * 50 / 1e6
best = {n: float("inf") for n in arms}
for rep in range(3):
    for name, c in arms.items():
        t0 = time.perf_counter()
        img = render(scene4, cfg=c.replace(seed=3 + rep))
        dt = time.perf_counter() - t0
        best[name] = min(best[name], dt)
        print(f"rep{rep} {name}: {dt:.3f}s -> {rays/dt:.2f} Mrays/s",
              flush=True)
for name, b in best.items():
    print(f"job616 {name} best {b:.3f}s = {rays/b:.2f} Mrays/s", flush=True)
print(f"total {time.perf_counter()-t_all:.1f}s", flush=True)
