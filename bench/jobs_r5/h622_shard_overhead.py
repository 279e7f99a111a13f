# job 619 (plan name: job 623): sharded-driver overhead re-measurement
# after the jitted-wrapper fix (commit e70cc8d).  Round-3 residual was
# +38.4% (job 575) with every component at parity; job 612 then showed
# the single-chip driver was paying an eager-wrapper tax the sharded one
# was not — now both dispatch one program per bounce.  Target <= 15%.
t_all = time.perf_counter()
from win32_raytracer_tpu.config import RenderConfig
from win32_raytracer_tpu.render import render
from win32_raytracer_tpu.parallel.shard import make_mesh
from win32_raytracer_tpu.parallel.persistent_shard import (
    render_image_persistent_sharded)
from win32_raytracer_tpu.render import tonemap
from win32_raytracer_tpu.scene.builders import random_scene
from win32_raytracer_tpu.scene.camera import default_camera

scene = random_scene()
cfg = RenderConfig(width=1200, height=800, samples=100, seed=99,
                   rays_per_chunk=1 << 22)
cam = default_camera(1200, 800)
mesh = make_mesh(1)

def run_single(seed):
    return render(scene, cfg=cfg.replace(seed=seed))

def run_sharded(seed):
    lin = render_image_persistent_sharded(scene, cam,
                                          cfg.replace(seed=seed), mesh)
    return np.asarray(tonemap(lin))

for name, fn in (("single", run_single), ("sharded", run_sharded)):
    t0 = time.perf_counter()
    img = fn(99)
    print(f"warm {name}: {time.perf_counter()-t0:.1f}s mean "
          f"{float(img.mean()):.2f}", flush=True)
best = {"single": float("inf"), "sharded": float("inf")}
for rep in range(3):
    for name, fn in (("single", run_single), ("sharded", run_sharded)):
        t0 = time.perf_counter()
        fn(3 + rep)
        dt = time.perf_counter() - t0
        best[name] = min(best[name], dt)
        print(f"rep{rep} {name}: {dt:.3f}s", flush=True)
ovh = best["sharded"] / best["single"] - 1.0
print(f"job619 single {best['single']:.3f}s sharded {best['sharded']:.3f}s"
      f" overhead {ovh*100:.1f}%", flush=True)
print(f"total {time.perf_counter()-t_all:.1f}s", flush=True)
