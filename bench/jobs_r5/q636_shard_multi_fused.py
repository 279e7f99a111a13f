# job q636: sharded overhead with the above-floor fused multi-bounce
# (cfg.multi_backend="fused") vs shipped — the h622 protocol (1-device
# mesh, interleaved vs single-chip).  Directive-3 lever: mk=4 bounces
# per shard_map dispatch amortize the ~20 ms + ~8 ms/M-lane lockstep
# tax 4-fold across the compute-bound steps.
# Requires a worker started after the sharded multi-fused commit.
t_all = time.perf_counter()
import win32_raytracer_tpu.parallel.persistent_shard as PS
from win32_raytracer_tpu.config import RenderConfig
from win32_raytracer_tpu.render import render, tonemap
from win32_raytracer_tpu.parallel.shard import make_mesh
from win32_raytracer_tpu.parallel.persistent_shard import (
    render_image_persistent_sharded)
from win32_raytracer_tpu.scene.builders import random_scene
from win32_raytracer_tpu.scene.camera import default_camera

assert getattr(PS, "_HAS_MULTI_FUSED", False), "stale worker"
scene = random_scene()
cfg = RenderConfig(width=1200, height=800, samples=100, seed=99,
                   rays_per_chunk=1 << 22)
cam = default_camera(1200, 800)
mesh = make_mesh(1)

def run_single(seed):
    return render(scene, cfg=cfg.replace(seed=seed))

def run_sharded(seed, mb=""):
    lin = render_image_persistent_sharded(
        scene, cam, cfg.replace(seed=seed, multi_backend=mb), mesh)
    return np.asarray(tonemap(lin))

arms = (("single", lambda s: run_single(s)),
        ("shard", lambda s: run_sharded(s)),
        ("shard_mf", lambda s: run_sharded(s, "fused")))
for name, fn in arms:
    t0 = time.perf_counter()
    img = fn(99)
    print(f"warm {name}: {time.perf_counter()-t0:.1f}s mean "
          f"{float(np.asarray(img).mean()):.2f}", flush=True)
best = {n: float("inf") for n, _ in arms}
for rep in range(3):
    for name, fn in arms:
        t0 = time.perf_counter()
        fn(3 + rep)
        dt = time.perf_counter() - t0
        best[name] = min(best[name], dt)
        print(f"rep{rep} {name}: {dt:.3f}s", flush=True)
ovh = best["shard"] / best["single"] - 1.0
ovh_mf = best["shard_mf"] / best["single"] - 1.0
print(f"q636 single {best['single']:.3f}s; shard {best['shard']:.3f}s "
      f"({ovh*100:+.1f}%); shard_mf {best['shard_mf']:.3f}s "
      f"({ovh_mf*100:+.1f}%)", flush=True)
print(f"total {time.perf_counter()-t_all:.1f}s", flush=True)
