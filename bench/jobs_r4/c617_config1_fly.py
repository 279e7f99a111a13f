# job 617: config 1 (test 400x200@16 d8, one_shot auto while-loop) and
# the config-5 flythrough baseline (8f 640x480@32, bf auto=4 + one_shot)
# with the shipped round-4 stack, in-worker.  Baselines for job 618's
# kpp x bf grid.
t_all = time.perf_counter()
from win32_raytracer_tpu.config import RenderConfig
from win32_raytracer_tpu.render import render
from win32_raytracer_tpu.scene.builders import get_scene
from win32_raytracer_tpu.animation import orbit_path, render_animation

# --- config 1 ---
scene1 = get_scene("test")
cfg1 = RenderConfig(width=400, height=200, samples=16, max_depth=8, seed=99)
t0 = time.perf_counter()
img = render(scene1, cfg=cfg1)
print(f"warm c1: {time.perf_counter()-t0:.1f}s mean {float(img.mean()):.2f}",
      flush=True)
rays1 = 400 * 200 * 16 / 1e6
b1 = float("inf")
for rep in range(5):
    t0 = time.perf_counter()
    render(scene1, cfg=cfg1.replace(seed=3 + rep))
    dt = time.perf_counter() - t0
    b1 = min(b1, dt)
    print(f"c1 rep{rep}: {dt:.3f}s -> {rays1/dt:.2f} Mrays/s", flush=True)
print(f"job617 c1 best {b1:.3f}s = {rays1/b1:.2f} Mrays/s", flush=True)

# --- config 5 baseline ---
scene5 = get_scene("final")
cfg5 = RenderConfig(width=640, height=480, samples=32, seed=99)
cams = orbit_path(n_frames=8, aspect_ratio=640 / 480)
t0 = time.perf_counter()
frames = render_animation(scene5, cams, cfg5)
print(f"warm c5: {time.perf_counter()-t0:.1f}s", flush=True)
rays5 = 640 * 480 * 32 * 8 / 1e6
b5 = float("inf")
for rep in range(3):
    t0 = time.perf_counter()
    frames = render_animation(scene5, cams, cfg5.replace(seed=3 + rep))
    dt = time.perf_counter() - t0
    b5 = min(b5, dt)
    print(f"c5 rep{rep}: {dt:.3f}s -> {rays5/dt:.2f} Mrays/s, "
          f"{8/dt:.2f} fps", flush=True)
print(f"job617 c5 best {b5:.3f}s = {rays5/b5:.2f} Mrays/s = {8/b5:.2f} fps",
      flush=True)
print(f"total {time.perf_counter()-t_all:.1f}s", flush=True)
