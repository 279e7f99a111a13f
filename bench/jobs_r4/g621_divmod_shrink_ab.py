# job 621 (runs on post-fix code after a worker restart): price the two
# round-4 fixes from the job-990 anatomy + job-615/617 regressions:
#   (1) XLA-core cheap divmod + lean (commit pending): config 1 had
#       regressed 2x (0.093 -> 0.182 s) on traced ``//`` expansions in
#       the one-shot while body; flythrough ~8%; headline tail ~etc.
#   (2) compact_shrink sweep: the 0.90 trigger over-fires at mid rungs
#       (2.36M -> 1.64M costs ~67 ms to save ~35).
# Arms interleaved, distinct seeds per rep (runtime-notes rules 12/15).
t_all = time.perf_counter()
from win32_raytracer_tpu.config import RenderConfig
from win32_raytracer_tpu.render import render
from win32_raytracer_tpu.scene.builders import get_scene, random_scene
from win32_raytracer_tpu.animation import orbit_path, render_animation

# --- headline: compact_shrink sweep (divmod fix rides along) ---
scene2 = random_scene()
cfg2 = RenderConfig(width=1200, height=800, samples=100, seed=99,
                    rays_per_chunk=1 << 22)
arms = {"s90": cfg2, "s75": cfg2.replace(compact_shrink=0.75),
        "s60": cfg2.replace(compact_shrink=0.60),
        "s50": cfg2.replace(compact_shrink=0.50),
        "s40": cfg2.replace(compact_shrink=0.40)}
for name, c in arms.items():
    t0 = time.perf_counter()
    img = render(scene2, cfg=c)
    print(f"warm h-{name}: {time.perf_counter()-t0:.1f}s mean "
          f"{float(img.mean()):.2f}", flush=True)
best = {n: float("inf") for n in arms}
for rep in range(3):
    for name, c in arms.items():
        t0 = time.perf_counter()
        render(scene2, cfg=c.replace(seed=3 + rep))
        dt = time.perf_counter() - t0
        best[name] = min(best[name], dt)
        print(f"h rep{rep} {name}: {dt:.3f}s -> {96.0/dt:.2f} Mrays/s",
              flush=True)
for name, b in sorted(best.items(), key=lambda kv: kv[1]):
    print(f"job621 headline {name} best {b:.3f}s = {96.0/b:.2f} Mrays/s",
          flush=True)

# --- config 1 (one-shot while program: the 2x regression case) ---
scene1 = get_scene("test")
cfg1 = RenderConfig(width=400, height=200, samples=16, max_depth=8, seed=99)
t0 = time.perf_counter()
render(scene1, cfg=cfg1)
print(f"warm c1: {time.perf_counter()-t0:.1f}s", flush=True)
rays1 = 400 * 200 * 16 / 1e6
b1 = float("inf")
for rep in range(5):
    t0 = time.perf_counter()
    render(scene1, cfg=cfg1.replace(seed=3 + rep))
    b1 = min(b1, time.perf_counter() - t0)
print(f"job621 c1 best {b1:.3f}s = {rays1/b1:.2f} Mrays/s "
      f"(r3: 0.093s/13.7; pre-fix r4: 0.182s/7.0)", flush=True)

# --- flythrough: new auto (kpp1 one batch, job 618 winner) + the old
# bf4 arm for the divmod-fix delta at fixed shape ---
scene5 = get_scene("final")
cfg5 = RenderConfig(width=640, height=480, samples=32, seed=99)
cams = orbit_path(n_frames=8, aspect_ratio=640 / 480)
fly_arms = {"auto": 0, "bf4": 4}
for name, bf in fly_arms.items():
    t0 = time.perf_counter()
    render_animation(scene5, cams, cfg5, batch_frames=bf)
    print(f"warm c5-{name}: {time.perf_counter()-t0:.1f}s", flush=True)
rays5 = 640 * 480 * 32 * 8 / 1e6
b5 = {n: float("inf") for n in fly_arms}
for rep in range(3):
    for name, bf in fly_arms.items():
        t0 = time.perf_counter()
        render_animation(scene5, cams, cfg5.replace(seed=3 + rep),
                         batch_frames=bf)
        b5[name] = min(b5[name], time.perf_counter() - t0)
for name, b in b5.items():
    print(f"job621 c5-{name} best {b:.3f}s = {rays5/b:.2f} Mrays/s = "
          f"{8/b:.2f} fps (pre-fix: auto 3.343/2.39, k1bf8 1.859/4.30)",
          flush=True)
print(f"total {time.perf_counter()-t_all:.1f}s", flush=True)
