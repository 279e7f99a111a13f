# job p634: route compactor post-denormal-fix validation — one headline
# render with compactor="route" must produce the CORRECT image (l627's
# route arm rendered black: i32 rows bitcast to f32 are denormals the
# chip flushes to zero; fixed by native-dtype transport, commit 6a254a6).
t_all = time.perf_counter()
import win32_raytracer_tpu.persistent as P
from win32_raytracer_tpu.config import RenderConfig
from win32_raytracer_tpu.render import render as _render
from win32_raytracer_tpu.scene.builders import random_scene

assert "_RI_PIXEL" in dir(P), "stale worker (pre-fix router)"
scene_p = random_scene()
cfg_p = RenderConfig(width=1200, height=800, samples=100, seed=71,
                     rays_per_chunk=1 << 22, compactor="route")
t0 = time.perf_counter()
img = _render(scene_p, cfg=cfg_p)
m = float(img.mean())
print(f"route render: {time.perf_counter()-t0:.1f}s mean {m:.2f}",
      flush=True)
assert 100.0 <= m <= 254.0, f"route image still wrong: mean {m}"
img2 = _render(scene_p, cfg=cfg_p.replace(compactor="sort"))
d = abs(m - float(img2.mean()))
print(f"sort-arm mean {float(img2.mean()):.2f}; |diff| {d:.4f}", flush=True)
assert d < 0.5
print(f"total {time.perf_counter()-t_all:.1f}s", flush=True)
