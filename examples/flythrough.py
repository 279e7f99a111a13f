"""Frame-batched orbit flythrough (the interactive-shell analogue of the
reference's Game::Tick loop).  Frames render in multi-frame batches — F
frames as one virtual tall image — and the run is resumable: re-run the
script and finished frames are skipped."""

from _common import maybe_force_cpu

maybe_force_cpu()

import time

import win32_raytracer_tpu as wrt

scene = wrt.get_scene("test")
cams = wrt.orbit_path(look_to=(0, 1, 0), radius=14.0, height=2.5,
                      n_frames=8, aspect_ratio=4.0 / 3.0)
cfg = wrt.RenderConfig(width=320, height=240, samples=16, seed=5)
t0 = time.perf_counter()
frames = wrt.render_animation(
    scene, cams, cfg, out_pattern="fly_%04d.png", resume=True,
    frame_callback=lambda i, img, ms: print(
        f"frame {i}: {'resumed' if ms == 0 else f'{ms:.0f} ms'}"))
dt = time.perf_counter() - t0
print(f"{len(frames)} frames in {dt:.1f}s = {len(frames) / dt:.2f} fps")
