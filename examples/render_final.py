"""Render the RTIOW final scene — the reference app's one job
(win32-raytracer Main.cpp boots, renders the random scene, saves
out.bmp).  Small by default so it finishes quickly anywhere; pass
explicit dims for the full-size render."""

import sys
import time

from _common import maybe_force_cpu

maybe_force_cpu()

import win32_raytracer_tpu as wrt

args = [int(x) for x in sys.argv[1:4]]
w, h, spp = args + [320, 240, 16][len(args):]
cfg = wrt.RenderConfig(width=w, height=h, samples=spp, seed=3)
t0 = time.perf_counter()
res = wrt.render("final", cfg=cfg)
print(f"{w}x{h}@{spp}: {time.perf_counter() - t0:.2f}s "
      f"({res.mrays_per_sec:.2f} Mrays/s primary)")
wrt.write_image("final.png", res.image)
print("wrote final.png")
