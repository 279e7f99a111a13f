"""Pass-level checkpoint/resume (the reference persists only out.bmp,
Game.cpp:104 — here a long render survives kills).  Run once with
--interrupt to do half the passes and exit; run again to finish.  The
final image is byte-identical to an uninterrupted render."""

import sys

from _common import maybe_force_cpu

maybe_force_cpu()

import win32_raytracer_tpu as wrt
from win32_raytracer_tpu.utils.checkpoint import render_with_checkpoints

interrupt = "--interrupt" in sys.argv

scene = wrt.get_scene("test")
cfg = wrt.RenderConfig(width=320, height=240, samples=32, seed=7)
img = render_with_checkpoints(
    scene, None, cfg, "render.ckpt.npz", passes=4,
    max_passes_per_run=2 if interrupt else None)
if img is None:
    print("interrupted with a saved checkpoint — run again to finish")
else:
    wrt.write_image("checkpointed.png", img)
    print("wrote checkpointed.png (resume-exact)")
