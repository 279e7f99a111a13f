"""Build a custom scene with SceneBuilder (the SoA analogue of the
reference's Spheres::add/addMoving, RayTracer.cpp:310-361) and render it
through a hand-placed thin-lens camera."""

from _common import maybe_force_cpu

maybe_force_cpu()

import win32_raytracer_tpu as wrt

b = wrt.SceneBuilder()
b.add_lambertian((0.0, -100.5, -1.0), 100.0, (0.6, 0.8, 0.0))  # ground
b.add_lambertian((0.0, 0.0, -1.2), 0.5, (0.1, 0.2, 0.5))
b.add_metal((1.1, 0.0, -1.0), 0.5, (0.8, 0.6, 0.2), fuzz=0.05)
b.add_dielectric((-1.1, 0.0, -1.0), 0.5, ior=1.5)
b.add_dielectric((-1.1, 0.0, -1.0), -0.45, ior=1.5)  # hollow shell
# Motion blur: a small sphere moving up during the shutter window.
b.add_moving((0.3, -0.25, -0.6), (0.3, -0.05, -0.6), 0.0, 1.0,
             0.15, 0, albedo=(0.9, 0.3, 0.3))
scene = b.build()

cam = wrt.make_camera(look_from=(0.5, 0.6, 1.6), look_to=(0.0, 0.0, -1.0),
                      up=(0.0, 1.0, 0.0), vfov_degrees=45.0,
                      aspect_ratio=4.0 / 3.0, aperture=0.08,
                      focus_dist=2.6)
cfg = wrt.RenderConfig(width=320, height=240, samples=32, seed=1)
res = wrt.render(scene, cam=cam, cfg=cfg)
wrt.write_image("custom.png", res.image)
print(f"wrote custom.png ({res.duration_ms:.0f} ms, "
      f"{res.mrays_per_sec:.2f} Mrays/s)")
