"""Animated flythrough (BASELINE config 5) over the virtual mesh."""

import numpy as np

from win32_raytracer_tpu.animation import orbit_path, render_animation
from win32_raytracer_tpu.config import RenderConfig
from win32_raytracer_tpu.parallel.shard import make_mesh
from win32_raytracer_tpu.scene.builders import test_scene as make_test_scene


def test_orbit_path_geometry():
    cams = orbit_path(look_to=(0, 1, 0), radius=10.0, height=3.0, n_frames=8)
    assert len(cams) == 8
    for cam in cams:
        o = np.asarray(cam.origin)
        assert abs(np.hypot(o[0], o[2]) - 10.0) < 1e-4
        assert abs(o[1] - 3.0) < 1e-6
    # distinct positions
    pts = np.stack([np.asarray(c.origin) for c in cams])
    assert np.ptp(pts[:, 0]) > 15


def test_flythrough_sharded_over_mesh(eight_devices, tmp_path):
    scene = make_test_scene()
    cfg = RenderConfig(width=32, height=16, samples=8, seed=2, backend="jnp")
    cams = orbit_path(look_to=(0, 0, 0), radius=14.0, height=2.0, n_frames=3,
                      aspect_ratio=2.0)
    got = []
    frames = render_animation(
        scene, cams, cfg,
        out_pattern=str(tmp_path / "fly_%04d.png"),
        mesh=make_mesh(8), shard_mode="spp",
        frame_callback=lambda i, img, ms: got.append((i, img.shape, ms > 0)),
    )
    assert len(frames) == 3
    assert all(f.shape == (16, 32, 3) for f in frames)
    assert (tmp_path / "fly_0002.png").exists()
    assert got == [(0, (16, 32, 3), True), (1, (16, 32, 3), True),
                   (2, (16, 32, 3), True)]
    # camera actually moves: frames differ
    assert np.abs(frames[0].astype(int) - frames[1].astype(int)).mean() > 1.0
