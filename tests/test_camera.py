"""Camera tests: basis construction and ray generation vs hand-computed
values (RayTracer.cpp:237-288)."""

import numpy as np

import jax.numpy as jnp

from win32_raytracer_tpu.scene.camera import make_camera, default_camera, camera_rays


def _simple_cam(aperture=0.0):
    # Axis-aligned view down -z: from origin toward (0,0,-1), up +y.
    return make_camera(
        look_from=(0.0, 0.0, 0.0), look_to=(0.0, 0.0, -1.0), up=(0.0, 1.0, 0.0),
        vfov_degrees=90.0, aspect_ratio=2.0, aperture=aperture, focus_dist=1.0,
    )


def test_basis_axis_aligned():
    cam = _simple_cam()
    # 90-deg vfov, focus 1: half-height = tan(45) = 1, half-width = 2.
    np.testing.assert_allclose(np.asarray(cam.origin), [0, 0, 0], atol=1e-6)
    np.testing.assert_allclose(np.asarray(cam.right_axis), [1, 0, 0], atol=1e-6)
    np.testing.assert_allclose(np.asarray(cam.up_axis), [0, 1, 0], atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(cam.lower_left_corner), [-2, -1, -1], atol=1e-6)
    np.testing.assert_allclose(np.asarray(cam.horizontal), [4, 0, 0], atol=1e-6)
    np.testing.assert_allclose(np.asarray(cam.vertical), [0, 2, 0], atol=1e-6)


def test_corner_rays():
    cam = _simple_cam()
    # No aperture, draws fixed: time draw 0.5 -> time = 0.025 (shutter 0..0.05).
    u = jnp.asarray([0.0, 1.0, 0.5], jnp.float32)
    v = jnp.asarray([0.0, 1.0, 0.5], jnp.float32)
    draws = jnp.full((3, 3), 0.5, jnp.float32)
    o, d, t = camera_rays(cam, u, v, draws)
    np.testing.assert_allclose(np.asarray(o), np.zeros((3, 3)), atol=1e-6)
    np.testing.assert_allclose(np.asarray(d[0]), [-2, -1, -1], atol=1e-6)
    np.testing.assert_allclose(np.asarray(d[1]), [2, 1, -1], atol=1e-6)
    np.testing.assert_allclose(np.asarray(d[2]), [0, 0, -1], atol=1e-6)
    np.testing.assert_allclose(np.asarray(t), [0.025] * 3, atol=1e-7)


def test_lens_offset_stays_on_focus_plane():
    """Defocus: rays from different lens points converge at the focus plane."""
    cam = make_camera((0, 0, 0), (0, 0, -1), (0, 1, 0), 90.0, 1.0,
                      aperture=2.0, focus_dist=3.0)
    u = jnp.full((4,), 0.5, jnp.float32)
    v = jnp.full((4,), 0.5, jnp.float32)
    # Different lens draws -> different origins...
    draws = jnp.asarray(
        [[0.0, 0.1, 0.2], [0.0, 0.9, 0.7], [0.0, 0.5, 0.33], [0.0, 0.0, 0.0]],
        jnp.float32,
    )
    o, d, _ = camera_rays(cam, u, v, draws)
    assert np.ptp(np.asarray(o), axis=0).max() > 0.1
    # ...but every ray passes through the same focus-plane point.
    # Solve o + s*d with z = -3.
    o, d = np.asarray(o), np.asarray(d)
    s = (-3.0 - o[:, 2]) / d[:, 2]
    pts = o + s[:, None] * d
    np.testing.assert_allclose(pts, np.broadcast_to(pts[0], pts.shape), atol=1e-5)


def test_default_camera_matches_reference_params():
    cam = default_camera(640, 480)
    np.testing.assert_allclose(np.asarray(cam.origin), [15, 2, 4], atol=1e-6)
    assert float(cam.lens_radius) == np.float32(0.05)
    assert float(cam.shutter_open) == 0.0
    assert float(cam.shutter_close) == np.float32(0.05)
    # focusDist = |lookTo - lookFrom| (RayTracer.cpp:911): check the image
    # plane sits at that distance along the look dir.
    look = np.asarray([0, 1, 0], np.float32) - np.asarray([15, 2, 4], np.float32)
    dist = np.linalg.norm(look)
    center = (np.asarray(cam.lower_left_corner)
              + 0.5 * np.asarray(cam.horizontal) + 0.5 * np.asarray(cam.vertical))
    np.testing.assert_allclose(
        np.linalg.norm(center - np.asarray(cam.origin)), dist, rtol=1e-5)
