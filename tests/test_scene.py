"""Scene SoA + builder tests (RayTracer.cpp:292-381, 707-891)."""

import numpy as np
import pytest

from win32_raytracer_tpu.core import materials as mat
from win32_raytracer_tpu.core.rng import ReferenceLcg
from win32_raytracer_tpu.scene.builders import test_scene as make_test_scene, random_scene, get_scene
from win32_raytracer_tpu.scene.spheres import SceneBuilder


def test_test_scene_layout():
    s = make_test_scene()
    act = np.asarray(s.active)
    assert act.sum() == 6
    assert s.padded_size % 128 == 0
    rad = np.asarray(s.radius)
    np.testing.assert_allclose(rad[:6], [100.0, -0.5, 0.5, -0.5, 0.5, 0.5])
    mats = np.asarray(s.mat_id)[:6]
    np.testing.assert_array_equal(
        mats, [mat.LAMBERTIAN, mat.LAMBERTIAN, mat.METAL, mat.DIELECTRIC,
               mat.LAMBERTIAN, mat.LAMBERTIAN])
    np.testing.assert_allclose(np.asarray(s.albedo)[2], [0.8, 0.6, 0.2])
    assert float(np.asarray(s.ior)[3]) == 1.5
    # Static spheres: center2 == center1, t-range [0, 1].
    np.testing.assert_array_equal(np.asarray(s.center1), np.asarray(s.center2))


def test_random_scene_counts_and_mix():
    s = random_scene()
    act = np.asarray(s.active)
    n = int(act.sum())
    assert n == 488  # ground + 3 heroes + 22*22 grid (RayTracer.cpp:771, 831)
    mats = np.asarray(s.mat_id)[act]
    # The LCG-driven mix: exact counts are deterministic for seed 666.
    assert (mats == mat.LAMBERTIAN).sum() == 390
    assert (mats == mat.METAL).sum() == 74
    assert (mats == mat.DIELECTRIC).sum() == 24
    # All grid lambertians move +3 in y over t [0,1] (RayTracer.cpp:848-859).
    c1, c2 = np.asarray(s.center1), np.asarray(s.center2)
    moving = (c1 != c2).any(axis=1) & act
    assert moving.sum() == 388  # 390 lambertians - ground - hero
    np.testing.assert_allclose((c2 - c1)[moving], np.tile([0, 3, 0], (388, 1)))


def test_random_scene_first_grid_sphere_exact():
    """The first grid sphere's position/material follow the LCG exactly."""
    s = random_scene()
    lcg = ReferenceLcg(666)
    r = lcg.rand4()
    want_center = np.array([-11 + 0.9 * r[0], 0.2, -11 + 0.9 * r[1]], np.float32)
    got_center = np.asarray(s.center1)[4]  # after ground + 3 heroes
    np.testing.assert_allclose(got_center, want_center, rtol=1e-6)
    choice = float(r[2])
    want_mat = (mat.LAMBERTIAN if choice < 0.8
                else mat.METAL if choice < 0.95 else mat.DIELECTRIC)
    assert int(np.asarray(s.mat_id)[4]) == want_mat
    if want_mat == mat.LAMBERTIAN:
        r = lcg.rand4()
        want_alb = [r[0] * r[1], r[1] * r[2], r[2] * r[3]]
        np.testing.assert_allclose(np.asarray(s.albedo)[4], want_alb, rtol=1e-6)


def test_builder_validation():
    b = SceneBuilder()
    with pytest.raises(ValueError):
        b.build()
    with pytest.raises(ValueError):
        b.add_moving((0, 0, 0), (1, 1, 1), 0.5, 0.5, 1.0, mat.LAMBERTIAN)
    b.add_lambertian((0, 0, 0), 1.0, (1, 0, 0))
    s = b.build(pad_to=128)
    assert s.padded_size == 128
    assert not bool(np.asarray(s.active)[1])
    # Padding parked far away with radius 0.
    assert float(np.asarray(s.radius)[1]) == 0.0


def test_get_scene_registry():
    assert get_scene("test").padded_size == 128
    with pytest.raises(ValueError):
        get_scene("nope")
