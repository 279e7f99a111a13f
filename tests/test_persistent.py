"""Persistent-wavefront scheduler vs the fixed-depth wavefront."""

import numpy as np

import jax.numpy as jnp

from win32_raytracer_tpu.config import RenderConfig
from win32_raytracer_tpu.persistent import render_image_persistent
from win32_raytracer_tpu.render import render, render_image, tonemap
from win32_raytracer_tpu.scene.builders import test_scene as make_test_scene


def test_persistent_matches_wavefront_statistically():
    """Same scene, same distributions, different schedulers: images agree
    within Monte-Carlo noise."""
    scene = make_test_scene()
    cfg = RenderConfig(width=64, height=32, samples=32, seed=9, backend="jnp")
    img_w = np.asarray(tonemap(render_image(scene, None, cfg)))
    img_p = np.asarray(tonemap(render_image_persistent(scene, None, cfg)))
    diff = np.abs(img_w.astype(float) - img_p.astype(float))
    assert diff.mean() < 4.0, diff.mean()


def test_persistent_sample_accounting():
    """Every lane completes exactly spp samples (radiance averaged once)."""
    scene = make_test_scene()
    # Sky-only view: point the camera up so every sample = 1 bounce (miss).
    from win32_raytracer_tpu.scene.camera import make_camera
    cam = make_camera((0, 50, 0), (0, 51, 0), (1, 0, 0), 60.0, 2.0, 0.0, 1.0)
    cfg = RenderConfig(width=32, height=16, samples=7, seed=1, backend="jnp")
    lin = np.asarray(render_image_persistent(scene, cam, cfg))
    # All-sky image: each pixel is the average of 7 sky draws; values must
    # lie inside the sky gradient's range with no accumulation error.
    assert lin.min() >= 0.5 - 1e-5 and lin.max() <= 1.0 + 1e-5
    # Compare against wavefront for the same camera: identical statistics.
    lin_w = np.asarray(render_image(scene, cam, cfg))
    assert np.abs(lin - lin_w).mean() < 0.02


def test_persistent_scheduler_selected_by_auto():
    scene = make_test_scene()
    cfg = RenderConfig(width=32, height=16, samples=16, seed=2,
                       backend="jnp", scheduler="auto")
    img = render(scene, cfg=cfg)
    assert img.shape == (16, 32, 3)
    cfg2 = cfg.replace(scheduler="persistent")
    img2 = render(scene, cfg=cfg2)
    np.testing.assert_array_equal(img, img2)


def test_stratified_sampling_reduces_variance():
    """Stratified pixel jitter should not change the mean image and should
    not increase noise (weak check: images stay close)."""
    scene = make_test_scene()
    base = RenderConfig(width=48, height=24, samples=16, seed=3,
                        backend="jnp", scheduler="persistent")
    img_u = render(scene, cfg=base)
    img_s = render(scene, cfg=base.replace(stratify=True))
    diff = np.abs(img_u.astype(float) - img_s.astype(float))
    assert diff.mean() < 4.0, diff.mean()
