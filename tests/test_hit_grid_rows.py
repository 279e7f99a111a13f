"""Rows-layout Pallas grid kernel vs the brute sweep (interpret on CPU).

Mirrors test_hit_grid.py for kernels/hit_grid_rows.py (the persistent
scheduler's production hit path), plus an end-to-end check that a
persistent render over the GridScene matches the brute render.
"""

import functools

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from win32_raytracer_tpu.accel import build_grid_accel
from win32_raytracer_tpu.config import RenderConfig
from win32_raytracer_tpu.kernels.hit_grid_rows import hit_spheres_grid_rows
from win32_raytracer_tpu.ops.hit import hit_spheres
from win32_raytracer_tpu.scene.builders import random_scene

INTERPRET = jax.devices()[0].platform == "cpu"


@pytest.fixture(scope="module")
def scene():
    return random_scene()


@pytest.fixture(scope="module")
def gscene(scene):
    g = build_grid_accel(scene, time_hi=0.05)
    assert g is not None
    return g


def _batch_rows(n, rb, seed, mode):
    rng = np.random.default_rng(seed)
    if mode == "primary":
        o = np.tile([15.0, 2.0, 4.0], (n, 1)) + rng.normal(0, 0.05, (n, 3))
        d = rng.uniform([-12, 0, -12], [12, 2.5, 12], (n, 3)) - o
    else:  # clustered bounce blocks
        centers = rng.uniform([-11, 0.0, -11], [11, 0.4, 11], (n // rb, 3))
        o = (np.repeat(centers, rb, axis=0)
             + rng.uniform(-0.5, 0.5, (n, 3)) * [1.0, 0.4, 1.0])
        d = rng.normal(0, 0.55, (n, 3)) + [0.0, 1.0, 0.0]
    d = d / np.linalg.norm(d, axis=1, keepdims=True)
    tm = rng.uniform(0, 0.05, (n,))
    return (jnp.asarray(o.T, jnp.float32), jnp.asarray(d.T, jnp.float32),
            jnp.asarray(tm[None], jnp.float32))


@pytest.mark.parametrize("mode", ["primary", "bounce"])
def test_grid_rows_vs_brute(scene, gscene, mode, rb=256):
    o_r, d_r, tm_r = _batch_rows(1024, rb, {"primary": 3, "bounce": 4}[mode],
                                 mode)
    rp = hit_spheres_grid_rows(gscene, o_r, d_r, tm_r, ray_block=rb,
                               interpret=INTERPRET)
    rj = hit_spheres(scene, o_r.T, d_r.T, tm_r[0])

    hp, hj = np.asarray(rp.hit[0]), np.asarray(rj.hit)
    assert (hp != hj).mean() < 2e-3, (hp.sum(), hj.sum())
    both = hp & hj
    same_idx = np.asarray(rp.idx[0])[both] == np.asarray(rj.idx)[both]
    assert same_idx.mean() > 0.998
    sel = both.copy()
    sel[both] &= same_idx
    np.testing.assert_allclose(
        np.asarray(rp.t[0])[sel], np.asarray(rj.t)[sel], rtol=5e-4, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(rp.mat_id[0])[sel],
                                  np.asarray(rj.mat_id)[sel])
    np.testing.assert_allclose(np.asarray(rp.albedo.T)[sel],
                               np.asarray(rj.albedo)[sel], atol=1e-6)
    np.testing.assert_allclose(np.asarray(rp.normal.T)[sel],
                               np.asarray(rj.normal)[sel], rtol=0, atol=2e-2)


def test_grid_rows_padding(scene, gscene):
    """N not a multiple of the ray block pads internally, unpads on return."""
    o_r, d_r, tm_r = _batch_rows(512, 256, 5, "bounce")
    o_r, d_r, tm_r = o_r[:, :300], d_r[:, :300], tm_r[:, :300]
    rp = hit_spheres_grid_rows(gscene, o_r, d_r, tm_r, ray_block=256,
                               interpret=INTERPRET)
    assert rp.hit.shape == (1, 300)
    rj = hit_spheres(scene, o_r.T, d_r.T, tm_r[0])
    assert (np.asarray(rp.hit[0]) != np.asarray(rj.hit)).mean() < 2e-3


def test_persistent_render_grid_matches_brute(scene, gscene):
    """End-to-end: the persistent scheduler over the GridScene reproduces
    the brute-force persistent render (same seeds => same paths wherever
    the hit records agree; grazing-ray flips stay under tolerance)."""
    from win32_raytracer_tpu.persistent import render_image_persistent

    cfg = RenderConfig(width=48, height=32, samples=4, seed=7,
                       scheduler="persistent")
    grid_fn = functools.partial(hit_spheres_grid_rows, ray_block=256,
                                interpret=INTERPRET)
    img_g = np.asarray(render_image_persistent(gscene, None, cfg,
                                               hit_fn=grid_fn))
    img_b = np.asarray(render_image_persistent(scene, None, cfg))
    # Identical RNG streams: pixels differ only via tie/grazing flips.
    close = np.isclose(img_g, img_b, rtol=1e-3, atol=2e-3).mean()
    assert close > 0.995, close
    np.testing.assert_allclose(img_g.mean(), img_b.mean(), rtol=2e-3)
