"""Pallas grid kernel vs the brute sweep (interpret mode on CPU).

Same comparison discipline as test_hit_pallas.py: near-total hit/idx
agreement (grazing rays may flip under fma variance), exact values where
both agree.  Uses realistic spatially-local ray batches so some tiles are
actually skipped (the interesting code path).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from win32_raytracer_tpu.accel import build_grid_accel
from win32_raytracer_tpu.kernels.experimental.hit_grid import hit_spheres_grid_pallas
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


def _batch(n, rb, seed, mode):
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
    return (jnp.asarray(o, jnp.float32), jnp.asarray(d, jnp.float32),
            jnp.asarray(tm, jnp.float32))


@pytest.mark.parametrize("mode", ["primary", "bounce"])
def test_grid_pallas_vs_brute(scene, gscene, mode, rb=256):
    o, d, tm = _batch(1024, rb, {"primary": 3, "bounce": 4}[mode], mode)
    rp = hit_spheres_grid_pallas(gscene, o, d, tm, ray_block=rb,
                                 interpret=INTERPRET)
    rj = hit_spheres(scene, o, d, tm)

    hp, hj = np.asarray(rp.hit), np.asarray(rj.hit)
    assert (hp != hj).mean() < 2e-3, (hp.sum(), hj.sum())
    both = hp & hj
    same_idx = np.asarray(rp.idx)[both] == np.asarray(rj.idx)[both]
    assert same_idx.mean() > 0.998
    sel = both.copy()
    sel[both] &= same_idx
    np.testing.assert_allclose(
        np.asarray(rp.t)[sel], np.asarray(rj.t)[sel], rtol=5e-4, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(rp.mat_id)[sel],
                                  np.asarray(rj.mat_id)[sel])
    np.testing.assert_allclose(np.asarray(rp.albedo)[sel],
                               np.asarray(rj.albedo)[sel], atol=1e-6)
    np.testing.assert_allclose(np.asarray(rp.normal)[sel],
                               np.asarray(rj.normal)[sel], rtol=0, atol=2e-2)


def test_grid_pallas_padding(scene, gscene):
    """N not a multiple of the ray block pads internally, unpads on return."""
    o, d, tm = _batch(512, 256, 5, "bounce")
    o, d, tm = o[:300], d[:300], tm[:300]
    rp = hit_spheres_grid_pallas(gscene, o, d, tm, ray_block=256,
                                 interpret=INTERPRET)
    assert rp.hit.shape == (300,)
    rj = hit_spheres(scene, o, d, tm)
    assert (np.asarray(rp.hit) != np.asarray(rj.hit)).mean() < 2e-3
