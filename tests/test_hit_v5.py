"""v5 (MXU-quadratic) hit kernel vs the jnp brute sweep.

Same comparison discipline as test_hit_pallas.py: near-total hit/idx
agreement (grazing rays may flip — v5's MXU contractions round differently
than the scan's fma chains), exact-ish values where both agree.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from win32_raytracer_tpu.kernels.experimental.hit_pallas_v5 import hit_spheres_pallas_v5
from win32_raytracer_tpu.ops.hit import hit_spheres
from win32_raytracer_tpu.scene.builders import (
    random_scene, test_scene as make_test_scene)

INTERPRET = jax.devices()[0].platform == "cpu"


def _compare(scene, n=1024, spread=15.0, seed=0):
    rng = np.random.default_rng(seed)
    o = rng.uniform(-spread, spread, (n, 3))
    d = rng.normal(0, 1, (n, 3))
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    tm = rng.uniform(0, 0.05, (n,))
    o_r = jnp.asarray(o.T, jnp.float32)
    d_r = jnp.asarray(d.T, jnp.float32)
    t_r = jnp.asarray(tm[None], jnp.float32)

    rp = hit_spheres_pallas_v5(scene, o_r, d_r, t_r, ray_block=256,
                               interpret=INTERPRET)
    rj = hit_spheres(scene, jnp.asarray(o, jnp.float32),
                     jnp.asarray(d, jnp.float32),
                     jnp.asarray(tm, jnp.float32))

    hp, hj = np.asarray(rp.hit[0]), np.asarray(rj.hit)
    assert (hp != hj).mean() < 5e-3, (hp.sum(), hj.sum())
    both = hp & hj
    same_idx = np.asarray(rp.idx[0])[both] == np.asarray(rj.idx)[both]
    assert same_idx.mean() > 0.995
    sel = both.copy()
    sel[both] &= same_idx
    np.testing.assert_allclose(np.asarray(rp.t[0])[sel],
                               np.asarray(rj.t)[sel], rtol=2e-3, atol=2e-3)
    np.testing.assert_array_equal(np.asarray(rp.mat_id[0])[sel],
                                  np.asarray(rj.mat_id)[sel])
    np.testing.assert_allclose(np.asarray(rp.albedo)[:, sel],
                               np.asarray(rj.albedo)[sel].T, atol=1e-6)
    np.testing.assert_allclose(np.asarray(rp.normal)[:, sel],
                               np.asarray(rj.normal)[sel].T,
                               rtol=0, atol=5e-2)


def test_v5_vs_jnp_random_scene():
    _compare(random_scene(), seed=1)


def test_v5_vs_jnp_test_scene():
    _compare(make_test_scene(), spread=5.0, seed=2)


def test_v5_motion_blur_times():
    """Motion matters: the same rays at shutter open vs close must hit the
    moving lambertians at different positions (t changes)."""
    scene = random_scene()
    rng = np.random.default_rng(3)
    n = 512
    o = np.tile([0.0, 6.0, 0.0], (n, 1))
    tgt = rng.uniform([-11, 0.2, -11], [11, 0.3, 11], (n, 3))
    d = tgt - o
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    o_r = jnp.asarray(o.T, jnp.float32)
    d_r = jnp.asarray(d.T, jnp.float32)
    r0 = hit_spheres_pallas_v5(scene, o_r, d_r,
                               jnp.zeros((1, n), jnp.float32),
                               ray_block=256, interpret=INTERPRET)
    r1 = hit_spheres_pallas_v5(scene, o_r, d_r,
                               jnp.full((1, n), 0.05, jnp.float32),
                               ray_block=256, interpret=INTERPRET)
    both = np.asarray(r0.hit[0]) & np.asarray(r1.hit[0])
    # Many moving-sphere hits must differ between the two shutter times.
    diff = (np.abs(np.asarray(r0.t[0]) - np.asarray(r1.t[0])) > 1e-4) & both
    assert diff.mean() > 0.05, diff.mean()
