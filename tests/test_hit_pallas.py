"""Pallas hit kernel vs the pure-jnp oracle (SURVEY.md §7 stage 4).

Runs the kernel in interpreter mode on CPU (the TPU analogue of a fake
backend); on real TPU the same comparisons run compiled.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from win32_raytracer_tpu.kernels.experimental.hit_pallas_v1 import hit_spheres_pallas
from win32_raytracer_tpu.ops.hit import hit_spheres
from win32_raytracer_tpu.scene.builders import test_scene as make_test_scene, random_scene

INTERPRET = jax.devices()[0].platform == "cpu"


def _compare(scene, n=256, spread=15.0, seed=0):
    rng = np.random.default_rng(seed)
    o = jnp.asarray(rng.uniform(-spread, spread, (n, 3)), jnp.float32)
    d = jnp.asarray(rng.uniform(-1, 1, (n, 3)), jnp.float32)
    tm = jnp.asarray(rng.uniform(0, 0.05, (n,)), jnp.float32)

    rp = hit_spheres_pallas(scene, o, d, tm, ray_block=128, interpret=INTERPRET)
    rj = hit_spheres(scene, o, d, tm)

    hp, hj = np.asarray(rp.hit), np.asarray(rj.hit)
    # Grazing rays (disc ~ 0) may flip between compilations; require
    # near-total agreement, exact values where both agree.
    assert (hp != hj).mean() < 2e-3, (hp.sum(), hj.sum())
    both = hp & hj
    np.testing.assert_allclose(
        np.asarray(rp.t)[both], np.asarray(rj.t)[both], rtol=1e-4, atol=1e-5)
    same_idx = np.asarray(rp.idx)[both] == np.asarray(rj.idx)[both]
    assert same_idx.mean() > 0.999
    sel = both & (np.asarray(rp.idx) == np.asarray(rj.idx))
    np.testing.assert_array_equal(np.asarray(rp.mat_id)[sel], np.asarray(rj.mat_id)[sel])
    np.testing.assert_allclose(
        np.asarray(rp.albedo)[sel], np.asarray(rj.albedo)[sel], atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(rp.normal)[sel], np.asarray(rj.normal)[sel], rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(
        np.asarray(rp.point)[sel], np.asarray(rj.point)[sel], rtol=1e-3, atol=1e-3)


def test_pallas_vs_jnp_test_scene():
    _compare(make_test_scene(), n=256, spread=5.0)


def test_pallas_vs_jnp_random_scene():
    _compare(random_scene(), n=256, spread=15.0, seed=1)


def test_pallas_ray_padding():
    """N not a multiple of the block is padded internally and unpadded."""
    scene = make_test_scene()
    rng = np.random.default_rng(2)
    o = jnp.asarray(rng.uniform(-5, 5, (77, 3)), jnp.float32)
    d = jnp.asarray(rng.uniform(-1, 1, (77, 3)), jnp.float32)
    tm = jnp.zeros((77,), jnp.float32)
    rp = hit_spheres_pallas(scene, o, d, tm, ray_block=128, interpret=INTERPRET)
    rj = hit_spheres(scene, o, d, tm)
    assert rp.t.shape == (77,)
    both = np.asarray(rp.hit) & np.asarray(rj.hit)
    np.testing.assert_allclose(
        np.asarray(rp.t)[both], np.asarray(rj.t)[both], rtol=1e-4, atol=1e-5)


def test_render_with_pallas_backend_matches_jnp():
    """End-to-end: tiny deterministic render, pallas vs jnp backends."""
    from win32_raytracer_tpu.config import RenderConfig
    from win32_raytracer_tpu.render import render
    from win32_raytracer_tpu.kernels.experimental.hit_pallas_v1 import hit_spheres_pallas
    import functools

    scene = make_test_scene()
    cfg = RenderConfig(width=48, height=24, samples=2, seed=5)
    img_jnp = render(scene, cfg=cfg.replace(backend="jnp"))
    pallas_interp = functools.partial(
        hit_spheres_pallas, ray_block=128, interpret=INTERPRET)
    img_pal = render(scene, cfg=cfg, hit_fn=pallas_interp)
    diff = np.abs(img_pal.astype(int) - img_jnp.astype(int))
    # identical RNG streams; only f32-edge hit flips may differ
    assert (diff > 2).mean() < 0.01
    assert diff.mean() < 0.5


def test_pallas_v2_factored_matches_oracle():
    """v2 (MXU-factored features) under the interpreter vs the jnp oracle."""
    from win32_raytracer_tpu.kernels.experimental.hit_pallas_v2 import hit_spheres_pallas_v2

    scene = random_scene()
    rng = np.random.default_rng(4)
    n = 512
    o = jnp.asarray(rng.uniform(-10, 10, (n, 3)), jnp.float32)
    d = jnp.asarray(rng.uniform(-1, 1, (n, 3)), jnp.float32)
    tm = jnp.asarray(rng.uniform(0, 0.05, (n,)), jnp.float32)
    r2 = hit_spheres_pallas_v2(scene, o, d, tm, ray_block=256,
                               interpret=INTERPRET)
    rj = hit_spheres(scene, o, d, tm)
    hp, hj = np.asarray(r2.hit), np.asarray(rj.hit)
    assert (hp != hj).mean() < 2e-3
    both = hp & hj
    np.testing.assert_allclose(np.asarray(r2.t)[both], np.asarray(rj.t)[both],
                               rtol=2e-2, atol=1e-3)
    assert (np.asarray(r2.idx)[both] == np.asarray(rj.idx)[both]).mean() > 0.99
