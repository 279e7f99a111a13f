"""v7 fused hit+sky kernel vs the composed v6 path (interpret on CPU).

v7 moves ray packing, winner assembly, and the miss->sky/alive update
into the pallas program; it must be BIT-identical to p_hit_step with the
v6 hit function up to the select-formulation (same MXU math, same
epilogue formulas)."""

import numpy as np

import jax
import jax.numpy as jnp

from win32_raytracer_tpu.config import RenderConfig
from win32_raytracer_tpu.kernels.hit_pallas_v6 import hit_spheres_pallas_v6
from win32_raytracer_tpu.kernels.hit_pallas_v7 import (
    hit_coeffs, p_hit_sky_step,
)
from win32_raytracer_tpu.persistent import PathState, p_hit_step
from win32_raytracer_tpu.scene.builders import random_scene

INTERPRET = jax.devices()[0].platform == "cpu"

RB = 256


def _make_state(n):
    rng = np.random.default_rng(5)
    return PathState(
        origin=jnp.asarray(rng.uniform(-12, 12, (3, n)), jnp.float32),
        direction=jnp.asarray(rng.normal(0, 1, (3, n)), jnp.float32),
        time=jnp.asarray(rng.uniform(0, 0.05, (1, n)), jnp.float32),
        throughput=jnp.asarray(rng.uniform(0, 1, (3, n)), jnp.float32),
        radiance_sum=jnp.asarray(rng.uniform(0, 1, (3, n)), jnp.float32),
        depth=jnp.ones((1, n), jnp.int32),
        sample=jnp.zeros((1, n), jnp.int32),
        pixel=jnp.arange(n, dtype=jnp.int32)[None],
        path_alive=jnp.asarray(rng.uniform(0, 1, (1, n)) < 0.8),
        s_base=jnp.zeros((1, n), jnp.int32),
        s_quota=jnp.full((1, n), 4, jnp.int32),
    )


def test_v7_matches_composed_v6_path():
    scene = random_scene()
    st = _make_state(1024)
    cfg = RenderConfig(width=32, height=32, samples=4)

    def hit6(sc, o, d, t, min_t=0.001):
        return hit_spheres_pallas_v6(sc, o, d, t, min_t=min_t,
                                     ray_block=RB, interpret=INTERPRET)

    rec6, st6 = p_hit_step(scene, st, cfg=cfg, hit_fn=hit6)
    rec7, st7 = p_hit_sky_step(hit_coeffs(scene), st, ray_block=RB,
                               interpret=INTERPRET)

    # On TPU the two paths are bit-identical (verified on hardware:
    # bench worker job 220, 2026-08-17).  On CPU the two
    # separately-compiled XLA programs round the bf16 contraction
    # differently (the backend's matmul emulation is not reproducible
    # across programs), so compare at v6's oracle tolerances instead:
    # few boundary flips, t/geometry within split-bf16 error.
    h6, h7 = np.asarray(rec6.hit[0]), np.asarray(rec7.hit[0])
    assert (h6 != h7).mean() < 0.01
    both = h6 & h7
    same = both & (np.asarray(rec6.idx[0]) == np.asarray(rec7.idx[0]))
    assert same.sum() > 0.95 * both.sum()
    np.testing.assert_array_equal(np.asarray(rec6.mat_id[0])[same],
                                  np.asarray(rec7.mat_id[0])[same])
    t6 = np.asarray(rec6.t[0])[same]
    t7 = np.asarray(rec7.t[0])[same]
    rel = np.abs(t7 - t6) / np.maximum(np.abs(t6), 1e-3)
    assert np.median(rel) < 1e-3, np.median(rel)
    assert np.percentile(rel, 99) < 0.1, np.percentile(rel, 99)
    # Material attributes are exact copies of attr rows.
    for f in ("albedo", "fuzz", "ior"):
        np.testing.assert_allclose(
            np.asarray(getattr(rec7, f))[:, same],
            np.asarray(getattr(rec6, f))[:, same],
            rtol=1e-6, atol=1e-6, err_msg=f)
    # Normals are unit-ish (loose: near-tangent t error shifts the point).
    nrm = np.asarray(rec7.normal)[:, same]
    assert np.median(np.abs(np.linalg.norm(nrm, axis=0) - 1.0)) < 1e-3
    # Alive/radiance agree wherever the hit verdict agrees.
    agree = h6 == h7
    np.testing.assert_array_equal(np.asarray(st6.path_alive[0])[agree],
                                  np.asarray(st7.path_alive[0])[agree])
    np.testing.assert_allclose(np.asarray(st7.radiance_sum)[:, agree],
                               np.asarray(st6.radiance_sum)[:, agree],
                               rtol=1e-6, atol=1e-7)


def test_v7_unaligned_batch():
    """Regression for the tail-drop bug: a batch that is NOT a multiple
    of ray_block (and has no 128-multiple divisor) must produce the same
    results as an aligned batch — via block fitting or padding."""
    scene = random_scene()
    st = _make_state(RB * 3 + 40)        # 808: no 128-divisor <= RB
    ref = _make_state(RB * 3 + 40)
    rec_u, st_u = p_hit_sky_step(hit_coeffs(scene), st, ray_block=RB,
                                 interpret=INTERPRET)
    assert rec_u.t.shape == (1, RB * 3 + 40)
    # Same rays through an aligned call (first RB lanes only).
    st_a = type(st)(*(x[:, :RB] for x in ref))
    rec_a, _ = p_hit_sky_step(hit_coeffs(scene), st_a, ray_block=RB,
                              interpret=INTERPRET)
    np.testing.assert_array_equal(np.asarray(rec_u.hit[:, :RB]),
                                  np.asarray(rec_a.hit))
    np.testing.assert_array_equal(np.asarray(rec_u.t[:, :RB]),
                                  np.asarray(rec_a.t))
    # Tail lanes got real results too (not garbage): every tail t is
    # either a genuine hit distance (bounded by the scene diameter) or
    # the F32_MAX miss sentinel — pad junk (tiny or mid-range values
    # from uninitialized memory) fails both.
    tail = np.asarray(rec_u.t[0, RB * 3:])
    assert np.isfinite(np.asarray(st_u.radiance_sum)[:, RB * 3:]).all()
    assert (((tail >= 9e-4) & (tail < 1e5)) | (tail >= 1e30)).all()


def test_v7_sky_on_all_miss():
    """Rays pointing away from every sphere: pure sky, all lanes die."""
    scene = random_scene()
    n = 512
    st = _make_state(n)._replace(
        origin=jnp.zeros((3, n), jnp.float32).at[1].set(5.0),
        direction=jnp.zeros((3, n), jnp.float32).at[1].set(1.0),
        path_alive=jnp.ones((1, n), bool),
        radiance_sum=jnp.zeros((3, n), jnp.float32),
        throughput=jnp.ones((3, n), jnp.float32),
    )
    rec, st2 = p_hit_sky_step(hit_coeffs(scene), st, ray_block=RB,
                              interpret=INTERPRET)
    assert not np.asarray(rec.hit).any()
    assert not np.asarray(st2.path_alive).any()
    # Straight up: unit dir y=1 -> t=1 -> tint (0.5, 0.7, 1.0).
    np.testing.assert_allclose(
        np.asarray(st2.radiance_sum),
        np.broadcast_to(np.array([[0.5], [0.7], [1.0]], np.float32),
                        (3, n)), rtol=1e-6)


def test_hit_terms_knob_plumbs_to_coeffs_and_kernel():
    """cfg.hit_terms selects the limb-pair count purely through the
    coeff stacks (K = 16*n_terms); the kernels derive the pair list
    from the shape.  n_terms=3 must agree with n_terms=6 on all but
    grazing-measure-zero lanes."""
    from win32_raytracer_tpu.kernels.hit_pallas_v7 import hit_coeffs
    from win32_raytracer_tpu.kernels.bounce_pallas import p_bounce_fused
    from win32_raytracer_tpu.persistent import make_dims, step_cfg
    from win32_raytracer_tpu.config import RenderConfig
    from win32_raytracer_tpu.scene.camera import default_camera

    scene = random_scene()
    c6 = hit_coeffs(scene)
    c3 = hit_coeffs(scene, 3)
    assert c6[0].shape[1] == 96 and c3[0].shape[1] == 48
    cfg = RenderConfig(width=32, height=16, samples=4, lanes_per_pixel=2)
    cam = default_camera(32, 16)
    st = _make_state(1024)
    dims = make_dims(cfg, 32, 16, 4, 2)
    kw = dict(cfg=step_cfg(cfg), ray_block=256, interpret=INTERPRET)
    out6 = p_bounce_fused(c6, cam, st, np.uint32(7), jnp.int32(2), dims,
                          **kw)
    out3 = p_bounce_fused(c3, cam, st, np.uint32(7), jnp.int32(2), dims,
                          **kw)
    agree = (np.asarray(out6.path_alive[0])
             == np.asarray(out3.path_alive[0]))
    assert agree.mean() > 0.99
    o6 = np.asarray(out6.origin)[:, agree]
    o3 = np.asarray(out3.origin)[:, agree]
    # n_terms=3 carries ~2^-17-per-product discriminant error: scatter
    # origins drift past 1e-3 on a few % of lanes (documented stance);
    # the test gates PLUMBING, not precision.
    close = np.isclose(o6, o3, rtol=1e-2, atol=1e-2).all(axis=0)
    assert close.mean() > 0.95, close.mean()
