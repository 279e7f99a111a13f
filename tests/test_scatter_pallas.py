"""Pallas fused scatter+respawn kernel vs the jnp step (interpret on CPU).

The kernel reimplements hash_uniform01 in-kernel with global lane
counters, so its draws are bit-identical to the jnp step's: the two paths
must agree exactly on integer/bool state and to float round-off on ray
state, plus structural invariants (respawn rays on the lens disc etc.).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from win32_raytracer_tpu.config import RenderConfig
from win32_raytracer_tpu.core import materials as mat
from win32_raytracer_tpu.kernels.dispatch import get_hit_fn_rows
from win32_raytracer_tpu.persistent import (
    PathState, make_dims, p_hit_step, p_respawn_step,
    p_scatter_respawn_step, step_cfg,
)
from win32_raytracer_tpu.scene.builders import random_scene
from win32_raytracer_tpu.scene.camera import default_camera

INTERPRET = jax.devices()[0].platform == "cpu"

W, H, SPP, KPP = 64, 32, 8, 2
RB = 256


@pytest.fixture(scope="module")
def setup():
    scene = random_scene()
    cam = default_camera(W, H)
    cfg = RenderConfig(width=W, height=H, samples=SPP, backend="jnp",
                       lanes_per_pixel=KPP)
    n = H * W * KPP
    quota = SPP // KPP
    st = PathState(
        origin=jnp.zeros((3, n), jnp.float32),
        direction=jnp.zeros((3, n), jnp.float32).at[2, :].set(1.0),
        time=jnp.zeros((1, n), jnp.float32),
        throughput=jnp.ones((3, n), jnp.float32),
        radiance_sum=jnp.zeros((3, n), jnp.float32),
        depth=jnp.zeros((1, n), jnp.int32),
        sample=jnp.full((1, n), -1, jnp.int32),
        pixel=jnp.arange(n, dtype=jnp.int32)[None],
        path_alive=jnp.zeros((1, n), bool),
        s_base=(jnp.arange(n, dtype=jnp.int32) % KPP * quota)[None],
        s_quota=jnp.full((1, n), quota, jnp.int32),
    )
    salt = np.uint32(0xC0FFEE)
    hit_fn = get_hit_fn_rows(cfg)
    dims = make_dims(cfg, W, H, SPP, KPP)
    st = p_respawn_step(cam, st, salt, jnp.int32(0), dims,
                        cfg=step_cfg(cfg))
    # A few bounces so the state has mixed depths/materials.
    for k in (1, 2):
        rec, st = p_hit_step(scene, st, cfg=cfg, hit_fn=hit_fn)
        st = p_scatter_respawn_step(scene, cam, st, rec, salt, jnp.int32(k),
                                    dims, cfg=step_cfg(cfg))
    rec, st = p_hit_step(scene, st, cfg=cfg, hit_fn=hit_fn)
    return scene, cam, cfg, st, rec, salt


def _run_both(setup):
    from win32_raytracer_tpu.kernels.scatter_pallas import (
        scatter_respawn_pallas,
    )
    scene, cam, cfg, st, rec, salt = setup
    dims = make_dims(cfg, W, H, SPP, KPP)
    out_j = p_scatter_respawn_step(scene, cam, st, rec, salt, jnp.int32(3),
                                   dims, cfg=step_cfg(cfg))
    out_p = scatter_respawn_pallas(scene, cam, st, rec, salt, jnp.int32(3),
                                   dims, cfg=step_cfg(cfg), ray_block=RB,
                                   interpret=INTERPRET)
    return st, rec, out_j, out_p


def test_scatter_pallas_structure(setup):
    st, rec, out_j, out_p = _run_both(setup)
    alive = np.asarray(st.path_alive[0])
    # Bit-identical draws => exact agreement on integer/bool state and
    # float agreement to round-off on ray state.
    np.testing.assert_array_equal(np.asarray(out_j.sample),
                                  np.asarray(out_p.sample))
    np.testing.assert_array_equal(np.asarray(out_j.depth),
                                  np.asarray(out_p.depth))
    np.testing.assert_array_equal(np.asarray(out_j.path_alive),
                                  np.asarray(out_p.path_alive))
    for f in ("origin", "direction", "time", "throughput"):
        np.testing.assert_allclose(
            np.asarray(getattr(out_p, f)), np.asarray(getattr(out_j, f)),
            rtol=2e-5, atol=2e-6, err_msg=f)
    # Dead, non-respawning lanes pass through bit-identically.
    passthru = ~alive & ~np.asarray(out_p.path_alive[0])
    for f in ("origin", "direction", "time", "throughput", "depth"):
        a = np.asarray(getattr(out_p, f))[:, passthru]
        b = np.asarray(getattr(st, f))[:, passthru]
        np.testing.assert_array_equal(a, b, err_msg=f)
    # Scattered lambertian lanes: origin == hit point + eps*normal exactly.
    lam = alive & (np.asarray(rec.mat_id[0]) == mat.LAMBERTIAN)
    lam &= np.asarray(out_p.path_alive[0]) & (np.asarray(out_p.depth[0]) > 0)
    expect = (np.asarray(rec.point) + 1e-5 * np.asarray(rec.normal))[:, lam]
    np.testing.assert_allclose(np.asarray(out_p.origin)[:, lam], expect,
                               rtol=1e-5, atol=1e-6)
    # Dielectric lanes keep throughput (attenuation 1).
    die = alive & (np.asarray(rec.mat_id[0]) == mat.DIELECTRIC)
    np.testing.assert_allclose(np.asarray(out_p.throughput)[:, die],
                               np.asarray(st.throughput)[:, die],
                               rtol=1e-6)


def test_scatter_pallas_respawn_rays(setup):
    scene, cam, cfg, st, rec, salt = setup
    st2, rec2, out_j, out_p = _run_both(setup)
    started = (np.asarray(out_p.depth[0]) == 0) & np.asarray(
        out_p.path_alive[0])
    assert started.sum() > 50
    # Respawned time is inside the shutter window.
    tm = np.asarray(out_p.time[0])[started]
    assert (tm >= float(cam.shutter_open) - 1e-6).all()
    assert (tm <= float(cam.shutter_close) + 1e-6).all()
    # Respawned origins sit on the lens disc around the camera origin.
    o = np.asarray(out_p.origin)[:, started] - np.asarray(cam.origin)[:, None]
    assert (np.linalg.norm(o, axis=0) <= float(cam.lens_radius) + 1e-5).all()
    # Throughput reset.
    np.testing.assert_allclose(np.asarray(out_p.throughput)[:, started], 1.0)


def test_scatter_pallas_render_statistics(setup):
    """Full renders via both scatter paths agree within MC noise."""
    from win32_raytracer_tpu.kernels.scatter_pallas import (
        scatter_respawn_pallas,
    )
    import win32_raytracer_tpu.persistent as P
    from win32_raytracer_tpu.persistent import render_image_persistent
    scene, cam, cfg, *_ = setup

    # Drop the compaction floor so the tiny test batch takes the
    # NON-fused path (which is where the scatter backend is dispatched);
    # at the default floor the whole render runs p_bounce_step and the
    # monkeypatch would never be exercised.
    import functools
    orig_floor = P._COMPACT_FLOOR
    P._COMPACT_FLOOR = 0
    try:
        img_j = np.asarray(render_image_persistent(scene, cam, cfg))
        orig = P.p_scatter_respawn_step
        P.p_scatter_respawn_step = functools.partial(
            scatter_respawn_pallas, ray_block=RB, interpret=INTERPRET)
        try:
            img_p = np.asarray(render_image_persistent(scene, cam, cfg))
        finally:
            P.p_scatter_respawn_step = orig
    finally:
        P._COMPACT_FLOOR = orig_floor
    assert np.isfinite(img_p).all()
    diff = np.abs(img_j - img_p)
    assert diff.mean() < 1e-4, diff.mean()  # bit-identical draws


def test_scatter_pallas_lean_bit_exact(setup):
    """lean=True (strat/RR compiled out) must be BIT-identical to
    lean=False when the dims encode strat off ((kx, ky) == (1, 1)) and
    RR off (rr_start > max_depth) — the identities the flag relies on."""
    from win32_raytracer_tpu.kernels.scatter_pallas import (
        scatter_respawn_pallas,
    )
    scene, cam, cfg, st, rec, salt = setup
    dims = make_dims(cfg, W, H, SPP, KPP)
    assert not cfg.stratify and not cfg.russian_roulette
    full = scatter_respawn_pallas(scene, cam, st, rec, salt, jnp.int32(3),
                                  dims, cfg=step_cfg(cfg), ray_block=RB,
                                  interpret=INTERPRET, lean=False)
    ln = scatter_respawn_pallas(scene, cam, st, rec, salt, jnp.int32(3),
                                dims, cfg=step_cfg(cfg), ray_block=RB,
                                interpret=INTERPRET, lean=True)
    for f in PathState._fields:
        a, b = np.asarray(getattr(full, f)), np.asarray(getattr(ln, f))
        np.testing.assert_array_equal(a, b, err_msg=f)
