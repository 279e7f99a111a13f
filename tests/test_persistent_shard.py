"""Multi-device persistent scheduler on the virtual 8-device CPU mesh."""

import numpy as np

import jax
import jax.numpy as jnp
import pytest

from win32_raytracer_tpu.config import RenderConfig
from win32_raytracer_tpu.parallel.persistent_shard import (
    _interleaved_pixel_lanes, render_image_persistent_sharded)
from win32_raytracer_tpu.parallel.shard import make_mesh
from win32_raytracer_tpu.persistent import render_image_persistent
from win32_raytracer_tpu.render import tonemap
from win32_raytracer_tpu.scene.builders import test_scene as make_test_scene


def test_interleaved_lane_partition():
    """Every pixel-lane id appears exactly once with nonzero quota; all
    shards are equal-sized (wrap-padded lanes carry zero quota)."""
    h, w, kpp, d = 37, 16, 2, 8
    lanes = _interleaved_pixel_lanes(h, w, kpp, d)
    assert lanes.shape[0] == d
    flat = lanes.reshape(-1)
    # All real lanes covered.
    assert set(flat.tolist()) == set(range(h * w * kpp))


def test_sharded_matches_single_device():
    scene = make_test_scene()
    cfg = RenderConfig(width=64, height=32, samples=16, seed=5,
                       backend="jnp")
    mesh = make_mesh(8)
    img_s = np.asarray(tonemap(render_image_persistent_sharded(
        scene, None, cfg, mesh)))
    img_1 = np.asarray(tonemap(render_image_persistent(scene, None, cfg)))
    diff = np.abs(img_s.astype(float) - img_1.astype(float))
    # Different RNG streams -> Monte-Carlo noise only.
    assert diff.mean() < 4.0, diff.mean()


def test_sharded_non_divisible_height_matches_single_device():
    """Heights with H % (block_rows * D) != 0 (here 37 % 64) exercise the
    wrap-padded short last block across shards — sample accounting and
    the ladder padding must survive it (VERDICT r3 item 7)."""
    scene = make_test_scene()
    cfg = RenderConfig(width=48, height=37, samples=16, seed=9,
                       backend="jnp")
    mesh = make_mesh(8)
    img_s = np.asarray(tonemap(render_image_persistent_sharded(
        scene, None, cfg, mesh)))
    img_1 = np.asarray(tonemap(render_image_persistent(scene, None, cfg)))
    assert img_s.shape == img_1.shape == (37, 48, 3)
    diff = np.abs(img_s.astype(float) - img_1.astype(float))
    assert diff.mean() < 4.0, diff.mean()


def test_sharded_16_device_mesh():
    """A 16-device mesh (twice the usual virtual mesh) renders and
    matches the single-chip driver — shard-count generality beyond the
    8-wide default (VERDICT r3 item 7)."""
    if jax.device_count() < 16:
        pytest.skip("needs 16 virtual devices")
    scene = make_test_scene()
    cfg = RenderConfig(width=48, height=32, samples=16, seed=7,
                       backend="jnp")
    mesh = make_mesh(16)
    img_s = np.asarray(tonemap(render_image_persistent_sharded(
        scene, None, cfg, mesh)))
    img_1 = np.asarray(tonemap(render_image_persistent(scene, None, cfg)))
    diff = np.abs(img_s.astype(float) - img_1.astype(float))
    assert diff.mean() < 4.0, diff.mean()


def test_sharded_above_floor_compaction_path(monkeypatch):
    """Shrink the compaction floor so a CPU-sized sharded render runs
    the ABOVE-floor quantized compaction + below-floor tail path (the
    code the production +38%-overhead investigation lives in), not just
    the whole-chunk finisher."""
    import win32_raytracer_tpu.persistent as P
    import win32_raytracer_tpu.parallel.persistent_shard as PS

    # Both modules: _grid_size reads persistent's global, the sharded
    # driver's per-shard floor reads its from-import binding.
    monkeypatch.setattr(P, "_COMPACT_FLOOR", 2048)
    monkeypatch.setattr(PS, "_COMPACT_FLOOR", 2048)
    scene = make_test_scene()
    # 64x64 kpp4 = 2048 lanes/shard on 8 devices; per-shard floor
    # max(2048//8, 1024) = 1024 < 2048, so compactions fire.
    cfg = RenderConfig(width=64, height=64, samples=16, seed=12,
                       backend="jnp", one_shot="off")
    mesh = make_mesh(8)
    img_s = np.asarray(tonemap(render_image_persistent_sharded(
        scene, None, cfg, mesh)))
    img_1 = np.asarray(tonemap(render_image_persistent(scene, None, cfg)))
    diff = np.abs(img_s.astype(float) - img_1.astype(float))
    assert diff.mean() < 4.0, diff.mean()


def test_sharded_staged_matches_host_loop():
    """one_shot='staged' on the mesh: per-shard device-side until-loops
    with lockstep compact+split between stages must statistically match
    the host-loop driver (same estimator, different event cadence)."""
    scene = make_test_scene()
    # 96x64 kpp8 = 6144 lanes/shard on 8 devices: above 2*min_lanes
    # (2048), so the until-loop stages + lockstep compact+split run
    # (64x32 would fall straight through to the finish_sm fallback).
    cfg = RenderConfig(width=96, height=64, samples=16, seed=5,
                       backend="jnp")
    mesh = make_mesh(8)
    stg = np.asarray(tonemap(render_image_persistent_sharded(
        scene, None, cfg.replace(one_shot="staged"), mesh)))
    host = np.asarray(tonemap(render_image_persistent_sharded(
        scene, None, cfg.replace(one_shot="off"), mesh)))
    diff = np.abs(stg.astype(float) - host.astype(float))
    assert diff.mean() < 4.0, diff.mean()


def test_sharded_multi_k_is_bitwise_invariant():
    """cfg.multi_k regroups the sharded tail's bounces into fewer
    shard_map dispatches (the fori_loop width in _steps.bounce_multi);
    draws key on (salt, step, lane), so the render is bit-identical."""
    scene = make_test_scene()
    cfg = RenderConfig(width=64, height=32, samples=16, seed=5,
                       backend="jnp", one_shot="off")
    mesh = make_mesh(8)
    base = np.asarray(render_image_persistent_sharded(
        scene, None, cfg, mesh))
    k8 = np.asarray(render_image_persistent_sharded(
        scene, None, cfg.replace(multi_k=8), mesh))
    np.testing.assert_array_equal(base, k8)


def test_sharded_sample_accounting_sky():
    """Sky-only view: every pixel must average exactly its spp sky draws
    (values inside the gradient range; no double/missing samples from the
    interleaved partition or wrap padding)."""
    from win32_raytracer_tpu.scene.camera import make_camera
    scene = make_test_scene()
    cam = make_camera((0, 50, 0), (0, 51, 0), (1, 0, 0), 60.0, 2.0, 0.0, 1.0)
    cfg = RenderConfig(width=32, height=22, samples=8, seed=1, backend="jnp")
    mesh = make_mesh(8)
    lin = np.asarray(render_image_persistent_sharded(scene, cam, cfg, mesh))
    assert lin.min() >= 0.5 - 1e-5 and lin.max() <= 1.0 + 1e-5


def test_sharded_multiframe_matches_single_device():
    """Multi-frame contract on the mesh: F frames as one virtual tall
    image sharded over interleaved row-blocks must statistically match
    the single-device multi-frame render of the same cameras."""
    from win32_raytracer_tpu.animation import orbit_path

    scene = make_test_scene()
    cfg = RenderConfig(width=32, height=16, samples=16, seed=6,
                       backend="jnp")
    cams = orbit_path(look_to=(0, 0.5, 0), radius=12.0, height=2.0,
                      n_frames=3, aspect_ratio=2.0)
    mesh = make_mesh(4)
    lin_s = np.asarray(render_image_persistent_sharded(
        scene, cams, cfg, mesh))
    lin_1 = np.asarray(render_image_persistent(scene, cams, cfg))
    assert lin_s.shape == lin_1.shape == (3, 16, 32, 3)
    a = np.asarray(tonemap(lin_s.reshape(-1, 32, 3))).astype(float)
    b = np.asarray(tonemap(lin_1.reshape(-1, 32, 3))).astype(float)
    assert np.abs(a - b).mean() < 4.0
    # frames actually differ (camera motion inside the batch)
    assert np.abs(lin_s[0] - lin_s[2]).mean() > 0.005


def test_sharded_multiframe_adaptive():
    """adaptive_alloc='on' composes with the multi-frame mesh contract."""
    from win32_raytracer_tpu.animation import orbit_path

    scene = make_test_scene()
    cams = orbit_path(look_to=(0, 0.5, 0), radius=12.0, height=2.0,
                      n_frames=2, aspect_ratio=1.5)
    mesh = make_mesh(4)
    cfg = RenderConfig(width=24, height=16, samples=16, seed=3,
                       backend="jnp")
    base = np.asarray(render_image_persistent_sharded(
        scene, cams, cfg, mesh))
    img = np.asarray(render_image_persistent_sharded(
        scene, cams, cfg.replace(adaptive_alloc="on"), mesh))
    assert img.shape == base.shape == (2, 16, 24, 3)
    d = np.abs(np.sqrt(np.clip(img, 0, 1)) - np.sqrt(np.clip(base, 0, 1)))
    assert d.mean() < 0.04, d.mean()


def test_sharded_composite_mesh_scene():
    """The composite spheres+triangles scene renders over the mesh and
    statistically matches the single-device render (the triangle hit
    path rides the same per-shard hit_fn dispatch)."""
    from win32_raytracer_tpu.scene.builders import mesh_scene

    scene = mesh_scene()
    cfg = RenderConfig(width=32, height=16, samples=8, seed=3,
                       backend="jnp")
    lin_s = np.asarray(render_image_persistent_sharded(
        scene, None, cfg, make_mesh(4)))
    lin_1 = np.asarray(render_image_persistent(scene, None, cfg))
    assert lin_s.shape == (16, 32, 3)
    assert np.abs(lin_s - lin_1).mean() < 0.05


def test_sharded_binned_grid_render():
    """accel='grid' + jnp backend over the mesh: each shard bin-sorts its
    own lanes (per-shard _bin_sort_sm, no cross-shard traffic) and the
    result statistically matches the single-chip binned render."""
    from win32_raytracer_tpu.parallel import persistent_shard as PS
    from win32_raytracer_tpu.scene.builders import mesh_scene

    scene = mesh_scene(subdivisions=3)
    cfg = RenderConfig(width=32, height=16, samples=8, seed=5,
                       backend="jnp", accel="grid")
    before = PS._bin_sort_sm.cache_info().misses
    lin_s = np.asarray(render_image_persistent_sharded(
        scene, None, cfg, make_mesh(4)))
    assert PS._bin_sort_sm.cache_info().misses > before  # sort really ran
    lin_1 = np.asarray(render_image_persistent(scene, None, cfg))
    assert lin_s.shape == (16, 32, 3)
    d = np.abs(np.sqrt(np.clip(lin_s, 0, 1)) - np.sqrt(np.clip(lin_1, 0, 1)))
    assert d.mean() < 0.04, d.mean()


def test_sharded_tri_rebin_matches_off_exactly():
    """tri_rebin='on' over the mesh: the working-set sort lives inside
    the per-shard hit fn and never permutes state lanes, so the sharded
    render is bitwise the rebin-off sharded render."""
    from win32_raytracer_tpu.scene.builders import mesh_scene

    scene = mesh_scene(subdivisions=3)
    cfg = RenderConfig(width=32, height=16, samples=8, seed=5,
                       backend="jnp", accel="grid", ray_binning="off")
    base = np.asarray(render_image_persistent_sharded(
        scene, None, cfg, make_mesh(4)))
    reb = np.asarray(render_image_persistent_sharded(
        scene, None, cfg.replace(tri_rebin="on"), make_mesh(4)))
    np.testing.assert_array_equal(reb, base)


def test_sharded_one_shot_matches_host_loop():
    """one_shot on vs off over the mesh: each shard's tail runs in one
    device-side while_loop vs the host-checked loop — same estimator,
    statistical parity.  Also: the explicit knob must round-trip (the
    tiny default batch takes the whole-batch shortcut under 'on')."""
    scene = make_test_scene()
    cfg = RenderConfig(width=64, height=32, samples=16, seed=8,
                       backend="jnp")
    mesh = make_mesh(8)
    on = np.asarray(render_image_persistent_sharded(
        scene, None, cfg.replace(one_shot="on"), mesh))
    off = np.asarray(render_image_persistent_sharded(
        scene, None, cfg.replace(one_shot="off"), mesh))
    assert on.shape == off.shape == (32, 64, 3)
    d = np.abs(np.sqrt(np.clip(on, 0, 1)) - np.sqrt(np.clip(off, 0, 1)))
    assert d.mean() < 0.03, d.mean()


def test_sharded_one_shot_conflict_raises():
    """Binned mesh renders need the host loop's per-period bin sorts:
    explicit one_shot='on' raises on the sharded driver too."""
    from win32_raytracer_tpu.scene.builders import mesh_scene

    scene = mesh_scene(subdivisions=3)
    cfg = RenderConfig(width=32, height=16, samples=8, seed=2,
                       backend="jnp", accel="grid", one_shot="on")
    with pytest.raises(ValueError, match="one_shot"):
        render_image_persistent_sharded(scene, None, cfg, make_mesh(4))


def test_sharded_sample_accounting_sky_same_shard_wrap():
    """Height chosen so the short last row-block wraps rows onto the
    SAME shard that owns block 0 ((ceil(h/8)-1) % d == 0, h % 8 != 0):
    the wrap dedupe must be first-occurrence-aware WITHIN a shard, or
    the duplicated rows get quota twice and render ~2x bright
    (round-2 regression: vectorized ~first_seen marked both copies
    fresh)."""
    from win32_raytracer_tpu.scene.camera import make_camera
    scene = make_test_scene()
    cam = make_camera((0, 50, 0), (0, 51, 0), (1, 0, 0), 60.0, 2.0, 0.0, 1.0)
    h = 67  # ceil(67/8) = 9 blocks; block 8 lands on shard 0 and wraps
    cfg = RenderConfig(width=16, height=h, samples=8, seed=1,
                       backend="jnp")
    mesh = make_mesh(8)
    lin = np.asarray(render_image_persistent_sharded(scene, cam, cfg, mesh))
    assert lin.min() >= 0.5 - 1e-5 and lin.max() <= 1.0 + 1e-5, (
        lin.min(), lin.max())


def test_sharded_route_compactor_matches_sort(monkeypatch):
    """compactor='route' on the mesh: the router engine must reproduce
    the sort engine's sharded render (identical surviving-lane slots per
    shard -> identical draws; only flush summation order differs)."""
    import win32_raytracer_tpu.persistent as P
    import win32_raytracer_tpu.parallel.persistent_shard as PS

    monkeypatch.setattr(P, "_COMPACT_FLOOR", 2048)
    monkeypatch.setattr(PS, "_COMPACT_FLOOR", 2048)
    scene = make_test_scene()
    cfg = RenderConfig(width=64, height=64, samples=16, seed=12,
                       backend="jnp", one_shot="off")
    mesh = make_mesh(8)
    base = np.asarray(render_image_persistent_sharded(
        scene, None, cfg, mesh))
    routed = np.asarray(render_image_persistent_sharded(
        scene, None, cfg.replace(compactor="route"), mesh))
    assert np.isfinite(routed).all()
    np.testing.assert_allclose(routed, base, rtol=2e-5, atol=2e-6)
