"""Allocator invariants for difficulty-adaptive lane allocation.

The allocator (adaptive.alloc_lanes) must produce EXACT sample
accounting whatever the difficulty input: every pixel keeps >= 1 lane,
the lane budget is hit exactly, and each pixel's lanes partition its
remaining sample range disjointly and completely — the same invariant
the uniform layout satisfies by construction (persistent.py PathState
init).  Rounding/f32-cumsum noise may only move lane COUNTS around,
never break accounting.
"""

import numpy as np
import pytest

from win32_raytracer_tpu.adaptive import alloc_lanes


def _check_invariants(pixel, s_base, s_quota, *, P, L, spp_done, spp):
    pixel, s_base, s_quota = (np.asarray(a[0]) for a in
                              (pixel, s_base, s_quota))
    assert pixel.shape == (L,)
    # ascending, contiguous per pixel, every pixel present
    assert (np.diff(pixel) >= 0).all()
    assert set(np.unique(pixel)) == set(range(P))
    # per-pixel sample ranges partition [spp_done, spp)
    for p in range(P):
        m = pixel == p
        ivs = sorted(zip(s_base[m], s_base[m] + s_quota[m]))
        cur = spp_done
        for lo, hi in ivs:
            assert lo == cur, (p, ivs)
            cur = hi
        assert cur == spp, (p, ivs)


@pytest.mark.parametrize("seed", [0, 3])
@pytest.mark.parametrize("P,L,spp_done,spp,kmax", [
    (64, 256, 4, 100, 32),
    (64, 64, 0, 7, 4),        # budget == floor: everyone gets exactly 1
    (10, 173, 2, 10, 8),      # prime-ish budget, tiny spp_rest
])
def test_alloc_invariants(seed, P, L, spp_done, spp, kmax):
    rng = np.random.default_rng(seed)
    est = rng.uniform(1.0, 11.0, P).astype(np.float32)
    pixel, s_base, s_quota = alloc_lanes(
        est, n_lanes=L, spp_done=spp_done, spp=spp, kpp_max=kmax)
    _check_invariants(pixel, s_base, s_quota,
                      P=P, L=L, spp_done=spp_done, spp=spp)


def test_alloc_monotone_in_difficulty():
    # A 10x harder pixel must get strictly more lanes than an easy one
    # when the pool has room.
    P, L = 128, 512
    est = np.ones(P, np.float32)
    est[7] = 10.0
    pixel, _, s_quota = alloc_lanes(est, n_lanes=L, spp_done=4, spp=100,
                                    kpp_max=32)
    pixel = np.asarray(pixel[0])
    counts = np.bincount(pixel, minlength=P)
    assert counts[7] > counts[3] * 2
    # and its quota per lane is correspondingly smaller
    s_quota = np.asarray(s_quota[0])
    assert s_quota[pixel == 7].max() < s_quota[pixel == 3].min()


def test_alloc_extreme_skew_keeps_floor():
    # One pixel hogging all difficulty must not starve the others.
    P, L = 32, 96
    est = np.full(P, 1e-3, np.float32)
    est[0] = 1e6
    pixel, s_base, s_quota = alloc_lanes(est, n_lanes=L, spp_done=0,
                                         spp=16, kpp_max=16)
    _check_invariants(pixel, s_base, s_quota, P=P, L=L, spp_done=0, spp=16)


def test_adaptive_render_matches_uniform():
    """Adaptive two-phase render must statistically match the uniform
    persistent render (different RNG consumption => not bitwise) and be
    deterministic run-to-run."""
    import jax.numpy as jnp

    from win32_raytracer_tpu.config import RenderConfig
    from win32_raytracer_tpu.persistent import render_image_persistent
    from win32_raytracer_tpu.scene.builders import test_scene

    scene = test_scene()
    cfg = RenderConfig(width=64, height=48, samples=16, backend="jnp",
                       scheduler="persistent", seed=5)
    base = np.asarray(render_image_persistent(scene, None, cfg))
    cfg_a = cfg.replace(adaptive_alloc="on")
    img = np.asarray(render_image_persistent(scene, None, cfg_a))
    img2 = np.asarray(render_image_persistent(scene, None, cfg_a))
    assert np.array_equal(img, img2), "adaptive render not deterministic"
    # tonemapped mean abs diff: Monte Carlo noise at 16 spp across two
    # independent sample streams stays well under this bound
    d = np.abs(np.sqrt(np.clip(img, 0, 1)) - np.sqrt(np.clip(base, 0, 1)))
    assert d.mean() < 0.035, d.mean()
    assert img.shape == base.shape == (48, 64, 3)


def test_adaptive_guard_raises():
    from win32_raytracer_tpu.config import RenderConfig
    from win32_raytracer_tpu.persistent import render_image_persistent
    from win32_raytracer_tpu.scene.builders import test_scene

    scene = test_scene()
    cfg = RenderConfig(width=8, height=8, samples=4, backend="jnp",
                       adaptive_alloc="on", lanes_per_pixel=4)
    with pytest.raises(ValueError, match="adaptive_alloc"):
        render_image_persistent(scene, None, cfg)  # spp == kpp


def test_adaptive_multiframe_matches():
    """Adaptive allocation over a multi-frame batch (virtual tall image)
    must statistically match per-frame uniform renders."""
    from win32_raytracer_tpu.config import RenderConfig
    from win32_raytracer_tpu.persistent import render_image_persistent
    from win32_raytracer_tpu.scene.builders import test_scene
    from win32_raytracer_tpu.animation import orbit_path

    scene = test_scene()
    cfg = RenderConfig(width=48, height=32, samples=16, backend="jnp",
                       scheduler="persistent", seed=3)
    cams = orbit_path(n_frames=2, radius=12.0,
                      aspect_ratio=cfg.width / cfg.height)
    base = np.asarray(render_image_persistent(scene, cams, cfg))
    imgs = np.asarray(render_image_persistent(
        scene, cams, cfg.replace(adaptive_alloc="on")))
    assert imgs.shape == base.shape == (2, 32, 48, 3)
    d = np.abs(np.sqrt(np.clip(imgs, 0, 1)) - np.sqrt(np.clip(base, 0, 1)))
    assert d.mean() < 0.04, d.mean()


def test_adaptive_sharded_matches():
    """Per-shard adaptive allocation on the virtual mesh must
    statistically match the uniform sharded render."""
    from win32_raytracer_tpu.config import RenderConfig
    from win32_raytracer_tpu.parallel.shard import make_mesh
    from win32_raytracer_tpu.parallel.persistent_shard import (
        render_image_persistent_sharded)
    from win32_raytracer_tpu.scene.builders import test_scene

    scene = test_scene()
    mesh = make_mesh(4)
    cfg = RenderConfig(width=48, height=40, samples=16, backend="jnp",
                       seed=9)
    base = np.asarray(render_image_persistent_sharded(scene, None, cfg,
                                                      mesh))
    img = np.asarray(render_image_persistent_sharded(
        scene, None, cfg.replace(adaptive_alloc="on"), mesh))
    assert img.shape == base.shape == (40, 48, 3)
    d = np.abs(np.sqrt(np.clip(img, 0, 1)) - np.sqrt(np.clip(base, 0, 1)))
    assert d.mean() < 0.04, d.mean()


def test_adaptive_pool_render_statistics():
    """adaptive_pool='on' (max(raw, 3x3 box)^1.2 estimate transform)
    changes lane ALLOCATION only: the render must match the uniform
    wavefront image statistically, and the knob must be rejected on the
    sharded driver (single-chip only)."""
    from win32_raytracer_tpu.config import RenderConfig
    from win32_raytracer_tpu.persistent import render_image_persistent
    from win32_raytracer_tpu.render import render_image
    from win32_raytracer_tpu.scene.builders import test_scene

    scene = test_scene()
    cfg = RenderConfig(width=48, height=24, samples=32, seed=4,
                       backend="jnp", adaptive_alloc="on",
                       adaptive_pool="on")
    lin = np.asarray(render_image_persistent(scene, None, cfg))
    lin_w = np.asarray(render_image(scene, None, cfg.replace(
        adaptive_alloc="off", adaptive_pool="auto")))
    assert np.isfinite(lin).all()
    assert np.abs(lin - lin_w).mean() < 0.03

    from win32_raytracer_tpu.parallel.persistent_shard import (
        render_image_persistent_sharded)
    from win32_raytracer_tpu.parallel.shard import make_mesh
    with pytest.raises(ValueError, match="adaptive_pool"):
        render_image_persistent_sharded(scene, None, cfg, make_mesh(8))

    bad = cfg.replace(adaptive_pool="ON")
    with pytest.raises(ValueError, match="adaptive_pool"):
        render_image_persistent(scene, None, bad)
