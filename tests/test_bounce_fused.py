"""Fused single-kernel bounce vs the two-program path (interpret)."""

import numpy as np

import jax
import jax.numpy as jnp

from win32_raytracer_tpu.config import RenderConfig
from win32_raytracer_tpu.kernels.bounce_pallas import p_bounce_fused
from win32_raytracer_tpu.kernels.hit_pallas_v7 import (
    hit_coeffs, p_hit_sky_step,
)
from win32_raytracer_tpu.kernels.scatter_pallas import scatter_respawn_pallas
from win32_raytracer_tpu.persistent import PathState, make_dims, step_cfg
from win32_raytracer_tpu.scene.builders import random_scene
from win32_raytracer_tpu.scene.camera import default_camera

INTERPRET = jax.devices()[0].platform == "cpu"
W, H, SPP, KPP, RB = 64, 32, 8, 2, 256


def _state(n, seed=11):
    rng = np.random.default_rng(seed)
    quota = SPP // KPP
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
        s_quota=jnp.full((1, n), quota, jnp.int32),
    )


def test_fused_bounce_matches_two_step():
    scene = random_scene()
    cam = default_camera(W, H)
    cfg = RenderConfig(width=W, height=H, samples=SPP,
                       lanes_per_pixel=KPP)
    st = _state(H * W * KPP)
    salt = np.uint32(0xABC123)

    dims = make_dims(cfg, W, H, SPP, KPP)
    fused = p_bounce_fused(hit_coeffs(scene), cam, st, salt, jnp.int32(4),
                           dims, cfg=step_cfg(cfg), ray_block=RB,
                           interpret=INTERPRET)
    rec, st2 = p_hit_sky_step(hit_coeffs(scene), st, ray_block=RB,
                              interpret=INTERPRET)
    split = scatter_respawn_pallas(scene, cam, st2, rec, salt,
                                   jnp.int32(4), dims, cfg=step_cfg(cfg),
                                   ray_block=RB, interpret=INTERPRET)

    # Same draws, same math: integer/bool state agrees except where the
    # CPU backend's per-program bf16 matmul rounding flips a boundary
    # lane (tolerate <1%); floats match where the alive verdicts agree.
    al_f = np.asarray(fused.path_alive[0])
    al_s = np.asarray(split.path_alive[0])
    assert (al_f != al_s).mean() < 0.01
    agree = al_f == al_s
    for f in ("depth", "sample"):
        a = np.asarray(getattr(fused, f))[0, agree]
        b = np.asarray(getattr(split, f))[0, agree]
        assert (a != b).mean() < 0.01, f
    same = agree & (np.asarray(fused.depth[0]) == np.asarray(split.depth[0]))
    for f in ("origin", "direction", "time", "throughput"):
        a = np.asarray(getattr(fused, f))[:, same]
        b = np.asarray(getattr(split, f))[:, same]
        close = np.isclose(a, b, rtol=1e-4, atol=1e-4).all(axis=0)
        assert close.mean() > 0.99, (f, close.mean())


def test_fused_bounce_unaligned_padding():
    """Batches with no fitting 128-multiple block pad with dead lanes
    (regression: this used to raise)."""
    scene = random_scene()
    cam = default_camera(W, H)
    cfg = RenderConfig(width=W, height=H, samples=SPP,
                       lanes_per_pixel=KPP)
    n = RB * 2 + 40                       # no 128-multiple divisor
    st = _state(n)
    out = p_bounce_fused(hit_coeffs(scene), cam, st, np.uint32(1),
                         jnp.int32(2), make_dims(cfg, W, H, SPP, KPP),
                         cfg=step_cfg(cfg), ray_block=RB,
                         interpret=INTERPRET)
    assert out.origin.shape == (3, n)
    assert np.isfinite(np.asarray(out.origin)).all()


def test_driver_render_smoke_jnp():
    """Driver smoke on the CPU jnp path (the fused Mosaic path itself is
    TPU-only in the driver; its kernel parity is covered above)."""
    from win32_raytracer_tpu.persistent import render_image_persistent

    scene = random_scene()
    cam = default_camera(W, H)
    cfg = RenderConfig(width=W, height=H, samples=4, backend="jnp")
    img = np.asarray(render_image_persistent(scene, cam, cfg))
    assert np.isfinite(img).all() and img.mean() > 0.05


def test_multi_fused_matches_successive_fused():
    """p_bounce_multi_fused(k) must be bit-identical to k successive
    p_bounce_fused calls at steps step0..step0+k-1 (same draw
    derivation, same kernel body, just one dispatch)."""
    from win32_raytracer_tpu.kernels.bounce_pallas import (
        p_bounce_fused, p_bounce_multi_fused)

    scene = random_scene()
    cam = default_camera(W, H)
    cfg = RenderConfig(width=W, height=H, samples=SPP,
                       lanes_per_pixel=KPP)
    st0 = _state(512)
    salt = np.uint32(0x5EED)
    dims = make_dims(cfg, W, H, SPP, KPP)
    k = 3
    multi = p_bounce_multi_fused(
        hit_coeffs(scene), cam, st0, salt, jnp.int32(4), dims,
        cfg=step_cfg(cfg), k=k, ray_block=RB, interpret=INTERPRET)
    st = st0
    for i in range(k):
        st = p_bounce_fused(hit_coeffs(scene), cam, st, salt,
                            jnp.int32(4 + i), dims, cfg=step_cfg(cfg),
                            ray_block=RB, interpret=INTERPRET)
    for f in PathState._fields:
        np.testing.assert_array_equal(
            np.asarray(getattr(multi, f)), np.asarray(getattr(st, f)),
            err_msg=f)
