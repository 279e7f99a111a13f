"""Closed-form tests for the scatter math helpers (RayTracer.cpp:139-184)."""

import numpy as np

import jax.numpy as jnp

from win32_raytracer_tpu.core import materials as mat


def V(*rows):
    return jnp.asarray(rows, dtype=jnp.float32)


def test_quantize():
    np.testing.assert_allclose(
        np.asarray(mat.quantize(V([-1.0, 0.0, 1.0]))), [[0.0, 0.5, 1.0]]
    )


def test_reflect():
    # 45-degree mirror: (1,-1,0) off n=(0,1,0) -> (1,1,0)
    got = mat.reflect(V([1.0, -1.0, 0.0]), V([0.0, 1.0, 0.0]))
    np.testing.assert_allclose(np.asarray(got), [[1.0, 1.0, 0.0]], atol=1e-6)
    # Works with unnormalized input (the reference reflects raw ray.direction)
    got = mat.reflect(V([2.0, -2.0, 0.0]), V([0.0, 1.0, 0.0]))
    np.testing.assert_allclose(np.asarray(got), [[2.0, 2.0, 0.0]], atol=1e-6)


def test_refract_normal_incidence():
    # Straight-on entry (dt=1): transmitted straight through.
    n = V([0.0, 1.0, 0.0])
    refr, ok = mat.refract(V([0.0, 1.0, 0.0]), n, jnp.asarray([1.0 / 1.5]),
                           discriminant_bias=1.0)
    assert bool(ok[0])
    # dt = 1 -> refr = -n * sqrt(1) = (0,-1,0)
    np.testing.assert_allclose(np.asarray(refr), [[0.0, -1.0, 0.0]], atol=1e-6)


def test_refract_textbook_snell():
    """With bias=1.0 the output obeys Snell's law exactly."""
    theta_i = np.float32(np.radians(30.0))
    d = V([np.sin(theta_i), np.cos(theta_i), 0.0])  # toward the surface normal
    n = V([0.0, 1.0, 0.0])
    ni_over_nt = jnp.asarray([1.0 / 1.5])
    refr, ok = mat.refract(d, n, ni_over_nt, discriminant_bias=1.0)
    assert bool(ok[0])
    r = np.asarray(refr)[0]
    sin_t = abs(r[0]) / np.linalg.norm(r)
    np.testing.assert_allclose(sin_t, np.sin(theta_i) / 1.5, rtol=1e-5)
    assert r[1] < 0  # transmitted through the surface


def test_refract_reference_bias_quirk():
    """bias=2.0 (RayTracer.cpp:168) bends differently — the glass quirk."""
    theta_i = np.float32(np.radians(30.0))
    d = V([np.sin(theta_i), np.cos(theta_i), 0.0])
    n = V([0.0, 1.0, 0.0])
    ni_over_nt = jnp.asarray([1.0 / 1.5])
    r1, _ = mat.refract(d, n, ni_over_nt, discriminant_bias=1.0)
    r2, _ = mat.refract(d, n, ni_over_nt, discriminant_bias=2.0)
    # Same tangential component, different normal component.
    np.testing.assert_allclose(np.asarray(r1)[0][0], np.asarray(r2)[0][0], rtol=1e-6)
    assert abs(float(r1[0][1]) - float(r2[0][1])) > 0.1
    # Hand-check the 2.0 discriminant: disc = 2 - (2/3)^2 (1 - cos^2(30)).
    dt = float(np.cos(theta_i))
    want_disc = 2.0 - (1.0 / 1.5) ** 2 * (1.0 - dt * dt)
    want_y = (1.0 / 1.5) * (dt - dt) - np.sqrt(want_disc)
    np.testing.assert_allclose(float(r2[0][1]), want_y, rtol=1e-5)


def test_refract_total_internal_reflection():
    # Dense-to-sparse beyond the critical angle: TIR.
    # At 70 deg with n=1.5: disc(bias=1) = 1 - 2.25 sin^2(70) = -0.99 < 0,
    # but disc(bias=2) = +0.013 > 0 — the reference's 2.0 bias (quirk)
    # suppresses TIR in a band where physics demands it.
    theta_i = np.float32(np.radians(70.0))
    d = V([np.sin(theta_i), np.cos(theta_i), 0.0])
    n = V([0.0, 1.0, 0.0])
    _, ok = mat.refract(d, n, jnp.asarray([1.5]), discriminant_bias=1.0)
    assert not bool(ok[0])
    # The reference's 2.0 bias *prevents* TIR here (quirk!):
    _, ok2 = mat.refract(d, n, jnp.asarray([1.5]), discriminant_bias=2.0)
    assert bool(ok2[0])


def test_schlick():
    # Normal incidence, n=1.5: r0 = (0.5/2.5)^2 = 0.04.
    got = float(mat.schlick(jnp.float32(1.0), jnp.float32(1.5)))
    np.testing.assert_allclose(got, 0.04, rtol=1e-6)
    # Grazing: -> 1.
    got = float(mat.schlick(jnp.float32(0.0), jnp.float32(1.5)))
    np.testing.assert_allclose(got, 1.0, rtol=1e-6)


def test_sky_gradient():
    # Straight up -> tint, straight down -> white (RayTracer.cpp:690-701).
    up = np.asarray(mat.sky_color(V([0.0, 1.0, 0.0])))[0]
    down = np.asarray(mat.sky_color(V([0.0, -1.0, 0.0])))[0]
    np.testing.assert_allclose(up, [0.5, 0.7, 1.0], atol=1e-6)
    np.testing.assert_allclose(down, [1.0, 1.0, 1.0], atol=1e-6)
    # Direction length must not matter (normalized inside).
    up2 = np.asarray(mat.sky_color(V([0.0, 10.0, 0.0])))[0]
    np.testing.assert_allclose(up, up2, atol=1e-6)
