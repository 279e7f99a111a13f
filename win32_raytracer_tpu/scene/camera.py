"""Thin-lens camera.

Pure-function reproduction of ``ptr::Camera`` (win32-raytracer/
RayTracer.cpp:219-289): look-at basis, vertical FOV in degrees, focus-dist
scaled image plane, defocus (lens disc) blur, and a shutter interval for
motion blur.  Where the reference's ``getRay`` draws from a per-thread LCG
(RayTracer.cpp:276-288), here ray generation is a pure function of uniform
draws so it vmaps over whole ``[N]`` ray batches.
"""

from __future__ import annotations

import math
from typing import NamedTuple

import numpy as np

import jax.numpy as jnp

from ..config import SHUTTER_OPEN_T, SHUTTER_CLOSE_T
from ..core.rng import sample_unit_disc


class Camera(NamedTuple):
    origin: jnp.ndarray            # [3]
    lower_left_corner: jnp.ndarray  # [3]
    horizontal: jnp.ndarray        # [3]
    vertical: jnp.ndarray          # [3]
    right_axis: jnp.ndarray        # [3]
    up_axis: jnp.ndarray           # [3]
    lens_radius: jnp.ndarray       # [] f32
    shutter_open: jnp.ndarray      # [] f32
    shutter_close: jnp.ndarray     # [] f32


def make_camera(
    look_from,
    look_to,
    up,
    vfov_degrees: float,
    aspect_ratio: float,
    aperture: float,
    focus_dist: float,
    shutter_open: float = SHUTTER_OPEN_T,
    shutter_close: float = SHUTTER_CLOSE_T,
) -> Camera:
    """Build the camera basis exactly as RayTracer.cpp:237-274 (f32 math)."""
    look_from = np.asarray(look_from, np.float32)
    look_to = np.asarray(look_to, np.float32)
    up = np.asarray(up, np.float32)

    lens_radius = np.float32(aperture) / np.float32(2.0)  # RayTracer.cpp:252
    theta = np.float32(math.radians(vfov_degrees))
    half_height = np.float32(np.tan(theta / np.float32(2.0)))
    half_width = np.float32(aspect_ratio) * half_height

    def norm(v):
        return (v / np.sqrt(np.dot(v, v))).astype(np.float32)

    look_dir = norm(look_to - look_from)
    right = norm(np.cross(look_dir, up))
    up_axis = norm(np.cross(right, look_dir))

    focus = np.float32(focus_dist)
    origin = look_from
    lower_left = (origin + look_dir * focus
                  - right * (half_width * focus)
                  - up_axis * (half_height * focus)).astype(np.float32)
    horizontal = (2.0 * half_width * focus * right).astype(np.float32)
    vertical = (2.0 * half_height * focus * up_axis).astype(np.float32)

    return Camera(
        origin=jnp.asarray(origin),
        lower_left_corner=jnp.asarray(lower_left),
        horizontal=jnp.asarray(horizontal),
        vertical=jnp.asarray(vertical),
        right_axis=jnp.asarray(right),
        up_axis=jnp.asarray(up_axis),
        lens_radius=jnp.float32(lens_radius),
        shutter_open=jnp.float32(shutter_open),
        shutter_close=jnp.float32(shutter_close),
    )


def default_camera(width: int, height: int) -> Camera:
    """The reference's hard-coded view (RayTracer.cpp:903-915)."""
    look_from = (15.0, 2.0, 4.0)
    look_to = (0.0, 1.0, 0.0)
    focus = float(np.linalg.norm(np.asarray(look_to, np.float32)
                                 - np.asarray(look_from, np.float32)))
    return make_camera(look_from, look_to, (0.0, 1.0, 0.0),
                       vfov_degrees=20.0, aspect_ratio=width / height,
                       aperture=0.1, focus_dist=focus)


def camera_rays(cam: Camera, u: jnp.ndarray, v: jnp.ndarray, draws: jnp.ndarray):
    """Batch version of ``Camera::getRay`` (RayTracer.cpp:276-288).

    ``u``/``v`` are [N] image-plane coords; ``draws`` is [N, 3] uniforms:
    draw 0 -> shutter time, draws 1..2 -> lens disc point.  Returns
    (origin [N,3], direction [N,3] (unnormalized, as in the reference),
    time [N]).
    """
    time = cam.shutter_open + (cam.shutter_close - cam.shutter_open) * draws[..., 0]
    disc = sample_unit_disc(draws[..., 1:3]) * cam.lens_radius
    offset = (cam.right_axis[None, :] * disc[..., 0:1]
              + cam.up_axis[None, :] * disc[..., 1:2])
    origin = cam.origin[None, :] + offset
    direction = (cam.lower_left_corner[None, :]
                 + u[..., None] * cam.horizontal[None, :]
                 + v[..., None] * cam.vertical[None, :]
                 - origin)
    return origin, direction, time
