"""Pallas TPU kernel: brute-force nearest-hit ray-sphere sweep.

The flagship kernel (SURVEY.md §7 stage 4) — the direct TPU descendant of
the reference's 8-wide AVX intersection loop (win32-raytracer/
RayTracer.cpp:433-589), redesigned for the VPU/MXU instead of translated:

* rays live in sublanes (one ray block per grid step), spheres in lanes —
  every [R, 128] VPU op evaluates 128 sphere candidates for R rays;
* the whole SoA sphere scene sits in VMEM as a packed [16, S] attribute
  matrix (S <= a few thousand fits easily; the RTIOW scene is 512 padded);
* the per-pair quadratic (motion-blur center lerp, half-b discriminant,
  near root, RayTracer.cpp:449-488) fills a [R, S] t-buffer in VMEM;
* the winner is min + first-occurrence one-hot via an iota-min (earliest
  sphere index wins ties, matching RayTracer.cpp:576-589 — and no argmin /
  cumsum, which lower badly);
* the winner's 16 packed attributes are fetched with ONE MXU contraction
  ``onehot [R,S] x attrs [16,S] -> [R,16]`` — the kernel-level equivalent
  of the reference's conditionalAssign running state (RayTracer.cpp:536-549)
  without carrying 12 running vectors.

The pure-jnp ``ops.hit.hit_spheres`` is the CI oracle for this kernel
(tests/test_hit_pallas.py compares them exactly).
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...config import MIN_HIT_T
from ...ops.hit import (
    ATTR_COLS,
    F32_MAX,
    HitRecord,
    _attr_matrix,
    _A_T1, _A_INVDT, _A_RADIUS, _A_MAT, _A_ALR, _A_ALB, _A_FUZZ, _A_IOR,
    _A_IDX, _A_C1X, _A_C1Z, _A_DCX, _A_DCZ,
)
from ...scene.spheres import SphereScene

# Attribute-matrix rows in the transposed [16, S] kernel layout.
_R_C1X, _R_C1Y, _R_C1Z = 0, 1, 2
_R_DCX, _R_DCY, _R_DCZ = 3, 4, 5
_R_T1, _R_INVDT, _R_RADIUS = 6, 7, 8

DEFAULT_RAY_BLOCK = 512  # rays per grid step (sublane dim; multiple of 8)


def _hit_kernel(rays_ref, attrs_ref, t_ref, g_ref, tbuf, *, n_spheres, min_t):
    """One grid step: R rays vs all S spheres.

    rays_ref: [R, 8]  (ox, oy, oz, dx, dy, dz, time, |d|^2)
    attrs_ref: [16, S] packed sphere attributes (transposed for lane loads)
    t_ref:    [R, 1]  out — nearest t (F32_MAX if none)
    g_ref:    [R, 16] out — winner's packed attribute row
    tbuf:     [R, S]  VMEM scratch — per-pair candidate t
    """
    ox = rays_ref[:, 0:1]
    oy = rays_ref[:, 1:2]
    oz = rays_ref[:, 2:3]
    dx = rays_ref[:, 3:4]
    dy = rays_ref[:, 4:5]
    dz = rays_ref[:, 5:6]
    tm = rays_ref[:, 6:7]
    a = rays_ref[:, 7:8]

    # Per-pair quadratic, all spheres at once ([R,1] x [1,S] broadcasting).
    t1 = attrs_ref[_R_T1, :][None, :]
    inv_dt = attrs_ref[_R_INVDT, :][None, :]
    lerp = (tm - t1) * inv_dt                      # motion blur (cpp:449-452)
    cx = attrs_ref[_R_C1X, :][None, :] + attrs_ref[_R_DCX, :][None, :] * lerp
    cy = attrs_ref[_R_C1Y, :][None, :] + attrs_ref[_R_DCY, :][None, :] * lerp
    cz = attrs_ref[_R_C1Z, :][None, :] + attrs_ref[_R_DCZ, :][None, :] * lerp
    ocx = ox - cx
    ocy = oy - cy
    ocz = oz - cz
    b_half = dx * ocx + dy * ocy + dz * ocz
    r = attrs_ref[_R_RADIUS, :][None, :]
    c = ocx * ocx + ocy * ocy + ocz * ocz - r * r
    disc = b_half * b_half - a * c                 # discriminant / 4
    t = (-b_half - jnp.sqrt(jnp.maximum(disc, 0.0))) / a
    # radius == 0 marks padding lanes (parked far away; also guards the
    # measure-zero disc==0 graze a zero-radius point would otherwise pass).
    valid = (disc >= 0.0) & (t > min_t) & (r != 0.0)
    tbuf[:, :] = jnp.where(valid, t, F32_MAX)

    t_pair = tbuf[:, :]
    t_min = jnp.min(t_pair, axis=1, keepdims=True)             # [R,1]
    eq = t_pair == t_min                                        # [R,S]
    lane = jax.lax.broadcasted_iota(jnp.int32, t_pair.shape, 1).astype(jnp.float32)
    big = jnp.float32(n_spheres + 1)
    winner = jnp.min(jnp.where(eq, lane, big), axis=1, keepdims=True)
    onehot = (lane == winner).astype(jnp.float32)               # [R,S]

    # Winner's packed attributes: [R,S] x [16,S] -> [R,16] on the MXU.
    g_ref[:, :] = jax.lax.dot_general(
        onehot, attrs_ref[:, :],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    t_ref[:, :] = t_min


@functools.partial(jax.jit, static_argnames=("min_t", "ray_block", "interpret"))
def _hit_pallas_raw(
    rays: jnp.ndarray,       # [N, 8]
    attrs_t: jnp.ndarray,    # [16, S]
    *,
    min_t: float,
    ray_block: int,
    interpret: bool = False,
):
    n = rays.shape[0]
    s = attrs_t.shape[1]
    grid = (n // ray_block,)
    kernel = functools.partial(_hit_kernel, n_spheres=s, min_t=min_t)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((ray_block, 8), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((16, s), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((ray_block, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ray_block, ATTR_COLS), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n, 1), jnp.float32),
            jax.ShapeDtypeStruct((n, ATTR_COLS), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((ray_block, s), jnp.float32)],
        interpret=interpret,
    )(rays, attrs_t)


def hit_spheres_pallas(
    scene: SphereScene,
    origin: jnp.ndarray,
    direction: jnp.ndarray,
    time: jnp.ndarray,
    min_t: float = MIN_HIT_T,
    ray_block: int = DEFAULT_RAY_BLOCK,
    interpret: bool = False,
) -> HitRecord:
    """Drop-in replacement for ``ops.hit.hit_spheres`` backed by the Pallas
    kernel.  Pads the ray batch to the block size; same HitRecord out."""
    n = origin.shape[0]
    pad = (-n) % ray_block
    a = jnp.sum(direction * direction, axis=1)
    rays = jnp.concatenate(
        [origin, direction, time[:, None], a[:, None]], axis=1)
    if pad:
        filler = jnp.zeros((pad, 8), jnp.float32).at[:, 7].set(1.0)
        rays = jnp.concatenate([rays, filler], axis=0)

    attrs = _attr_matrix(scene)          # [S, 16]
    t_out, g = _hit_pallas_raw(
        rays, attrs.T, min_t=float(min_t), ray_block=ray_block,
        interpret=interpret,
    )
    best_t = t_out[:n, 0]
    best_a = g[:n]

    hit = best_t < F32_MAX
    t_safe = jnp.where(hit, best_t, 0.0)
    point = origin + t_safe[:, None] * direction

    lerp = (time - best_a[:, _A_T1]) * best_a[:, _A_INVDT]
    center = (best_a[:, _A_C1X:_A_C1Z + 1]
              + best_a[:, _A_DCX:_A_DCZ + 1] * lerp[:, None])
    radius = best_a[:, _A_RADIUS]
    denom = jnp.where(radius == 0.0, 1.0, radius)
    normal = (point - center) / denom[:, None]

    return HitRecord(
        hit=hit,
        t=best_t,
        point=point,
        normal=normal,
        idx=best_a[:, _A_IDX].astype(jnp.int32),
        mat_id=best_a[:, _A_MAT].astype(jnp.int32),
        albedo=best_a[:, _A_ALR:_A_ALB + 1],
        fuzz=best_a[:, _A_FUZZ],
        ior=best_a[:, _A_IOR],
    )
