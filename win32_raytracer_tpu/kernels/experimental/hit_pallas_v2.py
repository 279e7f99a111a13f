"""Pallas TPU hit kernel v2: MXU-factored quadratic.

v1 (hit_pallas.py) evaluates the full quadratic per (ray, sphere) pair on
the VPU (~40 ops/pair).  v2 exploits that both quadratic coefficients are
*bilinear* in per-ray and per-sphere feature vectors — motion blur
included — so the pair terms become two small matmuls on the MXU:

    b_half[r,s] = F_b(ray r) . G_b(sphere s)     (7 features, padded to 8)
    c_coef[r,s] = F_c(ray r) . G_c(sphere s)     (10 features, padded to 16)

with the per-pair shutter lerp L = tm*A + B (A = 1/(t2-t1), B = -t1*A)
absorbed into the features:

    b_half = d.o - d.c1 - L (d.dc)
           = p0*1 + sum_i d_i * -(c1_i + B dc_i) + sum_i (tm d_i) * -(A dc_i)
    c_coef = |o - c(t)|^2 - r^2
           = |o|^2 - 2 o.c1 - 2L (o.dc) + |c1|^2 + 2L (c1.dc) + L^2 |dc|^2 - r^2

leaving only ~13 VPU ops per pair (disc, sqrt, near-root t, masks, winner
select).  Inactive padding spheres fold into the constant feature as a huge
positive c_coef, forcing disc < 0 — no separate active mask.

The winner's packed attributes are fetched with the same one-hot MXU
contraction as v1.  Semantics match ops/hit.py (the CI oracle) up to f32
association differences on grazing rays.

STATUS: EXPERIMENTAL — correct under the Pallas interpreter (exact match
with the jnp oracle) but miscompiled by Mosaic on the target TPU (likely
the in-kernel feature concatenation), and no faster than v1 in practice:
K=8/16 matmuls appear to lower to VPU broadcast-MACs, costing what the
direct pair math costs.  v1 (hit_pallas.py) remains the production kernel.
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

NB = 8    # b_half feature count (7 used)
NC = 16   # c_coef feature count (10 used)

_INACTIVE_BIAS = np.float32(1e16)


def _sphere_feature_matrices(scene: SphereScene):
    """G_b [S, NB], G_c [S, NC] from the SoA scene (traced-friendly)."""
    c1 = scene.center1
    dc = scene.center2 - scene.center1
    a_ = 1.0 / (scene.t2 - scene.t1)          # A
    b_ = -scene.t1 * a_                        # B
    r2 = scene.radius * scene.radius
    c1dc = jnp.sum(c1 * dc, axis=1)
    dc2 = jnp.sum(dc * dc, axis=1)
    c12 = jnp.sum(c1 * c1, axis=1)
    inactive = 1.0 - scene.active.astype(jnp.float32)

    zeros = jnp.zeros_like(r2)
    g_b = jnp.stack([
        jnp.ones_like(r2),                     # * p0 (= d.o)
        -(c1[:, 0] + b_ * dc[:, 0]),           # * dx
        -(c1[:, 1] + b_ * dc[:, 1]),           # * dy
        -(c1[:, 2] + b_ * dc[:, 2]),           # * dz
        -(a_ * dc[:, 0]),                      # * tm*dx
        -(a_ * dc[:, 1]),                      # * tm*dy
        -(a_ * dc[:, 2]),                      # * tm*dz
        zeros,
    ], axis=1)
    g_c = jnp.stack([
        c12 + 2.0 * b_ * c1dc + b_ * b_ * dc2 - r2
        + inactive * _INACTIVE_BIAS,           # * 1
        -2.0 * (c1[:, 0] + b_ * dc[:, 0]),     # * ox
        -2.0 * (c1[:, 1] + b_ * dc[:, 1]),     # * oy
        -2.0 * (c1[:, 2] + b_ * dc[:, 2]),     # * oz
        -2.0 * a_ * dc[:, 0],                  # * tm*ox
        -2.0 * a_ * dc[:, 1],                  # * tm*oy
        -2.0 * a_ * dc[:, 2],                  # * tm*oz
        2.0 * a_ * c1dc + 2.0 * a_ * b_ * dc2,  # * tm
        a_ * a_ * dc2,                         # * tm^2
        jnp.ones_like(r2),                     # * |o|^2
        zeros, zeros, zeros, zeros, zeros, zeros,
    ], axis=1)
    return g_b, g_c


def _hit_kernel_v2(rays_ref, gb_ref, gc_ref, attrs_ref, t_ref, g_ref, tbuf,
                   *, n_spheres, min_t):
    """rays_ref [R,8]: (ox,oy,oz,dx,dy,dz,tm,|d|^2); gb [NB,S]; gc [NC,S];
    attrs [16,S]; outputs t [R,1], gathered attrs [R,16]; scratch [R,S]."""
    ox = rays_ref[:, 0:1]
    oy = rays_ref[:, 1:2]
    oz = rays_ref[:, 2:3]
    dx = rays_ref[:, 3:4]
    dy = rays_ref[:, 4:5]
    dz = rays_ref[:, 5:6]
    tm = rays_ref[:, 6:7]
    a = rays_ref[:, 7:8]
    inv_a = 1.0 / a

    p0 = ox * dx + oy * dy + oz * dz
    o2 = ox * ox + oy * oy + oz * oz
    fb = jnp.concatenate(
        [p0, dx, dy, dz, tm * dx, tm * dy, tm * dz,
         jnp.zeros_like(p0)], axis=1)                       # [R, NB]
    ones = jnp.ones_like(p0)
    zeros = jnp.zeros_like(p0)
    fc = jnp.concatenate(
        [ones, ox, oy, oz, tm * ox, tm * oy, tm * oz, tm, tm * tm, o2,
         zeros, zeros, zeros, zeros, zeros, zeros], axis=1)  # [R, NC]

    bh = jnp.dot(fb, gb_ref[:, :], preferred_element_type=jnp.float32)
    cc = jnp.dot(fc, gc_ref[:, :], preferred_element_type=jnp.float32)

    disc = bh * bh - a * cc
    t = (-bh - jnp.sqrt(jnp.maximum(disc, 0.0))) * inv_a
    valid = (disc >= 0.0) & (t > min_t)
    tbuf[:, :] = jnp.where(valid, t, F32_MAX)

    t_pair = tbuf[:, :]
    t_min = jnp.min(t_pair, axis=1, keepdims=True)
    eq = t_pair == t_min
    lane = jax.lax.broadcasted_iota(jnp.int32, t_pair.shape, 1).astype(jnp.float32)
    big = jnp.float32(n_spheres + 1)
    winner = jnp.min(jnp.where(eq, lane, big), axis=1, keepdims=True)
    onehot = (lane == winner).astype(jnp.float32)

    g_ref[:, :] = jax.lax.dot_general(
        onehot, attrs_ref[:, :],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    t_ref[:, :] = t_min


@functools.partial(jax.jit, static_argnames=("min_t", "ray_block", "interpret"))
def _hit_pallas_v2_raw(rays, gb_t, gc_t, attrs_t, *, min_t, ray_block,
                       interpret=False):
    n = rays.shape[0]
    s = attrs_t.shape[1]
    kernel = functools.partial(_hit_kernel_v2, n_spheres=s, min_t=min_t)
    return pl.pallas_call(
        kernel,
        grid=(n // ray_block,),
        in_specs=[
            pl.BlockSpec((ray_block, 8), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((NB, s), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((NC, s), lambda i: (0, 0), memory_space=pltpu.VMEM),
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
    )(rays, gb_t, gc_t, attrs_t)


def hit_spheres_pallas_v2(
    scene: SphereScene,
    origin: jnp.ndarray,
    direction: jnp.ndarray,
    time: jnp.ndarray,
    min_t: float = MIN_HIT_T,
    ray_block: int = 1024,
    interpret: bool = False,
) -> HitRecord:
    """Drop-in replacement for ``ops.hit.hit_spheres`` (MXU-factored)."""
    n = origin.shape[0]
    pad = (-n) % ray_block
    a = jnp.sum(direction * direction, axis=1)
    rays = jnp.concatenate(
        [origin, direction, time[:, None], a[:, None]], axis=1)
    if pad:
        filler = jnp.zeros((pad, 8), jnp.float32).at[:, 7].set(1.0)
        rays = jnp.concatenate([rays, filler], axis=0)

    g_b, g_c = _sphere_feature_matrices(scene)
    attrs = _attr_matrix(scene)
    t_out, g = _hit_pallas_v2_raw(
        rays, g_b.T, g_c.T, attrs.T, min_t=float(min_t),
        ray_block=ray_block, interpret=interpret,
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
