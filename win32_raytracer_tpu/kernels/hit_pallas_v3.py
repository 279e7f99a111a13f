"""Pallas TPU hit kernel v3: transposed pair layout.

v1 (hit_pallas.py) puts rays in sublanes and spheres in lanes, so the
winner reduction runs across the 128-lane axis (log2(128) shuffle steps per
vreg).  v3 transposes the pair matrix — spheres in sublanes, rays in lanes —
so the min/one-hot winner phase reduces over sublanes instead, and ray
components arrive as [8, N] rows whose [1, R] slices broadcast down
sublanes.  Same semantics, same packed-attribute MXU gather (contracting
the sphere axis of the one-hot).

Kept alongside v1; the faster of the two on the target runtime is chosen
empirically (kernels/dispatch.py).
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import MIN_HIT_T
from ..ops.hit import (
    ATTR_COLS,
    F32_MAX,
    HitRecord,
    _attr_matrix,
    _A_T1, _A_INVDT, _A_RADIUS, _A_MAT, _A_ALR, _A_ALB, _A_FUZZ, _A_IOR,
    _A_IDX, _A_C1X, _A_C1Z, _A_DCX, _A_DCZ,
)
from ..scene.spheres import SphereScene

DEFAULT_RAY_BLOCK_V3 = 512  # rays per grid step (lane dim)


def _hit_kernel_v3(rays_ref, attrs_ref, t_ref, g_ref, *, n_spheres, min_t):
    """rays_ref [8, R] rows: (ox,oy,oz,dx,dy,dz,tm,|d|^2); attrs [S,16];
    outputs t [1, R], gathered attrs [R, 16]."""
    ox = rays_ref[0:1, :]
    oy = rays_ref[1:2, :]
    oz = rays_ref[2:3, :]
    dx = rays_ref[3:4, :]
    dy = rays_ref[4:5, :]
    dz = rays_ref[5:6, :]
    tm = rays_ref[6:7, :]
    a = rays_ref[7:8, :]

    def col(c):  # sphere attribute column -> [S, 1]
        return attrs_ref[:, c:c + 1]

    lerp = (tm - col(_A_T1)) * col(_A_INVDT)         # [S, R]
    cx = col(_A_C1X) + col(_A_DCX) * lerp
    cy = col(_A_C1X + 1) + col(_A_DCX + 1) * lerp
    cz = col(_A_C1Z) + col(_A_DCZ) * lerp
    ocx, ocy, ocz = ox - cx, oy - cy, oz - cz
    b_half = dx * ocx + dy * ocy + dz * ocz
    r = col(_A_RADIUS)
    c = ocx * ocx + ocy * ocy + ocz * ocz - r * r
    disc = b_half * b_half - a * c
    t = (-b_half - jnp.sqrt(jnp.maximum(disc, 0.0))) / a
    valid = (disc >= 0.0) & (t > min_t) & (r != 0.0)
    t = jnp.where(valid, t, F32_MAX)                 # [S, R]

    t_min = jnp.min(t, axis=0, keepdims=True)        # [1, R] (sublane reduce)
    eq = t == t_min
    sub = jax.lax.broadcasted_iota(jnp.int32, t.shape, 0).astype(jnp.float32)
    big = jnp.float32(n_spheres + 1)
    winner = jnp.min(jnp.where(eq, sub, big), axis=0, keepdims=True)
    onehot = (sub == winner).astype(jnp.float32)     # [S, R]

    # [S,R]^T-contract with [S,16] -> [R,16] on the MXU.
    g_ref[:, :] = jax.lax.dot_general(
        onehot, attrs_ref[:, :],
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    t_ref[:, :] = t_min


@functools.partial(jax.jit, static_argnames=("min_t", "ray_block", "interpret"))
def _hit_pallas_v3_raw(rays_t, attrs, *, min_t, ray_block, interpret=False):
    n = rays_t.shape[1]
    s = attrs.shape[0]
    kernel = functools.partial(_hit_kernel_v3, n_spheres=s, min_t=min_t)
    return pl.pallas_call(
        kernel,
        grid=(n // ray_block,),
        in_specs=[
            pl.BlockSpec((8, ray_block), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((s, ATTR_COLS), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, ray_block), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ray_block, ATTR_COLS), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((1, n), jnp.float32),
            jax.ShapeDtypeStruct((n, ATTR_COLS), jnp.float32),
        ],
        interpret=interpret,
    )(rays_t, attrs)


def hit_spheres_pallas_v3(
    scene: SphereScene,
    origin: jnp.ndarray,
    direction: jnp.ndarray,
    time: jnp.ndarray,
    min_t: float = MIN_HIT_T,
    ray_block: int = DEFAULT_RAY_BLOCK_V3,
    interpret: bool = False,
) -> HitRecord:
    """Drop-in replacement for ``ops.hit.hit_spheres`` (transposed layout)."""
    n = origin.shape[0]
    pad = (-n) % ray_block
    a = jnp.sum(direction * direction, axis=1)
    rays = jnp.concatenate(
        [origin, direction, time[:, None], a[:, None]], axis=1)
    if pad:
        filler = jnp.zeros((pad, 8), jnp.float32).at[:, 7].set(1.0)
        rays = jnp.concatenate([rays, filler], axis=0)

    attrs = _attr_matrix(scene)
    t_out, g = _hit_pallas_v3_raw(
        rays.T, attrs, min_t=float(min_t), ray_block=ray_block,
        interpret=interpret,
    )
    best_t = t_out[0, :n]
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
