"""Pallas TPU kernel: Möller-Trumbore nearest-hit ray-triangle sweep.

Same design as the sphere kernel v3 (hit_pallas_v3.py): triangles in
sublanes, rays in lanes, the whole packed [T, 16] attribute matrix resident
in VMEM, winner via sublane min + first-occurrence one-hot, attributes
fetched with one MXU contraction.  Two-sided test (dielectric meshes);
semantics match ops/hit_tri.py (the CI oracle).
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import MIN_HIT_T
from ..ops.hit import F32_MAX, HitRecord
from ..ops.hit_tri import (
    TRI_ATTR_COLS,
    _DET_EPS,
    _T_V0X, _T_E1X, _T_E1Z, _T_E2X, _T_E2Z,
    _T_MAT, _T_ALR, _T_ALB, _T_FUZZ, _T_IOR, _T_IDX,
    tri_attr_matrix,
)
from ..scene.triangles import TriangleScene

DEFAULT_TRI_RAY_BLOCK = 2048


def _tri_kernel(rays_ref, attrs_ref, t_ref, g_ref, *, n_tris, min_t):
    """rays_ref [8, R]: (ox,oy,oz,dx,dy,dz,tm,|d|^2); attrs [T, 16]."""
    ox = rays_ref[0:1, :]
    oy = rays_ref[1:2, :]
    oz = rays_ref[2:3, :]
    dx = rays_ref[3:4, :]
    dy = rays_ref[4:5, :]
    dz = rays_ref[5:6, :]

    def col(c):  # [T, 1]
        return attrs_ref[:, c:c + 1]

    e1x, e1y, e1z = col(_T_E1X), col(_T_E1X + 1), col(_T_E1Z)
    e2x, e2y, e2z = col(_T_E2X), col(_T_E2X + 1), col(_T_E2Z)
    # pvec = d x e2  -> [T, R]
    px = dy * e2z - dz * e2y
    py = dz * e2x - dx * e2z
    pz = dx * e2y - dy * e2x
    det = e1x * px + e1y * py + e1z * pz
    inv_det = 1.0 / jnp.where(jnp.abs(det) < _DET_EPS, 1.0, det)
    tx = ox - col(_T_V0X)
    ty = oy - col(_T_V0X + 1)
    tz = oz - col(_T_V0X + 2)
    u = (tx * px + ty * py + tz * pz) * inv_det
    qx = ty * e1z - tz * e1y
    qy = tz * e1x - tx * e1z
    qz = tx * e1y - ty * e1x
    v = (dx * qx + dy * qy + dz * qz) * inv_det
    t = (e2x * qx + e2y * qy + e2z * qz) * inv_det
    # Padding rows have e1 = e2 = 0 -> det ~ 0 -> rejected by the det test.
    valid = ((jnp.abs(det) >= _DET_EPS) & (u >= 0.0) & (v >= 0.0)
             & (u + v <= 1.0) & (t > min_t))
    t = jnp.where(valid, t, F32_MAX)                 # [T, R]

    t_min = jnp.min(t, axis=0, keepdims=True)        # [1, R]
    eq = t == t_min
    sub = jax.lax.broadcasted_iota(jnp.int32, t.shape, 0).astype(jnp.float32)
    big = jnp.float32(n_tris + 1)
    winner = jnp.min(jnp.where(eq, sub, big), axis=0, keepdims=True)
    onehot = (sub == winner).astype(jnp.float32)

    g_ref[:, :] = jax.lax.dot_general(
        onehot, attrs_ref[:, :],
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    t_ref[:, :] = t_min


@functools.partial(jax.jit, static_argnames=("min_t", "ray_block", "interpret"))
def _tri_pallas_raw(rays_t, attrs, *, min_t, ray_block, interpret=False):
    n = rays_t.shape[1]
    s = attrs.shape[0]
    kernel = functools.partial(_tri_kernel, n_tris=s, min_t=min_t)
    return pl.pallas_call(
        kernel,
        grid=(n // ray_block,),
        in_specs=[
            pl.BlockSpec((8, ray_block), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((s, TRI_ATTR_COLS), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, ray_block), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ray_block, TRI_ATTR_COLS), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((1, n), jnp.float32),
            jax.ShapeDtypeStruct((n, TRI_ATTR_COLS), jnp.float32),
        ],
        interpret=interpret,
    )(rays_t, attrs)


def hit_triangles_pallas(
    scene: TriangleScene,
    origin: jnp.ndarray,
    direction: jnp.ndarray,
    time: jnp.ndarray,
    min_t: float = MIN_HIT_T,
    ray_block: int = DEFAULT_TRI_RAY_BLOCK,
    interpret: bool = False,
) -> HitRecord:
    """Drop-in replacement for ``ops.hit_tri.hit_triangles``."""
    del time  # meshes are static
    n = origin.shape[0]
    # VMEM budget: [T, R] pair temps; shrink the ray block for big meshes.
    t_padded = scene.padded_size
    while ray_block > 256 and t_padded * ray_block * 4 > (6 << 20):
        ray_block //= 2
    pad = (-n) % ray_block
    a = jnp.sum(direction * direction, axis=1)
    rays = jnp.concatenate(
        [origin, direction, jnp.zeros((n, 1), jnp.float32), a[:, None]],
        axis=1)
    if pad:
        filler = jnp.zeros((pad, 8), jnp.float32).at[:, 7].set(1.0)
        rays = jnp.concatenate([rays, filler], axis=0)

    attrs = tri_attr_matrix(scene)
    t_out, g = _tri_pallas_raw(rays.T, attrs, min_t=float(min_t),
                               ray_block=ray_block, interpret=interpret)
    best_t = t_out[0, :n]
    best_a = g[:n]

    hit = best_t < F32_MAX
    t_safe = jnp.where(hit, best_t, 0.0)
    point = origin + t_safe[:, None] * direction

    e1 = best_a[:, _T_E1X:_T_E1Z + 1]
    e2 = best_a[:, _T_E2X:_T_E2Z + 1]
    gn = jnp.cross(e1, e2)
    norm = jnp.sqrt(jnp.maximum(jnp.sum(gn * gn, axis=1, keepdims=True),
                                1e-30))
    normal = gn / norm

    return HitRecord(
        hit=hit,
        t=best_t,
        point=point,
        normal=normal,
        idx=best_a[:, _T_IDX].astype(jnp.int32),
        mat_id=best_a[:, _T_MAT].astype(jnp.int32),
        albedo=best_a[:, _T_ALR:_T_ALB + 1],
        fuzz=best_a[:, _T_FUZZ],
        ior=best_a[:, _T_IOR],
    )
