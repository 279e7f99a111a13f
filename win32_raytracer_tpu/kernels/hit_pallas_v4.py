"""Pallas TPU hit kernel v4: lane-major in AND out.

v3 (hit_pallas_v3.py) computes the right things but hands the winner's
packed attribute matrix back in column layout ([N, 16]), which the XLA
epilogue then re-reads once per extracted column — measured +30 ms per hit
step at 2M lanes on the axon runtime, twice the kernel's own cost.  v4
keeps the same pair math (spheres in sublanes x rays in lanes; the
descendant of the reference AVX sweep, win32-raytracer/RayTracer.cpp:433-589)
but flips the winner-gather contraction to produce ``[16, R]`` — attribute
values land as contiguous rows, the epilogue is pure row arithmetic, and
the full HitRecord costs ~1.5 ms over the raw kernel instead of ~30.

Interface is the rows layout of ops.rows: origins/directions [3, N],
time [1, N]; returns HitRecordRows.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import MIN_HIT_T
from ..ops.hit import (
    ATTR_COLS, F32_MAX, _attr_matrix,
    _A_T1, _A_INVDT, _A_RADIUS, _A_MAT, _A_ALR, _A_ALB, _A_FUZZ, _A_IOR,
    _A_IDX, _A_C1X, _A_C1Z, _A_DCX, _A_DCZ,
)
from ..ops.rows import HitRecordRows
from ..scene.spheres import SphereScene

DEFAULT_RAY_BLOCK_V4 = 2048


def _hit_kernel_v4(rays_ref, attrs_ref, t_ref, g_ref, *, n_spheres, min_t):
    """rays [8, R] rows (ox,oy,oz,dx,dy,dz,tm,|d|^2); attrs [S, 16];
    outputs t [1, R], gathered attr ROWS [16, R]."""
    ox = rays_ref[0:1, :]
    oy = rays_ref[1:2, :]
    oz = rays_ref[2:3, :]
    dx = rays_ref[3:4, :]
    dy = rays_ref[4:5, :]
    dz = rays_ref[5:6, :]
    tm = rays_ref[6:7, :]
    a = rays_ref[7:8, :]

    def col(c):
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

    t_min = jnp.min(t, axis=0, keepdims=True)        # [1, R]
    eq = t == t_min
    sub = jax.lax.broadcasted_iota(jnp.int32, t.shape, 0).astype(jnp.float32)
    big = jnp.float32(n_spheres + 1)
    winner = jnp.min(jnp.where(eq, sub, big), axis=0, keepdims=True)
    onehot = (sub == winner).astype(jnp.float32)     # [S, R]

    # [S,16]^T-contract [S,R] -> [16,R] on the MXU: attribute *rows* out.
    g_ref[:, :] = jax.lax.dot_general(
        attrs_ref[:, :], onehot,
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    t_ref[:, :] = t_min


@functools.partial(jax.jit, static_argnames=("min_t", "ray_block", "interpret"))
def _hit_pallas_v4_raw(rays_t, attrs, *, min_t, ray_block, interpret=False):
    n = rays_t.shape[1]
    s = attrs.shape[0]
    kernel = functools.partial(_hit_kernel_v4, n_spheres=s, min_t=min_t)
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
            pl.BlockSpec((ATTR_COLS, ray_block), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((1, n), jnp.float32),
            jax.ShapeDtypeStruct((ATTR_COLS, n), jnp.float32),
        ],
        interpret=interpret,
    )(rays_t, attrs)


def pack_rays_rows(origin, direction, time):
    """[3,N]+[3,N]+[1,N] -> the kernel's [8,N] ray rows (contiguous concat,
    no transposes)."""
    a = jnp.sum(direction * direction, axis=0, keepdims=True)
    return jnp.concatenate([origin, direction, time, a], axis=0)


def assemble_hit_record_rows(origin, direction, time, best_t, gt
                             ) -> HitRecordRows:
    """HitRecordRows from winner attribute rows gt [16, N] (row epilogue —
    each field is one contiguous row slice)."""
    hit = best_t < F32_MAX
    t_safe = jnp.where(hit, best_t, 0.0)
    point = origin + t_safe * direction
    lerp = (time - gt[_A_T1:_A_T1 + 1]) * gt[_A_INVDT:_A_INVDT + 1]
    center = gt[_A_C1X:_A_C1Z + 1] + gt[_A_DCX:_A_DCZ + 1] * lerp
    radius = gt[_A_RADIUS:_A_RADIUS + 1]
    denom = jnp.where(radius == 0.0, 1.0, radius)
    normal = (point - center) / denom
    return HitRecordRows(
        hit=hit, t=best_t, point=point, normal=normal,
        idx=gt[_A_IDX:_A_IDX + 1].astype(jnp.int32),
        mat_id=gt[_A_MAT:_A_MAT + 1].astype(jnp.int32),
        albedo=gt[_A_ALR:_A_ALB + 1],
        fuzz=gt[_A_FUZZ:_A_FUZZ + 1], ior=gt[_A_IOR:_A_IOR + 1],
    )


def hit_spheres_pallas_v4(
    scene: SphereScene,
    origin: jnp.ndarray,     # [3, N]
    direction: jnp.ndarray,  # [3, N]
    time: jnp.ndarray,       # [1, N]
    min_t: float = MIN_HIT_T,
    ray_block: int = DEFAULT_RAY_BLOCK_V4,
    interpret: bool = False,
) -> HitRecordRows:
    """Rows-layout nearest-hit sweep (ops.rows interface)."""
    n = origin.shape[1]
    pad = (-n) % ray_block
    rays_t = pack_rays_rows(origin, direction, time)
    if pad:
        filler = jnp.zeros((8, pad), jnp.float32).at[7, :].set(1.0)
        rays_t = jnp.concatenate([rays_t, filler], axis=1)

    attrs = _attr_matrix(scene)
    t_out, gt = _hit_pallas_v4_raw(
        rays_t, attrs, min_t=float(min_t), ray_block=ray_block,
        interpret=interpret)
    rec = assemble_hit_record_rows(
        rays_t[0:3], rays_t[3:6], rays_t[6:7], t_out, gt)
    if pad:
        rec = HitRecordRows(*(x[:, :n] for x in rec))
    return rec
